"""Faster R-CNN in JAX/Flax — the TPU-native glomerulus detector.

Re-design of the reference's frozen TF-1.12 Object Detection API graph
(loaded at ``module/faster-rcnn/detect_glomus_test.py:420-456``; tensors
``image_tensor / detection_boxes / detection_scores / detection_classes /
num_detections``).  The graph internals (backbone, RPN, proposal NMS,
crop_and_resize, box head, multiclass NMS) are rebuilt as static-shape
XLA programs:

- anchors precomputed on the host for the static window size;
- proposal selection = top-k + greedy scan NMS (:mod:`..ops.nms`);
- ROI features via MXU-friendly ``crop_and_resize`` (:mod:`..ops.roi_align`);
- every stage padded to fixed sizes so one compilation serves every window.

Outputs mirror the frozen graph: normalized ``[ymin, xmin, ymax, xmax]``
boxes, scores, 1-based float classes, and ``num_detections``.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.boxes import clip_boxes, decode_boxes, generate_anchors
from ..ops.nms import gather_padded, nms
from ..ops.roi_align import crop_and_resize_matmul
from .resnet import ResNetBlock4, ResNetC4, TinyBackbone, TinyHead


@dataclasses.dataclass(frozen=True)
class FasterRCNNConfig:
    num_classes: int = 1  # foreground classes ('glomerulus')
    image_size: Tuple[int, int] = (512, 512)
    stride: int = 16
    anchor_scales: Tuple[float, ...] = (0.25, 0.5, 1.0, 2.0)
    anchor_aspects: Tuple[float, ...] = (0.5, 1.0, 2.0)
    anchor_base: float = 256.0
    pre_nms_top_n: int = 2000
    post_nms_top_n: int = 300
    rpn_nms_threshold: float = 0.7
    crop_size: int = 14
    max_detections: int = 100
    second_nms_threshold: float = 0.6
    score_threshold: float = 0.0
    backbone: str = "resnet50"  # or "tiny"
    # image-net channel means for the resnet preprocessing (RGB)
    pixel_means: Tuple[float, float, float] = (123.68, 116.779, 103.939)
    # proposals per second-stage step: an unchunked head materializes
    # (B, 300, 14, 14, 1024) ROI crops — 3.85 GB at B=16, which fails HBM
    # allocation; chunking keeps only (B, chunk, ...) live (profiled
    # round 2: the ROI stage was 49 of 78 ms per 4-window batch).
    # 0 = auto: the largest chunk with B * chunk <= 1024 (~820 MB live),
    # so small window batches stay effectively unchunked
    roi_chunk: int = 0

    @property
    def num_anchors_per_cell(self) -> int:
        return len(self.anchor_scales) * len(self.anchor_aspects)

    @property
    def feature_shape(self) -> Tuple[int, int]:
        return (self.image_size[0] // self.stride,
                self.image_size[1] // self.stride)


class RPNHead(nn.Module):
    num_anchors: int
    dtype: Any = None

    @nn.compact
    def __call__(self, feat):
        x = nn.relu(nn.Conv(512, (3, 3), padding="SAME", dtype=self.dtype,
                            name="conv")(feat))
        objectness = nn.Conv(self.num_anchors * 2, (1, 1), dtype=self.dtype,
                             name="cls")(x)
        deltas = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype,
                         name="box")(x)
        # box decode / NMS numerics stay f32 whatever the compute dtype
        # (matches the OD-API model, od_api_frcnn.py:133-134)
        return objectness.astype(jnp.float32), deltas.astype(jnp.float32)


class BoxHead(nn.Module):
    """Second stage: per-ROI features -> class scores + box refinements."""

    num_classes: int
    backbone: str
    dtype: Any = None

    @nn.compact
    def __call__(self, roi_feats, train: bool = False):
        if self.backbone == "resnet50":
            x = ResNetBlock4(dtype=self.dtype, name="block4")(roi_feats,
                                                              train)
        else:
            x = TinyHead(dtype=self.dtype, name="tiny_head")(roi_feats, train)
        x = x.mean(axis=(1, 2))  # global average pool
        scores = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                          name="cls")(x)
        deltas = nn.Dense(self.num_classes * 4, dtype=self.dtype,
                          name="box")(x)
        return scores.astype(jnp.float32), deltas.astype(jnp.float32)


class FasterRCNN(nn.Module):
    """Full detector. ``__call__`` returns raw stage outputs for training;
    :meth:`detect` applies the inference post-processing."""

    config: FasterRCNNConfig = FasterRCNNConfig()
    dtype: Any = None  # bf16 MXU compute; params/BN stats/box math stay f32

    def setup(self):
        cfg = self.config
        if cfg.backbone == "resnet50":
            self.extractor = ResNetC4(dtype=self.dtype, name="backbone")
        else:
            self.extractor = TinyBackbone(dtype=self.dtype, name="backbone")
        self.rpn = RPNHead(cfg.num_anchors_per_cell, dtype=self.dtype,
                           name="rpn")
        self.box_head = BoxHead(cfg.num_classes, cfg.backbone,
                                dtype=self.dtype, name="box_head")

    def preprocess(self, images: jax.Array) -> jax.Array:
        means = jnp.asarray(self.config.pixel_means, images.dtype
                            if jnp.issubdtype(images.dtype, jnp.floating)
                            else jnp.float32)
        return images.astype(means.dtype) - means

    def features(self, images: jax.Array, train: bool = False) -> jax.Array:
        return self.extractor(self.preprocess(images), train)

    def rpn_outputs(self, feats: jax.Array):
        """(N, H*W*A, 2) objectness logits and (N, H*W*A, 4) deltas."""
        obj, deltas = self.rpn(feats)
        n = feats.shape[0]
        return (obj.reshape(n, -1, 2), deltas.reshape(n, -1, 4))

    def propose(self, rpn_obj: jax.Array, rpn_deltas: jax.Array,
                anchors: jax.Array):
        """RPN outputs -> (N, post_nms_top_n, 4) pixel-coord proposals."""
        cfg = self.config
        h, w = cfg.image_size

        def one(obj, deltas):
            scores = jax.nn.softmax(obj, axis=-1)[:, 1]
            k = min(cfg.pre_nms_top_n, scores.shape[0])
            top_scores, top_idx = jax.lax.top_k(scores, k)
            boxes = decode_boxes(deltas[top_idx], anchors[top_idx])
            boxes = clip_boxes(boxes, h, w)
            keep, _ = nms(boxes, top_scores, cfg.post_nms_top_n,
                          cfg.rpn_nms_threshold)
            return gather_padded(boxes, keep), gather_padded(top_scores, keep,
                                                             NEG_PAD)

        return jax.vmap(one)(rpn_obj, rpn_deltas)

    def roi_features(self, feats: jax.Array, proposals: jax.Array):
        """Crop proposals (pixel coords) from the stride-16 features
        (MXU two-tap-matrix formulation, ops/roi_align.py)."""
        cfg = self.config
        h, w = cfg.image_size
        norm = proposals / jnp.asarray([h, w, h, w], jnp.float32)

        def one(feat, boxes):
            return crop_and_resize_matmul(feat, boxes.astype(jnp.float32),
                                          cfg.crop_size)

        return jax.vmap(one)(feats, norm)

    def __call__(self, images: jax.Array, anchors: jax.Array,
                 train: bool = False):
        cfg = self.config
        feats = self.features(images, train)
        rpn_obj, rpn_deltas = self.rpn_outputs(feats)
        proposals, prop_scores = self.propose(rpn_obj, rpn_deltas, anchors)
        # two-stage training convention: no gradient through proposal
        # generation into the second stage (and no backward through the NMS
        # scan, which would dominate compile time)
        proposals = jax.lax.stop_gradient(proposals)
        # chunk the second stage over the proposal axis: cropping all P
        # proposals at once materializes (B, P, S, S, C) — 3.85 GB at
        # B=16 — and the chunked calls share box_head params (linen
        # reuses the submodule; XLA schedules the chunks sequentially so
        # only one chunk's crops are live at a time)
        n, p = proposals.shape[:2]
        chunk = cfg.roi_chunk or max(1, 1024 // n)
        chunk = min(chunk, p)
        scores_parts, deltas_parts = [], []
        for start in range(0, p, chunk):
            part = jax.lax.slice_in_dim(proposals, start,
                                        min(start + chunk, p), axis=1)
            roi = self.roi_features(feats, part)
            pc = roi.shape[1]
            flat = roi.reshape((n * pc,) + roi.shape[2:])
            s_c, d_c = self.box_head(flat, train)
            scores_parts.append(s_c.reshape(n, pc, -1))
            deltas_parts.append(d_c.reshape(n, pc, cfg.num_classes, 4))
        scores = jnp.concatenate(scores_parts, axis=1)
        deltas = jnp.concatenate(deltas_parts, axis=1)
        return {
            "features": feats,
            "rpn_objectness": rpn_obj,
            "rpn_deltas": rpn_deltas,
            "proposals": proposals,
            "proposal_scores": prop_scores,
            "class_scores": scores,
            "box_deltas": deltas,
        }

    def detect(self, images: jax.Array, anchors: jax.Array):
        """Inference post-processing to the frozen-graph output contract."""
        cfg = self.config
        out = self(images, anchors, train=False)
        h, w = cfg.image_size

        def one(proposals, class_scores, box_deltas):
            probs = jax.nn.softmax(class_scores, axis=-1)  # (P, C+1)
            all_boxes = []
            all_scores = []
            all_classes = []
            for c in range(cfg.num_classes):
                boxes_c = decode_boxes(box_deltas[:, c, :], proposals)
                boxes_c = clip_boxes(boxes_c, h, w)
                scores_c = probs[:, c + 1]
                keep, _ = nms(boxes_c, scores_c, cfg.max_detections,
                              cfg.second_nms_threshold,
                              cfg.score_threshold)
                all_boxes.append(gather_padded(boxes_c, keep))
                all_scores.append(gather_padded(scores_c, keep, NEG_PAD))
                all_classes.append(
                    jnp.full((cfg.max_detections,), c + 1, jnp.float32))
            boxes = jnp.concatenate(all_boxes)
            scores = jnp.concatenate(all_scores)
            classes = jnp.concatenate(all_classes)
            top_scores, top_idx = jax.lax.top_k(scores, cfg.max_detections)
            boxes = boxes[top_idx]
            classes = classes[top_idx]
            valid = top_scores > NEG_PAD / 2
            num = jnp.sum(valid).astype(jnp.float32)
            norm = boxes / jnp.asarray([h, w, h, w], jnp.float32)
            return (jnp.where(valid[:, None], norm, 0.0),
                    jnp.where(valid, top_scores, 0.0), classes, num)

        boxes, scores, classes, num = jax.vmap(one)(
            out["proposals"], out["class_scores"], out["box_deltas"])
        return {"detection_boxes": boxes, "detection_scores": scores,
                "detection_classes": classes, "num_detections": num}


NEG_PAD = -1e10


def build_anchors(config: FasterRCNNConfig) -> jax.Array:
    fh, fw = config.feature_shape
    return generate_anchors(fh, fw, config.stride, config.anchor_scales,
                            config.anchor_aspects, config.anchor_base)
