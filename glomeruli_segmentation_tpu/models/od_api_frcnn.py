"""Faster R-CNN with the TF OD-API inception_v2 architecture — runs the
reference's downloaded ``frozen_inference_graph.pb`` weights natively on TPU.

This is the graph the reference loads at
``module/faster-rcnn/detect_glomus_test.py:420-456`` (tensors
``image_tensor / detection_boxes / detection_scores / detection_classes /
num_detections``), rebuilt as a static-shape XLA program over the parameter
tree produced by :func:`..convert.pb_import.load_od_api_detector_params`:

- inception_v2 trunk through Mixed_4e (stride 16), BN folded
  (:mod:`.inception_v2`);
- RPN: 3x3 conv (relu6, ``Conv/*``) + 1x1 box/class heads
  (``FirstStageBoxPredictor``), anchors per the OD-API grid generator
  (offset 0, base 256, scales x aspects flattened aspect-major);
- proposals: softmax objectness -> top-k -> decode ([10,10,5,5] scales)
  -> clip -> greedy NMS (iou 0.7) -> top ``max_proposals``;
- ROI features: ``crop_and_resize`` to 14, 2x2/2 maxpool, Mixed_5a..5c,
  global mean pool, FC heads (``SecondStageBoxPredictor``);
- per-class NMS (iou 0.6) + cross-class top-k, normalized outputs matching
  the frozen-graph contract.

Post-processing thresholds default to the OD-API sample
``faster_rcnn_inception_v2`` configuration; all are overridable.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.boxes import clip_boxes, decode_boxes
from ..ops.nms import gather_padded, nms
from ..ops.roi_align import crop_and_resize_matmul
from .inception_v2 import (
    classifier_features,
    conv_same,
    max_pool_same,
    proposal_features,
)

NEG_PAD = -1e10


@dataclasses.dataclass(frozen=True)
class ODAPIConfig:
    num_classes: int = 1
    image_size: Tuple[int, int] = (600, 600)
    # keep_aspect_ratio_resizer bounds (applied by the backend on host)
    min_dimension: int = 600
    max_dimension: int = 1024
    stride: int = 16
    anchor_scales: Tuple[float, ...] = (0.25, 0.5, 1.0, 2.0)
    anchor_aspects: Tuple[float, ...] = (0.5, 1.0, 2.0)
    anchor_base: float = 256.0
    pre_nms_top_n: int = 6000
    max_proposals: int = 300
    rpn_nms_threshold: float = 0.7
    initial_crop_size: int = 14
    second_nms_threshold: float = 0.6
    second_score_threshold: float = 0.0
    max_detections: int = 100


def od_api_anchors(feat_h: int, feat_w: int,
                   config: ODAPIConfig) -> jax.Array:
    """OD-API GridAnchorGenerator: centers at ``(y*stride, x*stride)``
    (anchor_offset 0), heights ``scale/sqrt(aspect)*base``, per-cell order
    aspect-major / scale-minor — the flattened layout the conv heads'
    channels were trained against."""
    scales = np.asarray(config.anchor_scales, np.float32)
    aspects = np.asarray(config.anchor_aspects, np.float32)
    scales_grid, aspects_grid = np.meshgrid(scales, aspects)  # (A_a, A_s)
    scales_grid = scales_grid.reshape(-1)
    aspects_grid = aspects_grid.reshape(-1)
    ratio_sqrt = np.sqrt(aspects_grid)
    heights = scales_grid / ratio_sqrt * config.anchor_base
    widths = scales_grid * ratio_sqrt * config.anchor_base

    ys = np.arange(feat_h, dtype=np.float32) * config.stride
    xs = np.arange(feat_w, dtype=np.float32) * config.stride
    cx, cy = np.meshgrid(xs, ys)
    cy = cy.reshape(-1, 1)
    cx = cx.reshape(-1, 1)
    n = feat_h * feat_w
    a = len(heights)
    anchors = np.stack([
        np.broadcast_to(cy - heights / 2, (n, a)),
        np.broadcast_to(cx - widths / 2, (n, a)),
        np.broadcast_to(cy + heights / 2, (n, a)),
        np.broadcast_to(cx + widths / 2, (n, a)),
    ], axis=-1).reshape(-1, 4).astype(np.float32)
    # inference-mode OD API clips anchors to the image window
    h, w = config.image_size
    anchors[:, 0::2] = anchors[:, 0::2].clip(0, h)
    anchors[:, 1::2] = anchors[:, 1::2].clip(0, w)
    return jnp.asarray(anchors)


class ODAPIFasterRCNN:
    """Inference-only detector over an imported frozen-graph param tree."""

    def __init__(self, params, config: ODAPIConfig,
                 compute_dtype: str = "bfloat16"):
        self.params = jax.tree.map(jnp.asarray, params)
        self.config = config
        self.compute_dtype = jnp.dtype(compute_dtype)
        h, w = config.image_size
        self.anchors = od_api_anchors(-(-h // config.stride),
                                      -(-w // config.stride), config)

    # ------------- stages -------------
    # every stage takes an optional ``params`` override so a jitted
    # training step can thread the parameter tree as a traced argument
    # (fine-tuning, see train/od_api_finetune.py); inference uses the
    # baked self.params
    def _first_stage(self, images: jax.Array, params=None):
        """uint8/float RGB images -> (feats, objectness, deltas)."""
        p = self.params if params is None else params
        x = images.astype(self.compute_dtype) * (2.0 / 255.0) - 1.0
        feats = proposal_features(p["first"], x)
        rpn = conv_same(feats, p["rpn_conv"]["w"], p["rpn_conv"]["b"],
                        relu=False)
        rpn = jnp.minimum(jax.nn.relu(rpn), 6.0)  # tf.nn.relu6
        obj = conv_same(rpn, p["rpn_cls"]["w"], p["rpn_cls"]["b"], relu=False)
        deltas = conv_same(rpn, p["rpn_box"]["w"], p["rpn_box"]["b"],
                           relu=False)
        n = feats.shape[0]
        # conv output (B, h, w, A*k) flattens row-major to (B, h*w*A, k) —
        # the OD-API box predictor's reshape
        obj = obj.reshape(n, -1, 2).astype(jnp.float32)
        deltas = deltas.reshape(n, -1, 4).astype(jnp.float32)
        return feats, obj, deltas

    def _propose(self, obj: jax.Array, deltas: jax.Array):
        cfg = self.config
        h, w = cfg.image_size
        anchors = self.anchors

        def one(obj_i, deltas_i):
            scores = jax.nn.softmax(obj_i, axis=-1)[:, 1]
            k = min(cfg.pre_nms_top_n, scores.shape[0])
            top_scores, top_idx = jax.lax.top_k(scores, k)
            boxes = decode_boxes(deltas_i[top_idx], anchors[top_idx])
            boxes = clip_boxes(boxes, h, w)
            keep, _ = nms(boxes, top_scores, cfg.max_proposals,
                          cfg.rpn_nms_threshold)
            return (gather_padded(boxes, keep),
                    gather_padded(top_scores, keep, NEG_PAD))

        return jax.vmap(one)(obj, deltas)

    def _box_classifier(self, feats: jax.Array, proposals: jax.Array,
                        params=None):
        """Crop + Mixed_5 head + FC predictors.

        proposals are absolute pixel coords (padded rows are zeros)."""
        pp = self.params if params is None else params
        cfg = self.config
        h, w = cfg.image_size
        norm = proposals / jnp.asarray([h, w, h, w], jnp.float32)

        def crop_one(feat, boxes):
            c = crop_and_resize_matmul(feat, boxes.astype(jnp.float32),
                                       cfg.initial_crop_size)
            return max_pool_same(c, 2, 2)[:, : cfg.initial_crop_size // 2,
                                          : cfg.initial_crop_size // 2]

        roi = jax.vmap(crop_one)(feats, norm)  # (B, P, 7, 7, C)
        n, p = roi.shape[:2]
        flat = roi.reshape((n * p,) + roi.shape[2:])
        head = classifier_features(pp["second"], flat)
        pooled = head.mean(axis=(1, 2)).astype(jnp.float32)  # (B*P, C)
        fc_box, fc_cls = pp["fc_box"], pp["fc_cls"]
        box_enc = pooled @ fc_box["w"] + fc_box["b"]
        cls_logits = pooled @ fc_cls["w"] + fc_cls["b"]
        return (cls_logits.reshape(n, p, -1),
                box_enc.reshape(n, p, cfg.num_classes, 4))

    def train_outputs(self, images: jax.Array, params=None):
        """Both stages' raw outputs in the contract
        :func:`..train.detector_train.detector_loss` consumes — the same
        two-stage losses the TF OD API trained the downloaded graph with
        (the reference's detector training lived in the companion
        glomeruli_detection repo, SURVEY.md §0).  ``params`` is threaded
        explicitly so jitted steps differentiate w.r.t. it; BN is folded
        at import, so fine-tuning updates the folded conv scale/shift
        with frozen normalization statistics."""
        feats, obj, deltas = self._first_stage(images, params)
        proposals, prop_scores = self._propose(obj, deltas)
        # two-stage convention: no gradient through proposal generation
        proposals = jax.lax.stop_gradient(proposals)
        cls_logits, box_enc = self._box_classifier(feats, proposals, params)
        return {"rpn_objectness": obj, "rpn_deltas": deltas,
                "proposals": proposals, "proposal_scores": prop_scores,
                "class_scores": cls_logits, "box_deltas": box_enc}

    def detect(self, images: jax.Array):
        """Frozen-graph output contract (detect_glomus_test.py:443-450)."""
        cfg = self.config
        h, w = cfg.image_size
        feats, obj, deltas = self._first_stage(images)
        proposals, prop_scores = self._propose(obj, deltas)
        cls_logits, box_enc = self._box_classifier(feats, proposals)

        def one(proposals_i, prop_scores_i, cls_i, enc_i):
            probs = jax.nn.softmax(cls_i, axis=-1)  # (P, C+1)
            valid = (prop_scores_i > NEG_PAD / 2).astype(jnp.float32)
            all_boxes, all_scores, all_classes = [], [], []
            for c in range(cfg.num_classes):
                boxes_c = decode_boxes(enc_i[:, c, :], proposals_i)
                boxes_c = clip_boxes(boxes_c, h, w)
                scores_c = probs[:, c + 1] * valid  # mask padded proposals
                keep, _ = nms(boxes_c, scores_c, cfg.max_detections,
                              cfg.second_nms_threshold,
                              cfg.second_score_threshold)
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
            ok = top_scores > NEG_PAD / 2
            num = jnp.sum(ok).astype(jnp.float32)
            norm = boxes / jnp.asarray([h, w, h, w], jnp.float32)
            return (jnp.where(ok[:, None], norm, 0.0),
                    jnp.where(ok, top_scores, 0.0), classes, num)

        boxes, scores, classes, num = jax.vmap(one)(
            proposals, prop_scores, cls_logits, box_enc)
        return {"detection_boxes": boxes, "detection_scores": scores,
                "detection_classes": classes, "num_detections": num}


def keep_aspect_resize_shape(height: int, width: int, min_dimension: int,
                             max_dimension: int) -> Tuple[int, int]:
    """The graph's keep_aspect_ratio_resizer target shape (rounded like
    TF: int(round(dim * scale)))."""
    scale = min_dimension / min(height, width)
    if round(max(height, width) * scale) > max_dimension:
        scale = max_dimension / max(height, width)
    return (int(round(height * scale)), int(round(width * scale)))
