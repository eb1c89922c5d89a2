"""Whole-slide detector training driver.

The reference consumes a frozen Faster R-CNN graph trained in the separate
``jinseikenai/glomeruli_detection`` repo (not in the tree; SURVEY.md §0).
This driver provides the equivalent capability natively: it samples
detection windows from annotated slides (Pascal-VOC XMLs at ds-8
coordinates, the layout `make_seg_data` reads), trains
:class:`..models.faster_rcnn.FasterRCNN` with the two-stage losses, and
saves a ``detector.ckpt.pth`` the detect CLI loads.

Window sampling: positive-biased — each step picks a random annotated
slide, then with p=0.7 a window centred near a random GT box (jittered),
else a uniform window; boxes are clipped to the window and kept when at
least half their area survives.
"""
from __future__ import annotations

import dataclasses
import glob
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from .. import wsi
from ..utils.annotation import AnnotationHandler
from ..utils.glomus_handler import GlomusHandler


@dataclasses.dataclass
class DetectorTrainConfig:
    image_size: int = 512
    batch_size: int = 4
    steps: int = 2000
    lr: float = 1e-3
    max_gt: int = 16
    level_downsample: float = 8.0
    pos_window_prob: float = 0.7
    eval_every: int = 200
    seed: int = 0


class SlideWindowSampler:
    """Random detection windows + clipped GT boxes from annotated slides."""

    def __init__(self, staining_type: str, data_dir: str, target_list: str,
                 config: DetectorTrainConfig):
        self.config = config
        self.staining_dir = GlomusHandler.get_staining_type(staining_type)
        self.slides = []  # (slide, level, gt_boxes_level_coords)
        handler = AnnotationHandler(data_dir, staining_type)
        with open(target_list) as f:
            patients = [line.split(os.sep)[0].strip() for line in f
                        if line.strip()]
        for patient in patients:
            pdir = os.path.join(data_dir, self.staining_dir, patient)
            ann_dir = os.path.join(pdir, "annotations")
            if not os.path.isdir(ann_dir):
                continue
            slide_files = [p for pat in ("*ndpi", "*.tiff", "*.tif")
                           for p in glob.glob(os.path.join(pdir, pat))]
            if not slide_files:
                continue
            slide = wsi.open_slide(slide_files[0])
            level = slide.get_best_level_for_downsample(
                config.level_downsample)
            for xml in sorted(glob.glob(os.path.join(ann_dir, "*.xml"))):
                handler.clear_annotation()
                try:
                    handler.read_annotation(ann_dir, os.path.basename(xml))
                except Exception:
                    continue
                ds_ann = self._annotation_downsample(os.path.basename(xml))
                scale = ds_ann / slide.level_downsamples[level]
                boxes = [[b[1] * scale, b[0] * scale, b[3] * scale,
                          b[2] * scale]  # [ymin, xmin, ymax, xmax]
                         for b, name in zip(handler.gt_list,
                                            handler.gt_name_list)
                         if name in ("glomerulus", "glomerulus-kana")]
                if boxes:
                    self.slides.append((slide, level,
                                        np.asarray(boxes, np.float32)))
        if not self.slides:
            raise SystemExit("no annotated slides found for detector training")

    @staticmethod
    def _annotation_downsample(file_name: str) -> float:
        import re

        m = re.search(r"_ds(\d{1,2})", file_name)
        return float(m.group(1)) if m else 8.0

    def sample_batch(self, rng: np.random.Generator):
        cfg = self.config
        s = cfg.image_size
        images = np.zeros((cfg.batch_size, s, s, 3), np.uint8)
        gt_boxes = np.zeros((cfg.batch_size, cfg.max_gt, 4), np.float32)
        gt_classes = np.zeros((cfg.batch_size, cfg.max_gt), np.int32)
        gt_valid = np.zeros((cfg.batch_size, cfg.max_gt), bool)
        for b in range(cfg.batch_size):
            slide, level, boxes = self.slides[
                int(rng.integers(len(self.slides)))]
            lw, lh = slide.level_dimensions[level]
            ds = slide.level_downsamples[level]
            if rng.random() < cfg.pos_window_prob and len(boxes):
                gt = boxes[int(rng.integers(len(boxes)))]
                cy = (gt[0] + gt[2]) / 2 + rng.uniform(-s / 4, s / 4)
                cx = (gt[1] + gt[3]) / 2 + rng.uniform(-s / 4, s / 4)
                y0 = int(np.clip(cy - s / 2, 0, max(lh - s, 0)))
                x0 = int(np.clip(cx - s / 2, 0, max(lw - s, 0)))
            else:
                y0 = int(rng.integers(0, max(lh - s, 1)))
                x0 = int(rng.integers(0, max(lw - s, 1)))
            region = slide.read_region_array(
                (int(x0 * ds), int(y0 * ds)), level, (s, s))
            images[b] = region
            count = 0
            for gy1, gx1, gy2, gx2 in boxes:
                cy1 = np.clip(gy1 - y0, 0, s)
                cx1 = np.clip(gx1 - x0, 0, s)
                cy2 = np.clip(gy2 - y0, 0, s)
                cx2 = np.clip(gx2 - x0, 0, s)
                if (cy2 - cy1) * (cx2 - cx1) < 0.5 * (gy2 - gy1) * (gx2 - gx1):
                    continue
                if count >= self.config.max_gt:
                    break
                gt_boxes[b, count] = [cy1, cx1, cy2, cx2]
                gt_classes[b, count] = 1
                gt_valid[b, count] = True
                count += 1
        return images, gt_boxes, gt_classes, gt_valid


def _jit_detector_step(step, n_state: int, n_batch: int,
                       data_parallel: int, batch_size: int):
    """jit a detector training step, optionally data-parallel: the first
    ``n_state`` args (params/optimizer state) replicate over the mesh,
    the trailing ``n_batch`` args shard on their leading (batch) axis,
    and every output replicates (scalar losses; state updates are
    reduced by GSPMD over ICI).  Returns (jitted_step, batch_sharding)
    — ``batch_sharding`` is None off-mesh."""
    import jax

    if not data_parallel:
        return jax.jit(step), None
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import make_data_mesh

    mesh = make_data_mesh(data_parallel, batch_size)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    jitted = jax.jit(step,
                     in_shardings=(repl,) * n_state + (data,) * n_batch,
                     out_shardings=repl)
    return jitted, data


def train_detector(staining: str, data_dir: str, target_list: str,
                   output_dir: str,
                   config: Optional[DetectorTrainConfig] = None,
                   model_config=None, log_every: int = 50,
                   data_parallel: int = 0, bf16: bool = False) -> str:
    """Train and save ``detector.ckpt.pth``; returns its path.

    ``data_parallel=N`` shards the window batch over an N-device mesh
    (params/optimizer replicated; GSPMD inserts the gradient reduction
    over ICI) — the reference trains single-GPU (SURVEY.md §2.11).
    ``bf16`` runs backbone/head convs in bfloat16 on the MXU (params,
    BN statistics, box decode and the loss stay f32, matching the
    ESPNet/SegFormer trainers' --bf16)."""
    import jax
    import jax.numpy as jnp
    import optax

    from ..convert.torch_pickle import save_torch_legacy
    from ..models.faster_rcnn import (
        FasterRCNN,
        FasterRCNNConfig,
        build_anchors,
    )
    from .detector_train import detector_loss

    config = config or DetectorTrainConfig()
    if model_config is None:
        model_config = FasterRCNNConfig(
            image_size=(config.image_size, config.image_size))
    sampler = SlideWindowSampler(staining, data_dir, target_list, config)
    rng = np.random.default_rng(config.seed)

    model = FasterRCNN(model_config,
                       dtype=jnp.bfloat16 if bf16 else None)
    anchors = build_anchors(model_config)
    x0, b0, c0, v0 = sampler.sample_batch(rng)
    variables = model.init(jax.random.key(config.seed),
                           jnp.asarray(x0, jnp.float32), anchors, train=True)
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(config.lr)
    opt_state = tx.init(params)

    def step(params, batch_stats, opt_state, x, gb, gc, gv):
        def loss_fn(p):
            out, upd = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, anchors,
                train=True, mutable=["batch_stats"])
            losses = detector_loss(anchors, out, gb, gc, gv)
            return losses["total"], (losses, upd["batch_stats"])

        (loss, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), new_stats, opt_state,
                losses)

    step, batch_sharding = _jit_detector_step(
        step, n_state=3, n_batch=4, data_parallel=data_parallel,
        batch_size=config.batch_size)

    for i in range(config.steps):
        x, gb, gc, gv = sampler.sample_batch(rng)
        params, batch_stats, opt_state, losses = step(
            params, batch_stats, opt_state,
            jax.device_put(np.asarray(x, np.float32), batch_sharding),
            jax.device_put(gb, batch_sharding),
            jax.device_put(gc, batch_sharding),
            jax.device_put(gv, batch_sharding))
        if i % log_every == 0:
            print(f"step {i}: " + ", ".join(
                f"{k}={float(v):.4f}" for k, v in losses.items()))

    os.makedirs(output_dir, exist_ok=True)
    ckpt_path = os.path.join(output_dir, "detector.ckpt.pth")
    save_torch_legacy({
        "variables": jax.tree.map(np.asarray, {
            "params": params, "batch_stats": batch_stats}),
        "config": dataclasses.asdict(model_config),
    }, ckpt_path)
    return ckpt_path
