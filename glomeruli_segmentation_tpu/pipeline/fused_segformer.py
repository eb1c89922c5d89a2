"""Fused SegFormer/GTCS slide path: crops -> MiT forward -> /8 canvas.

The reference's SegFormer variant only exists as a staged chain (crop PNGs
-> ``module/SegFormer/test/test.py`` per-crop inference -> label PNGs ->
``eval_wsi_segmentation_gtcs.py`` host stitcher); this module gives the
GTCS model family the same resident one-process slide path the 5-fold
ESPNet ensemble has (:class:`.fused.FusedSlideSegmenter`), so ``gseg-e2e
--segformer_checkpoint`` runs detect -> merge -> SegFormer -> stitch with
no intermediate files.

Numerics follow the staged chain exactly:

- crops are cv2-resized to ``input_size`` on host **as uint8** — the
  ``SegformerFeatureExtractor`` contract reconstructed in
  :func:`..data.segformer_dataset.feature_extract` (cv2's uint8
  INTER_LINEAR is fixed-point; doing it on host keeps the staged
  bit-pattern AND ships only ``input_size²`` bytes per crop);
- /255 + ImageNet normalization and the MiT forward run on device in one
  jitted program per batch (logits at 1/4 input resolution, the HF
  contract ``SegFormer/test/test.py:60-74``);
- the staged chain bilinear-upsamples logits to crop size before the
  argmax (``upsample_logits``, torch ``F.interpolate`` align_corners=False
  at ``SegFormer/train/train.py:46-52``); the /8 canvas needs only every
  nearest-selected pixel of that map, so the device path evaluates the
  *same* half-pixel bilinear blend (``ops.resize._linear_weights``
  tables, identical f32 expression) only at the gathered positions and
  reads back a tiny (B, h/8, w/8) uint8 map — bit-identical to
  upsample-then-nearest (tested).
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.segformer_dataset import IMAGENET_MEAN, IMAGENET_STD
from ..ops.resize import _linear_weights, resize_bilinear_np


@dataclasses.dataclass
class SegformerSlideConfig:
    num_labels: int = 5
    input_size: int = 512
    batch_size: int = 8
    compute_dtype: str = "float32"


def load_segformer_checkpoint(path: str):
    """Load a ``flax_model.pth`` blob (the trainer's checkpoint format,
    ``train/segformer_train.py``) from the file itself, a ``checkpoint-N``
    directory, or a training output dir (best checkpoint discovered from
    ``log.txt``, the reference contract ``SegFormer/test/test.py:149-171``)."""
    import os

    from ..convert.torch_pickle import load_torch_pickle

    if os.path.isdir(path):
        if os.path.isfile(os.path.join(path, "flax_model.pth")):
            path = os.path.join(path, "flax_model.pth")
        else:
            from .segformer_test import search_best_checkpoint

            path = os.path.join(path, search_best_checkpoint(path),
                                "flax_model.pth")
    blob = load_torch_pickle(path)
    variables = {"params": jax.tree.map(jnp.asarray, blob["params"]),
                 "batch_stats": jax.tree.map(jnp.asarray,
                                             blob["batch_stats"])}
    return variables, int(blob.get("num_labels", 5))


class SegformerSlideSegmenter:
    """Whole-slide fused GTCS path: detections -> /8 prediction canvas.

    Drop-in peer of :class:`.fused.FusedSlideSegmenter` (same
    ``segment_slide(slide, detections, progress, on_crop)`` surface) so
    :class:`.e2e.FusedEndToEnd` drives either model family."""

    def __init__(self, variables, config: Optional[SegformerSlideConfig]
                 = None, mesh=None):
        from ..models.segformer import Segformer, config_from_variables

        self.config = config or SegformerSlideConfig()
        cfg = self.config
        mdtype = jnp.dtype(cfg.compute_dtype)
        self.model = Segformer(
            config_from_variables(variables, num_labels=cfg.num_labels),
            dtype=None if mdtype == jnp.float32 else mdtype)
        self.variables = variables
        # logits resolution: 1/4 of the input (HF Segformer contract)
        self._hq = cfg.input_size // 4
        self._data_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            n_data = mesh.shape["data"]
            if cfg.batch_size % n_data:
                raise ValueError(
                    f"batch_size {cfg.batch_size} must be divisible by "
                    f"the mesh 'data' axis size {n_data} (crop batches "
                    f"shard over it — same contract as EnsembleSegmenter)")
            data = NamedSharding(mesh, P("data"))
            self._data_sharding = data
            self.variables = jax.device_put(self.variables,
                                            NamedSharding(mesh, P()))
            self._logits = jax.jit(self._logits_impl, in_shardings=(data,),
                                   out_shardings=data)
            self._gather = jax.jit(self._gather_impl,
                                   in_shardings=(data,) * 7,
                                   out_shardings=data)
        else:
            self._logits = jax.jit(self._logits_impl)
            self._gather = jax.jit(self._gather_impl)

    def _logits_impl(self, batch_u8: jax.Array) -> jax.Array:
        """(B, S, S, 3) uint8 RGB (host cv2-resized) -> (B, S/4, S/4, C)
        f32 logits.  /255 + ImageNet norm on device
        (data/segformer_dataset.py::feature_extract semantics)."""
        x = batch_u8.astype(jnp.float32) / 255.0
        x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        return self.model.apply(self.variables, x).astype(jnp.float32)

    def _gather_impl(self, batch_u8: jax.Array, ylo: jax.Array,
                     yhi: jax.Array, wy: jax.Array, xlo: jax.Array,
                     xhi: jax.Array, wx: jax.Array) -> jax.Array:
        """Forward + bilinear-sample the logits at the /8 stitch positions
        + argmax, all on device; only (B, th, tw) uint8 leaves the chip.

        The blend is the exact f32 expression of
        :func:`..ops.resize.resize_bilinear` (rows then columns,
        ``top*(1-w) + bot*w``), evaluated at the nearest-/8-selected
        output pixels — bit-identical to the staged upsample-then-argmax
        at those pixels."""
        logits = self._logits_impl(batch_u8)

        def one(lg, yl, yh, w_y, xl, xh, w_x):
            top = jnp.take(lg, yl, axis=0)
            bot = jnp.take(lg, yh, axis=0)
            w_y = w_y[:, None, None]
            rows = top * (1.0 - w_y) + bot * w_y
            left = jnp.take(rows, xl, axis=1)
            right = jnp.take(rows, xh, axis=1)
            w_x = w_x[None, :, None]
            out = left * (1.0 - w_x) + right * w_x
            return jnp.argmax(out, axis=-1).astype(jnp.uint8)

        return jax.vmap(one)(logits, ylo, yhi, wy, xlo, xhi, wx)

    def predict_full(self, logits_np: np.ndarray, crop_h: int,
                     crop_w: int) -> np.ndarray:
        """Host per-crop staged math: bilinear logits -> crop size ->
        argmax (``upsample_logits`` + argmax of segformer_test.py), via
        the numpy twin so no per-crop-shape device program compiles."""
        up = resize_bilinear_np(logits_np, crop_h, crop_w)
        return np.argmax(up, axis=-1).astype(np.uint8)

    def segment_slide(self, slide, detections: List[List[float]],
                      progress: bool = False, on_crop=None) -> np.ndarray:
        import queue
        import threading

        import cv2

        cfg = self.config
        S = cfg.input_size
        hq = self._hq
        width, height = slide.dimensions
        canvas = np.zeros((height // 8, width // 8), np.uint8)
        bs = cfg.batch_size
        boxes = [[int(v) for v in det[:4]] for det in detections]
        ds8 = on_crop is None

        def sample_tables(crop_n: int, out_n: int, table_n: int):
            """Bilinear lo/hi/weight of the full crop_n-upsample, taken at
            the nearest-/8 rows ``floor(i * crop_n / out_n)`` — the exact
            composition the ESPNet fused path uses (fused.py nearest_idx
            -> postprocess_nearest_host semantics)."""
            lo, hi, w = _linear_weights(hq, max(crop_n, 1))
            sel = np.minimum(np.floor(np.arange(table_n)
                                      * (crop_n / max(out_n, 1))
                                      ).astype(np.int64),
                             max(crop_n, 1) - 1)
            return lo[sel], hi[sel], w[sel]

        def stage_batch(chunk):
            resized = np.zeros((bs, S, S, 3), np.uint8)
            dims = []
            for i, (x1, y1, x2, y2) in enumerate(chunk):
                crop = slide.read_region_array((x1, y1), 0,
                                               (x2 - x1, y2 - y1))  # RGB
                # uint8 cv2 INTER_LINEAR: the SegformerFeatureExtractor
                # resize the staged chain applies (fixed-point; host-exact)
                resized[i] = cv2.resize(crop, (S, S),
                                        interpolation=cv2.INTER_LINEAR)
                dims.append((crop.shape[0], crop.shape[1]))
            if not ds8:
                return chunk, len(chunk), resized, None
            # bucket the gather-table extents so XLA compiles a bounded
            # number of programs across a slide's ragged crops
            th = max(-(-max(h // 8 for h, _ in dims) // 64) * 64, 64)
            tw = max(-(-max(w // 8 for _, w in dims) // 64) * 64, 64)
            ylo = np.zeros((bs, th), np.int32)
            yhi = np.zeros((bs, th), np.int32)
            wy = np.zeros((bs, th), np.float32)
            xlo = np.zeros((bs, tw), np.int32)
            xhi = np.zeros((bs, tw), np.int32)
            wx = np.zeros((bs, tw), np.float32)
            for i, (h, w) in enumerate(dims):
                ylo[i], yhi[i], wy[i] = sample_tables(h, h // 8, th)
                xlo[i], xhi[i], wx[i] = sample_tables(w, w // 8, tw)
            return chunk, len(chunk), resized, (ylo, yhi, wy, xlo, xhi, wx)

        q: "queue.Queue" = queue.Queue(maxsize=2)
        SENTINEL = object()

        def producer():
            # a producer failure (e.g. a slide-read IOError) must reach
            # the consumer, not silently truncate the canvas: the slide
            # would otherwise be logged complete, --resume would skip it
            # and gseg-serve would file the ticket under done/
            try:
                for start in range(0, len(boxes), bs):
                    q.put(stage_batch(boxes[start: start + bs]))
                q.put(SENTINEL)
            except BaseException as e:  # re-raised in the consumer loop
                q.put(e)

        threading.Thread(target=producer, daemon=True).start()
        done = 0
        s = self._data_sharding

        def submit(item):
            chunk, n, resized, tables = item
            batch = jax.device_put(resized, s)
            if ds8:
                out = self._gather(batch, *(jax.device_put(t, s)
                                            for t in tables))
            else:
                out = self._logits(batch)
            return chunk, n, out

        def drain(pending):
            nonlocal done
            chunk, n, out = pending
            maps = np.asarray(out)
            for k, (x1, y1, x2, y2) in enumerate(chunk):
                ch, cw = (y2 - y1) // 8, (x2 - x1) // 8
                if ds8:
                    small = maps[k]
                else:
                    full = self.predict_full(maps[k], y2 - y1, x2 - x1)
                    on_crop((x1, y1, x2, y2), full)
                    from ..ops.preprocess import postprocess_nearest_host

                    small = postprocess_nearest_host(full, ch, cw)
                y0, x0 = y1 // 8, x1 // 8
                # clamp the paste to the canvas intersection (detect's
                # ceil window grid can overhang the slide edge)
                ch = max(0, min(ch, canvas.shape[0] - y0))
                cw = max(0, min(cw, canvas.shape[1] - x0))
                if ch == 0 or cw == 0:
                    continue
                region = canvas[y0: y0 + ch, x0: x0 + cw]
                np.maximum(region, small[:ch, :cw], out=region)
            done += n
            if progress:
                print(f"{done}/{len(boxes)} crops")

        pending = None
        while True:
            item = q.get()
            if item is SENTINEL:
                break
            if isinstance(item, BaseException):
                raise item
            submitted = submit(item)
            if pending is not None:
                drain(pending)
            pending = submitted
        if pending is not None:
            drain(pending)
        return canvas
