"""Fused on-device slide pipeline: crops -> 5-fold ESPNet ensemble -> stitch.

The reference runs each fold separately and stitches on the host through
labelme JSON files; the TPU-native fused path keeps everything resident on
device for a whole slide (BASELINE.json north star: "detect->crop->segment
handoff and overlap-tile label stitching with the 5-fold espnet_fold*.pth
ensemble run entirely on-device"):

- the five fold checkpoints are stacked into one pytree with a leading fold
  axis; a single ``vmap`` over folds runs all five networks per crop batch
  (one XLA program, weights stay in HBM);
- each fold applies its own BGR mean/std (README.md:243-249) inside the
  kernel; fold probabilities are averaged before the argmax;
- crop class maps are nearest-downsampled by 8 and pasted into the /8
  slide canvas with a pixelwise max — the same combine rule the host
  stitcher uses (eval_wsi_segmentation.py:300-316).
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..convert.espnet_import import load_espnet_variables
from ..models.espnet import ESPNet
from ..ops.preprocess import (FLAT_OFFSET_LIMIT, flat_bytes_needed,
                              pack_crops_flat, resize_bilinear_dynamic,
                              unflatten_crops)

# fold -> (BGR mean, BGR std), reference README.md:243-249
FOLD_NORMALIZATION = {
    1: ((204.60071, 170.19359, 199.57469), (20.61257, 42.92207, 28.401505)),
    2: ((202.38148, 167.13171, 198.10599), (20.704079, 42.958416, 28.366297)),
    3: ((203.12099, 167.813, 198.50894), (21.038654, 43.769535, 29.034416)),
    4: ((203.66399, 167.94217, 198.58081), (20.96783, 43.556736, 28.838718)),
    5: ((204.49896, 169.03307, 199.22058), (20.547842, 42.86628, 27.966227)),
}


@dataclasses.dataclass
class EnsembleConfig:
    checkpoints: Sequence[str]
    folds: Sequence[int] = (1, 2, 3, 4, 5)
    classes: int = 5
    p: int = 2
    q: int = 8
    in_height: int = 512
    in_width: int = 1024
    batch_size: int = 8
    compute_dtype: str = "bfloat16"
    precision: str = "default"
    # dtype of the fold-probability softmax + accumulator.  f32 by default:
    # a bf16 accumulator can flip the argmax at near-ties, so the HBM
    # saving (~250 MB/fold at B=48) is an explicit opt-in ("bfloat16").
    accum_dtype: str = "float32"
    # pack k class-map pixels per byte (base-`classes`; k=3 at 5 classes)
    # before the full-resolution readback: exact, cuts the (B, 512, 1024)
    # d2h bytes 3x.  Measured OFF by default: this tunnel moves the
    # 8.4 MB packed array at only 17-39 MB/s vs ~37 MB/s for the 25 MB
    # contiguous map (small transfers pay disproportionate fixed cost),
    # so interleaved A/B on both the raw batch and the fused labelme
    # slide path reads a statistical tie (BASELINE.md round-3 probe).
    # Opt in on links that are genuinely byte-limited.
    pack_output: bool = False


class EnsembleSegmenter:
    """vmapped 5-fold ESPNet: raw padded BGR crops -> averaged class maps.

    With a ``mesh``, crop batches shard over the 'data' axis (params
    replicated); batch_size must divide by the data-axis size.
    """

    def __init__(self, config: EnsembleConfig, mesh=None,
                 engine: str = "xla", interpret: Optional[bool] = None,
                 variables=None):
        """``variables`` optionally injects a pre-stacked (fold-leading)
        variable pytree instead of loading ``config.checkpoints`` — used by
        the driver's multi-chip dryrun where no checkpoints exist (xla
        engine only).

        ``engine="auto"`` resolves batch-adaptively from the measured
        round-3 crossover on one v5e chip (BASELINE.md "Fold-packed
        ensemble"): the packed block-diagonal engine wins below B~96
        where the small-channel segments are latency-bound; above, the
        per-fold scan with XLA's folded-BN level-3 wins and the packed
        form's F^2 block-diagonal FLOPs stop being free."""
        self.config = config
        if engine == "auto":
            engine = ("xla" if variables is not None
                      else "packed" if config.batch_size < 96
                      else "fused")
        if engine == "fold_parallel":
            # fold ("expert") parallelism: each device holds only its
            # fold slice and runs the full batch (or its data shard)
            # through it; the ordered all_gather combine is bit-identical
            # to the sequential fold loop (parallel/fold_parallel.py).
            # The only axis that cuts the ~60 ms/fold latency-bound fixed
            # cost at production batch sizes (BASELINE.md round-3 profile).
            if mesh is None or not {"fold", "data"} <= set(mesh.axis_names):
                raise ValueError(
                    "engine='fold_parallel' needs a mesh with 'fold' and "
                    "'data' axes (parallel.mesh.make_fold_mesh)")
        self.engine = engine
        if interpret is None:
            interpret = jax.devices()[0].platform == "cpu"
        trees = []
        means, stds = [], []
        for fold in config.folds:
            mean, std = FOLD_NORMALIZATION[fold]
            means.append(mean)
            stds.append(std)
        if variables is not None:
            assert engine in ("xla", "fold_parallel"), \
                "injected variables require engine='xla'/'fold_parallel'"
            # fold_parallel must NOT keep the stack in self.variables:
            # the mesh block replicates self.variables, but fold weights
            # shard over the 'fold' axis
            self.variables = variables if engine == "xla" else None
            if engine == "fold_parallel":
                _fp_stacked = variables
        else:
            for ckpt in config.checkpoints:
                trees.append(load_espnet_variables(ckpt))
            # the stacked raw fold tree feeds only the xla fold-vmap and
            # fold-parallel engines; the packed/fused engines repack
            # `trees` themselves — stacking (and, under a mesh, uploading)
            # ~7 MB of unused fold weights for them would be pure overhead
            # on this tunnel.  fold_parallel keeps the stack out of
            # self.variables: the mesh block below replicates
            # self.variables, but fold weights must shard over 'fold'.
            self.variables = (jax.tree.map(lambda *xs: jnp.stack(xs),
                                           *trees)
                              if engine == "xla" else None)
            if engine == "fold_parallel":
                _fp_stacked = jax.tree.map(lambda *xs: jnp.stack(xs),
                                           *trees)
        self.mean = jnp.asarray(means, jnp.float32)  # (F, 3) BGR
        self.std = jnp.asarray(stds, jnp.float32)
        # thread the compute dtype into the flax model (xla engine): an
        # input-only bf16 cast would promote back to f32 at the first
        # f32-param conv; the fused/packed engines cast their packed
        # weights explicitly instead
        _mdtype = jnp.dtype(config.compute_dtype)
        self.model = ESPNet(config.classes, config.p, config.q,
                            dtype=None if _mdtype == jnp.float32
                            else _mdtype)
        if engine == "packed":
            # Fold-packed ensemble: all folds ride one channel axis with
            # block-diagonal convs, paying the latency-bound small-channel
            # segment cost once instead of once per fold (BASELINE.md
            # "Round-3 device profile": ~60 ms/fold fixed cost).  Level-3
            # stays per-fold; its kernel choice is batch-adaptive like the
            # fused engine.
            from ..models.espnet_packed import PackedEnsembleESPNet

            assert variables is None, \
                "packed engine builds from checkpoints"
            # under a mesh, level3 must stay on XLA: a Pallas custom call
            # does not partition under GSPMD (same restriction as
            # engine='fused' + data_parallel)
            self._packed = PackedEnsembleESPNet(
                trees, np.asarray(means), np.asarray(stds),
                config.classes, config.p, config.q,
                level3="pallas" if (config.batch_size < 96
                                    and mesh is None) else "xla",
                interpret=interpret, compute_dtype=config.compute_dtype,
                accum_dtype=config.accum_dtype,
                precision=config.precision)
        if engine == "fused":
            # Pallas-fused forward: packs stacked along a fold axis and the
            # forward scans over folds (one kernel call site total).
            # Level-3 kernel choice is batch-adaptive (round-3 measured
            # crossover on one v5e chip: Pallas wins at B=48, XLA's
            # folded-BN path wins at B=128 — BASELINE.md).
            from ..models.espnet_fused import FusedESPNet

            fuse_l3 = config.batch_size < 96
            nets = [FusedESPNet(tree, config.classes, config.p, config.q,
                                interpret=interpret, fuse_level3=fuse_l3)
                    for tree in trees]
            self._fused_template = nets[0]
            self._fused_packs = jax.tree.map(
                lambda *xs: jnp.stack(xs),
                *[{"enc": n.enc, "dec": n.dec} for n in nets])
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            data = NamedSharding(mesh, P("data"))
            repl = NamedSharding(mesh, P())
            self._data_sharding = data
            if engine == "fold_parallel":
                from ..parallel.fold_parallel import (build_fold_parallel_fn,
                                                      pad_folds)

                vars_p, mean_p, std_p, wf = pad_folds(
                    _fp_stacked, self.mean, self.std, mesh.shape["fold"])
                fold_shard = NamedSharding(mesh, P("fold"))
                # each device holds 1/n_fold of the stacked weights; the
                # shard_map'd program is embedded un-jitted inside the
                # jitted _forward* programs below
                self._fp_weights = tuple(
                    jax.device_put(t, fold_shard)
                    for t in (vars_p, mean_p, std_p, wf))
                self._fp_fn = build_fold_parallel_fn(
                    mesh, self.model, axis_name="fold", data_axis="data",
                    compute_dtype=jnp.dtype(config.compute_dtype),
                    precision=config.precision, exact=True)
            if self.variables is not None:
                self.variables = jax.device_put(self.variables, repl)
            self.mean = jax.device_put(self.mean, repl)
            self.std = jax.device_put(self.std, repl)
            self._forward = jax.jit(
                self._forward_impl,
                in_shardings=(data, data, data),
                out_shardings=data)
            self._forward_gather = jax.jit(
                self._forward_gather_impl,
                in_shardings=(data,) * 5,
                out_shardings=data)
            self._forward_resized = jax.jit(
                self._forward_resized_impl,
                in_shardings=(data,), out_shardings=data)
            self._forward_gather_resized = jax.jit(
                self._forward_gather_resized_impl,
                in_shardings=(data,) * 3, out_shardings=data)
        else:
            self._data_sharding = None
            self._forward = jax.jit(self._forward_impl)
            self._forward_gather = jax.jit(self._forward_gather_impl)
            self._forward_resized = jax.jit(self._forward_resized_impl)
            self._forward_gather_resized = jax.jit(
                self._forward_gather_resized_impl)
        # flat (ragged) crop transfer: bytes crossing the link are exactly
        # the crop content — no per-crop padding, no batch-max coupling.
        # Single-device only: a flat buffer has no meaningful 'data'-axis
        # sharding (FusedSlideSegmenter falls back to padded under a mesh).
        self._forward_flat = jax.jit(self._forward_flat_impl,
                                     static_argnums=(4, 5))
        self._forward_gather_flat = jax.jit(self._forward_gather_flat_impl,
                                            static_argnums=(6, 7))

    def _resize_batch(self, padded: jax.Array, heights: jax.Array,
                      widths: jax.Array) -> jax.Array:
        """Per-crop cv2-exact dynamic resize to the network input size."""
        cfg = self.config

        def resize_one(img, h, w):
            return resize_bilinear_dynamic(img.astype(jnp.float32), h, w,
                                           cfg.in_height, cfg.in_width)

        return jax.vmap(resize_one)(padded, heights, widths)

    def _maybe_pack(self, maps: jax.Array) -> jax.Array:
        """Base-``classes`` pack the full-res readback (3 px/byte at 5
        classes) when ``config.pack_output`` (byte-limited-link opt-in);
        exact inverse applied in :meth:`read_maps`."""
        from ..ops.preprocess import maybe_pack

        return maybe_pack(maps, self.config.classes,
                          self.config.pack_output)

    def read_maps(self, out) -> np.ndarray:
        """Materialize a ``submit_batch*`` handle as (B, in_h, in_w) uint8
        class maps (host LUT unpack when the readback is packed)."""
        from ..ops.preprocess import read_packed

        return read_packed(out, self.config.classes, self.config.in_width,
                           self.config.pack_output)

    def _forward_impl(self, padded: jax.Array, heights: jax.Array,
                      widths: jax.Array) -> jax.Array:
        """(B, maxH, maxW, 3) uint8 BGR + valid sizes -> (B, H, W/k)
        packed uint8 (see :meth:`_maybe_pack`)."""
        return self._maybe_pack(
            self._fold_argmax(self._resize_batch(padded, heights, widths)))

    def _forward_resized_impl(self, resized: jax.Array) -> jax.Array:
        """(B, in_h, in_w, 3) float crops already at network resolution
        (host cv2 pre-resize) -> (B, in_h, in_w/k) packed uint8 argmax."""
        return self._maybe_pack(self._fold_argmax(resized))

    def _fold_argmax(self, resized: jax.Array) -> jax.Array:
        cfg = self.config
        if self.engine == "fold_parallel":
            # the fold-local fn normalizes per fold and casts to the
            # compute dtype itself; hand it the f32 resized batch.  The
            # ordered all_gather combine sums softmaxes strictly in fold
            # order — argmax-identical to the sequential fold loop.
            return self._fp_fn(*self._fp_weights,
                               resized.astype(jnp.float32))
        if self.engine == "packed":
            # packed model normalizes per fold internally and owns the
            # compute/accumulator dtype policy
            return self._packed(resized)
        # In the bf16 fast path the resized batch is re-read once per fold
        # (~500 MB/fold at B=48 in f32) — keep it bf16 there.  The softmax/
        # probability accumulator follows cfg.accum_dtype (f32 default;
        # bf16 accumulation can flip argmax at near-ties, so it is opt-in).
        fast = jnp.dtype(cfg.compute_dtype) == jnp.bfloat16
        acc_dtype = jnp.dtype(cfg.accum_dtype)
        acc_f32 = acc_dtype == jnp.float32
        if fast:
            resized = resized.astype(jnp.bfloat16)
        else:
            resized = resized.astype(jnp.float32)

        if self.engine == "fused":
            def body(acc, inputs):
                pack, mean, std = inputs
                x = ((resized - mean) / std / 255.0).astype(cfg.compute_dtype)
                with jax.default_matmul_precision(cfg.precision):
                    logits = self._fused_template.apply_packed(
                        pack["enc"], pack["dec"], x)
                probs = jax.nn.softmax(
                    logits.astype(jnp.float32) if acc_f32 else logits,
                    axis=-1)
                return acc + probs.astype(acc_dtype), None

            init = jnp.zeros(resized.shape[:3] + (cfg.classes,), acc_dtype)
            probs_sum, _ = jax.lax.scan(
                body, init, (self._fused_packs, self.mean, self.std))
            return jnp.argmax(probs_sum, axis=-1).astype(jnp.uint8)

        def fold_forward(variables, mean, std):
            x = (resized - mean) / std / 255.0
            with jax.default_matmul_precision(cfg.precision):
                logits = self.model.apply(variables,
                                          x.astype(cfg.compute_dtype))
            probs = jax.nn.softmax(
                logits.astype(jnp.float32) if acc_f32 else logits, axis=-1)
            return probs.astype(acc_dtype)

        probs = jax.vmap(fold_forward)(self.variables, self.mean, self.std)
        return jnp.argmax(probs.mean(axis=0), axis=-1).astype(jnp.uint8)

    def segment_batch_padded(self, padded: np.ndarray, heights: np.ndarray,
                             widths: np.ndarray) -> np.ndarray:
        # explicit device_put: the implicit numpy->device path (and
        # jnp.asarray) can ride a ~40 MB/s slow channel on the axon
        # tunnel vs ~1.4 GB/s for device_put (profiled round 2)
        s = self._data_sharding
        return self.read_maps(self._forward(jax.device_put(padded, s),
                                            jax.device_put(heights, s),
                                            jax.device_put(widths, s)))

    def _forward_gather_impl(self, padded: jax.Array, heights: jax.Array,
                             widths: jax.Array, ys: jax.Array,
                             xs: jax.Array) -> jax.Array:
        """Forward + per-crop nearest-index gather on device.

        The full-resolution class maps are (B, 512, 1024) uint8 — ~25 MB a
        batch, and the d2h link is the slide pipeline's bottleneck
        (measured round 2: 0.6-0.7 s vs 0.5 s for the forward itself).
        The /8 stitch only reads a nearest-downsample of each map, so the
        caller passes per-crop gather tables (computed on host in float64,
        byte-identical to :func:`..ops.preprocess.postprocess_nearest_host`)
        and only (B, oh, ow) uint8 leaves the device.

        With the packed engine the gather additionally commutes through
        the final classifier upconv (``PackedEnsembleESPNet
        .gathered_argmax``), skipping the full-res lane-padded logits
        entirely.
        """
        if self.engine == "packed":
            resized = self._resize_batch(padded, heights, widths)
            return self._packed.gathered_argmax(resized, ys, xs)
        maps = self._fold_argmax(self._resize_batch(padded, heights, widths))

        def one(m, y_idx, x_idx):
            return m[y_idx][:, x_idx]

        return jax.vmap(one)(maps, ys, xs)

    def _forward_gather_resized_impl(self, resized: jax.Array, ys: jax.Array,
                                     xs: jax.Array) -> jax.Array:
        """Pre-resized forward + the same on-device /8 stitch gather."""
        if self.engine == "packed":
            return self._packed.gathered_argmax(resized, ys, xs)
        maps = self._fold_argmax(resized)

        def one(m, y_idx, x_idx):
            return m[y_idx][:, x_idx]

        return jax.vmap(one)(maps, ys, xs)

    def _forward_flat_impl(self, flat: jax.Array, offsets: jax.Array,
                           heights: jax.Array, widths: jax.Array,
                           max_h: int, max_w: int) -> jax.Array:
        """Ragged flat crop buffer -> (B, in_h, in_w/k) packed argmax.

        ``flat`` holds each crop's raw bytes back to back
        (:func:`..ops.preprocess.pack_crops_flat`); the padded batch view
        is rebuilt on device so only the crop content crosses the (slow,
        exec-serialized on this tunnel) host->device link."""
        padded = unflatten_crops(flat, offsets, heights, widths,
                                 max_h, max_w)
        return self._forward_impl(padded, heights, widths)

    def _forward_gather_flat_impl(self, flat: jax.Array, offsets: jax.Array,
                                  heights: jax.Array, widths: jax.Array,
                                  ys: jax.Array, xs: jax.Array,
                                  max_h: int, max_w: int) -> jax.Array:
        """Flat-transfer variant of :meth:`_forward_gather_impl`."""
        padded = unflatten_crops(flat, offsets, heights, widths,
                                 max_h, max_w)
        return self._forward_gather_impl(padded, heights, widths, ys, xs)

    def submit_batch_flat(self, flat: np.ndarray, offsets: np.ndarray,
                          heights: np.ndarray, widths: np.ndarray,
                          max_h: int, max_w: int):
        """Async flat-transfer forward (full-resolution class maps)."""
        return self._forward_flat(
            jax.device_put(flat), jax.device_put(offsets),
            jax.device_put(heights), jax.device_put(widths), max_h, max_w)

    def submit_batch_gather_flat(self, flat: np.ndarray, offsets: np.ndarray,
                                 heights: np.ndarray, widths: np.ndarray,
                                 ys: np.ndarray, xs: np.ndarray,
                                 max_h: int, max_w: int):
        """Async flat-transfer forward + on-device /8 stitch gather."""
        return self._forward_gather_flat(
            jax.device_put(flat), jax.device_put(offsets),
            jax.device_put(heights), jax.device_put(widths),
            jax.device_put(ys), jax.device_put(xs), max_h, max_w)

    def segment_batch_gather(self, padded: np.ndarray, heights: np.ndarray,
                             widths: np.ndarray, ys: np.ndarray,
                             xs: np.ndarray) -> np.ndarray:
        """Padded crops -> per-crop gathered class maps (B, oh, ow).

        ``ys``/``xs`` are (B, oh)/(B, ow) int32 row/column index tables
        into the (in_height, in_width) network map; rows past a crop's
        valid extent may hold any in-range index (the caller slices)."""
        return np.asarray(self.submit_batch_gather(padded, heights, widths,
                                                   ys, xs))

    def submit_batch_gather(self, padded: np.ndarray, heights: np.ndarray,
                            widths: np.ndarray, ys: np.ndarray,
                            xs: np.ndarray):
        """Async form: transfer + dispatch, return the device array
        without reading it back.  The slide loop submits batch N+1 before
        reading batch N so the (slow post-exec) h2d overlaps compute."""
        s = self._data_sharding
        return self._forward_gather(
            jax.device_put(padded, s), jax.device_put(heights, s),
            jax.device_put(widths, s), jax.device_put(ys, s),
            jax.device_put(xs, s))

    def submit_batch_padded(self, padded: np.ndarray, heights: np.ndarray,
                            widths: np.ndarray):
        s = self._data_sharding
        return self._forward(jax.device_put(padded, s),
                             jax.device_put(heights, s),
                             jax.device_put(widths, s))

    def submit_batch_resized(self, resized: np.ndarray):
        """(B, in_h, in_w, 3) crops pre-resized on host (cv2, in the
        compute dtype) -> async (B, in_h, in_w) argmax handle.  Large
        crops never cross the host->device link at full resolution."""
        return self._forward_resized(
            jax.device_put(resized, self._data_sharding))

    def submit_batch_gather_resized(self, resized: np.ndarray,
                                    ys: np.ndarray, xs: np.ndarray):
        s = self._data_sharding
        return self._forward_gather_resized(
            jax.device_put(resized, s), jax.device_put(ys, s),
            jax.device_put(xs, s))


def paste_downsampled_max(canvas: jax.Array, class_map: jax.Array,
                          x0_ds: int, y0_ds: int) -> jax.Array:
    """Nearest /8 downsample of a class map, max-pasted into the canvas."""
    h, w = class_map.shape
    ys = jnp.arange(h // 8) * 8
    xs = jnp.arange(w // 8) * 8
    small = class_map[ys][:, xs]
    region = jax.lax.dynamic_slice(canvas, (y0_ds, x0_ds), small.shape)
    return jax.lax.dynamic_update_slice(canvas,
                                        jnp.maximum(region, small),
                                        (y0_ds, x0_ds))


class FusedSlideSegmenter:
    """Whole-slide fused path: detections CSV -> /8 prediction canvas.

    Crops are read via the native reader, bucketed to a shared padded shape
    per batch, segmented by the fold ensemble in one device program, and
    stitched into a device-resident /8 label canvas.
    """

    def __init__(self, ensemble: EnsembleSegmenter,
                 host_resize: bool = False, transfer: str = "auto"):
        """``host_resize``: cv2-resize each crop to the network input
        resolution on the host (producer thread) and ship the batch in
        the compute dtype.  Transfer becomes O(net input) instead of
        O(crop) — the staging-cost lever for large crops on a degraded
        host->device link (VERDICT r2 weak 1); numerically equivalent to
        the on-device resize (same half-pixel sampling; differences sit
        below the bf16 operand truncation of the default path).

        ``transfer``: ``"flat"`` ships each batch as one ragged byte
        buffer (crop content only — no per-crop padding, no batch-max
        coupling; the padded view is rebuilt on device, byte-identical
        results) and is the ``"auto"`` default on a single device, where
        h2d serializes with execution on this tunnel so bytes saved are
        wall time saved.  ``"padded"`` is the per-batch max-shape layout
        (required under a mesh — a flat buffer has no 'data'-axis
        sharding — and by ``host_resize``)."""
        self.ensemble = ensemble
        self.host_resize = host_resize
        if transfer == "auto":
            transfer = ("padded" if host_resize
                        or ensemble._data_sharding is not None else "flat")
        assert transfer in ("flat", "padded")
        if transfer == "flat" and (host_resize
                                   or ensemble._data_sharding is not None):
            raise ValueError(
                "transfer='flat' is single-device, full-resolution only")
        self.transfer = transfer

    def segment_slide(self, slide, detections: List[List[float]],
                      progress: bool = False, on_crop=None) -> np.ndarray:
        """``on_crop(box, class_map)`` is invoked per crop with the
        crop-resolution class map (network argmax at the padded input
        resolution, before the /8 stitch downsample) — the fused e2e path
        uses it to emit the per-crop labelme JSONs the staged pipeline
        writes."""
        import queue
        import threading

        width, height = slide.dimensions
        # the /8 canvas is tiny (couple of MB): host-side max-paste avoids a
        # shape-specialized device dispatch per crop
        canvas = np.zeros((height // 8, width // 8), np.uint8)
        bs = self.ensemble.config.batch_size
        net_h = self.ensemble.config.in_height
        net_w = self.ensemble.config.in_width
        boxes = [[int(v) for v in det[:4]] for det in detections]
        # without a full-resolution consumer, gather the /8 stitch maps on
        # device and skip the 25 MB-per-batch class-map d2h (the pipeline's
        # measured bottleneck; tables reproduce postprocess_nearest_host)
        ds8 = on_crop is None

        def nearest_idx(out_n: int, src_n: int, table_n: int) -> np.ndarray:
            idx = np.minimum(np.floor(
                np.arange(table_n) * (src_n / max(out_n, 1))).astype(np.int64),
                src_n - 1)
            return idx.astype(np.int32)

        def stage_batch(chunk):
            crops = [slide.read_region_array((x1, y1), 0,
                                             (x2 - x1, y2 - y1))[:, :, ::-1]
                     for x1, y1, x2, y2 in chunk]  # BGR
            n = len(crops)
            # bucket shapes to multiples of 256 so XLA compiles a bounded
            # number of programs across a slide's ragged crops (with
            # host_resize only the tiny /8 gather output varies; the
            # expensive forward has one fixed geometry)
            max_h = -(-max(c.shape[0] for c in crops) // 256) * 256
            max_w = -(-max(c.shape[1] for c in crops) // 256) * 256
            if self.host_resize:
                # resize to the network input on host: the batch crossing
                # the link is a fixed (bs, net_h, net_w, 3) in the compute
                # dtype, not the full-resolution crops
                import cv2

                dtype = jnp.dtype(self.ensemble.config.compute_dtype)
                padded = np.zeros((bs, net_h, net_w, 3), dtype)
                for i, c in enumerate(crops):
                    padded[i] = cv2.resize(
                        c.astype(np.float32), (net_w, net_h),
                        interpolation=cv2.INTER_LINEAR).astype(dtype)
            elif (self.transfer == "flat"
                  and flat_bytes_needed(crops, max_w) <= FLAT_OFFSET_LIMIT):
                flat, offs, hs, ws = pack_crops_flat(crops, bs,
                                                     max_w=max_w,
                                                     max_h=max_h)
                padded = (flat, offs, max_h, max_w)
            else:
                # padded layout: the transfer default under a mesh, and the
                # per-batch fallback when a flat buffer would exceed the
                # int32 device-offset range (> 2 GiB of crop bytes)
                padded = np.zeros((bs, max_h, max_w, 3), np.uint8)
                for i, c in enumerate(crops):
                    padded[i, : c.shape[0], : c.shape[1]] = c
            if not isinstance(padded, tuple):
                hs = np.zeros(bs, np.int32)
                ws = np.zeros(bs, np.int32)
                for i, c in enumerate(crops):
                    hs[i], ws[i] = c.shape[:2]
                hs[n:], ws[n:] = 1, 1
            if not ds8:
                return chunk, n, padded, hs, ws, None, None
            table_h, table_w = max_h // 8, max_w // 8
            ys = np.zeros((bs, table_h), np.int32)
            xs = np.zeros((bs, table_w), np.int32)
            for i, c in enumerate(crops):
                ys[i] = nearest_idx(c.shape[0] // 8, net_h, table_h)
                xs[i] = nearest_idx(c.shape[1] // 8, net_w, table_w)
            return chunk, n, padded, hs, ws, ys, xs

        # double-buffered staging: a producer thread reads + pads the next
        # crop batch while the device runs the current one (the staged
        # pipeline reads crops synchronously between forwards)
        q: "queue.Queue" = queue.Queue(maxsize=2)
        SENTINEL = object()

        def producer():
            # a producer failure (e.g. a slide-read IOError) must reach
            # the consumer, not silently truncate the canvas — the slide
            # would otherwise be logged complete and --resume / the serve
            # daemon would treat it as done (advisor finding, round 3)
            try:
                for start in range(0, len(boxes), bs):
                    q.put(stage_batch(boxes[start: start + bs]))
                q.put(SENTINEL)
            except BaseException as e:  # re-raised in the consumer loop
                q.put(e)

        threading.Thread(target=producer, daemon=True).start()
        start = 0

        def submit(item):
            chunk, n, padded, hs, ws, ys, xs = item
            if self.host_resize:
                if ds8:
                    out = self.ensemble.submit_batch_gather_resized(
                        padded, ys, xs)
                else:
                    out = self.ensemble.submit_batch_resized(padded)
            elif isinstance(padded, tuple):  # flat layout (per batch)
                flat, offs, max_h, max_w = padded
                if ds8:
                    out = self.ensemble.submit_batch_gather_flat(
                        flat, offs, hs, ws, ys, xs, max_h, max_w)
                else:
                    out = self.ensemble.submit_batch_flat(
                        flat, offs, hs, ws, max_h, max_w)
            elif ds8:
                out = self.ensemble.submit_batch_gather(padded, hs, ws,
                                                        ys, xs)
            else:
                out = self.ensemble.submit_batch_padded(padded, hs, ws)
            return chunk, n, out

        def drain(pending):
            nonlocal start
            chunk, n, out = pending
            # the full-res (non-ds8) readback may arrive base-`classes`
            # packed (pack_output opt-in); the gather path's small
            # (B, oh, ow) maps never pack
            maps = (np.asarray(out) if ds8
                    else self.ensemble.read_maps(out))
            for (x1, y1, x2, y2), net_map in zip(chunk, maps[:n]):
                from ..ops.preprocess import postprocess_nearest_host

                if on_crop is not None:
                    full = postprocess_nearest_host(net_map, y2 - y1,
                                                    x2 - x1)
                    on_crop((x1, y1, x2, y2), full)
                ch, cw = (y2 - y1) // 8, (x2 - x1) // 8
                if ds8:
                    small = net_map  # already /8-gathered on device
                else:
                    small = postprocess_nearest_host(net_map, ch, cw)
                y0, x0 = y1 // 8, x1 // 8
                # the detect scan's ceil grid pads windows past the slide
                # edge (detect_glomus_test.py:286-304 semantics), so merged
                # boxes can overhang — or sit entirely beyond — the canvas;
                # paste only the intersection (an origin past the edge must
                # not turn the clamp negative: (0,W) dst vs (h,W) src)
                ch = max(0, min(ch, canvas.shape[0] - y0))
                cw = max(0, min(cw, canvas.shape[1] - x0))
                if ch == 0 or cw == 0:
                    continue
                region = canvas[y0: y0 + ch, x0: x0 + cw]
                np.maximum(region, small[:ch, :cw], out=region)
            start += n
            if progress:
                print(f"{start}/{len(boxes)} crops")

        # one-deep pipeline: batch N+1's h2d + dispatch are issued before
        # batch N's results are read, overlapping the transfer (slow in
        # the post-exec tunnel state, CLAUDE.md) with device compute
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
