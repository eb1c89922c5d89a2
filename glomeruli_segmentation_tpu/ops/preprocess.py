"""Crop preprocessing for ESPNet inference.

The reference order matters for pixel parity
(``module/espnet/test/VisualizeResults_iou.py:103-119``):

1. ``cv2.imread`` -> BGR uint8 HWC
2. subtract per-channel mean (0..255 domain, BGR order)
3. divide per-channel std
4. ``cv2.resize`` to (inWidth, inHeight) = (1024, 512), INTER_LINEAR
5. divide by 255
6. HWC -> CHW (the reference comment says "convert to RGB" but no channel
   swap happens — the network consumes BGR)

Two implementations:

- :func:`preprocess_host` — bit-faithful host path using cv2 (parity mode).
- :func:`preprocess_batch_device` — fused device path.  Because bilinear
  resampling is affine in pixel values, ``resize((x-m)/s)/255`` equals
  ``(resize(x)-m)/s/255`` exactly up to fp rounding, so the device path
  resizes raw pixels first (one gather kernel over the padded batch, sizes
  passed dynamically) and then normalizes — no per-crop recompilation and
  no host arithmetic.  Equivalence is covered by tests.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def preprocess_host(img_bgr: np.ndarray, mean, std, width: int = 1024,
                    height: int = 512) -> np.ndarray:
    """Reference-exact preprocessing. Returns (H, W, 3) float32 (NHWC order)."""
    import cv2

    img = img_bgr.astype(np.float32)
    for j in range(3):
        img[:, :, j] -= mean[j]
    for j in range(3):
        img[:, :, j] /= std[j]
    img = cv2.resize(img, (width, height))
    img /= 255.0
    return img


def _dynamic_linear_gather(img, src_size: jax.Array, out_size: int, axis: int):
    """Bilinear gather along one axis with dynamic source extent.

    ``img`` is padded along ``axis``; only the first ``src_size`` entries are
    valid.  OpenCV coordinate mapping: src = (dst + 0.5) * scale - 0.5.
    """
    scale = src_size.astype(jnp.float32) / out_size
    x = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
    x = jnp.clip(x, 0.0, src_size.astype(jnp.float32) - 1.0)
    lo = jnp.floor(x).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, src_size - 1)
    w = (x - lo).astype(img.dtype)
    shape = [1] * img.ndim
    shape[axis] = out_size
    w = w.reshape(shape)
    a = jnp.take(img, lo, axis=axis)
    b = jnp.take(img, hi, axis=axis)
    return a * (1 - w) + b * w


def resize_bilinear_dynamic(img: jax.Array, src_h: jax.Array, src_w: jax.Array,
                            out_h: int, out_w: int) -> jax.Array:
    """cv2 INTER_LINEAR resize of a padded image with dynamic valid extent."""
    img = _dynamic_linear_gather(img, src_h, out_h, axis=0)
    return _dynamic_linear_gather(img, src_w, out_w, axis=1)


@functools.partial(jax.jit, static_argnums=(4, 5))
def preprocess_batch_device(padded: jax.Array, heights: jax.Array,
                            widths: jax.Array, mean_std: jax.Array,
                            out_h: int = 512, out_w: int = 1024) -> jax.Array:
    """Fused resize+normalize for a batch of padded BGR uint8 crops.

    Args:
      padded:   (B, maxH, maxW, 3) uint8, valid region top-left anchored
      heights:  (B,) int32 valid heights
      widths:   (B,) int32 valid widths
      mean_std: (2, 3) float32 — rows are BGR mean and std
    Returns (B, out_h, out_w, 3) float32 network input.
    """
    def one(img, h, w):
        resized = resize_bilinear_dynamic(img.astype(jnp.float32), h, w,
                                          out_h, out_w)
        return (resized - mean_std[0]) / mean_std[1] / 255.0

    return jax.vmap(one)(padded, heights, widths)


def unflatten_crops(flat: jax.Array, offsets: jax.Array, heights: jax.Array,
                    widths: jax.Array, max_h: int, max_w: int) -> jax.Array:
    """Reconstruct a padded crop batch from a ragged flat byte buffer.

    Host->device transfer of padded crop batches wastes bytes two ways:
    per-crop padding to the batch max shape, and the batch max itself
    (one large crop forces every crop's pad).  The flat layout ships each
    crop's raw ``h*w*3`` bytes back to back — transfer is exactly the crop
    content — and this kernel rebuilds the padded (B, max_h, max_w, 3)
    view on device as row-contiguous DMA gathers (one ``dynamic_slice``
    per output row, vmapped), which XLA lowers to bulk copies rather than
    element gathers.

    Rows past a crop's valid height repeat its last row, and bytes past a
    row's valid width alias the next row's data — both regions are never
    read downstream (:func:`resize_bilinear_dynamic` clips its sample
    indices to the valid extent).  The caller must leave ``max_w * 3``
    slack bytes at the end of ``flat`` so no valid row's slice is clamped.
    """
    length = flat.shape[0]
    maxw3 = max_w * 3

    def one(off, h, w):
        row = jnp.minimum(jnp.arange(max_h, dtype=jnp.int32), h - 1)
        starts = off + row * (w * 3)
        rows = jax.vmap(
            lambda s: jax.lax.dynamic_slice(flat, (s,), (maxw3,)))(starts)
        return rows.reshape(max_h, max_w, 3)

    del length  # bounds are the caller's slack contract (docstring)
    return jax.vmap(one)(offsets, heights, widths)


# Device-side crop offsets are int32 (x64 is disabled under jit): a flat
# buffer may address at most 2^31-1 bytes.  Callers staging bigger batches
# must use the padded layout (FusedSlideSegmenter falls back per batch).
FLAT_OFFSET_LIMIT = 2**31 - 1


def flat_bytes_needed(crops, max_w: int = 0) -> int:
    """Bytes a flat transfer of ``crops`` addresses (content + row slack)."""
    pos = sum(c.shape[0] * c.shape[1] * 3 for c in crops)
    slack = max(max(int(c.shape[1]) for c in crops), max_w) * 3
    return pos + slack


def flat_quantum(batch_size: int, max_h: int, max_w: int,
                 bucket_bytes: int = 1 << 21) -> int:
    """Flat-buffer length quantum: one eighth of the padded batch bytes.

    The single source of truth for :func:`pack_crops_flat`'s buffer
    quantization AND for ``gseg-warmup``'s pre-compile of the same buffer
    lengths — every distinct length is a distinct (remote-AOT, minutes)
    compiled program, so the two must never disagree."""
    if max_h and max_w:
        return max(1, batch_size * max_h * max_w * 3 // 8)
    return bucket_bytes


def pack_crops_flat(crops, batch_size: int, max_w: int = 0, max_h: int = 0,
                    bucket_bytes: int = 1 << 21):
    """Pack ragged HWC uint8 crops into one flat transfer buffer.

    Returns ``(flat, offsets, heights, widths)`` where ``flat`` is a 1-D
    uint8 array holding each crop's bytes back to back, length rounded up
    to a shape bucket: every distinct buffer length is a distinct compiled
    program (minutes each through this host's remote-AOT service), so the
    bucket ties the program count to the padded layout's already-quantized
    shape axes.  When ``max_h`` is given, the quantum is one eighth of the
    padded batch's byte size (``batch_size * max_h * max_w * 3 / 8``) — at
    most ~9 flat programs per padded shape, average over-transfer ~6% of
    the padded bytes.  Without ``max_h`` the quantum is ``bucket_bytes``
    (tight buffers for direct/test callers).

    ``max_w`` must be at least the padded width :func:`unflatten_crops`
    will be called with (its ``max_w * 3``-byte row slices must never
    reach past the buffer end, or XLA's dynamic-slice clamping would
    shift — and corrupt — the last crop's tail rows).  Empty batch slots
    get offset 0 and size 1x1.
    """
    n = len(crops)
    offsets = np.zeros(batch_size, np.int64)
    heights = np.ones(batch_size, np.int32)
    widths = np.ones(batch_size, np.int32)
    pos = 0
    for i, c in enumerate(crops):
        offsets[i] = pos
        heights[i], widths[i] = c.shape[:2]
        pos += c.shape[0] * c.shape[1] * 3
    slack = max(int(widths.max()), max_w) * 3
    if pos + slack > FLAT_OFFSET_LIMIT:
        raise ValueError(
            f"flat crop buffer needs {pos + slack} bytes, over the int32 "
            "device-offset limit; stage this batch in the padded layout")
    quantum = flat_quantum(batch_size, max_h, max_w, bucket_bytes)
    total = -(-(pos + slack) // quantum) * quantum
    total = min(total, FLAT_OFFSET_LIMIT)  # quantum rounding stays in range
    flat = np.zeros(total, np.uint8)
    for i, c in enumerate(crops[:n]):
        flat[offsets[i]: offsets[i] + c.size] = c.reshape(-1)
    return flat, offsets.astype(np.int32), heights, widths


def classmap_pack_width(classes: int) -> int:
    """Pixels per byte for base-``classes`` class-map packing.

    The fused pipeline's full-resolution readback is (B, 512, 1024) uint8
    argmax maps whose values are < ``classes`` — at 5 classes each byte
    carries 2.3 bits of information across a d2h link that is the
    measured pipeline bottleneck (~36 MB/s post-exec on this tunnel,
    BASELINE.md).  Packing ``k`` pixels per byte in base ``classes``
    (k=3 for 5 classes: 5^3=125 <= 256) is exact and cuts the readback
    3x.  Returns 1 (no packing) for classes > 16.
    """
    if classes < 2:  # degenerate map; 1**k/0**k never exceed 256
        return 1
    k = 1
    while classes ** (k + 1) <= 256:
        k += 1
    return k


def pack_classmap(maps: jax.Array, classes: int) -> jax.Array:
    """(B, H, W) uint8 class map -> (B, H, ceil(W/k)) base-``classes``
    packed bytes (device side; exact inverse :func:`unpack_classmap`).

    Digit layout is CHUNKED, not interleaved: with chunk = ceil(W/k),
    output byte ``j`` holds pixels ``(j, j+chunk, j+2*chunk, ...)`` as
    base-``classes`` digits 0..k-1.  Adjacent-pixel packing would need a
    (..., chunk, k) view whose minor dimension is k — a catastrophic TPU
    layout (k of 128 lanes used; measured +0.39 s of pure relayout on a
    (48, 512, 1024) map).  The chunked form is k contiguous lane-aligned
    slices, a multiply and adds; padding pixels land in the tail of the
    last digit, so the unpacked tail slice drops them.
    """
    k = classmap_pack_width(classes)
    if k == 1:
        return maps
    w = maps.shape[-1]
    chunk = -(-w // k)
    m = jnp.pad(maps, ((0, 0),) * (maps.ndim - 1)
                + ((0, chunk * k - w),)).astype(jnp.uint8)
    packed = m[..., :chunk]
    for i in range(1, k):
        packed = packed + m[..., i * chunk: (i + 1) * chunk] * (classes ** i)
    return packed


def unpack_classmap(packed: np.ndarray, classes: int, w: int) -> np.ndarray:
    """Host inverse of :func:`pack_classmap`: digit ``i`` of each byte is
    pixels ``[i*chunk, (i+1)*chunk)``, recovered with one 256-entry LUT
    gather per digit into a contiguous slab (no per-pixel transpose)."""
    k = classmap_pack_width(classes)
    if k == 1:
        return packed[..., :w]
    chunk = packed.shape[-1]
    vals = np.arange(256)
    out = np.empty(packed.shape[:-1] + (chunk * k,), np.uint8)
    for i in range(k):
        lut = (vals // classes ** i % classes).astype(np.uint8)
        out[..., i * chunk: (i + 1) * chunk] = lut[packed]
    return out[..., :w]


def maybe_pack(maps: jax.Array, classes: int, enabled: bool) -> jax.Array:
    """:func:`pack_classmap` gated on a config flag (device side) — the
    single enable/classes contract shared by ``EnsembleSegmenter`` and
    ``EspnetSegmenter``."""
    return pack_classmap(maps, classes) if enabled else maps


def read_packed(out, classes: int, w: int, enabled: bool) -> np.ndarray:
    """Materialize a (possibly packed) device class-map handle as
    (..., H, ``w``) uint8 on host — the inverse of :func:`maybe_pack`
    under the same flag."""
    maps = np.asarray(out)
    return unpack_classmap(maps, classes, w) if enabled else maps


def postprocess_nearest_host(class_map: np.ndarray, out_h: int,
                             out_w: int) -> np.ndarray:
    """cv2 INTER_NEAREST resize of the argmax map back to crop size (host)."""
    h, w = class_map.shape
    ys = np.minimum(np.floor(np.arange(out_h) * (h / out_h)).astype(np.intp), h - 1)
    xs = np.minimum(np.floor(np.arange(out_w) * (w / out_w)).astype(np.intp), w - 1)
    return class_map[np.ix_(ys, xs)]
