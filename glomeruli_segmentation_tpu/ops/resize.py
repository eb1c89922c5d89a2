"""Image resizing with OpenCV-compatible semantics, as jittable JAX ops.

The reference preprocess/postprocess uses ``cv2.resize`` with INTER_LINEAR
(input resize, ``module/espnet/test/VisualizeResults_iou.py:113-114``) and
INTER_NEAREST (class-map resize back to crop size, ``:128-129``).  Pixel
parity with the reference therefore requires OpenCV's exact coordinate
mapping, which differs from ``jax.image.resize``:

- INTER_LINEAR maps ``src = (dst + 0.5) * scale - 0.5`` with edge clamping
  (half-pixel centers) — same as jax's "linear" for upsampling but OpenCV
  clamps negative source coordinates to 0 exactly.
- INTER_NEAREST maps ``src = floor(dst * scale)`` — *no* half-pixel shift
  (OpenCV legacy nearest, not INTER_NEAREST_EXACT).

Both are implemented as gathers with static output shape, so they fuse under
jit and run on TPU without host round-trips.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _linear_weights(src_size: int, dst_size: int):
    scale = src_size / dst_size
    x = (np.arange(dst_size, dtype=np.float64) + 0.5) * scale - 0.5
    x = np.clip(x, 0.0, src_size - 1.0)
    lo = np.floor(x).astype(np.int32)
    hi = np.minimum(lo + 1, src_size - 1)
    w = (x - lo).astype(np.float32)
    return lo, hi, w


@functools.partial(jax.jit, static_argnums=(1, 2))
def resize_bilinear(img: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """cv2.resize(..., interpolation=INTER_LINEAR) for float images.

    ``img`` is HWC or HW; output size is static.
    """
    h, w = img.shape[:2]
    ylo, yhi, wy = _linear_weights(h, out_h)
    xlo, xhi, wx = _linear_weights(w, out_w)
    ylo, yhi = jnp.asarray(ylo), jnp.asarray(yhi)
    xlo, xhi = jnp.asarray(xlo), jnp.asarray(xhi)
    wy = jnp.asarray(wy)
    wx = jnp.asarray(wx)
    if img.ndim == 3:
        wy = wy[:, None, None]
        wx = wx[None, :, None]
    else:
        wy = wy[:, None]
        wx = wx[None, :]

    top = jnp.take(img, ylo, axis=0)
    bot = jnp.take(img, yhi, axis=0)
    rows = top * (1.0 - wy) + bot * wy
    left = jnp.take(rows, xlo, axis=1)
    right = jnp.take(rows, xhi, axis=1)
    return left * (1.0 - wx) + right * wx


def resize_bilinear_np(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Host (numpy) twin of :func:`resize_bilinear` — same half-pixel
    sampling, same f32 blend expression (rows then columns), so results
    match the jitted op bit-for-bit on elementwise-IEEE backends.  Used
    where output shapes vary per call (per-crop logit upsampling in the
    fused SegFormer slide path) and a shape-specialized device program
    per crop would be wasteful."""
    img = np.asarray(img, np.float32)
    ylo, yhi, wy = _linear_weights(img.shape[0], out_h)
    xlo, xhi, wx = _linear_weights(img.shape[1], out_w)
    if img.ndim == 3:
        wy = wy[:, None, None]
        wx = wx[None, :, None]
    else:
        wy = wy[:, None]
        wx = wx[None, :]
    rows = img[ylo] * (np.float32(1.0) - wy) + img[yhi] * wy
    return rows[:, xlo] * (np.float32(1.0) - wx) + rows[:, xhi] * wx


def _tf1_linear_weights(src_size: int, dst_size: int):
    """TF1 ``resize_bilinear`` (align_corners=False) samples at
    ``src = dst * (src/dst)`` — scale*i, NO half-pixel shift.  This is the
    sampling the frozen graph's internal ``keep_aspect_ratio_resizer``
    applies before the backbone (OD-API image_resizer with TF-1.12
    semantics; the graph the reference downloads per
    example/README.md:20-24 and runs at detect_glomus_test.py:349-352)."""
    scale = src_size / dst_size
    x = np.arange(dst_size, dtype=np.float64) * scale
    x = np.clip(x, 0.0, src_size - 1.0)
    lo = np.floor(x).astype(np.int32)
    hi = np.minimum(lo + 1, src_size - 1)
    w = (x - lo).astype(np.float32)
    return lo, hi, w


@functools.partial(jax.jit, static_argnums=(1, 2))
def resize_bilinear_tf1(img: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """TF1 ``tf.image.resize_bilinear`` (align_corners=False), jittable.

    Same gather structure as :func:`resize_bilinear` but with scale*i
    sampling; ``compat_tf1_resize`` in the OD-API backend selects this to
    reproduce the frozen graph's resizer bit-for-bit (modulo float order).
    """
    h, w = img.shape[:2]
    ylo, yhi, wy = _tf1_linear_weights(h, out_h)
    xlo, xhi, wx = _tf1_linear_weights(w, out_w)
    ylo, yhi = jnp.asarray(ylo), jnp.asarray(yhi)
    xlo, xhi = jnp.asarray(xlo), jnp.asarray(xhi)
    wy = jnp.asarray(wy)
    wx = jnp.asarray(wx)
    if img.ndim == 3:
        wy = wy[:, None, None]
        wx = wx[None, :, None]
    else:
        wy = wy[:, None]
        wx = wx[None, :]
    top = jnp.take(img, ylo, axis=0)
    bot = jnp.take(img, yhi, axis=0)
    rows = top * (1.0 - wy) + bot * wy
    left = jnp.take(rows, xlo, axis=1)
    right = jnp.take(rows, xhi, axis=1)
    return left * (1.0 - wx) + right * wx


def resize_bilinear_tf1_np(img: np.ndarray, out_h: int,
                           out_w: int) -> np.ndarray:
    """Host (numpy) twin of :func:`resize_bilinear_tf1` for the backend's
    host-resize path (cv2 cannot express scale*i sampling)."""
    img = np.asarray(img, np.float32)
    ylo, yhi, wy = _tf1_linear_weights(img.shape[0], out_h)
    xlo, xhi, wx = _tf1_linear_weights(img.shape[1], out_w)
    if img.ndim == 3:
        wy = wy[:, None, None]
        wx = wx[None, :, None]
    else:
        wy = wy[:, None]
        wx = wx[None, :]
    rows = img[ylo] * (1.0 - wy) + img[yhi] * wy
    return rows[:, xlo] * (1.0 - wx) + rows[:, xhi] * wx


@functools.partial(jax.jit, static_argnums=(1, 2))
def resize_nearest(img: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """cv2.resize(..., interpolation=INTER_NEAREST): ``src = floor(dst*scale)``."""
    h, w = img.shape[:2]
    ys = np.minimum(np.floor(np.arange(out_h) * (h / out_h)).astype(np.int32), h - 1)
    xs = np.minimum(np.floor(np.arange(out_w) * (w / out_w)).astype(np.int32), w - 1)
    out = jnp.take(img, jnp.asarray(ys), axis=0)
    return jnp.take(out, jnp.asarray(xs), axis=1)
