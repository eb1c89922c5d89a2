"""ROI feature cropping (TF ``crop_and_resize`` semantics).

The OD API's second stage crops each proposal from the backbone feature map
with ``tf.image.crop_and_resize`` — bilinear sampling on a ``crop x crop``
grid whose corner samples sit exactly on the (normalized) box corners
(endpoint-aligned).  Expressed as two dense one-axis gathers + matmuls so
XLA maps it onto the MXU rather than scatter/gather scalar code.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnums=(2, 3))
def crop_and_resize(features: jax.Array, boxes: jax.Array, crop_size: int,
                    box_chunk: int = 64):
    """Crop normalized boxes from a feature map.

    Args:
      features: (H, W, C)
      boxes: (N, 4) normalized [ymin, xmin, ymax, xmax]
      crop_size: output spatial size S
      box_chunk: boxes processed per step.  A flat vmap materializes the
        per-box (S, W, C) row gather for every box at once — 3.7 MB/box at
        the detector's stride-16 shape, 17.6 GB for a 16-image window
        batch (fails HBM allocation at compile).  ``lax.map`` over chunks
        bounds the live intermediate to chunk * 3.7 MB while keeping each
        step wide enough for the VPU.
    Returns (N, S, S, C).
    """
    h, w, _ = features.shape
    s = crop_size
    n = boxes.shape[0]

    def one(box):
        y1, x1, y2, x2 = box
        # endpoint-aligned sample positions (TF crop_and_resize)
        ys = y1 * (h - 1) + (jnp.arange(s) / (s - 1)) * (y2 - y1) * (h - 1)
        xs = x1 * (w - 1) + (jnp.arange(s) / (s - 1)) * (x2 - x1) * (w - 1)
        ys = jnp.clip(ys, 0.0, h - 1)
        xs = jnp.clip(xs, 0.0, w - 1)
        y0 = jnp.floor(ys).astype(jnp.int32)
        x0 = jnp.floor(xs).astype(jnp.int32)
        y1i = jnp.minimum(y0 + 1, h - 1)
        x1i = jnp.minimum(x0 + 1, w - 1)
        wy = (ys - y0)[:, None, None]
        wx = (xs - x0)[None, :, None]
        top = features[y0]        # (S, W, C)
        bot = features[y1i]
        rows = top * (1 - wy) + bot * wy
        left = rows[:, x0]        # (S, S, C)
        right = rows[:, x1i]
        return left * (1 - wx) + right * wx

    if n <= box_chunk:
        return jax.vmap(one)(boxes)
    pad = (-n) % box_chunk
    padded = jnp.concatenate([boxes, jnp.zeros((pad, 4), boxes.dtype)])
    chunks = padded.reshape(-1, box_chunk, 4)
    out = jax.lax.map(jax.vmap(one), chunks)
    return out.reshape((-1,) + out.shape[2:])[:n]


def _two_tap_matrix(q: jax.Array, size: int) -> jax.Array:
    """Sample positions (S,) -> (S, size) bilinear two-tap weight rows.

    Row s holds ``1-frac`` at ``floor(q_s)`` and ``frac`` at
    ``floor(q_s)+1`` — so ``M @ values`` computes the same clamped lerp
    as the gather formulation, but on the MXU.
    """
    q = jnp.clip(q, 0.0, size - 1.0)
    lo = jnp.floor(q).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, size - 1)
    frac = q - lo
    grid = jnp.arange(size)
    return ((grid[None, :] == lo[:, None]) * (1 - frac)[:, None]
            + (grid[None, :] == hi[:, None]) * frac[:, None])


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def crop_and_resize_matmul(features: jax.Array, boxes: jax.Array,
                           crop_size: int, box_chunk: int = 100,
                           precision: str = "highest"):
    """TF ``crop_and_resize`` semantics expressed as two MXU matmuls.

    Same interface/semantics as :func:`crop_and_resize`.  TPU gathers over
    the feature map run far below HBM bandwidth (profiled round 2: the
    gather formulation was ~8x off peak and half the detector's device
    time); building per-box two-tap interpolation matrices and contracting
    ``(K*S, H) @ (H, W*C)`` then ``(K, S, W) x (K, T, W)`` keeps the crop
    on the systolic array — measured 2.4x faster at the detector's
    stride-16 shape (B=4, P=300, 64x64x1024).  The two contractions carry
    an explicit ``precision`` (default 'highest' = exact vs the gather
    path) so frozen-graph parity does not depend on the process-global
    ``jax_default_matmul_precision`` flag.
    """
    h, w, c = features.shape
    s = crop_size
    prec = jax.lax.Precision(precision) if precision != "default" else None

    def one_chunk(bc):
        y1, x1, y2, x2 = bc[:, 0], bc[:, 1], bc[:, 2], bc[:, 3]
        t = jnp.arange(s) / (s - 1)
        ys = (y1[:, None] * (h - 1)
              + t[None, :] * ((y2 - y1) * (h - 1))[:, None])
        xs = (x1[:, None] * (w - 1)
              + t[None, :] * ((x2 - x1) * (w - 1))[:, None])
        wy = jax.vmap(lambda q: _two_tap_matrix(q, h))(ys)  # (K, S, H)
        wx = jax.vmap(lambda q: _two_tap_matrix(q, w))(xs)  # (K, S, W)
        k = bc.shape[0]
        rows = jnp.matmul(wy.reshape(k * s, h).astype(features.dtype),
                          features.reshape(h, w * c),
                          precision=prec).reshape(k, s, w, c)
        return jnp.einsum("ktw,kswc->kstc", wx.astype(features.dtype), rows,
                          precision=prec)

    n = boxes.shape[0]
    if n <= box_chunk:
        return one_chunk(boxes)
    outs = [one_chunk(boxes[i: i + box_chunk])
            for i in range(0, n, box_chunk)]
    return jnp.concatenate(outs, axis=0)


def roi_align_maxpool(features: jax.Array, boxes: jax.Array,
                      crop_size: int = 14) -> jax.Array:
    """OD API initial-crop + 2x2 maxpool stride 2 (e.g. 14 -> 7)."""
    crops = crop_and_resize(features, boxes, crop_size)
    n, s, _, c = crops.shape
    pooled = crops.reshape(n, s // 2, 2, s // 2, 2, c).max(axis=(2, 4))
    return pooled
