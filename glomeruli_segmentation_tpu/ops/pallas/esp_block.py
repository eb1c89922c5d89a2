"""Fused ESP residual block as one Pallas TPU kernel (inference).

The ESP block (``DilatedParllelResidualBlockB``, reference Model.py:162-214)
is ESPNet's hot op: a 1x1 reduce, five parallel dilated 3x3 convs, a
hierarchical-add fusion, concat, residual add, BN and PReLU.  XLA executes
it as ~8 separate HBM-level ops; profiling on one v5e chip shows the eight
level-3 blocks cost ~116 ms of a 165 ms batch-64 forward at ~1% MXU
utilization — the block is pure HBM bandwidth.

This kernel runs the whole block for one image entirely in VMEM
(64x128x128 activations are ~2 MB):

- the 1x1 reduce is one (H*W, C) x (C, n) matmul;
- each dilated 3x3 conv is nine shifted (H*W, n) x (n, n_d) matmuls over a
  zero-padded halo scratch (max dilation 16 -> halo 16), accumulated in
  f32;
- the hierarchical adds, channel concat, residual add, folded-BN affine
  and PReLU all happen before the single output write.

BN is folded to scale/bias on the host (inference only; training uses the
reference flax path).  Grid: one program per image.

Mosaic constraint (measured on v5e): per-program spatial extent H*W must
stay <= 8192 — larger extents (level-2's 128x256, or 64x256 / 128x128)
push the (H, W, n) -> (H*W, n) relayout past a compile-time wall (>>9 min
remote AOT), independent of channel count or tap packing.  Level-3
(64x128) sits exactly at the wall and compiles in ~40 s.

``w_tile`` works around the wall by tiling the width axis with private
16-px halo strips recomputed per tile (the 1x1 reduce is cheap), so every
relayout stays at the proven level-3 extent.  Measured verdict at the
level-2 shape (full net, batch 128, one v5e chip): the W-tiled kernel
*does* compile (~30 min AOT, vs never before) but runs the full forward
at 183 ms/batch vs 140 ms with level-2 on XLA — the 4-tile unroll plus
halo recompute costs more than the fusion saves at n=12 channels.  So
``fuse_level2`` stays False by default and level-2 runs the XLA path
(models/espnet_fused.py); the tiling machinery is kept for the level-3
shape family and covered by interpret-mode parity tests.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DILATIONS = (1, 2, 4, 8, 16)
HALO = 16  # max dilation


def _esp_kernel(x_ref, w1_ref, wd_ref, scale_ref, bias_ref, alpha_ref,
                out_ref, rpad_ref, *, height: int, width: int, c: int,
                n: int, n1: int, add_residual: bool,
                pack_taps: bool = True, w_tile: int = 0):
    """One image per grid step. Shapes:
    x (1, H, W, C) block; w1 (C, n); wd (5*9, n, n_pad) stacked taps with
    the d1 branch's extra columns (n1 > n) carried in the padding;
    scale/bias/alpha (1, C); out (1, H, W, C); rpad scratch
    (H + 2*HALO, W + 2*HALO, n).

    ``w_tile`` statically tiles the width axis so every (H, Wt, n) ->
    (H*Wt, n) relayout stays under Mosaic's ~8192 spatial-extent compile
    wall (the level-2 fix).  Each tile uses the scratch as a PRIVATE
    (H+2*HALO, Wt+2*HALO, n) halo buffer whose slice patterns exactly
    match the proven level-3 compile shape; the reduce recomputes the
    16-column halo strips per tile (cheap: the 1x1 reduce is ~2% of the
    block's FLOPs).
    """
    w_tile = w_tile or width
    n_tiles = width // w_tile
    x = x_ref[0]
    hw = height * w_tile

    def reduce_cols(c0: int, cols: int):
        """1x1-reduce columns [c0, c0+cols) of the image on the MXU."""
        xs = x[:, c0: c0 + cols, :]
        r = jnp.dot(xs.reshape(height * cols, c), w1_ref[:],
                    preferred_element_type=jnp.float32)
        return r.reshape(height, cols, n).astype(rpad_ref.dtype)

    def stage_tile(t: int):
        """Fill the private scratch with the tile's center + halo strips."""
        rpad_ref[:] = jnp.zeros_like(rpad_ref)
        c0 = t * w_tile
        rpad_ref[HALO: HALO + height, HALO: HALO + w_tile, :] = \
            reduce_cols(c0, w_tile)
        if t > 0:  # left halo strip
            rpad_ref[HALO: HALO + height, 0: HALO, :] = \
                reduce_cols(c0 - HALO, HALO)
        if t < n_tiles - 1:  # right halo strip
            rpad_ref[HALO: HALO + height,
                     HALO + w_tile: 2 * HALO + w_tile, :] = \
                reduce_cols(c0 + w_tile, HALO)

    def branch(col0: int, d_index: int, dilation: int, width_out: int):
        if pack_taps:
            # pack the 9 taps into one (hw, 9n) x (9n, n_pad) MXU matmul —
            # 9x wider contraction keeps the 128-lane systolic array busy
            windows = []
            for dy in (-dilation, 0, dilation):
                for dx in (-dilation, 0, dilation):
                    windows.append(
                        rpad_ref[HALO + dy: HALO + dy + height,
                                 col0 + dx: col0 + dx + w_tile, :]
                        .reshape(hw, n))
            packed = jnp.concatenate(windows, axis=1)
            acc = jnp.dot(packed, wd_ref[d_index],
                          preferred_element_type=jnp.float32)
            return acc[:, :width_out]
        # tap-by-tap accumulation (compiles faster in Mosaic for some shapes)
        acc = None
        tap = 0
        for dy in (-dilation, 0, dilation):
            for dx in (-dilation, 0, dilation):
                window = rpad_ref[HALO + dy: HALO + dy + height,
                                  col0 + dx: col0 + dx + w_tile, :]
                part = jnp.dot(window.reshape(hw, n),
                               wd_ref[d_index, tap * n: (tap + 1) * n],
                               preferred_element_type=jnp.float32)
                acc = part if acc is None else acc + part
                tap += 1
        return acc[:, :width_out]

    for t in range(n_tiles):
        stage_tile(t)
        d1 = branch(HALO, 0, 1, n1)
        add1 = branch(HALO, 1, 2, n)
        add2 = add1 + branch(HALO, 2, 4, n)
        add3 = add2 + branch(HALO, 3, 8, n)
        add4 = add3 + branch(HALO, 4, 16, n)
        combine = jnp.concatenate([d1, add1, add2, add3, add4], axis=1)
        if add_residual:
            xt = x[:, t * w_tile: (t + 1) * w_tile, :]
            combine = combine + xt.reshape(hw, c).astype(jnp.float32)
        y = combine * scale_ref[0] + bias_ref[0]
        alpha = alpha_ref[0]
        y = jnp.maximum(y, 0) + alpha * jnp.minimum(y, 0)
        out_ref[0, :, t * w_tile: (t + 1) * w_tile, :] = (
            y.reshape(height, w_tile, c).astype(out_ref.dtype))


def fold_bn(scale, bias, mean, var, eps: float = 1e-3):
    """BatchNorm -> affine (y = x*s + b)."""
    s = scale / np.sqrt(var + eps)
    return s, bias - mean * s


@functools.partial(jax.jit,
                   static_argnames=("add_residual", "interpret",
                                    "pack_taps"))
def esp_block_fused(x: jax.Array, w1: jax.Array, wd: jax.Array,
                    scale: jax.Array, bias: jax.Array, alpha: jax.Array,
                    add_residual: bool = True,
                    interpret: bool = False,
                    pack_taps: bool = True) -> jax.Array:
    """Apply the fused ESP block to a batch.

    Args:
      x:     (B, H, W, C)
      w1:    (C, n) 1x1 reduce weights
      wd:    (5, 9*n, n_pad) — per dilation branch, the 9 taps stacked
             along the contraction axis; output channels padded to
             ``n_pad`` (= n1, the d1 branch width)
      scale, bias: (C,) folded BN affine
      alpha: (C,) PReLU slopes
    """
    b, h, w, c = x.shape
    n = w1.shape[1]
    n_pad = wd.shape[2]
    n1 = c - 4 * n

    # keep each relayout's spatial extent under the Mosaic compile wall
    # (esp_block.py module docstring): halve the internal width tile until
    # H * Wt <= 8192
    w_tile = w
    while h * w_tile > 8192 and w_tile % 2 == 0:
        w_tile //= 2

    kernel = functools.partial(
        _esp_kernel, height=h, width=w, c=c, n=n, n1=n1,
        add_residual=add_residual, pack_taps=pack_taps, w_tile=w_tile)

    # grid over the batch: one image's activations resident in VMEM per
    # program (vmap would instead stage the whole batch into VMEM)
    def img_spec():
        return pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def const_spec(shape):
        ndim = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * ndim,
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(b,),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        in_specs=[
            img_spec(),
            const_spec(w1.shape),
            const_spec(wd.shape),
            const_spec((1, c)),
            const_spec((1, c)),
            const_spec((1, c)),
        ],
        out_specs=img_spec(),
        scratch_shapes=[
            # same dtype as the activations: a f32 halo buffer would force
            # full-precision (multi-pass) MXU matmuls downstream; sized to
            # one width tile (private per-tile halo buffer)
            pltpu.VMEM((h + 2 * HALO, w_tile + 2 * HALO, n), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, w1, wd, scale[None], bias[None], alpha[None])


def pack_esp_weights(params, stats, dtype=jnp.float32):
    """Flax ESP-block variables -> fused kernel operands.

    ``params``/``stats`` are the block's subtree (keys c1, d1..d16, br).
    """
    w1 = np.asarray(params["c1"]["conv"]["kernel"])[0, 0]  # (C, n)
    n = w1.shape[1]
    names = ["d1", "d2", "d4", "d8", "d16"]
    widths = [np.asarray(params[m]["conv"]["kernel"]).shape[-1]
              for m in names]
    n_pad = max(widths)
    wd = np.zeros((5, 9 * n, n_pad), np.float32)
    for i, name in enumerate(names):
        k = np.asarray(params[name]["conv"]["kernel"])  # (3, 3, n, n_d)
        for tap in range(9):
            dy, dx = divmod(tap, 3)
            wd[i, tap * n: (tap + 1) * n, : k.shape[-1]] = k[dy, dx]
    bn_p = params["br"]["norm"]["bn"]
    bn_s = stats["br"]["norm"]["bn"]
    scale, bias = fold_bn(np.asarray(bn_p["scale"]),
                          np.asarray(bn_p["bias"]),
                          np.asarray(bn_s["mean"]),
                          np.asarray(bn_s["var"]))
    alpha = np.asarray(params["br"]["act"]["alpha"])
    return (jnp.asarray(w1, dtype), jnp.asarray(wd, dtype),
            jnp.asarray(scale, jnp.float32), jnp.asarray(bias, jnp.float32),
            jnp.asarray(alpha, jnp.float32))
