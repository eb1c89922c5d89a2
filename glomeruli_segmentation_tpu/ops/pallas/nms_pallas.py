"""Greedy NMS as a single Pallas TPU kernel.

The lax.scan NMS in :mod:`..nms` runs ``max_outputs`` sequential XLA steps,
each re-reading boxes from wherever XLA materialized them.  This kernel
keeps the candidate set **VMEM-resident** (N <= a few thousand boxes is
tens of KB) and runs the whole greedy loop inside one kernel launch: per
step an argmax over live scores (VPU reduction), a vectorized IoU of the
winner against all boxes, and a masked suppression update — no HBM traffic
after the initial load.

``nms_pallas`` matches the reference semantics of :func:`..nms.nms`
(indices padded with -1); parity is tested in interpret mode on CPU and
compiled on TPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e10


def _nms_kernel(boxes_ref, scores_ref, thresh_ref, out_idx_ref,
                max_outputs: int):
    # Everything stays rank-2 (N, 1): Mosaic requires >= 2-D vector layouts.
    boxes = boxes_ref[:]          # (N, 4) VMEM
    scores = scores_ref[:]        # (N, 1) VMEM
    iou_threshold = thresh_ref[0]
    n = boxes.shape[0]

    y1 = boxes[:, 0:1]
    x1 = boxes[:, 1:2]
    y2 = boxes[:, 2:3]
    x2 = boxes[:, 3:4]
    area = jnp.maximum(y2 - y1, 0) * jnp.maximum(x2 - x1, 0)  # (N, 1)
    ids = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)

    def body(k, live_scores):
        best_score = jnp.max(live_scores)
        valid = best_score > NEG_INF / 2
        # winner row: first index attaining the max
        is_best = live_scores >= best_score
        idx = jnp.min(jnp.where(is_best, ids, n))
        onehot = ids == idx
        # winner's coordinates via masked reductions (no dynamic gather)
        by1 = jnp.sum(jnp.where(onehot, y1, 0))
        bx1 = jnp.sum(jnp.where(onehot, x1, 0))
        by2 = jnp.sum(jnp.where(onehot, y2, 0))
        bx2 = jnp.sum(jnp.where(onehot, x2, 0))
        barea = jnp.sum(jnp.where(onehot, area, 0))
        iy = jnp.maximum(jnp.minimum(by2, y2) - jnp.maximum(by1, y1), 0)
        ix = jnp.maximum(jnp.minimum(bx2, x2) - jnp.maximum(bx1, x1), 0)
        inter = iy * ix
        union = barea + area - inter
        iou = jnp.where(union > 0, inter / union, 0.0)  # (N, 1)
        suppress = iou >= iou_threshold
        new_scores = jnp.where(valid & suppress, NEG_INF, live_scores)
        new_scores = jnp.where(onehot, NEG_INF, new_scores)
        out_idx_ref[k] = jnp.where(valid, idx.astype(jnp.int32), -1)
        return new_scores

    jax.lax.fori_loop(0, max_outputs, body, scores)


@functools.partial(jax.jit, static_argnums=(2, 4))
def nms_pallas(boxes: jax.Array, scores: jax.Array, max_outputs: int,
               iou_threshold: float = 0.5, interpret: bool = False):
    """VMEM-resident greedy NMS. Same contract as :func:`..nms.nms`
    (without score_threshold; pre-mask scores if needed)."""
    out = pl.pallas_call(
        functools.partial(_nms_kernel, max_outputs=max_outputs),
        out_shape=jax.ShapeDtypeStruct((max_outputs,), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            memory_space=pl.ANY if interpret else pltpu.SMEM),
        interpret=interpret,
    )(boxes, scores[:, None], jnp.asarray([iou_threshold], boxes.dtype))
    num_valid = jnp.sum(out >= 0).astype(jnp.int32)
    return out, num_valid
