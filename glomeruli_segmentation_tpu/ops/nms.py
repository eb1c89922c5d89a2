"""Non-maximum suppression as a static-shape XLA program.

Replaces the NMS baked inside the reference's frozen TF graph
(``detect_glomus_test.py:443-450``; the TF OD API runs NMS both after the
RPN and per class in the second stage).  Greedy NMS is inherently
sequential in the number of *kept* boxes, so the TPU formulation iterates
``max_outputs`` times with a vectorized O(N) suppression update per step —
``max_outputs`` is small (<= 300) while N can be thousands, keeping the
VPU busy and the shapes static for XLA.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .boxes import boxes_area

NEG_INF = -1e10


@functools.partial(jax.jit, static_argnums=(2,))
def nms(boxes: jax.Array, scores: jax.Array, max_outputs: int,
        iou_threshold: float = 0.5, score_threshold: float = float("-inf")):
    """Greedy NMS.

    Args:
      boxes: (N, 4) [ymin, xmin, ymax, xmax]
      scores: (N,)
      max_outputs: static number of boxes to keep (padded with -1)
    Returns (indices (max_outputs,) int32 with -1 padding,
             num_valid scalar int32).
    """
    n = boxes.shape[0]
    area = boxes_area(boxes)
    live_scores = jnp.where(scores > score_threshold, scores, NEG_INF)

    def body(state, _):
        live_scores, = state
        idx = jnp.argmax(live_scores)
        best_score = live_scores[idx]
        valid = best_score > NEG_INF / 2
        best_box = boxes[idx]
        # IoU of the selected box with every box
        lt = jnp.maximum(best_box[:2], boxes[:, :2])
        rb = jnp.minimum(best_box[2:], boxes[:, 2:])
        wh = jnp.maximum(rb - lt, 0)
        inter = wh[:, 0] * wh[:, 1]
        union = area[idx] + area - inter
        iou = jnp.where(union > 0, inter / union, 0.0)
        suppress = iou >= iou_threshold
        new_scores = jnp.where(valid & suppress, NEG_INF, live_scores)
        new_scores = new_scores.at[idx].set(NEG_INF)
        out_idx = jnp.where(valid, idx.astype(jnp.int32), -1)
        return (new_scores,), out_idx

    (_,), indices = jax.lax.scan(body, (live_scores,), None,
                                 length=max_outputs)
    num_valid = jnp.sum(indices >= 0).astype(jnp.int32)
    return indices, num_valid


def gather_padded(values: jax.Array, indices: jax.Array, pad_value=0):
    """Gather rows by NMS indices, replacing -1 slots with ``pad_value``."""
    safe = jnp.maximum(indices, 0)
    out = values[safe]
    mask = (indices >= 0)
    mask = mask.reshape(mask.shape + (1,) * (out.ndim - mask.ndim))
    return jnp.where(mask, out, pad_value)
