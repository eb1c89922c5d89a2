"""Training losses.

``cross_entropy_2d`` replicates the upstream-ESPNet ``CrossEntropyLoss2d``
the reference trains with (``module/espnet/train/main.py:8,250-258``):
2-D log-softmax + NLL with per-class weights, mean-reduced over weighted
pixels (torch ``NLLLoss`` weighted-mean semantics).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy_2d(logits: jax.Array, labels: jax.Array,
                     class_weights: jax.Array | None = None) -> jax.Array:
    """Weighted 2-D cross entropy.

    Args:
      logits: (N, H, W, C) float
      labels: (N, H, W) int
      class_weights: (C,) float or None
    Returns scalar loss: sum(w_y * nll) / sum(w_y) (torch weighted mean).
    """
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(log_probs, labels[..., None], axis=-1)[..., 0]
    if class_weights is None:
        return nll.mean()
    w = class_weights[labels]
    return (w * nll).sum() / w.sum()
