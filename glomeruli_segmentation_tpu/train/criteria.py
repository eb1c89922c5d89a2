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
                     class_weights: jax.Array | None = None,
                     valid: jax.Array | None = None) -> jax.Array:
    """Weighted 2-D cross entropy.

    Args:
      logits: (N, H, W, C) float
      labels: (N, H, W) int
      class_weights: (C,) float or None
      valid: (N,) bool or None — samples padded onto a ragged
        data-parallel batch carry False and drop out of both the
        numerator and the weight denominator (valid=None or all-True is
        identical to the reference math). Given the same logits the
        masked loss equals the unpadded one exactly; in train mode the
        BN batch statistics still see the padded images.
    Returns scalar loss: sum(w_y * nll) / sum(w_y) (torch weighted mean).
    """
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(log_probs, labels[..., None], axis=-1)[..., 0]
    w = (jnp.ones_like(nll) if class_weights is None
         else class_weights[labels])
    if valid is not None:
        w = w * valid[:, None, None]
    return (w * nll).sum() / w.sum()
