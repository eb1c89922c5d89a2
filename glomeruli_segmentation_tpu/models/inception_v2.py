"""InceptionV2 trunk with TF-slim semantics — the frozen-graph backbone.

The reference's detector is a TF Object Detection API Faster R-CNN export
(``module/faster-rcnn/detect_glomus_test.py:420-456``) whose feature
extractor is slim ``inception_v2``: the first stage runs the trunk through
``Mixed_4e``; the second stage runs ``Mixed_5a..Mixed_5c`` on cropped ROI
features.  This module re-implements that math as pure NHWC functions over
a parameter tree produced by :mod:`..convert.pb_import` (batch-norm already
folded into each conv's bias/scale — inference graphs never update BN, so
folding removes the op entirely and leaves XLA pure conv+bias+relu chains
for MXU fusion).

Semantics faithfully reproduced from TF:

- SAME padding (XLA's "SAME" matches TF's asymmetric rule);
- avg-pool excludes padded elements from the mean (TF AvgPool);
- the stem's ``Conv2d_1a_7x7`` is a depthwise-separable conv
  (depthwise 7x7 stride 2, then pointwise 1x1);
- relu after every trunk conv (slim default activation).

Channel widths are never hardcoded: they come from the imported kernels,
so any ``depth_multiplier`` the graph was exported with works unchanged.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax import lax

Params = Dict[str, dict]


def conv_same(x: jax.Array, w: jax.Array, b: jax.Array, stride: int = 1,
              relu: bool = True, groups: int = 1) -> jax.Array:
    """TF-style conv: NHWC input, HWIO kernel, SAME padding, bias, relu."""
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)
    y = y + b.astype(x.dtype)
    return jax.nn.relu(y) if relu else y


def depthwise_conv_same(x: jax.Array, w_tf: jax.Array,
                        stride: int = 1) -> jax.Array:
    """TF depthwise conv; ``w_tf`` is the TF layout (H, W, IC, M).

    Output channel ``ic * M + m`` — matched by reshaping to HWIO
    (H, W, 1, IC*M) with ``feature_group_count=IC``.
    """
    kh, kw, ic, m = w_tf.shape
    w = w_tf.reshape(kh, kw, 1, ic * m)
    return lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=ic)


def max_pool_same(x: jax.Array, k: int = 3, stride: int = 1) -> jax.Array:
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, k, k, 1),
                             (1, stride, stride, 1), "SAME")


def avg_pool_same(x: jax.Array, k: int = 3, stride: int = 1) -> jax.Array:
    """TF AvgPool: the mean is over valid (unpadded) elements only."""
    summed = lax.reduce_window(x, 0.0, lax.add, (1, k, k, 1),
                               (1, stride, stride, 1), "SAME")
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    count = lax.reduce_window(ones, 0.0, lax.add, (1, k, k, 1),
                              (1, stride, stride, 1), "SAME")
    return summed / count


def _conv(p: dict, x: jax.Array, stride: int = 1) -> jax.Array:
    return conv_same(x, p["w"], p["b"], stride)


# Inception block topology (slim inception_v2.inception_v2_base).  Branch
# kinds: t1 = 1x1; t3 = 1x1 -> 3x3; d3 = 1x1 -> 3x3 -> 3x3;
# avg/max = 3x3 pool -> 1x1 projection.  Widths live in the params.
_STANDARD = ("t1", "t3", "d3", "avg")
_BLOCKS = {
    "Mixed_3b": _STANDARD,
    "Mixed_3c": _STANDARD,
    "Mixed_4a": "downsample",
    "Mixed_4b": _STANDARD,
    "Mixed_4c": _STANDARD,
    "Mixed_4d": _STANDARD,
    "Mixed_4e": _STANDARD,
    "Mixed_5a": "downsample",
    "Mixed_5b": _STANDARD,
    "Mixed_5c": ("t1", "t3", "d3", "max"),  # 5c projects a max pool
}


def inception_block(p: Params, x: jax.Array, name: str) -> jax.Array:
    spec = _BLOCKS[name]
    if spec == "downsample":
        # Branch_0: 1x1 -> 3x3 stride 2; Branch_1: 1x1 -> 3x3 -> 3x3 stride
        # 2; Branch_2: max pool stride 2 (no params)
        b0 = _conv(p["Branch_0"]["Conv2d_0a_1x1"], x)
        b0 = _conv(p["Branch_0"]["Conv2d_1a_3x3"], b0, stride=2)
        b1 = _conv(p["Branch_1"]["Conv2d_0a_1x1"], x)
        b1 = _conv(p["Branch_1"]["Conv2d_0b_3x3"], b1)
        b1 = _conv(p["Branch_1"]["Conv2d_1a_3x3"], b1, stride=2)
        b2 = max_pool_same(x, 3, 2)
        return jnp.concatenate([b0, b1, b2], axis=-1)

    outs = []
    for i, kind in enumerate(spec):
        bp = p[f"Branch_{i}"]
        if kind == "t1":
            outs.append(_conv(bp["Conv2d_0a_1x1"], x))
        elif kind == "t3":
            y = _conv(bp["Conv2d_0a_1x1"], x)
            outs.append(_conv(bp["Conv2d_0b_3x3"], y))
        elif kind == "d3":
            y = _conv(bp["Conv2d_0a_1x1"], x)
            y = _conv(bp["Conv2d_0b_3x3"], y)
            outs.append(_conv(bp["Conv2d_0c_3x3"], y))
        elif kind == "avg":
            y = avg_pool_same(x, 3, 1)
            outs.append(_conv(bp["Conv2d_0b_1x1"], y))
        elif kind == "max":
            y = max_pool_same(x, 3, 1)
            outs.append(_conv(bp["Conv2d_0b_1x1"], y))
        else:  # pragma: no cover
            raise ValueError(kind)
    return jnp.concatenate(outs, axis=-1)


def proposal_features(p: Params, x: jax.Array) -> jax.Array:
    """First-stage trunk: stem + Mixed_3b..Mixed_4e (stride 16 output).

    ``x`` is the preprocessed image ((2/255)*pix - 1, see the feature
    extractor's ``preprocess``).
    """
    stem = p["Conv2d_1a_7x7"]
    y = depthwise_conv_same(x, stem["dw"], stride=2)
    y = conv_same(y, stem["pw"], stem["b"])  # pointwise + folded BN + relu
    y = max_pool_same(y, 3, 2)
    y = _conv(p["Conv2d_2b_1x1"], y)
    y = _conv(p["Conv2d_2c_3x3"], y)
    y = max_pool_same(y, 3, 2)
    for name in ("Mixed_3b", "Mixed_3c", "Mixed_4a", "Mixed_4b", "Mixed_4c",
                 "Mixed_4d", "Mixed_4e"):
        y = inception_block(p[name], y, name)
    return y


def classifier_features(p: Params, x: jax.Array) -> jax.Array:
    """Second-stage head: Mixed_5a..Mixed_5c over cropped ROI features."""
    for name in ("Mixed_5a", "Mixed_5b", "Mixed_5c"):
        x = inception_block(p[name], x, name)
    return x
