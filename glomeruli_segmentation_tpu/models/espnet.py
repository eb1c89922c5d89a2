"""ESPNet / ESPNet-C in Flax, NHWC, designed for TPU.

Semantics replicate the reference network exactly (reference:
``module/espnet/train/Model.py`` in jinseikenai/glomeruli_segmentation —
bias-free convs, BatchNorm eps=1e-3, per-channel PReLU, ESP hierarchical
feature fusion, positional encoder reuse in the decoder,
``Model.py:130-214,242-378``), but the implementation is TPU-native:

- NHWC layout so XLA tiles convolutions onto the MXU without transposes.
- Explicit symmetric padding ``(k-1)//2 * d`` reproduces torch's padded-conv
  output geometry exactly (XLA "SAME" pads asymmetrically for stride 2,
  which would shift stride-2 features by one pixel).
- The 2x2 stride-2 transposed convolutions of the decoder are expressed as
  a single einsum + pixel-shuffle reshape: one MXU matmul, no gradient-style
  dilated conv.
- The five parallel dilated 3x3 convolutions of an ESP unit share one input;
  XLA fuses the adds of the hierarchical fusion chain into the conv epilogue.

Channel arithmetic (``Model.py:133-134,176-177``): ``n = nOut//5``,
``n1 = nOut - 4*n`` — 64 -> n=12, n1=16; 128 -> n=25, n1=28.

Mixed precision: every module threads an optional ``dtype`` (flax
convention) — ``dtype=jnp.bfloat16`` runs convolutions and activations in
bf16 on the MXU while parameters, BatchNorm statistics and running
averages stay float32 (flax computes normalization statistics with
float32 reductions regardless of ``dtype``).  ``dtype=None`` (default)
is the reference-parity float32 path.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array

# torch BatchNorm2d(eps=1e-03) — Model.py:21,44,70,141
BN_EPS = 1e-3
# torch momentum 0.1 == flax momentum 0.9 (flax: ra = m*ra + (1-m)*batch)
BN_MOMENTUM = 0.9


class PReLU(nn.Module):
    """Per-channel PReLU (torch ``nn.PReLU(nOut)``, init 0.25)."""

    features: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        alpha = self.param("alpha", nn.initializers.constant(0.25), (self.features,))
        alpha = alpha.astype(x.dtype)
        return jnp.maximum(x, 0) + alpha * jnp.minimum(x, 0)


def _torch_pad(kernel: int, dilation: int = 1):
    p = (kernel - 1) // 2 * dilation
    return ((p, p), (p, p))


class Conv(nn.Module):
    """Bias-free conv with torch-style symmetric padding (ref ``C``)."""

    features: int
    kernel: int
    stride: int = 1
    dilation: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=_torch_pad(self.kernel, self.dilation),
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)


class BatchNorm(nn.Module):
    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.dtype,
            name="bn",
        )(x)


class BNPReLU(nn.Module):
    """BatchNorm + PReLU (ref ``BR``, Model.py:35-54)."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = BatchNorm(self.features, dtype=self.dtype, name="norm")(x, train)
        return PReLU(self.features, name="act")(x)


class ConvBNPReLU(nn.Module):
    """Conv + BatchNorm + PReLU (ref ``CBR``, Model.py:6-32)."""

    features: int
    kernel: int
    stride: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = Conv(self.features, self.kernel, self.stride,
                 dtype=self.dtype, name="c")(x)
        x = BatchNorm(self.features, dtype=self.dtype, name="norm")(x, train)
        return PReLU(self.features, name="act")(x)


def avg_pool_3x3_s2(x: Array) -> Array:
    """torch ``AvgPool2d(3, stride=2, padding=1)`` with count_include_pad=True.

    Reference ``InputProjectionA`` (Model.py:216-239).
    """
    summed = jax.lax.reduce_window(
        x,
        jnp.array(0, x.dtype),
        jax.lax.add,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    return summed / jnp.array(9, x.dtype)


def input_pyramid(x: Array, times: int) -> Array:
    for _ in range(times):
        x = avg_pool_3x3_s2(x)
    return x


def _esp_split(n_out: int):
    n = n_out // 5
    n1 = n_out - 4 * n
    return n, n1


class ESPDownsample(nn.Module):
    """ESP downsampling unit (ref ``DownSamplerB``, Model.py:130-160)."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        n, n1 = _esp_split(self.features)
        reduced = Conv(n, 3, stride=2, dtype=self.dtype, name="c1")(x)
        d1 = Conv(n1, 3, dilation=1, dtype=self.dtype, name="d1")(reduced)
        d2 = Conv(n, 3, dilation=2, dtype=self.dtype, name="d2")(reduced)
        d4 = Conv(n, 3, dilation=4, dtype=self.dtype, name="d4")(reduced)
        d8 = Conv(n, 3, dilation=8, dtype=self.dtype, name="d8")(reduced)
        d16 = Conv(n, 3, dilation=16, dtype=self.dtype, name="d16")(reduced)
        # hierarchical additive fusion — Model.py:152-155
        add1 = d2
        add2 = add1 + d4
        add3 = add2 + d8
        add4 = add3 + d16
        combine = jnp.concatenate([d1, add1, add2, add3, add4], axis=-1)
        combine = BatchNorm(self.features, dtype=self.dtype,
                            name="norm")(combine, train)
        return PReLU(self.features, name="act")(combine)


class ESPBlock(nn.Module):
    """Dilated parallel residual block (ref ``DilatedParllelResidualBlockB``,
    Model.py:162-214)."""

    features: int
    add: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        n, n1 = _esp_split(self.features)
        reduced = Conv(n, 1, dtype=self.dtype, name="c1")(x)
        d1 = Conv(n1, 3, dilation=1, dtype=self.dtype, name="d1")(reduced)
        d2 = Conv(n, 3, dilation=2, dtype=self.dtype, name="d2")(reduced)
        d4 = Conv(n, 3, dilation=4, dtype=self.dtype, name="d4")(reduced)
        d8 = Conv(n, 3, dilation=8, dtype=self.dtype, name="d8")(reduced)
        d16 = Conv(n, 3, dilation=16, dtype=self.dtype, name="d16")(reduced)
        add1 = d2
        add2 = add1 + d4
        add3 = add2 + d8
        add4 = add3 + d16
        combine = jnp.concatenate([d1, add1, add2, add3, add4], axis=-1)
        if self.add:
            combine = x.astype(combine.dtype) + combine  # Model.py:211-212
        return BNPReLU(self.features, dtype=self.dtype,
                       name="br")(combine, train)


def upconv2x2(x: Array, kernel: Array) -> Array:
    """2x2 stride-2 transposed conv as einsum + pixel shuffle.

    ``kernel`` has shape (2, 2, C_in, C_out) (HWIO).  Equivalent to torch
    ``ConvTranspose2d(cin, cout, 2, stride=2, bias=False)`` (Model.py:334-339)
    but runs as one MXU matmul followed by a reshape.
    """
    n, h, w, cin = x.shape
    kh, kw, kcin, cout = kernel.shape
    assert (kh, kw) == (2, 2) and kcin == cin
    y = jnp.einsum("nhwc,uvco->nhwuvo", x, kernel.astype(x.dtype))
    y = y.reshape(n, h, w, 2, 2, cout)
    y = y.transpose(0, 1, 3, 2, 4, 5)  # n, h, 2, w, 2, cout
    return y.reshape(n, 2 * h, 2 * w, cout)


class UpConv2x2(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (2, 2, x.shape[-1], self.features),
        )
        return upconv2x2(x, kernel)


class ESPNetEncoder(nn.Module):
    """ESPNet-C (ref ``ESPNet_Encoder``, Model.py:242-304).

    Output resolution is 1/8 of the input.  When ``return_intermediates`` is
    set, also returns the two intermediate concatenations the decoder taps
    (Model.py:346-377).
    """

    classes: int = 5
    p: int = 2
    q: int = 8
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False,
                 return_intermediates: bool = False):
        dt = self.dtype
        if dt is not None:
            x = x.astype(dt)
        output0 = ConvBNPReLU(16, 3, stride=2, dtype=dt,
                              name="level1")(x, train)
        inp1 = input_pyramid(x, 1)
        inp2 = input_pyramid(x, 2)

        output0_cat = BNPReLU(16 + 3, dtype=dt, name="b1")(
            jnp.concatenate([output0, inp1], axis=-1), train)
        output1_0 = ESPDownsample(64, dtype=dt, name="down2")(output0_cat,
                                                              train)

        out = output1_0
        for i in range(self.p):
            out = ESPBlock(64, dtype=dt, name=f"level2_{i}")(out, train)
        output1 = out

        output1_cat = BNPReLU(128 + 3, dtype=dt, name="b2")(
            jnp.concatenate([output1, output1_0, inp2], axis=-1), train)
        output2_0 = ESPDownsample(128, dtype=dt, name="down3")(output1_cat,
                                                               train)

        out = output2_0
        for i in range(self.q):
            out = ESPBlock(128, dtype=dt, name=f"level3_{i}")(out, train)
        output2 = out

        output2_cat = BNPReLU(256, dtype=dt, name="b3")(
            jnp.concatenate([output2_0, output2], axis=-1), train)
        logits = Conv(self.classes, 1, dtype=dt,
                      name="classifier")(output2_cat)

        if return_intermediates:
            return logits, output0_cat, output1_cat
        return logits


class ESPNet(nn.Module):
    """Full ESPNet: shared encoder + light-weight RUM decoder
    (ref ``ESPNet``, Model.py:306-378).  Output at input resolution."""

    classes: int = 5
    p: int = 2
    q: int = 8
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        c = self.classes
        dt = self.dtype
        enc_logits, output0_cat, output1_cat = ESPNetEncoder(
            self.classes, self.p, self.q, dtype=dt, name="encoder"
        )(x, train, return_intermediates=True)

        # RUM decoder — Model.py:330-339,370-378
        br = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                          epsilon=BN_EPS, dtype=dt, name="br")
        output2_c = UpConv2x2(c, name="up_l3")(br(enc_logits))

        output1_c = Conv(c, 1, dtype=dt, name="level3_C")(output1_cat)

        comb = jnp.concatenate([output1_c, output2_c], axis=-1)
        comb = BNPReLU(2 * c, dtype=dt, name="combine_l2_l3_br")(comb, train)
        comb = ConvBNPReLU(c, 3, dtype=dt,
                           name="combine_l2_l3_cbr")(comb, train)
        comb = UpConv2x2(c, name="up_l2")(comb)
        comb = BNPReLU(c, dtype=dt, name="up_l2_br")(comb, train)

        feats = ConvBNPReLU(c, 3, dtype=dt, name="conv")(
            jnp.concatenate([comb, output0_cat], axis=-1), train)
        return UpConv2x2(c, name="classifier")(feats)


def create_espnet(classes: int = 5, p: int = 2, q: int = 8,
                  decoder: bool = True, dtype: Any = None) -> nn.Module:
    return (ESPNet if decoder else ESPNetEncoder)(classes=classes, p=p, q=q,
                                                  dtype=dtype)
