"""ResNet-v1 backbone for the detection stage (Flax, NHWC).

The reference's detector is a TF OD API Faster R-CNN frozen graph whose
backbone lives inside the ``.pb`` (``detect_glomus_test.py:420-456``).  The
TPU-native rebuild uses a ResNet-v1 feature extractor in the OD API layout:
``conv1..block3`` produce the stride-16 first-stage features and ``block4``
(applied per-ROI) is the second-stage head.

Every module threads an optional ``dtype`` (flax convention):
``dtype=jnp.bfloat16`` runs the convolutions on the MXU in bf16 while
parameters and BatchNorm statistics stay float32.  Without it, a bf16
*input* alone would silently promote back to f32 at the first f32-param
conv — the backend's ``compute_dtype`` plumbs through here.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class ConvBN(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    use_relu: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((pad, pad), (pad, pad)), use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.997,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        if self.use_relu:
            x = nn.relu(x)
        return x


class Bottleneck(nn.Module):
    features: int  # inner width; output is 4x
    stride: int = 1
    dilation: int = 1
    project: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        shortcut = x
        if self.project:
            shortcut = ConvBN(4 * self.features, 1, self.stride,
                              use_relu=False, dtype=self.dtype,
                              name="proj")(x, train)
        y = ConvBN(self.features, 1, dtype=self.dtype, name="c1")(x, train)
        y = nn.Conv(self.features, (3, 3),
                    strides=(self.stride, self.stride),
                    padding=((self.dilation,) * 2, (self.dilation,) * 2),
                    kernel_dilation=(self.dilation, self.dilation),
                    use_bias=False, dtype=self.dtype, name="c2_conv")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.997,
                         epsilon=1e-5, dtype=self.dtype, name="c2_bn")(y)
        y = nn.relu(y)
        y = ConvBN(4 * self.features, 1, use_relu=False, dtype=self.dtype,
                   name="c3")(y, train)
        return nn.relu(shortcut.astype(y.dtype) + y)


class ResNetStage(nn.Module):
    features: int
    blocks: int
    stride: int = 2
    dilation: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Bottleneck(self.features, stride=self.stride,
                       dilation=self.dilation, project=True,
                       dtype=self.dtype, name="block0")(x, train)
        for i in range(1, self.blocks):
            x = Bottleneck(self.features, dilation=self.dilation,
                           dtype=self.dtype, name=f"block{i}")(x, train)
        return x


class ResNetC4(nn.Module):
    """conv1..block3: stride-16 feature extractor (first stage)."""

    depths: Tuple[int, int, int] = (3, 4, 6)  # resnet50 blocks 1-3
    width: int = 64
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = nn.Conv(self.width, (7, 7), strides=(2, 2),
                    padding=((3, 3), (3, 3)), use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.997,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        x = ResNetStage(self.width, self.depths[0], stride=1,
                        dtype=self.dtype, name="block1")(x, train)
        x = ResNetStage(self.width * 2, self.depths[1], dtype=self.dtype,
                        name="block2")(x, train)
        x = ResNetStage(self.width * 4, self.depths[2], dtype=self.dtype,
                        name="block3")(x, train)
        return x  # stride 16, channels width*16


class ResNetBlock4(nn.Module):
    """block4 applied to per-ROI crops (second-stage head)."""

    blocks: int = 3
    width: int = 64
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return ResNetStage(self.width * 8, self.blocks, stride=2,
                           dtype=self.dtype, name="block4")(x, train)


class TinyBackbone(nn.Module):
    """Small stride-16 CNN for tests and synthetic-data training."""

    width: int = 32
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        for i, stride in enumerate([2, 2, 2, 2]):
            x = ConvBN(self.width * min(2 ** i, 4), 3, stride,
                       dtype=self.dtype, name=f"c{i}")(x, train)
        return x


class TinyHead(nn.Module):
    width: int = 64
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(self.width, 3, 2, dtype=self.dtype, name="h0")(x, train)
        return x
