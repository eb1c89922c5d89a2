"""ResNet-v1 backbone for the detection stage (Flax, NHWC).

The reference's detector is a TF OD API Faster R-CNN frozen graph whose
backbone lives inside the ``.pb`` (``detect_glomus_test.py:420-456``).  The
TPU-native rebuild uses a ResNet-v1 feature extractor in the OD API layout:
``conv1..block3`` produce the stride-16 first-stage features and ``block4``
(applied per-ROI) is the second-stage head.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class ConvBN(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    use_relu: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((pad, pad), (pad, pad)), use_bias=False,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.997,
                         epsilon=1e-5, name="bn")(x)
        if self.use_relu:
            x = nn.relu(x)
        return x


class Bottleneck(nn.Module):
    features: int  # inner width; output is 4x
    stride: int = 1
    dilation: int = 1
    project: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        shortcut = x
        if self.project:
            shortcut = ConvBN(4 * self.features, 1, self.stride,
                              use_relu=False, name="proj")(x, train)
        y = ConvBN(self.features, 1, name="c1")(x, train)
        y = nn.Conv(self.features, (3, 3),
                    strides=(self.stride, self.stride),
                    padding=((self.dilation,) * 2, (self.dilation,) * 2),
                    kernel_dilation=(self.dilation, self.dilation),
                    use_bias=False, name="c2_conv")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.997,
                         epsilon=1e-5, name="c2_bn")(y)
        y = nn.relu(y)
        y = ConvBN(4 * self.features, 1, use_relu=False, name="c3")(y, train)
        return nn.relu(shortcut + y)


class ResNetStage(nn.Module):
    features: int
    blocks: int
    stride: int = 2
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Bottleneck(self.features, stride=self.stride,
                       dilation=self.dilation, project=True,
                       name="block0")(x, train)
        for i in range(1, self.blocks):
            x = Bottleneck(self.features, dilation=self.dilation,
                           name=f"block{i}")(x, train)
        return x


class ResNetC4(nn.Module):
    """conv1..block3: stride-16 feature extractor (first stage)."""

    depths: Tuple[int, int, int] = (3, 4, 6)  # resnet50 blocks 1-3
    width: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.width, (7, 7), strides=(2, 2),
                    padding=((3, 3), (3, 3)), use_bias=False,
                    name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.997,
                         epsilon=1e-5, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        x = ResNetStage(self.width, self.depths[0], stride=1,
                        name="block1")(x, train)
        x = ResNetStage(self.width * 2, self.depths[1], name="block2")(x, train)
        x = ResNetStage(self.width * 4, self.depths[2], name="block3")(x, train)
        return x  # stride 16, channels width*16


class ResNetBlock4(nn.Module):
    """block4 applied to per-ROI crops (second-stage head)."""

    blocks: int = 3
    width: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        return ResNetStage(self.width * 8, self.blocks, stride=2,
                           name="block4")(x, train)


class TinyBackbone(nn.Module):
    """Small stride-16 CNN for tests and synthetic-data training."""

    width: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, stride in enumerate([2, 2, 2, 2]):
            x = ConvBN(self.width * min(2 ** i, 4), 3, stride,
                       name=f"c{i}")(x, train)
        return x


class TinyHead(nn.Module):
    width: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(self.width, 3, 2, name="h0")(x, train)
        return x
