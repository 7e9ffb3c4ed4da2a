"""Factorized 3D-ResNet (R(2+1)D-style), NDHWC flax.

Capability parity with videoRecognition/models/scholor.py:193-206
(resnet18/34/50/101/152_3d): each bottleneck factorizes into a spatial
(1x3x3) conv followed by a temporal (3x1x1) conv (scholor.py:41-46) —
cheaper than full 3x3x3 and maps both convs cleanly onto the MXU.
Input: [B, T, H, W, 3].
"""
from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


class ConvBN3D(nn.Module):
    features: int
    kernel: tuple = (1, 3, 3)
    strides: tuple = (1, 1, 1)
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding="SAME", use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="bn")(x)
        return nn.relu(x) if self.act else x


class SpatioTemporalBlock(nn.Module):
    """Basic residual block: spatial conv then temporal conv (+skip)."""

    features: int
    strides: tuple = (1, 1, 1)
    dtype: Any = jnp.float32
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = ConvBN3D(self.features, (1, 3, 3), self.strides, dtype=self.dtype,
                     name="spatial")(x, train)
        y = ConvBN3D(self.features, (3, 1, 1), (1, 1, 1), act=False,
                     dtype=self.dtype, name="temporal")(y, train)
        if residual.shape != y.shape:
            residual = ConvBN3D(self.features, (1, 1, 1), self.strides, act=False,
                                dtype=self.dtype, name="downsample")(x, train)
        return nn.relu(y + residual)


class SpatioTemporalBottleneck(nn.Module):
    """Bottleneck: 1x1x1 squeeze -> spatial 1x3x3 -> temporal 3x1x1 -> 1x1x1
    expand (scholor.py:41-46 factorization)."""

    features: int
    strides: tuple = (1, 1, 1)
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = ConvBN3D(self.features, (1, 1, 1), dtype=self.dtype, name="squeeze")(x, train)
        y = ConvBN3D(self.features, (1, 3, 3), self.strides, dtype=self.dtype,
                     name="spatial")(y, train)
        y = ConvBN3D(self.features, (3, 1, 1), dtype=self.dtype, name="temporal")(y, train)
        y = ConvBN3D(self.features * self.expansion, (1, 1, 1), act=False,
                     dtype=self.dtype, name="expand")(y, train)
        if residual.shape != y.shape:
            residual = ConvBN3D(self.features * self.expansion, (1, 1, 1),
                                self.strides, act=False, dtype=self.dtype,
                                name="downsample")(x, train)
        return nn.relu(y + residual)


class ResNet3D(nn.Module):
    block_cls: type
    stage_sizes: Sequence[int]
    num_classes: int = 400
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN3D(64, (3, 7, 7), (1, 2, 2), dtype=self.dtype, name="stem")(x, train)
        x = nn.max_pool(x, (1, 3, 3), (1, 2, 2), "SAME")
        for i, n_blocks in enumerate(self.stage_sizes):
            features = 64 * 2**i
            for j in range(n_blocks):
                strides = (2, 2, 2) if (i > 0 and j == 0) else (1, 1, 1)
                x = self.block_cls(features, strides, dtype=self.dtype,
                                   name=f"stage{i + 1}_block{j}")(x, train)
        x = jnp.mean(x, axis=(1, 2, 3))  # global avg over T, H, W
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(x)


resnet18_3d = partial(ResNet3D, SpatioTemporalBlock, (2, 2, 2, 2))
resnet34_3d = partial(ResNet3D, SpatioTemporalBlock, (3, 4, 6, 3))
resnet50_3d = partial(ResNet3D, SpatioTemporalBottleneck, (3, 4, 6, 3))
resnet101_3d = partial(ResNet3D, SpatioTemporalBottleneck, (3, 4, 23, 3))
resnet152_3d = partial(ResNet3D, SpatioTemporalBottleneck, (3, 8, 36, 3))
