"""Factorized 3D-ResNet (R(2+1)D-style), NDHWC flax.

Structure-exact to videoRecognition/models/scholor.py:193-206
(resnet18/34/50/101/152_3d), verified by executed-reference forward parity
(tests/test_reference_video_parity.py):
  - Bottleneck (scholor.py:36-49): 1x1x1 squeeze -> spatial 1x3x3 (spatial
    half of the stride) -> temporal 3x1x1 (temporal half of the stride) ->
    1x1x1 expand; downsample branch takes the full stride;
  - BasicBlock (scholor.py:105-108): two full 3x3x3 convs, stride on the
    first (resnet18/34_3d are NOT factorized in the reference);
  - stem: (1,7,7) stride (1,2,2) conv + (1,3,3)/(1,2,2) max-pool
    (scholor.py:145-153).

TPU notes: NDHWC layout; both factorized convs map cleanly onto the MXU.
Padding is explicit torch-style (k//2 per dim) — at stride 2 XLA's SAME is
right-biased while torch pads symmetrically, which changes strided-conv
and max-pool windows; explicit padding keeps imported torch weights exact.
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
        pad = tuple((k // 2, k // 2) for k in self.kernel)
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=pad, use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="bn")(x)
        return nn.relu(x) if self.act else x


class BasicBlock3D(nn.Module):
    """Two full 3x3x3 convs + skip (scholor.py BasicBlock :105-135)."""

    features: int
    strides: tuple = (1, 1, 1)
    dtype: Any = jnp.float32
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = ConvBN3D(self.features, (3, 3, 3), self.strides, dtype=self.dtype,
                     name="conv1")(x, train)
        y = ConvBN3D(self.features, (3, 3, 3), act=False, dtype=self.dtype,
                     name="conv2")(y, train)
        if residual.shape != y.shape:
            residual = ConvBN3D(self.features, (1, 1, 1), self.strides, act=False,
                                dtype=self.dtype, name="downsample")(x, train)
        return nn.relu(y + residual)


class Bottleneck3D(nn.Module):
    """1x1x1 -> spatial 1x3x3 -> temporal 3x1x1 -> 1x1x1 bottleneck with the
    stride split across the two factorized convs (scholor.py:39-46: the
    spatial conv takes the HW stride, the temporal conv the T stride)."""

    features: int
    strides: tuple = (1, 1, 1)
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        st, sh, sw = self.strides
        residual = x
        y = ConvBN3D(self.features, (1, 1, 1), dtype=self.dtype, name="conv1")(x, train)
        y = ConvBN3D(self.features, (1, 3, 3), (1, sh, sw), dtype=self.dtype,
                     name="conv2_spatial")(y, train)
        y = ConvBN3D(self.features, (3, 1, 1), (st, 1, 1), dtype=self.dtype,
                     name="conv2_temporal")(y, train)
        y = ConvBN3D(self.features * self.expansion, (1, 1, 1), act=False,
                     dtype=self.dtype, name="conv3")(y, train)
        if residual.shape != y.shape:
            residual = ConvBN3D(self.features * self.expansion, (1, 1, 1),
                                self.strides, act=False, dtype=self.dtype,
                                name="downsample")(x, train)
        return nn.relu(y + residual)


# legacy aliases (round<=4 names)
SpatioTemporalBlock = BasicBlock3D
SpatioTemporalBottleneck = Bottleneck3D


class ResNet3D(nn.Module):
    block_cls: type
    stage_sizes: Sequence[int]
    num_classes: int = 400
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN3D(64, (1, 7, 7), (1, 2, 2), dtype=self.dtype, name="stem")(x, train)
        x = nn.max_pool(x, (1, 3, 3), (1, 2, 2),
                        padding=((0, 0), (1, 1), (1, 1)))
        for i, n_blocks in enumerate(self.stage_sizes):
            features = 64 * 2**i
            for j in range(n_blocks):
                strides = (2, 2, 2) if (i > 0 and j == 0) else (1, 1, 1)
                x = self.block_cls(features, strides, dtype=self.dtype,
                                   name=f"stage{i + 1}_block{j}")(x, train)
        x = jnp.mean(x, axis=(1, 2, 3))  # global avg over T, H, W
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(x)


resnet18_3d = partial(ResNet3D, BasicBlock3D, (2, 2, 2, 2))
resnet34_3d = partial(ResNet3D, BasicBlock3D, (3, 4, 6, 3))
resnet50_3d = partial(ResNet3D, Bottleneck3D, (3, 4, 6, 3))
resnet101_3d = partial(ResNet3D, Bottleneck3D, (3, 4, 23, 3))
resnet152_3d = partial(ResNet3D, Bottleneck3D, (3, 8, 36, 3))
