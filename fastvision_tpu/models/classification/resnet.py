"""ResNet / ResNeXt family, NHWC flax modules.

Capability parity with classfication/models/resnet.py:184-197 (resnet18/34/
50/101/152) and classfication/models/resnext.py:186-194 (resnext50_32x4d,
resnext101_32x8d), re-designed for TPU: NHWC, fused conv+BN+act blocks, bf16
compute option, and the detection-backbone contract — `including_top=False`
returns the [C5, C4, C3] pyramid (strides 32/16/8), mirroring
classfication/models/resnet.py:181.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...nn.layers import ConvBN, global_avg_pool


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    groups: int = 1  # unused in basic block
    base_width: int = 64
    dtype: Any = jnp.float32
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = ConvBN(self.features, 3, self.strides, act="relu", dtype=self.dtype)(x, train)
        y = ConvBN(self.features, 3, 1, act="none", dtype=self.dtype)(y, train)
        if residual.shape != y.shape:
            residual = ConvBN(
                self.features * self.expansion, 1, self.strides, act="none",
                dtype=self.dtype, name="downsample",
            )(x, train)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    features: int
    strides: int = 1
    groups: int = 1
    base_width: int = 64
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = int(self.features * (self.base_width / 64.0)) * self.groups
        residual = x
        y = ConvBN(width, 1, 1, act="relu", dtype=self.dtype)(x, train)
        y = ConvBN(width, 3, self.strides, groups=self.groups, act="relu", dtype=self.dtype)(y, train)
        y = ConvBN(self.features * self.expansion, 1, 1, act="none", dtype=self.dtype)(y, train)
        if residual.shape != y.shape:
            residual = ConvBN(
                self.features * self.expansion, 1, self.strides, act="none",
                dtype=self.dtype, name="downsample",
            )(x, train)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """ResNet/ResNeXt trunk.

    including_top=True  -> logits [N, num_classes]
    including_top=False -> [C5, C4, C3] feature pyramid (deepest first),
                           the detection backbone contract (resnet.py:181).
    """

    block_cls: type
    stage_sizes: Sequence[int]
    num_classes: int = 1000
    including_top: bool = True
    groups: int = 1
    base_width: int = 64
    dtype: Any = jnp.float32

    @property
    def strides_per_level(self):
        return [32, 16, 8]

    @property
    def channels_per_level(self):
        exp = self.block_cls.expansion
        return [512 * exp, 256 * exp, 128 * exp]

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(64, 7, 2, act="relu", dtype=self.dtype, name="stem")(x, train)
        x = nn.max_pool(x, (3, 3), (2, 2), ((1, 1), (1, 1)))  # torch pad=1 parity
        feats = []
        for i, n_blocks in enumerate(self.stage_sizes):
            features = 64 * 2**i
            for j in range(n_blocks):
                strides = 2 if (i > 0 and j == 0) else 1
                x = self.block_cls(
                    features,
                    strides=strides,
                    groups=self.groups,
                    base_width=self.base_width,
                    dtype=self.dtype,
                    name=f"stage{i + 1}_block{j}",
                )(x, train)
            feats.append(x)
        if not self.including_top:
            return [feats[3], feats[2], feats[1]]  # C5, C4, C3
        x = global_avg_pool(feats[3])
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(x)


# Factory functions — the reference's public surface (resnet.py:184-197).
resnet18 = partial(ResNet, BasicBlock, (2, 2, 2, 2))
resnet34 = partial(ResNet, BasicBlock, (3, 4, 6, 3))
resnet50 = partial(ResNet, Bottleneck, (3, 4, 6, 3))
resnet101 = partial(ResNet, Bottleneck, (3, 4, 23, 3))
resnet152 = partial(ResNet, Bottleneck, (3, 8, 36, 3))

# ResNeXt (resnext.py:186-194): grouped bottlenecks.
resnext50_32x4d = partial(ResNet, Bottleneck, (3, 4, 6, 3), groups=32, base_width=4)
resnext101_32x8d = partial(ResNet, Bottleneck, (3, 4, 23, 3), groups=32, base_width=8)
