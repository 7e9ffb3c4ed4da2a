"""Darknet-53 backbone (YOLOv3's trunk), NHWC flax.

Capability parity with classfication/models/darknet53.py:140: residual stages
[1, 2, 8, 8, 4], LeakyReLU(0.1) activations, and the backbone contract
`strides_per_level = [32, 16, 8]`, `channels_per_level = [1024, 512, 256]`
(darknet53.py:106-110) consumed by the YOLOv3 neck.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ...nn.layers import ConvBN, global_avg_pool


class DarkResidual(nn.Module):
    """1x1 squeeze -> 3x3 expand + skip."""

    features: int  # output channels (== input channels)
    act: str = "silu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBN(self.features // 2, 1, 1, act=self.act, dtype=self.dtype)(x, train)
        y = ConvBN(self.features, 3, 1, act=self.act, dtype=self.dtype)(y, train)
        return x + y


class Darknet53(nn.Module):
    """act='silu' matches the working demo + ultralytics-converted weights
    (demos/yolov3_u/models/darknet.py activation() = nn.SiLU); the classic
    Darknet-53 paper variant is act='leaky_relu'."""

    num_classes: int = 1000
    including_top: bool = True
    act: str = "silu"
    dtype: Any = jnp.float32

    stage_sizes = (1, 2, 8, 8, 4)

    @property
    def strides_per_level(self):
        return [32, 16, 8]

    @property
    def channels_per_level(self):
        return [1024, 512, 256]

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(32, 3, 1, act=self.act, dtype=self.dtype, name="stem")(x, train)
        feats = []
        for i, n_blocks in enumerate(self.stage_sizes):
            features = 64 * 2**i
            x = ConvBN(
                features, 3, 2, act=self.act, dtype=self.dtype, name=f"down{i + 1}"
            )(x, train)
            for j in range(n_blocks):
                x = DarkResidual(features, act=self.act, dtype=self.dtype,
                                 name=f"stage{i + 1}_block{j}")(x, train)
            feats.append(x)
        if not self.including_top:
            return [feats[4], feats[3], feats[2]]  # P5(32), P4(16), P3(8)
        x = global_avg_pool(feats[4])
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(x)


def darknet53(**kwargs) -> Darknet53:
    """Factory (ref classfication/models/darknet53.py:140)."""
    return Darknet53(**kwargs)
