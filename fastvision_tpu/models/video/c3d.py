"""C3D video classifier, NDHWC flax (ref videoRecognition/models/c3d.py:102).

VGG-style 3D-conv trunk for 16-frame 112x112 clips (c3d.py:73-98);
`c3d` (no norm) and `c3d_bn` variants. Input: [B, T, H, W, 3].
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class Conv3DBlock(nn.Module):
    features: int
    use_bn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (3, 3, 3), padding="SAME",
                    use_bias=not self.use_bn, dtype=self.dtype, name="conv")(x)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


def pool3d(x, window, strides):
    return nn.max_pool(x, window, strides, "SAME")


class C3D(nn.Module):
    num_classes: int = 101
    batch_norm: bool = False
    dropout: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = self.batch_norm
        x = Conv3DBlock(64, bn, self.dtype, name="conv1a")(x, train)
        x = pool3d(x, (1, 2, 2), (1, 2, 2))  # keep time early (c3d.py pool1)
        x = Conv3DBlock(128, bn, self.dtype, name="conv2a")(x, train)
        x = pool3d(x, (2, 2, 2), (2, 2, 2))
        x = Conv3DBlock(256, bn, self.dtype, name="conv3a")(x, train)
        x = Conv3DBlock(256, bn, self.dtype, name="conv3b")(x, train)
        x = pool3d(x, (2, 2, 2), (2, 2, 2))
        x = Conv3DBlock(512, bn, self.dtype, name="conv4a")(x, train)
        x = Conv3DBlock(512, bn, self.dtype, name="conv4b")(x, train)
        x = pool3d(x, (2, 2, 2), (2, 2, 2))
        x = Conv3DBlock(512, bn, self.dtype, name="conv5a")(x, train)
        x = Conv3DBlock(512, bn, self.dtype, name="conv5b")(x, train)
        x = pool3d(x, (2, 2, 2), (2, 2, 2))
        x = x.reshape((x.shape[0], -1))
        x = nn.relu(nn.Dense(4096, dtype=self.dtype, name="fc6")(x))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.relu(nn.Dense(4096, dtype=self.dtype, name="fc7")(x))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc8")(x)


def c3d(**kw) -> C3D:
    return C3D(batch_norm=False, **kw)


def c3d_bn(**kw) -> C3D:
    return C3D(batch_norm=True, **kw)
