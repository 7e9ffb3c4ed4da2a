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


def pool3d(x, window, strides, padding="VALID"):
    return nn.max_pool(x, window, strides, padding)


def _adaptive_matrix(n_in: int, n_out: int):
    """(n_out, n_in) averaging matrix with torch AdaptiveAvgPool window
    semantics: window i covers [floor(i*in/out), ceil((i+1)*in/out))."""
    import numpy as np

    m = np.zeros((n_out, n_in), np.float32)
    for i in range(n_out):
        a = (i * n_in) // n_out
        b = -(-((i + 1) * n_in) // n_out)
        m[i, a:b] = 1.0 / (b - a)
    return jnp.asarray(m)


def adaptive_avg_pool3d(x, out_thw):
    """NDHWC adaptive average pool to (T, H, W) — the reference gap to
    (1, 4, 4) before the classifier (c3d.py:46,95). Identity when already
    at the target; exact torch adaptive semantics otherwise (three small
    matmul contractions with static averaging matrices — MXU-friendly,
    handles upsampling like torch's overlapping windows)."""
    n, t, h, w, c = x.shape
    ot, oh, ow = out_thw
    if (t, h, w) == (ot, oh, ow):
        return x
    x = jnp.einsum("ot,nthwc->nohwc", _adaptive_matrix(t, ot), x)
    x = jnp.einsum("ph,nthwc->ntpwc", _adaptive_matrix(h, oh), x)
    return jnp.einsum("qw,nthwc->nthqc", _adaptive_matrix(w, ow), x)


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
        # pool5 pads H/W by 1 on BOTH sides, torch-style (c3d.py:43
        # padding=(0,1,1)) — XLA SAME would pad right only, shifting windows
        x = pool3d(x, (2, 2, 2), (2, 2, 2), padding=((0, 0), (1, 1), (1, 1)))
        x = adaptive_avg_pool3d(x, (1, 4, 4))  # ref gap (c3d.py:46,95)
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
