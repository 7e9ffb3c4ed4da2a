"""VGG family (11/13/16/19, with and without BN), NHWC flax.

Capability parity with classfication/models/vgg.py:73-103. Head matches the
reference contract: adaptive-avg-pool to 7x7 then 4096-4096-classes MLP
(vgg.py:27-37). `including_top=False` returns the final conv feature map —
Faster R-CNN reuses the conv trunk as its backbone and the MLP as the RoI
head (demos/faster_rcnn/models/faster.py:80).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...nn.layers import ConvBN, adaptive_avg_pool

# stage channel plans; 'M' = maxpool (standard VGG configs A/B/D/E)
CFGS = {
    "vgg11": (64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"),
    "vgg13": (64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"),
    "vgg16": (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M"),
    "vgg19": (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M", 512, 512, 512, 512, "M", 512, 512, 512, 512, "M"),
}


class VGG(nn.Module):
    cfg: Sequence
    batch_norm: bool = False
    num_classes: int = 1000
    including_top: bool = True
    # Faster R-CNN uses the trunk up to (not including) the last maxpool,
    # giving stride 16 (demos/faster_rcnn/models/faster.py VGG backbone).
    drop_last_pool: bool = False
    dropout: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg[:-1] if self.drop_last_pool else self.cfg
        conv_idx = 0
        for v in cfg:
            if v == "M":
                x = nn.max_pool(x, (2, 2), (2, 2))
            else:
                x = ConvBN(
                    int(v), 3, 1, use_bn=self.batch_norm, act="relu",
                    dtype=self.dtype, name=f"conv{conv_idx}",
                )(x, train)
                conv_idx += 1
        if not self.including_top:
            return x
        x = adaptive_avg_pool(x, (7, 7))
        x = x.reshape((x.shape[0], -1))
        x = self.classifier(x, train)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc3")(x)

    def classifier(self, x, train: bool = False):
        """The 4096-4096 MLP (exposed so Faster R-CNN can reuse it as the
        RoI head, ref faster.py:80)."""
        x = nn.relu(nn.Dense(4096, dtype=self.dtype, name="fc1")(x))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.relu(nn.Dense(4096, dtype=self.dtype, name="fc2")(x))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


# Factories (vgg.py:73-103 surface)
vgg11 = partial(VGG, CFGS["vgg11"], batch_norm=False)
vgg13 = partial(VGG, CFGS["vgg13"], batch_norm=False)
vgg16 = partial(VGG, CFGS["vgg16"], batch_norm=False)
vgg19 = partial(VGG, CFGS["vgg19"], batch_norm=False)
vgg11_bn = partial(VGG, CFGS["vgg11"], batch_norm=True)
vgg13_bn = partial(VGG, CFGS["vgg13"], batch_norm=True)
vgg16_bn = partial(VGG, CFGS["vgg16"], batch_norm=True)
vgg19_bn = partial(VGG, CFGS["vgg19"], batch_norm=True)
