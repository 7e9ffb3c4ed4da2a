"""YOLOv3: composable backbone/neck/head detector, NHWC flax.

Re-design of the reference's two YOLOv3s into one working model:
  - the library's composable factory idea (detection/models/yolov3.py:57 —
    backbone/neck/head injection; import-broken there, fixed here);
  - the demos' working architecture (demos/yolov3_u/models/yolov3.py:139:
    darknet53 + 5-conv FPN neck + 1x1 conv heads).

Output contract: list of per-level raw heads, each [B, H, W, A, 5+C]
(NHWC; level order P5(stride 32), P4(16), P3(8) — deepest first, matching
the backbone contract). Decode lives in `fastvision_tpu.infer.decode` as a
pure function (both v5 and v3 styles, SURVEY.md §2.7 last bullet).
"""
from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...nn.layers import ConvBN
from ..classification.darknet53 import Darknet53


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x upsample, NHWC."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class YoloBlock(nn.Module):
    """The 5-conv (1-3-1-3-1) refinement block (ref yolov3neck.py:76-114)."""

    features: int  # output (squeezed) channels
    act: str = "silu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.features
        x = ConvBN(f, 1, act=self.act, dtype=self.dtype)(x, train)
        x = ConvBN(f * 2, 3, act=self.act, dtype=self.dtype)(x, train)
        x = ConvBN(f, 1, act=self.act, dtype=self.dtype)(x, train)
        x = ConvBN(f * 2, 3, act=self.act, dtype=self.dtype)(x, train)
        x = ConvBN(f, 1, act=self.act, dtype=self.dtype)(x, train)
        return x


class YOLOv3Neck(nn.Module):
    """Top-down FPN: YoloBlock + upsample-concat per level.

    Input: [P5, P4, P3] (deepest first); output: refined [N5, N4, N3] with
    channels equal to the input channels per level (ref NeckV3 semantics).
    """

    channels: Sequence[int] = (1024, 512, 256)  # per level, deepest first
    act: str = "silu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        outs = []
        carry = None
        for i, (x, ch) in enumerate(zip(feats, self.channels)):
            if carry is not None:
                lateral = ConvBN(ch // 2, 1, act=self.act, dtype=self.dtype,
                                 name=f"lateral{i}")(carry, train)
                x = jnp.concatenate([x, upsample2x(lateral)], axis=-1)
            carry = YoloBlock(ch // 2, act=self.act, dtype=self.dtype, name=f"block{i}")(
                x, train
            )
            out = ConvBN(ch, 3, act=self.act, dtype=self.dtype, name=f"out{i}")(carry, train)
            outs.append(out)
        return outs


class YOLOv3Head(nn.Module):
    """Per-level 1x1 conv -> [B, H, W, A, 5+C] (ref yolov3head.py:58-66)."""

    num_classes: int = 80
    anchors_per_level: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        outs = []
        no = 5 + self.num_classes
        for i, x in enumerate(feats):
            y = nn.Conv(
                self.anchors_per_level * no, (1, 1), use_bias=True,
                dtype=self.dtype, name=f"pred{i}",
            )(x)
            b, h, w, _ = y.shape
            outs.append(y.reshape(b, h, w, self.anchors_per_level, no))
        return outs


class YOLOv3(nn.Module):
    """Composable detector. `backbone_fn` builds any module honoring the
    backbone contract (returns [P5, P4, P3]; default Darknet-53).

    Ref: detection/models/yolov3.py:57 (composability) +
    demos/yolov3_u/models/yolov3.py:139 (working architecture).
    """

    num_classes: int = 80
    anchors_per_level: int = 3
    backbone_fn: Callable[..., nn.Module] | None = None
    channels: Sequence[int] = (1024, 512, 256)
    strides: Sequence[int] = (32, 16, 8)
    act: str = "silu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        make_backbone = self.backbone_fn or (
            lambda **kw: Darknet53(including_top=False, **kw)
        )
        feats = make_backbone(dtype=self.dtype, name="backbone")(x, train)
        feats = YOLOv3Neck(self.channels, act=self.act, dtype=self.dtype, name="neck")(
            feats, train
        )
        return YOLOv3Head(
            self.num_classes, self.anchors_per_level, dtype=self.dtype, name="head"
        )(feats)


def yolov3(num_classes: int = 80, **kwargs) -> YOLOv3:
    """Factory, mirrors detection/models/yolov3.py:57."""
    return YOLOv3(num_classes=num_classes, **kwargs)
