"""YOLO head decoding: raw per-level predictions -> image-space boxes.

The reference has two inconsistent decodes (SURVEY.md §2.7):
  - v5-style: xy = (2*sig(t) - 0.5 + grid) * stride,
              wh = (2*sig(t))^2 * anchor        (demos/yolov3_u/inference.py:86-89)
  - v3-style: xy = (sig(t) + grid) * stride,
              wh = exp(t) * anchor              (customize_service.py:444-447,
                                                 detection/models/yolov3.py:46-49)
Both are provided; v5 is the default (the ultralytics-converted checkpoint
requires it). Pure jnp, static shapes, vmap/jit friendly.

Anchors are in INPUT-IMAGE pixels here, [L, A, 2], level order matching the
heads (deepest/stride-32 first); the reference stores them feature-scale
(÷stride, demos/yolov3_u/train.py:60-62) — divide internally where needed.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from ..ops.grid import grid


def decode_level(
    head: jnp.ndarray,  # [B, H, W, A, 5+C] raw logits
    anchors: jnp.ndarray,  # [A, 2] pixel units
    stride: int,
    style: str = "v5",
) -> jnp.ndarray:
    """Decode one pyramid level -> [B, H*W*A, 5+C] with xywh in pixels and
    sigmoided obj/cls scores."""
    b, h, w, a, no = head.shape
    offsets = grid(h, w, mode="xy", dtype=head.dtype)[None, :, :, None, :]  # [1,H,W,1,2]
    anchors = anchors.reshape(1, 1, 1, a, 2).astype(head.dtype)

    if style == "v5":
        sig = jax.nn.sigmoid(head)
        xy = (sig[..., 0:2] * 2.0 - 0.5 + offsets) * stride
        wh = (sig[..., 2:4] * 2.0) ** 2 * anchors
        rest = sig[..., 4:]
    elif style == "v3":
        xy = (jax.nn.sigmoid(head[..., 0:2]) + offsets) * stride
        wh = jnp.exp(head[..., 2:4]) * anchors
        rest = jax.nn.sigmoid(head[..., 4:])
    else:
        raise ValueError("style must be 'v5' or 'v3'")

    out = jnp.concatenate([xy, wh, rest], axis=-1)
    return out.reshape(b, h * w * a, no)


def decode_predictions(
    heads: Sequence[jnp.ndarray],
    anchors: jnp.ndarray,  # [L, A, 2] pixels, level order == heads order
    strides: Sequence[int] = (32, 16, 8),
    style: str = "v5",
) -> jnp.ndarray:
    """All levels -> [B, sum(H*W*A), 5+C], xywh pixel boxes + sigmoided scores.

    Feed the result to ops.nms.batched_non_max_suppression (box_format='xywh').
    """
    levels = [
        decode_level(h, anchors[i], strides[i], style) for i, h in enumerate(heads)
    ]
    return jnp.concatenate(levels, axis=1)
