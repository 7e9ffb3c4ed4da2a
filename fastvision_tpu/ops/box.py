"""Box coordinate conversions.

TPU-native re-design of the reference toolbox (`detection/tools/BOX.py:4-27`):
pure-functional jnp over arbitrary leading dims (`[..., 4]`), no in-place
mutation, jit/vmap friendly.  Works for both jnp and np inputs (np in → np
semantics via jnp, returned as jnp arrays).
"""
from __future__ import annotations

import jax.numpy as jnp


def xywh2xyxy(xywh: jnp.ndarray) -> jnp.ndarray:
    """(cx, cy, w, h) -> (x1, y1, x2, y2). Ref: detection/tools/BOX.py:4."""
    cx, cy, w, h = jnp.split(xywh, 4, axis=-1)
    return jnp.concatenate([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def xyxy2xywh(xyxy: jnp.ndarray) -> jnp.ndarray:
    """(x1, y1, x2, y2) -> (cx, cy, w, h). Ref: detection/tools/BOX.py:12."""
    x1, y1, x2, y2 = jnp.split(xyxy, 4, axis=-1)
    return jnp.concatenate([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def xyxy2xywhn(xyxy: jnp.ndarray, height: float, width: float) -> jnp.ndarray:
    """(x1, y1, x2, y2) pixel coords -> normalized (cx, cy, w, h) in [0, 1].

    Ref: detection/tools/BOX.py:20.
    """
    xywh = xyxy2xywh(xyxy)
    scale = jnp.asarray([width, height, width, height], dtype=xywh.dtype)
    return xywh / scale


def xywhn2xyxy(xywhn: jnp.ndarray, height: float, width: float) -> jnp.ndarray:
    """Normalized (cx, cy, w, h) -> pixel (x1, y1, x2, y2). Inverse of xyxy2xywhn."""
    scale = jnp.asarray([width, height, width, height], dtype=xywhn.dtype)
    return xywh2xyxy(xywhn * scale)


def clip_boxes(xyxy: jnp.ndarray, height: float, width: float) -> jnp.ndarray:
    """Clip xyxy boxes into [0, width] x [0, height]."""
    x1, y1, x2, y2 = jnp.split(xyxy, 4, axis=-1)
    return jnp.concatenate(
        [
            jnp.clip(x1, 0, width),
            jnp.clip(y1, 0, height),
            jnp.clip(x2, 0, width),
            jnp.clip(y2, 0, height),
        ],
        axis=-1,
    )


def box_area(xyxy: jnp.ndarray) -> jnp.ndarray:
    """Area of xyxy boxes, shape [...]."""
    x1, y1, x2, y2 = jnp.split(xyxy, 4, axis=-1)
    return ((x2 - x1) * (y2 - y1)).squeeze(-1)
