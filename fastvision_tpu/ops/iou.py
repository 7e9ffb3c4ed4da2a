"""IoU family: paired and all-pairs IoU / GIoU / DIoU / CIoU, plus wh-IoU.

TPU-native re-design of the reference's 481-line dual-dispatch toolbox
(`detection/tools/IOU.py`): one jnp implementation each, broadcasting
handles both the paired ([..., 4] vs [..., 4]) and all-pairs ([N, 4] vs
[M, 4] -> [N, M]) cases.

The reference's sign bugs are intentionally FIXED here (SURVEY.md §2.7):
  - `GIOU_batch` returned iou + penalty (IOU.py:290)  -> here iou - penalty
  - `DIOU`/`DIOU_batch` torch paths added the center-distance term
    (IOU.py:341,393)                                  -> here subtracted

All functions are jit/vmap/grad friendly and static-shape.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .box import xywh2xyxy

_EPS = 1e-7


def _split_xyxy(box):
    return box[..., 0], box[..., 1], box[..., 2], box[..., 3]


def _to_xyxy(box, fmt):
    if fmt == "xyxy":
        return box
    if fmt == "xywh":
        return xywh2xyxy(box)
    raise ValueError("fmt must be 'xyxy' or 'xywh'")


def box_iou(box1, box2, *, kind: str = "iou", fmt: str = "xyxy", eps: float = _EPS):
    """Elementwise (broadcast) IoU-family between box1 and box2.

    Args:
      box1, box2: [..., 4] broadcastable boxes.
      kind: one of 'iou' | 'giou' | 'diou' | 'ciou'.
      fmt: 'xyxy' or 'xywh' (center format).

    Returns [...] (the last axis is consumed).
    Ref semantics: detection/tools/IOU.py:7 (cal_iou) and GIOU:193 /
    DIOU:294 / CIOU:397, with penalty signs corrected.
    """
    b1 = _to_xyxy(jnp.asarray(box1, jnp.float32), fmt)
    b2 = _to_xyxy(jnp.asarray(box2, jnp.float32), fmt)
    x11, y11, x12, y12 = _split_xyxy(b1)
    x21, y21, x22, y22 = _split_xyxy(b2)

    iw = jnp.clip(jnp.minimum(x12, x22) - jnp.maximum(x11, x21), 0, None)
    ih = jnp.clip(jnp.minimum(y12, y22) - jnp.maximum(y11, y21), 0, None)
    inter = iw * ih
    area1 = (x12 - x11) * (y12 - y11)
    area2 = (x22 - x21) * (y22 - y21)
    union = area1 + area2 - inter + eps
    iou = inter / union
    if kind == "iou":
        return iou

    # Smallest enclosing (convex) box.
    cw = jnp.maximum(x12, x22) - jnp.minimum(x11, x21)
    ch = jnp.maximum(y12, y22) - jnp.minimum(y11, y21)
    if kind == "giou":
        c_area = cw * ch + eps
        return iou - (c_area - (union - eps)) / c_area

    # Center-distance penalty (DIoU / CIoU).
    c2 = cw**2 + ch**2 + eps
    rho2 = ((x21 + x22) - (x11 + x12)) ** 2 / 4 + ((y21 + y22) - (y11 + y12)) ** 2 / 4
    if kind == "diou":
        return iou - rho2 / c2

    if kind == "ciou":
        w1, h1 = x12 - x11, y12 - y11
        w2, h2 = x22 - x21, y22 - y21
        v = (4 / math.pi**2) * (jnp.arctan(w2 / (h2 + eps)) - jnp.arctan(w1 / (h1 + eps))) ** 2
        alpha = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
        return iou - (rho2 / c2 + alpha * v)

    raise ValueError(f"unknown kind: {kind!r}")


def box_iou_matrix(box1, box2, *, kind: str = "iou", fmt: str = "xyxy", eps: float = _EPS):
    """All-pairs IoU-family: [N, 4] x [M, 4] -> [N, M].

    Ref: detection/tools/IOU.py:17 (cal_iou_batch) / xyxy_iou_batch:124 and
    the *_batch GIoU/DIoU/CIoU variants (signs corrected).
    """
    return box_iou(box1[..., :, None, :], box2[..., None, :, :], kind=kind, fmt=fmt, eps=eps)


def wh_iou(wh1, wh2, eps: float = _EPS):
    """Elementwise (broadcast) IoU of zero-anchored (w, h) boxes: [..., 2] -> [...].

    Ref: detection/tools/IOU.py wh_iou (paired).
    """
    wh1 = jnp.asarray(wh1, jnp.float32)
    wh2 = jnp.asarray(wh2, jnp.float32)
    inter = jnp.minimum(wh1[..., 0], wh2[..., 0]) * jnp.minimum(wh1[..., 1], wh2[..., 1])
    union = wh1[..., 0] * wh1[..., 1] + wh2[..., 0] * wh2[..., 1] - inter + eps
    return inter / union


def wh_iou_matrix(wh1, wh2, eps: float = _EPS):
    """All-pairs wh-IoU: [N, 2] x [M, 2] -> [N, M]. Ref: IOU.py:158 (wh_iou_batch)."""
    return wh_iou(wh1[..., :, None, :], wh2[..., None, :, :], eps=eps)


# Convenience aliases mirroring the reference's public names
# (detection/tools/IOU.py cal_iou / cal_iou_batch dispatchers).
def cal_iou(box1, box2, mode: str = "xyxy", eps: float = _EPS):
    if mode == "wh":
        return wh_iou(box1, box2, eps=eps)
    return box_iou(box1, box2, kind="iou", fmt=mode, eps=eps)


def cal_iou_batch(box1, box2, mode: str = "xyxy", eps: float = _EPS):
    if mode == "wh":
        return wh_iou_matrix(box1, box2, eps=eps)
    return box_iou_matrix(box1, box2, kind="iou", fmt=mode, eps=eps)
