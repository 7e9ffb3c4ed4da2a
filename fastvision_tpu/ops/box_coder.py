"""Box delta encoding/decoding for two-stage detectors (Faster R-CNN).

Standard (dx, dy, dw, dh) parameterization between reference boxes
(anchors/proposals) and targets, with per-coordinate normalization weights
— the reference normalizes Fast-head targets by mean 0 / std
(0.1, 0.1, 0.2, 0.2) (demos/faster_rcnn/models/fast.py:189-191).
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-7


def encode_boxes(reference_xyxy, target_xyxy, weights=(1.0, 1.0, 1.0, 1.0)):
    """xyxy reference + target -> normalized deltas [..., 4]."""
    rx = (reference_xyxy[..., 0] + reference_xyxy[..., 2]) / 2
    ry = (reference_xyxy[..., 1] + reference_xyxy[..., 3]) / 2
    rw = jnp.maximum(reference_xyxy[..., 2] - reference_xyxy[..., 0], _EPS)
    rh = jnp.maximum(reference_xyxy[..., 3] - reference_xyxy[..., 1], _EPS)
    tx = (target_xyxy[..., 0] + target_xyxy[..., 2]) / 2
    ty = (target_xyxy[..., 1] + target_xyxy[..., 3]) / 2
    tw = jnp.maximum(target_xyxy[..., 2] - target_xyxy[..., 0], _EPS)
    th = jnp.maximum(target_xyxy[..., 3] - target_xyxy[..., 1], _EPS)
    wx, wy, ww, wh = weights
    return jnp.stack(
        [
            (tx - rx) / rw / wx,
            (ty - ry) / rh / wy,
            jnp.log(tw / rw) / ww,
            jnp.log(th / rh) / wh,
        ],
        axis=-1,
    )


def decode_boxes(reference_xyxy, deltas, weights=(1.0, 1.0, 1.0, 1.0),
                 clip_exp=4.0, wh_from_dw=False):
    """Deltas back to xyxy (exp clamped for stability).

    `wh_from_dw=True` selects reference-checkpoint-compatible decoding: the
    reference decodes BOTH w and h from the dw channel (its dxdydwdh2xywh
    uses exp(d[...,2]) twice — demos/faster_rcnn/models/rpn.py:116-117 and
    fast.py:98-99 — so heads trained by the reference never learn a usable
    dh at inference). Imported reference checkpoints need this flag; our
    own training uses the standard 4-channel decode (default)."""
    rx = (reference_xyxy[..., 0] + reference_xyxy[..., 2]) / 2
    ry = (reference_xyxy[..., 1] + reference_xyxy[..., 3]) / 2
    rw = jnp.maximum(reference_xyxy[..., 2] - reference_xyxy[..., 0], _EPS)
    rh = jnp.maximum(reference_xyxy[..., 3] - reference_xyxy[..., 1], _EPS)
    wx, wy, ww, wh = weights
    cx = deltas[..., 0] * wx * rw + rx
    cy = deltas[..., 1] * wy * rh + ry
    dh = deltas[..., 2] * ww if wh_from_dw else deltas[..., 3] * wh
    w = jnp.exp(jnp.clip(deltas[..., 2] * ww, -clip_exp, clip_exp)) * rw
    h = jnp.exp(jnp.clip(dh, -clip_exp, clip_exp)) * rh
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)
