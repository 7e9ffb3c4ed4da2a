"""Inference postprocessing: map letterboxed-space boxes back to the
original image (ref demos/yolov3_u/inference.py:92-109 unpad/unscale and
customize_service.py:184-197 scale_coords)."""
from __future__ import annotations

import numpy as np


def scale_coords(
    boxes_xyxy: np.ndarray,
    scale,
    pad: tuple[int, int],
    orig_hw: tuple[int, int],
) -> np.ndarray:
    """Boxes in letterboxed input space -> original-image pixels, clipped.

    `scale` is a scalar, or an (sx, sy) pair when the preprocess chain had
    anisotropic steps (reduced JPEG decode rounds h and w independently)."""
    boxes = np.asarray(boxes_xyxy, np.float32).reshape(-1, 4).copy()
    px, py = pad
    sx, sy = (scale, scale) if np.isscalar(scale) else scale
    boxes[:, [0, 2]] = (boxes[:, [0, 2]] - px) / sx
    boxes[:, [1, 3]] = (boxes[:, [1, 3]] - py) / sy
    h, w = orig_hw
    boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, w)
    boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, h)
    return boxes


def reference_demo_unscale(
    pred,
    ratio: float,
    pad_left: float,
    pad_top: float,
    ori_w: int,
    ori_h: int,
    min_wh: float = 5.0,
):
    """Demo-exact unscale to ORIGINAL pixels, before NMS (jittable).

    Replicates demos/yolov3_u/inference.py:92-115 exactly: xywh unscale
    (unpad + /ratio), clamp cx/cy to [0, ori-1] and w/h to [0, ori],
    drop boxes with w or h <= min_wh ORIGINAL pixels, convert to xyxy,
    clamp corners to [0, ori-1]. Dropped rows get objectness -1 so the
    NMS conf filter removes them (fixed shapes). Output rows:
    (x1, y1, x2, y2, obj, cls...) — feed `non_max_suppression` with
    box_format='xyxy' and score_mode='obj' for the demo's full chain.
    """
    import jax.numpy as jnp

    cx = jnp.clip((pred[:, 0] - pad_left) / ratio, 0, ori_w - 1)
    cy = jnp.clip((pred[:, 1] - pad_top) / ratio, 0, ori_h - 1)
    w = jnp.clip(pred[:, 2] / ratio, 0, ori_w)
    h = jnp.clip(pred[:, 3] / ratio, 0, ori_h)
    keep = (w > min_wh) & (h > min_wh)
    x1 = jnp.clip(cx - w / 2, 0, ori_w - 1)
    y1 = jnp.clip(cy - h / 2, 0, ori_h - 1)
    x2 = jnp.clip(cx + w / 2, 0, ori_w - 1)
    y2 = jnp.clip(cy + h / 2, 0, ori_h - 1)
    obj = jnp.where(keep, pred[:, 4], -1.0)
    return jnp.concatenate(
        [jnp.stack([x1, y1, x2, y2, obj], axis=1), pred[:, 5:]], axis=1
    )


def detections_to_original(det, meta: dict, index: int | None = None) -> dict:
    """ops.nms.Detections (+batch index) + preprocess meta -> numpy dict
    {boxes, scores, classes} in original-image pixels, padding stripped."""
    if index is not None:
        boxes = np.asarray(det.boxes[index])
        scores = np.asarray(det.scores[index])
        classes = np.asarray(det.classes[index])
        valid = np.asarray(det.valid[index])
    else:
        boxes, scores, classes, valid = map(
            np.asarray, (det.boxes, det.scores, det.classes, det.valid)
        )
    boxes = scale_coords(boxes[valid], meta["scale"], meta["pad"], meta["orig_hw"])
    return {"boxes": boxes, "scores": scores[valid], "classes": classes[valid]}
