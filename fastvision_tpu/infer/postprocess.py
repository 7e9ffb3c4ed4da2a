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
