"""4-image mosaic augmentation (ref demos/yolov3_u/data_gen.py:176 Mosaic01,
applied in train __getitem__ :333-340).

Composites four (image, labels) samples around a random center into a
(size, size) canvas; labels are shifted/clipped in pixel xyxy. Host-side and
shape-dynamic by nature (SURVEY.md §7 hard parts) — output is fixed-size.
"""
from __future__ import annotations

import numpy as np


def mosaic4(
    samples: list[tuple[np.ndarray, np.ndarray]],
    size: int,
    rng: np.random.Generator,
    pad_value: int = 114,
    center_range: tuple[float, float] = (0.5, 1.5),
) -> tuple[np.ndarray, np.ndarray]:
    """samples: four (rgb uint8, [N,5] cls+xyxy) pairs -> (canvas, labels).

    The canvas is (2*size, 2*size) while compositing, then the center
    (size, size) window around the random mosaic center is NOT re-cropped —
    following the demo, we resize the 2x canvas down to (size, size).
    """
    assert len(samples) == 4
    import cv2

    s2 = size * 2
    canvas = np.full((s2, s2, 3), pad_value, np.uint8)
    cx = int(rng.uniform(*center_range) * size)
    cy = int(rng.uniform(*center_range) * size)
    all_labels = []
    for i, (img, labels) in enumerate(samples):
        h, w = img.shape[:2]
        scale = size / max(h, w)
        img = cv2.resize(img, (round(w * scale), round(h * scale)))
        h, w = img.shape[:2]
        if i == 0:  # top-left of center
            x1, y1 = max(cx - w, 0), max(cy - h, 0)
            x2, y2 = cx, cy
        elif i == 1:  # top-right
            x1, y1 = cx, max(cy - h, 0)
            x2, y2 = min(cx + w, s2), cy
        elif i == 2:  # bottom-left
            x1, y1 = max(cx - w, 0), cy
            x2, y2 = cx, min(cy + h, s2)
        else:  # bottom-right
            x1, y1 = cx, cy
            x2, y2 = min(cx + w, s2), min(cy + h, s2)
        cw, ch = x2 - x1, y2 - y1
        if cw <= 0 or ch <= 0:
            continue
        # take the matching window from the source image (anchored at the
        # corner that touches the center point)
        sx = w - cw if i in (0, 2) else 0
        sy = h - ch if i in (0, 1) else 0
        canvas[y1:y2, x1:x2] = img[sy : sy + ch, sx : sx + cw]
        if labels is not None and len(labels):
            lab = labels.copy().astype(np.float32)
            lab[:, 1:5] *= scale
            lab[:, [1, 3]] += x1 - sx
            lab[:, [2, 4]] += y1 - sy
            all_labels.append(lab)

    if all_labels:
        labels = np.concatenate(all_labels, axis=0)
        labels[:, [1, 3]] = np.clip(labels[:, [1, 3]], 0, s2)
        labels[:, [2, 4]] = np.clip(labels[:, [2, 4]], 0, s2)
        keep = (labels[:, 3] - labels[:, 1] > 2) & (labels[:, 4] - labels[:, 2] > 2)
        labels = labels[keep]
    else:
        labels = np.zeros((0, 5), np.float32)

    canvas = cv2.resize(canvas, (size, size))
    labels[:, 1:5] /= 2.0
    return canvas, labels
