"""Synthetic 'shapes' detection dataset in the fastvision on-disk format.

Generates images of filled shapes (class 0 = rectangle, 1 = circle,
2 = triangle) on a textured background, with `labels/<id>.txt` rows
`class xmin ymin xmax ymax` in pixel coords — the same data contract the
reference's converters emit (datasets/detection_dataloader.py:105-118).

Used by examples/toy_convergence.py to prove the FULL train->eval loop
(real CLI path: train with mosaic+EMA, eval with NMS+mAP) converges on
TPU — the reference's de-facto QA is exactly this kind of end-to-end
train/eval run (demos/yolov3_u/metric.txt, demos/faster_rcnn/README.md).

    python examples/toy_shapes.py --out /tmp/toy_shapes --n-train 300 --n-val 60
"""
from __future__ import annotations

import argparse
import os

import numpy as np

CLASSES = ("rectangle", "circle", "triangle")
# fixed per-class fill colors keep the task easy (color + shape cues)
_COLORS = ((220, 60, 50), (60, 200, 80), (70, 90, 230))


def _draw_sample(rng: np.random.Generator, size: int, max_shapes: int):
    import cv2

    img = rng.integers(90, 150, (size, size, 3), np.uint8)
    img = cv2.GaussianBlur(img, (7, 7), 0)
    n = int(rng.integers(1, max_shapes + 1))
    boxes = []
    for _ in range(n):
        cls = int(rng.integers(0, len(CLASSES)))
        s = int(rng.integers(size // 8, size // 3))  # shape extent
        x1 = int(rng.integers(0, size - s))
        y1 = int(rng.integers(0, size - s))
        x2, y2 = x1 + s, y1 + s
        # reject heavy overlap with existing boxes so GT stays unambiguous
        ok = True
        for _, bx1, by1, bx2, by2 in boxes:
            ix = max(0, min(x2, bx2) - max(x1, bx1))
            iy = max(0, min(y2, by2) - max(y1, by1))
            if ix * iy > 0.3 * s * s:
                ok = False
                break
        if not ok:
            continue
        color = tuple(int(c + rng.integers(-25, 26)) for c in _COLORS[cls])
        if cls == 0:
            cv2.rectangle(img, (x1, y1), (x2, y2), color, -1)
        elif cls == 1:
            r = s // 2
            cv2.circle(img, (x1 + r, y1 + r), r, color, -1)
        else:
            pts = np.array(
                [[x1 + s // 2, y1], [x1, y2], [x2, y2]], np.int32
            )
            cv2.fillConvexPoly(img, pts, color)
        boxes.append((cls, x1, y1, x2, y2))
    return img, boxes


def generate(
    root: str,
    n_train: int = 300,
    n_val: int = 60,
    size: int = 320,
    max_shapes: int = 3,
    seed: int = 0,
) -> str:
    """Write the dataset under `root`; returns `root`."""
    import cv2

    rng = np.random.default_rng(seed)
    for split, n in (("train", n_train), ("val", n_val)):
        img_dir = os.path.join(root, split, "images")
        lbl_dir = os.path.join(root, split, "labels")
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(lbl_dir, exist_ok=True)
        for i in range(n):
            img, boxes = _draw_sample(rng, size, max_shapes)
            cv2.imwrite(os.path.join(img_dir, f"{split}_{i:05d}.jpg"),
                        cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                        [cv2.IMWRITE_JPEG_QUALITY, 95])
            with open(os.path.join(lbl_dir, f"{split}_{i:05d}.txt"), "w") as f:
                for cls, x1, y1, x2, y2 in boxes:
                    f.write(f"{cls} {x1} {y1} {x2} {y2}\n")
    return root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-train", type=int, default=300)
    ap.add_argument("--n-val", type=int, default=60)
    ap.add_argument("--size", type=int, default=320)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    generate(args.out, args.n_train, args.n_val, args.size, seed=args.seed)
    print(f"wrote {args.n_train}+{args.n_val} images under {args.out}")


if __name__ == "__main__":
    main()
