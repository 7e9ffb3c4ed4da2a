"""End-to-end toy convergence for the CLASSIFICATION and VIDEO families.

Completes the per-family e2e story next to examples/toy_convergence.py
(detection). Classification: shape images (folder-per-class layout,
ClassificationDataset contract) through the REAL CLI `train-cls` path
(ResNet-18, warmup-cosine, flip aug). Video: clips whose ONLY class cue is
the motion direction of an identical white square (right / down /
diagonal) — appearance is useless, so better-than-chance accuracy proves
the temporal stack (3D convs + frame sampler) actually learns motion.
Mirrors the reference's videoRecognition/ + classfication/ usage
(SURVEY.md §2.3) the same way toy_convergence.py mirrors its detectors.

    python examples/toy_cls_video.py --out /tmp/toy_cv
    python examples/toy_cls_video.py --out /tmp/toy_cv --family cls
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)
sys.path.insert(0, os.path.dirname(_HERE))

CLS_CLASSES = ("rectangle", "circle", "triangle")
_COLORS = ((220, 60, 50), (60, 200, 80), (70, 90, 230))
MOTIONS = ("right", "down", "diag")


def _shape_image(rng, size, cls):
    import cv2

    img = rng.integers(90, 150, (size, size, 3), np.uint8)
    img = cv2.GaussianBlur(img, (7, 7), 0)
    s = int(rng.integers(size // 3, int(size // 1.8)))
    x1 = int(rng.integers(0, size - s))
    y1 = int(rng.integers(0, size - s))
    color = tuple(int(c + rng.integers(-25, 26)) for c in _COLORS[cls])
    if cls == 0:
        cv2.rectangle(img, (x1, y1), (x1 + s, y1 + s), color, -1)
    elif cls == 1:
        cv2.circle(img, (x1 + s // 2, y1 + s // 2), s // 2, color, -1)
    else:
        pts = np.array([(x1 + s // 2, y1), (x1, y1 + s), (x1 + s, y1 + s)])
        cv2.fillPoly(img, [pts], color)
    return img


def generate_cls(root, n_train=120, n_val=30, size=64, seed=0):
    import cv2

    rng = np.random.default_rng(seed)
    for split, n in (("train", n_train), ("val", n_val)):
        for ci, name in enumerate(CLS_CLASSES):
            d = os.path.join(root, split, name)
            os.makedirs(d, exist_ok=True)
            for i in range(n):
                cv2.imwrite(os.path.join(d, f"{i:04d}.jpg"),
                            cv2.cvtColor(_shape_image(rng, size, ci),
                                         cv2.COLOR_RGB2BGR))


def generate_video(root, n_train=30, n_val=10, size=64, frames=12, seed=0):
    """Identical white square; class = motion direction only."""
    import cv2

    rng = np.random.default_rng(seed)
    step = size // (frames + 4)
    for split, n in (("train", n_train), ("val", n_val)):
        for ci, name in enumerate(MOTIONS):
            d = os.path.join(root, split, name)
            os.makedirs(d, exist_ok=True)
            for i in range(n):
                path = os.path.join(d, f"{i:04d}.avi")
                w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"),
                                    10, (size, size))
                s = size // 5
                x = int(rng.integers(0, size // 3))
                y = int(rng.integers(0, size // 3))
                dx, dy = {"right": (step, 0), "down": (0, step),
                          "diag": (step, step)}[name]
                for _ in range(frames):
                    frame = rng.integers(60, 90, (size, size, 3), np.uint8)
                    cv2.rectangle(frame, (x, y), (min(x + s, size - 1),
                                                  min(y + s, size - 1)),
                                  (255, 255, 255), -1)
                    w.write(frame)
                    x, y = x + dx, y + dy
                w.release()


def run_cls(out, epochs=8, size=64, batch_size=16, lr=5e-3):
    from fastvision_tpu.cli import main as cli

    root = os.path.join(out, "cls_data")
    if not os.path.isdir(os.path.join(root, "train")):
        generate_cls(root, size=size)
    ckpt = os.path.abspath(os.path.join(out, "ckpt_cls"))
    cli([
        "train-cls",
        f"data.data_root={root}", f"data.input_size={size}",
        f"data.batch_size={batch_size}", "data.num_classes=3",
        "model.num_classes=3", "model.backbone=resnet18",
        f"train.ckpt_dir={ckpt}", f"train.epochs={epochs}",
        f"train.lr={lr}", "train.final_lr=1e-5", "train.warmup_epochs=1",
        "train.optimizer=sgd", "train.eval_every=2",
        "train.save_every_epoch=false",
    ])
    return _last_metric(os.path.join(ckpt, "train.jsonl"), "accuracy")


def run_video(out, epochs=14, size=64, frames=8, batch_size=8, lr=1e-2,
              model_name="resnet18_3d"):
    """Video convergence through the REAL CLI `train-video` path
    (VideoFolderDataset + VideoClipLoader + frame sampler)."""
    from fastvision_tpu.cli import main as cli

    root = os.path.join(out, "video_data")
    if not os.path.isdir(os.path.join(root, "train")):
        generate_video(root, size=size)
    ckpt = os.path.abspath(os.path.join(out, "ckpt_video"))
    cli([
        "train-video",
        f"data.data_root={root}", f"data.input_size={size}",
        f"data.batch_size={batch_size}", "data.num_classes=3",
        f"data.num_frames={frames}", "data.frame_strategy=average",
        "model.num_classes=3", f"model.backbone={model_name}",
        f"train.ckpt_dir={ckpt}", f"train.epochs={epochs}",
        f"train.lr={lr}", "train.final_lr=1e-4", "train.warmup_epochs=1",
        "train.optimizer=sgd", "train.eval_every=2",
        "train.save_every_epoch=false",
    ])
    return _last_metric(os.path.join(ckpt, "train.jsonl"), "accuracy")


def _last_metric(jsonl, key):
    best = None
    with open(jsonl) as f:
        for line in f:
            rec = json.loads(line)
            if key in rec:
                best = float(rec[key]) if best is None else max(best, float(rec[key]))
    if best is None:
        raise RuntimeError(f"no {key!r} records in {jsonl}")
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/toy_cv")
    ap.add_argument("--family", choices=["cls", "video", "both"], default="both")
    ap.add_argument("--cls-target", type=float, default=0.9)
    ap.add_argument("--video-target", type=float, default=0.7)
    args = ap.parse_args()

    results = {}
    if args.family in ("cls", "both"):
        results["cls_accuracy"] = run_cls(args.out)
    if args.family in ("video", "both"):
        results["video_accuracy"] = run_video(args.out)
    print(json.dumps(results))
    with open(os.path.join(args.out, "convergence.json"), "a") as f:
        f.write(json.dumps(results) + "\n")
    ok = True
    if "cls_accuracy" in results and results["cls_accuracy"] < args.cls_target:
        print(f"FAIL cls: {results['cls_accuracy']:.3f} < {args.cls_target}")
        ok = False
    if "video_accuracy" in results and results["video_accuracy"] < args.video_target:
        print(f"FAIL video: {results['video_accuracy']:.3f} < {args.video_target}")
        ok = False
    if not ok:
        sys.exit(1)
    print("OK:", results)


if __name__ == "__main__":
    main()
