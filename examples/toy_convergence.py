"""End-to-end toy convergence: the framework's integration test on real HW.

Drives the REAL CLI path (fastvision_tpu.cli.main) over a synthetic shapes
dataset (examples/toy_shapes.py): train YOLOv3 (mosaic + EMA + warmup-cosine)
and Faster R-CNN (step decay + grad clip), then eval mAP@0.5 through the
full NMS+metric stack. Mirrors the reference's de-facto QA — train a model,
record its mAP (demos/yolov3_u/metric.txt:1-3, demos/faster_rcnn/README.md
results table) — which component-level parity tests cannot replace:
decode/loss/anchor mismatches only show up in a convergence run.

    python examples/toy_convergence.py --model yolov3 --out /tmp/toy_run
    python examples/toy_convergence.py --model faster_rcnn --out /tmp/toy_run

Pass --target to fail the process unless mAP@0.5 meets it (default 0.9).
Recorded results live in docs/PARITY.md ("End-to-end convergence").
"""
from __future__ import annotations

import argparse
import json
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)  # toy_shapes
sys.path.insert(0, os.path.dirname(_HERE))  # repo root (fastvision_tpu)

from toy_shapes import generate  # noqa: E402


def run(model: str, out: str, epochs: int, batch_size: int, lr: float,
        n_train: int, n_val: int, input_size: int, seed: int = 0,
        eval_every: int = 0) -> dict:
    from fastvision_tpu.cli import main as cli

    data_root = os.path.join(out, "data")
    ckpt_dir = os.path.abspath(os.path.join(out, f"ckpt_{model}"))
    if not os.path.exists(os.path.join(data_root, "train", "images")):
        generate(data_root, n_train=n_train, n_val=n_val, size=input_size,
                 seed=seed)

    common = [
        f"data.data_root={data_root}",
        f"data.input_size={input_size}",
        f"data.batch_size={batch_size}",
        "data.max_boxes=8",
        "data.num_classes=3",
        "model.num_classes=3",
        f"train.ckpt_dir={ckpt_dir}",
        f"train.seed={seed}",
    ]
    if model == "yolov3":
        train_over = [
            f"train.epochs={epochs}", f"train.lr={lr}",
            "train.final_lr=1e-4", "train.warmup_epochs=2",
            "train.optimizer=sgd", "train.ema_decay=0.99",
            "train.no_aug_epochs=2",
            f"train.eval_every={eval_every or max(epochs // 4, 1)}",
            "train.save_every_epoch=false",
        ]
    elif model == "faster_rcnn":
        train_over = [
            "model.name=faster_rcnn",
            # toy shapes are 40-106 px; stride-16 anchors need small scales
            "model.anchor_scales=[2,4,6]",
            "nms.conf_thres=0.05",
            f"train.epochs={epochs}", f"train.lr={lr}",
            "train.optimizer=sgd", "train.grad_clip_norm=10.0",
            f"train.eval_every={eval_every or max(epochs // 4, 1)}",
            "train.save_every_epoch=false",
        ]
    else:
        raise SystemExit(f"unknown model {model!r}")

    cli(["train", *common, *train_over])

    # eval through the real CLI (restores best/EMA weights from ckpt_dir)
    metric_file = os.path.join(out, f"metric_{model}.txt")
    argv = ["eval", "--ckpt", ckpt_dir, "--metric-file", metric_file,
            *common]
    if model == "faster_rcnn":
        # CLI eval path is YOLO-specific; Faster R-CNN reports via the
        # in-train evaluator — read the last eval from the train log instead
        results = _last_eval(os.path.join(ckpt_dir, "train.jsonl"))
    else:
        cli(argv)
        results = _parse_metric_file(metric_file)
    return results


def _last_eval(metrics_jsonl: str) -> dict:
    last = {}
    with open(metrics_jsonl) as f:
        for line in f:
            rec = json.loads(line)
            if "map50" in rec:
                last = rec
    if not last:
        raise RuntimeError(f"no eval records in {metrics_jsonl}")
    return {"map50": float(last["map50"]), "map": float(last.get("map", 0.0))}


def _parse_metric_file(path: str) -> dict:
    """Parse Detector.evaluate's metric table (infer/predictor.py:288-291):
    a '# note' line, a header line, then 'v v v ... | map' data rows."""
    rows = []
    with open(path) as f:
        for line in f:
            if "|" in line and not line.lstrip().startswith(("#", "mAP")):
                per_iou, _, overall = line.partition("|")
                vals = [float(v) for v in per_iou.split()]
                rows.append({"map50": vals[0], "map": float(overall)})
    if not rows:
        raise RuntimeError(f"no data rows in {path}")
    return rows[-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=["yolov3", "faster_rcnn"],
                    default="yolov3")
    ap.add_argument("--out", default="/tmp/toy_run")
    ap.add_argument("--epochs", type=int, default=0,
                    help="0 = per-model default")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=0.0)
    ap.add_argument("--n-train", type=int, default=300)
    ap.add_argument("--n-val", type=int, default=60)
    ap.add_argument("--input-size", type=int, default=320)
    ap.add_argument("--target", type=float, default=0.9,
                    help="required mAP@0.5; exit 1 below it")
    args = ap.parse_args()

    epochs = args.epochs or {"yolov3": 40, "faster_rcnn": 20}[args.model]
    lr = args.lr or {"yolov3": 1e-2, "faster_rcnn": 1e-2}[args.model]
    res = run(args.model, args.out, epochs, args.batch_size, lr,
              args.n_train, args.n_val, args.input_size)
    line = json.dumps({"model": args.model, **res, "target": args.target})
    print(line)
    with open(os.path.join(args.out, "convergence.json"), "a") as f:
        f.write(line + "\n")
    if res["map50"] < args.target:
        print(f"FAIL: mAP@0.5 {res['map50']:.4f} < {args.target}")
        sys.exit(1)
    print(f"OK: mAP@0.5 {res['map50']:.4f} >= {args.target}")


if __name__ == "__main__":
    main()
