"""Turnkey COCO parity fixture builder (VERDICT r4 task 3).

The reference's anchor correctness number is COCO-val mAP@0.5 = 0.5136 at
input 640 / conf .25 / iou .45 with the ultralytics-converted YOLOv3
checkpoint (/root/reference/demos/yolov3_u/metric.txt:1-3). This script
makes that number reproducible by ONE command the day data + checkpoint
exist on a host:

  1. converts any COCO-format directory (instances json + images — the
     full val2017 or any subset) into the fastvision on-disk layout;
  2. writes a ready-to-run coco.yaml config pointing at it, with the
     parity-correct knobs (fixed pixel anchors, pad 114, 80 classes);
  3. validates the ultralytics checkpoint import end-to-end when given
     --ckpt: every imported tensor must land (apply_import reports
     unmatched keys), and a 2-image smoke eval must produce finite boxes.

Usage:
    python tools/make_parity_fixture.py \
        --ann instances_val2017.json --images val2017/ \
        --out /data/coco_fv [--ckpt yolov3_u.pt] [--subset 500]

Then the parity runbook (docs/PARITY.md "Real-data mAP parity"):
    python -m fastvision_tpu eval --config /data/coco_fv/coco.yaml \
        --metric-file metric.txt data.input_size=640
"""
import argparse
import json
import os
import sys


def build_fixture(ann: str, images: str, out: str, subset: int | None) -> str:
    from fastvision_tpu.data import coco_to_fastvision
    from fastvision_tpu.data.class_names import COCO_CLASSES

    if subset:
        with open(ann) as f:
            coco = json.load(f)
        keep = {im["id"] for im in coco["images"][:subset]}
        coco["images"] = [im for im in coco["images"] if im["id"] in keep]
        coco["annotations"] = [a for a in coco["annotations"]
                               if a["image_id"] in keep]
        ann = os.path.join(out, "_subset.json")
        os.makedirs(out, exist_ok=True)
        with open(ann, "w") as f:
            json.dump(coco, f)
    n = coco_to_fastvision(ann, images, out, split="val")
    print(f"converted {n} images -> {out}/val/{{images,labels}}")

    cfg_path = os.path.join(out, "coco.yaml")
    with open(cfg_path, "w") as f:
        import yaml

        yaml.safe_dump({
            "data": {
                "data_root": out,
                "num_classes": 80,
                "categories": list(COCO_CLASSES),
                "input_size": 640,
                "batch_size": 32,
            },
            "model": {
                "name": "yolov3",
                "num_classes": 80,
                # parity-critical: the ultralytics weights assume the
                # canonical COCO pixel anchors at ANY input size
                "scale_anchors_with_input": False,
            },
            "nms": {"conf_thres": 0.25, "iou_thres": 0.45, "max_det": 300},
        }, f, sort_keys=False)
    print(f"wrote {cfg_path}")
    return cfg_path


def validate_ckpt(ckpt: str, out: str, cfg_path: str) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fastvision_tpu.core.checkpoint import load_torch_state
    from fastvision_tpu.data import DetectionDataset
    from fastvision_tpu.infer import Detector
    from fastvision_tpu.models.detection import YOLOv3
    from fastvision_tpu.models.import_torch import apply_import, yolov3_from_torch
    from fastvision_tpu.ops import COCO_ANCHORS

    state = load_torch_state(ckpt)
    imported = yolov3_from_torch(state)
    model = YOLOv3(num_classes=80, dtype=jnp.bfloat16)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, 640, 640, 3), jnp.bfloat16), train=True)
    variables = apply_import(dict(variables), imported)  # prints unmatched
    anchors = COCO_ANCHORS.reshape(3, 3, 2)[::-1].astype(np.float32)
    det = Detector(model, variables, anchors, input_size=640, batch_size=2,
                   dtype=jnp.bfloat16)
    ds = DetectionDataset(out, "val")
    res = det.evaluate(ds, max_images=2)
    if not np.isfinite(res["map50"]):
        raise SystemExit("smoke eval produced non-finite mAP")
    print(f"ckpt import OK; 2-image smoke eval map50={res['map50']:.3f}")
    print("Full parity run:")
    print(f"  python -m fastvision_tpu eval --config {cfg_path} "
          f"--metric-file metric.txt model.pretrained={ckpt}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ann", required=True, help="COCO instances json")
    ap.add_argument("--images", required=True, help="COCO images directory")
    ap.add_argument("--out", required=True, help="fixture output directory")
    ap.add_argument("--ckpt", default="", help="ultralytics yolov3 .pt to validate")
    ap.add_argument("--subset", type=int, default=0,
                    help="convert only the first N images (quick fixtures)")
    args = ap.parse_args()

    cfg_path = build_fixture(args.ann, args.images, args.out,
                             args.subset or None)
    if args.ckpt:
        validate_ckpt(args.ckpt, args.out, cfg_path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
