"""Eval throughput: device-matched vs host-matched mAP (VERDICT r4 #2).

Measures Detector.evaluate img/s over the bench JPEG fixture with the
per-image correct-matrix matching (a) inside the jitted program
(device_matching=True) and (b) on host numpy (the r3 path), same data,
same chip. Also re-verifies result equality on this run.

Run alone: python tools/probe_eval_matching.py
"""
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    import bench

    from fastvision_tpu.data import DetectionDataset
    from fastvision_tpu.infer import Detector
    from fastvision_tpu.models.detection import YOLOv3
    from fastvision_tpu.ops import COCO_ANCHORS

    root = bench._jpeg_fixture(256)
    # labels exist but are empty in the bench fixture; synthesize some GT
    # so the matcher has real work (2 boxes/img)
    import os

    lab_dir = os.path.join(root, "val", "labels")
    for f in sorted(os.listdir(lab_dir)):
        p = os.path.join(lab_dir, f)
        if os.path.getsize(p) == 0:
            with open(p, "w") as fh:
                fh.write("0 50 60 300 280\n5 320 100 600 400\n")

    anchors = COCO_ANCHORS.reshape(3, 3, 2)[::-1].astype(np.float32)
    model = YOLOv3(num_classes=80, dtype=jnp.bfloat16)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, 416, 416, 3), jnp.bfloat16), train=True)
    ds = DetectionDataset(root, "val")
    det = Detector(model, variables, anchors, input_size=416, batch_size=32,
                   dtype=jnp.bfloat16, input_format="i420", conf_thres=0.05)

    det.evaluate(ds, max_images=32)  # compile both paths + warm cache
    det.evaluate(ds, max_images=32, device_matching=False)

    out = {}
    r_dev = det.evaluate(ds)
    out["device_img_s"] = round(r_dev["img_per_sec"], 1)
    r_host = det.evaluate(ds, device_matching=False)
    out["host_img_s"] = round(r_host["img_per_sec"], 1)
    assert abs(r_dev["map50"] - r_host["map50"]) < 1e-7, (r_dev, r_host)
    out["map50_equal"] = True

    # host-side matching cost alone (no device in the loop): rematch the
    # same padded shapes in a tight numpy loop, as Detector.evaluate's
    # host path does per image
    from fastvision_tpu.ops.map import match_predictions

    rng = np.random.default_rng(0)
    pb = rng.uniform(0, 416, (300, 4)).astype(np.float32)
    pb[:, 2:] += pb[:, :2]
    pc = rng.integers(0, 80, 300).astype(np.float32)
    tb = rng.uniform(0, 416, (2, 4)).astype(np.float32)
    tb[:, 2:] += tb[:, :2]
    tc = np.asarray([0, 5], np.float32)
    thr = np.linspace(0.5, 0.95, 10)
    t0 = time.perf_counter()
    n = 512
    for _ in range(n):
        match_predictions(pb, pc, tb, tc, thr)
    out["host_match_img_s_alone"] = round(n / (time.perf_counter() - t0), 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
