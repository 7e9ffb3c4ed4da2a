"""Probe: jpeg->boxes vs the same-run H2D link ceiling (VERDICT r4 task 1).

Measures, in one process on the real chip:
  - h2d_MBps: raw link bandwidth (bench.h2d_bandwidth);
  - e2e img/s: Detector.predict_dataset over 256 COCO-like JPEGs
    (i420, two-stage prefetch: decode thread | transfer thread | compute);
  - ceiling_fraction = e2e / (h2d * 1MiB / 259,584 B-per-img-i420@416).

Run alone (1-core host: any concurrent python contaminates it):
    python tools/probe_overlap.py [--workers N]
"""
import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", type=int, default=None)
    ap.add_argument("--images", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    import bench

    from fastvision_tpu.models.detection import YOLOv3
    from fastvision_tpu.ops import COCO_ANCHORS

    anchors = COCO_ANCHORS.reshape(3, 3, 2)[::-1].astype(np.float32)
    model = YOLOv3(num_classes=80, dtype=jnp.bfloat16)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, 416, 416, 3), jnp.bfloat16), train=True)

    h2d = bench.h2d_bandwidth(jax, jnp)
    t0 = time.perf_counter()
    e2e = bench.jpeg_to_boxes(jax, jnp, model, variables, anchors,
                              n_images=args.images, num_workers=args.workers)
    wall = time.perf_counter() - t0
    # re-measure the link AFTER the e2e pass too: the shared tunnel's
    # ambient bandwidth drifts, and the ceiling should bracket the run
    h2d2 = bench.h2d_bandwidth(jax, jnp)
    i420_bytes = 416 * 416 * 3 // 2
    ceiling = max(h2d, h2d2) * 1024 * 1024 / i420_bytes
    print(json.dumps({
        "e2e_img_s": round(e2e, 1),
        "h2d_MBps_before": round(h2d, 1),
        "h2d_MBps_after": round(h2d2, 1),
        "ceiling_img_s": round(ceiling, 1),
        "ceiling_fraction": round(e2e / ceiling, 3),
        "wall_s": round(wall, 1),
    }))


if __name__ == "__main__":
    main()
