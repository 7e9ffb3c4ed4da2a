"""Headline benchmark: YOLOv3-416 end-to-end inference throughput on one chip.

Matches BASELINE.json's metric: "YOLOv3-416 COCO-val images/sec/chip e2e
(decode+NMS)". One jitted XLA program covers forward (bf16, NHWC, MXU) +
v5 decode + fixed-size class-aware NMS.

Baseline for `vs_baseline`: the north star is >= 2x A100 img/s/chip
(BASELINE.json). The reference publishes no inference throughput; we use an
A100 estimate of 250 img/s for batched PyTorch fp16 YOLOv3-416 e2e with NMS
(~4 ms/img), so vs_baseline = value / 250. The reference's only measured
number is training: ~21 img/s/GPU (BASELINE.md, bs32 @608 on 2 GPUs).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from fastvision_tpu.infer import decode_predictions
    from fastvision_tpu.models.detection import YOLOv3
    from fastvision_tpu.ops import COCO_ANCHORS, batched_non_max_suppression

    # batch/pre-NMS sweep on v5e: bs32/K1024 778 -> bs64/K512 1286 ->
    # bs128/K512 1610 img/s; K=512 keeps >500 candidates per image above
    # conf 0.25 — no mAP impact at max_det 300.
    B, S, C = 128, 416, 80
    anchors = jnp.asarray(COCO_ANCHORS.reshape(3, 3, 2)[::-1].copy())
    model = YOLOv3(num_classes=C, dtype=jnp.bfloat16)
    init_x = jnp.zeros((B, S, S, 3), jnp.bfloat16)
    variables = model.init(jax.random.key(0), init_x, train=True)

    @jax.jit
    def infer(v, images):
        heads = model.apply(v, images, train=False)
        pred = decode_predictions(heads, anchors, (32, 16, 8), "v5")
        return batched_non_max_suppression(
            pred.astype(jnp.float32), conf_thres=0.25, iou_thres=0.45,
            max_det=300, pre_nms_top_k=512,
        )

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (B, S, S, 3)), jnp.bfloat16)

    det = jax.block_until_ready(infer(variables, images))  # compile
    # timed steady-state
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        det = infer(variables, images)
    jax.block_until_ready(det.boxes)
    dt = (time.perf_counter() - t0) / iters
    ips = B / dt

    print(json.dumps({
        "metric": "YOLOv3-416 e2e images/sec/chip (fwd+decode+NMS, bf16, bs128)",
        "value": round(ips, 1),
        "unit": "img/s/chip",
        "vs_baseline": round(ips / 250.0, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
