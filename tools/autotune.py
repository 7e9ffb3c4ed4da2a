"""On-chip config autotuner: find the fastest (batch_size, pre_nms_top_k)
for the jitted inference program, and the serving bucket set it implies.

The fixed-shape programs this framework compiles (SURVEY.md build
principles) mean throughput is a STEP function of batch size and the
pre-NMS top-K — the right values depend on the chip generation and the
model, not on taste. The sweep in docs/PERF.md (bs32/K1024 778 img/s ->
bs256/K256 1825 img/s on v5e) was done by hand in round 2; this tool
automates it so a deployment re-derives the numbers on ITS hardware in
one command:

    python tools/autotune.py [--model yolov3] [--input-size 416] \
        [--classes 80] [--iters 6] [--out tuned.json]

Prints one JSON line: per-point img/s, the chosen config, and the
serving `batch_buckets` suggestion (largest power-of-two ladder under
the chosen batch). Measurement protocol per docs/PERF.md: sync via a
SMALL device fetch (block_until_ready returns early on relay backends);
one measurement at a time (never run this concurrently with other jobs).
"""
import argparse
import json
import time

import numpy as np


def measure(jax, jnp, model, variables, anchors, B, K, S, iters):
    from fastvision_tpu.infer import decode_predictions
    from fastvision_tpu.ops import batched_non_max_suppression

    @jax.jit
    def infer(v, images):
        heads = model.apply(v, images, train=False)
        pred = decode_predictions(heads, anchors, (32, 16, 8), "v5")
        return batched_non_max_suppression(
            pred, conf_thres=0.25, iou_thres=0.45, max_det=300,
            pre_nms_top_k=K,
        )

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (B, S, S, 3)), jnp.bfloat16)
    try:
        det = infer(variables, images)  # compile
        np.asarray(det.valid)
        t0 = time.perf_counter()
        for _ in range(iters):
            det = infer(variables, images)
        np.asarray(det.valid)  # small fetch = real sync (docs/PERF.md)
        return B * iters / (time.perf_counter() - t0)
    except Exception as e:  # noqa: BLE001 — OOM at large B is expected data
        msg = str(e).splitlines()[0][:120]
        print(f"# bs{B}/K{K}: {msg}")
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input-size", type=int, default=416)
    ap.add_argument("--classes", type=int, default=80)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--batches", type=int, nargs="*",
                    default=[32, 64, 128, 256, 512])
    ap.add_argument("--topk", type=int, nargs="*", default=[1024, 512, 256])
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fastvision_tpu.models.detection import YOLOv3
    from fastvision_tpu.ops import COCO_ANCHORS

    S = args.input_size
    anchors = COCO_ANCHORS.reshape(3, 3, 2)[::-1].astype(np.float32)
    model = YOLOv3(num_classes=args.classes, dtype=jnp.bfloat16)
    variables = model.init(jax.random.key(0), jnp.zeros((1, S, S, 3), jnp.bfloat16),
                           train=True)

    points = {}
    best = (0.0, None)
    # Sweep coarse-to-fine: batch first at the middle K, then refine K at
    # the winning batch — 8 compiles instead of |B|x|K|.
    k_mid = args.topk[len(args.topk) // 2]
    for B in args.batches:
        ips = measure(jax, jnp, model, variables, anchors, B, k_mid, S, args.iters)
        points[f"bs{B}_K{k_mid}"] = round(ips, 1) if ips else None
        if ips and ips > best[0]:
            best = (ips, (B, k_mid))
        if ips is None:  # OOM: larger batches will too
            break
    if best[1] is None:
        raise SystemExit(
            "autotune: every batch point failed (see '# bs.../K...' lines "
            "above) — backend down or OOM even at the smallest batch; "
            "retry with --batches 8 16")
    B_star = best[1][0]
    for K in args.topk:
        if K == k_mid:
            continue
        ips = measure(jax, jnp, model, variables, anchors, B_star, K, S, args.iters)
        points[f"bs{B_star}_K{K}"] = round(ips, 1) if ips else None
        if ips and ips > best[0]:
            best = (ips, (B_star, K))

    B_star, K_star = best[1]
    buckets = []
    b = 1
    while b < min(B_star, 8):  # small-request ladder for serving
        buckets.append(b)
        b *= 2
    out = {
        "img_s": round(best[0], 1),
        "batch_size": B_star,
        "pre_nms_top_k": K_star,
        "batch_buckets": buckets,
        "points": points,
        "config": {
            "data.batch_size": B_star,
            "nms.pre_nms_top_k": K_star,
        },
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
