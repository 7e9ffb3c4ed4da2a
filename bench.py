"""Headline benchmark: YOLOv3-416 jpeg->boxes throughput, decomposed.

Matches BASELINE.json's metric as WRITTEN: "YOLOv3-416 COCO-val
images/sec/chip e2e (decode+NMS)" — the headline `value` is
Detector.predict_dataset from JPEG files on disk (process-parallel host
decode -> letterbox -> i420 H2D -> one jitted forward+v5-decode+NMS
program -> unscale), COCO-like 640x480 inputs.

Because the dev host (1 core, ~37 MB/s device tunnel) binds that number
far below the chip's rate, the line also carries the measured per-stage
decomposition that transfers to a real TPU-VM host:
  - device_img_s: the jitted device program from device-resident tensors
    (bf16 bs256; the chip capability — 1815 img/s on v5e, 2566 int8);
  - decode_img_s: host-only decode+letterbox scaling vs process worker
    count (data/decode_pool.py);
  - h2d_MBps / h2d_ceiling_img_s_i420 / ceiling_fraction: the measured
    link bandwidth, the jpeg->boxes ceiling it implies at 259,584 B/img
    (i420 @416), and how close the pipeline gets to that ceiling;
  - train_img_s: jitted train step (fwd+loss+bwd+SGD) at the reference's
    own bs32@416 config;
  - int8_img_s: the w8a8 PTQ path (on by default since r5; --no-int8 skips);
  - mfu_*: model FLOP utilization from the compiler's AOT cost analysis
    against v5e peaks (197 TFLOP/s bf16 / 394 TOP/s int8) — the
    tunnel-independent utilization number to compare across rounds.

Baseline for `vs_baseline`: the north star is >= 2x A100 img/s/chip
(BASELINE.json). The reference publishes no inference throughput; we use an
A100 estimate of 250 img/s for batched PyTorch fp16 YOLOv3-416 e2e with NMS
(~4 ms/img), so vs_baseline = value / 250. The reference's only measured
number is training: ~21 img/s/GPU (BASELINE.md, bs32 @608 on 2 GPUs).
"""
import json
import os
import sys
import time

import numpy as np

# shared MFU accounting — ONE definition of the v5e peaks and the
# compiler-FLOP reader for bench.py / tools/probe_zoo_throughput.py /
# doctor (core/telemetry.py): 197 TFLOP/s bf16, 394 TOP/s int8 per chip
from fastvision_tpu.core.telemetry import (
    V5E_PEAK_BF16 as PEAK_BF16,
    V5E_PEAK_INT8 as PEAK_INT8,
    flops_of,
)


def device_path(jax, jnp):
    from fastvision_tpu.infer import decode_predictions
    from fastvision_tpu.models.detection import YOLOv3
    from fastvision_tpu.ops import COCO_ANCHORS, batched_non_max_suppression

    # batch/pre-NMS sweep on v5e (docs/PERF.md): bs32/K1024 778 -> bs128/K512
    # 1626 -> bs256/K256 bf16-chain 1825 img/s; bs512 OOMs at init. K=256
    # keeps >250 candidates per image above conf 0.25 at max_det 300.
    B, S, C = 256, 416, 80
    # numpy: a device-array jit closure degrades axon H2D 30x (docs/PERF.md)
    anchors = COCO_ANCHORS.reshape(3, 3, 2)[::-1].astype(np.float32)
    model = YOLOv3(num_classes=C, dtype=jnp.bfloat16)
    init_x = jnp.zeros((B, S, S, 3), jnp.bfloat16)
    variables = model.init(jax.random.key(0), init_x, train=True)

    @jax.jit
    def infer(v, images):
        heads = model.apply(v, images, train=False)
        # bf16 straight through decode + scoring; NMS upcasts the K
        # selected boxes to fp32 internally (ops/nms.py)
        pred = decode_predictions(heads, anchors, (32, 16, 8), "v5")
        return batched_non_max_suppression(
            pred, conf_thres=0.25, iou_thres=0.45,
            max_det=300, pre_nms_top_k=256,
        )

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (B, S, S, 3)), jnp.bfloat16)

    # sync via a small device_get, NOT block_until_ready: on the axon
    # remote backend block_until_ready returns before remote execution
    # completes (fully async queue; docs/PERF.md), which would inflate the
    # number ~300x. The valid-mask fetch (77 KB) adds <0.5 ms/iter and the
    # device stream serializes all queued executions before it resolves.
    det = infer(variables, images)  # compile
    np.asarray(det.valid)
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        det = infer(variables, images)
    np.asarray(det.valid)
    dt = (time.perf_counter() - t0) / iters

    flops = flops_of(infer, variables, images)  # per batch, bf16 program

    int8_ips = None
    if "--no-int8" not in sys.argv:
        # w8a8 PTQ path (infer/quantize.py): measured 2566 img/s vs 1827
        # bf16 on v5e (1.40x, past the bf16 forward-only ceiling). On by
        # default since round 5: the persistent compile cache (enabled in
        # main) amortizes its extra bs256 compile (~10 min cold) across
        # rounds. `--no-int8` skips it. Non-fatal: an int8-lane failure
        # (e.g. an XLA regression on s8 convs) must not take down the
        # headline bf16 numbers, so it degrades to int8_img_s absent.
        try:
            from fastvision_tpu.infer import quantize_model

            calib = jnp.asarray(rng.uniform(0, 1, (8, S, S, 3)), jnp.bfloat16)
            qv = quantize_model(model, variables, [calib])
            det = infer(qv, images)
            np.asarray(det.valid)
            t0 = time.perf_counter()
            for _ in range(iters):
                det = infer(qv, images)
            np.asarray(det.valid)
            int8_ips = B / ((time.perf_counter() - t0) / iters)
        except Exception as e:  # noqa: BLE001 — bench must emit its line
            print(f"[bench] int8 lane failed ({e!r}); continuing bf16-only",
                  file=sys.stderr)
    return B / dt, int8_ips, model, variables, anchors, (flops or 0) / B


def _jpeg_fixture(n_images=256):
    import cv2

    root = "/tmp/bench_jpegs"
    img_dir = os.path.join(root, "val", "images")
    have = len(os.listdir(img_dir)) if os.path.isdir(img_dir) else 0
    if have < n_images:
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(os.path.join(root, "val", "labels"), exist_ok=True)
        rng = np.random.default_rng(0)
        for i in range(n_images):  # COCO-val-like 640x480 JPEGs
            img = rng.integers(0, 255, (480, 640, 3), np.uint8)
            img = cv2.GaussianBlur(img, (7, 7), 0)
            cv2.imwrite(os.path.join(img_dir, f"{i:05d}.jpg"), img,
                        [cv2.IMWRITE_JPEG_QUALITY, 90])
    return root


def decode_scaling(worker_counts=(0, 2, 4, 8), n_images=256):
    """HOST-ONLY decode+letterbox+label throughput vs process worker count
    (data/decode_pool.py). On a many-core TPU-VM host this shows the
    linear decode scaling that feeds the device rate; on this 1-core dev
    box it documents the single-core decode budget (img/s/core) that a
    deployment multiplies by its core count.

    The `i420_w0` field is the fused native JPEG->I420 kernel
    (native/jpeg_i420.cpp: stored-plane decode, no RGB round-trip) on the
    same fixture — the path Detector(input_format='i420') feeds from."""
    from fastvision_tpu.data import DetectionDataset, DetectionLoader

    root = _jpeg_fixture(n_images)
    ds = DetectionDataset(root, "val")
    out = {}
    # measure the serial fused-native path FIRST: in r3 it ran last, after
    # the DecodePool scaling runs, and recorded 244 img/s vs 505 measured
    # clean — pool teardown/tunnel churn on the 1-core host contaminated it
    from fastvision_tpu import native

    if native.jpeg_i420_available():
        loader = DetectionLoader(
            ds, input_size=416, batch_size=32, max_boxes=1, train=False,
            drop_last=False, emit="i420",
        )
        for _ in loader.epoch(0):
            break
        t0 = time.perf_counter()
        n = sum(b["num_real"] for b in loader.epoch(0))
        out["i420_w0"] = round(n / (time.perf_counter() - t0), 1)
    for w in worker_counts:
        loader = DetectionLoader(
            ds, input_size=416, batch_size=32, max_boxes=1, train=False,
            drop_last=False, num_workers=w, worker_backend="process",
        )
        for _ in loader.epoch(0):  # warm workers + page cache
            break
        t0 = time.perf_counter()
        n = sum(b["num_real"] for b in loader.epoch(0))
        out[f"w{w}"] = round(n / (time.perf_counter() - t0), 1)
        if loader._decode_pool is not None:
            loader._decode_pool.close()
    return out


def h2d_bandwidth(jax, jnp, mb=32, reps=3):
    """Measured host->device link bandwidth (uint8), synced by a 1-element
    fetch (block_until_ready returns early on the axon relay)."""
    buf = np.random.default_rng(0).integers(
        0, 255, (mb * 1024 * 1024,), np.uint8
    )
    x = jnp.asarray(buf)  # warm any lazy session state
    np.asarray(x[0])
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        x = jnp.asarray(buf)
        np.asarray(x[0])
        best = max(best, mb / (time.perf_counter() - t0))
    return best


def jpeg_to_boxes(jax, jnp, model, variables, anchors, n_images=256,
                  num_workers=None):
    """Detector.predict_dataset throughput from JPEG bytes on disk — the
    north-star path (BASELINE.json: jpeg->boxes img/s). Host decode runs
    in DecodePool worker processes overlapping device dispatch — except
    on a single-core host, where worker IPC competes with the H2D
    transfer loop for the one core and HALVES throughput (measured
    2026-08-17: 100.6 img/s serial vs 52.3 with 2 workers, 91% vs 48%
    link saturation), so workers auto-disable there."""
    if num_workers is None:
        num_workers = max(0, min(4, (os.cpu_count() or 1) - 1))
    from fastvision_tpu.data import DetectionDataset
    from fastvision_tpu.infer import Detector

    root = _jpeg_fixture(n_images)
    # i420 halves the H2D bytes (the binding constraint on tunnel-attached
    # dev hosts, docs/PERF.md); JPEG chroma is 4:2:0 already, lossless here
    det = Detector(model, variables, anchors, input_size=416, batch_size=32,
                   dtype=jnp.bfloat16, input_format="i420")
    ds = DetectionDataset(root, "val")

    class _Head:  # small fully-drained warmup: breaking out of the
        def __init__(self, ds, n):  # generator mid-iteration would leave
            self.ds, self.n = ds, n  # its prefetch thread holding queued
        def __len__(self):  # batches that contend with the measured pass
            return self.n
        def __getitem__(self, i):
            return self.ds[i]

    for _ in det.predict_dataset(_Head(ds, 32), fast_decode=True,
                                 num_workers=num_workers):
        pass  # compile + first-fetch + decode-pool warmup
    # best of 3 passes: this is the only transfer-bound number, and the
    # shared tunnel's ambient congestion swings single passes up to 2x
    # (device/train numbers are stable across the same runs; docs/PERF.md)
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        n = sum(1 for _ in det.predict_dataset(ds, fast_decode=True,
                                               num_workers=num_workers))
        best = max(best, n / (time.perf_counter() - t0))
    return best


def train_path(jax, jnp, model, variables, anchors, B=32, want_flops=False):
    """Reference train config: bs32 @416 (its published number is bs32@608
    on 2 GPUs, ~21 img/s/GPU; BASELINE.md). B=128 shows the batch-scaling
    headroom (per-image cost drops ~40% bs32->bs128, docs/PERF.md)."""
    from fastvision_tpu.train import TrainState, YOLOv3Loss, build_optimizer, make_train_step

    S = 416
    loss_obj = YOLOv3Loss(anchors, num_classes=80)

    def loss_fn(heads, batch):
        out = loss_obj(heads, batch["labels"])
        return out.total, {}

    tx = build_optimizer("sgd", variables["params"], weight_decay=5e-4)
    step = make_train_step(model.apply, loss_fn, tx)
    # the jitted step donates its state: seed it with COPIES so the
    # caller's variables survive a second train_path call (bs128 run)
    state = TrainState.create(jax.tree.map(jnp.copy, dict(variables)), tx)
    rng = np.random.default_rng(0)
    labels = np.full((B, 32, 5), -1, np.float32)
    labels[:, :4] = rng.uniform(0.2, 0.6, (B, 4, 5))
    labels[:, :4, 0] = rng.integers(0, 80, (B, 4))
    batch = {
        "images": jnp.asarray(rng.uniform(0, 1, (B, S, S, 3)), jnp.bfloat16),
        "labels": jnp.asarray(labels),
    }
    state, metrics = step(state, batch, 1e-3)
    float(metrics["loss"])  # compile + drain (device_get is the real sync)
    iters = 8
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch, 1e-3)
    float(metrics["loss"])
    ips = B * iters / (time.perf_counter() - t0)
    # AOT-lower only when the caller reports MFU for this batch size — the
    # extra lowering+cache-roundtrip of the full train step isn't free
    flops = flops_of(step.jitted, state, batch, 1e-3) if want_flops else None
    return ips, (flops or 0) / B


def main():
    import jax
    import jax.numpy as jnp

    # persistent XLA compile cache: the big bs256 programs (bf16 + int8)
    # compile once per machine and load from disk on later runs/rounds
    from fastvision_tpu.core.mesh import enable_compile_cache

    enable_compile_cache(os.path.expanduser("~/.cache/fastvision_tpu_xla"))

    ips, int8_ips, model, variables, anchors, eval_flops = device_path(jax, jnp)
    decode = decode_scaling()
    h2d = h2d_bandwidth(jax, jnp)
    e2e = jpeg_to_boxes(jax, jnp, model, variables, anchors)
    # fresh fp32-master variables for training (bench model is bf16-act)
    train_ips, _ = train_path(jax, jnp, model, variables, anchors)
    train_ips128, train_flops = train_path(jax, jnp, model, variables, anchors,
                                           B=128, want_flops=True)

    # north-star decomposition (VERDICT r2 next-1): jpeg->boxes headline
    # plus the measured per-stage ceilings that bound it on THIS host —
    # i420 @416 is 416*416*1.5 = 259,584 B/img over the measured link
    i420_bytes = 416 * 416 * 3 // 2
    ceiling = h2d * 1024 * 1024 / i420_bytes
    out = {
        "metric": "YOLOv3-416 jpeg->boxes images/sec "
                  "(decode+H2D+fwd+v5-decode+NMS+unscale)",
        "value": round(e2e, 1),
        "unit": "img/s",
        "vs_baseline": round(e2e / 250.0, 3),
        "device_img_s": round(ips, 1),
        "decode_img_s": decode,
        "h2d_MBps": round(h2d, 1),
        "h2d_ceiling_img_s_i420": round(ceiling, 1),
        "ceiling_fraction": round(e2e / ceiling, 3),
        "train_img_s_bs32_416": round(train_ips, 1),
        "train_img_s_bs128_416": round(train_ips128, 1),
        "host_cores": os.cpu_count(),
        "note": "dev host = 1 core behind a shared tunnel whose bandwidth "
                "swings 19-40 MB/s across days: jpeg->boxes is link-bound "
                "here (ceiling_fraction = saturation of the same-run "
                "measured link; compare THAT across rounds, not raw img/s); "
                "device_img_s is the per-chip program rate and decode_img_s "
                "the per-core host decode budget — on a real TPU-VM host "
                "(100+ cores, >10 GB/s PCIe) the host stages outrun "
                "device_img_s.",
    }
    if int8_ips is not None:
        out["int8_img_s"] = round(int8_ips, 1)
    # MFU from the compiler's own FLOP count (AOT cost_analysis; absent on
    # backends without it). v5e peaks: 197 TFLOP/s bf16, 394 TOP/s int8.
    # The int8 program's arithmetic is the same conv graph, so its MFU is
    # computed from the bf16 FLOP count against the int8 peak.
    if eval_flops:
        out["eval_gflops_per_img"] = round(eval_flops / 1e9, 1)
        out["mfu_eval_bf16"] = round(ips * eval_flops / PEAK_BF16, 3)
        if int8_ips is not None:
            out["mfu_int8"] = round(int8_ips * eval_flops / PEAK_INT8, 3)
    if train_flops:
        out["train_gflops_per_img"] = round(train_flops / 1e9, 1)
        out["mfu_train_bs128"] = round(train_ips128 * train_flops / PEAK_BF16, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
