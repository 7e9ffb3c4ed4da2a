"""Train-step batch-scaling probe: does bs>128 buy anything on one chip?

probe_train_opt.py (round 5) proved the bs128 step is conv-backward-bound
inside XLA; the one lever it did not measure is pushing the batch further.
This probe times the FULL SGD step (donate on, as bench.py runs it) at
bs 128 / 192 / 256, each plain and with `remat=True` (jax.checkpoint over
the forward — trades one extra forward's FLOPs for activation memory, the
standard move when a larger batch OOMs).

Usage: python tools/probe_train_bs.py [sizes...]   (default 128 192 256)
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from fastvision_tpu.core.mesh import enable_compile_cache
from fastvision_tpu.models.detection import YOLOv3
from fastvision_tpu.ops import COCO_ANCHORS
from fastvision_tpu.train import TrainState, YOLOv3Loss, build_optimizer, make_train_step

enable_compile_cache("/root/.cache/fastvision_tpu_xla")

SIZES = [int(a) for a in sys.argv[1:]] or [128, 192, 256]
S, C = 416, 80
anchors = COCO_ANCHORS.reshape(3, 3, 2)[::-1].astype(np.float32)
model = YOLOv3(num_classes=C, dtype=jnp.bfloat16)
variables = model.init(jax.random.key(0), jnp.zeros((8, S, S, 3), jnp.bfloat16),
                       train=True)
loss_obj = YOLOv3Loss(anchors, num_classes=C)
rng = np.random.default_rng(0)


def loss_fn(heads, b):
    out = loss_obj(heads, b["labels"])
    return out.total, {}


def make_batch(B):
    labels = np.full((B, 32, 5), -1, np.float32)
    labels[:, :4] = rng.uniform(0.2, 0.6, (B, 4, 5))
    labels[:, :4, 0] = rng.integers(0, C, (B, 4))
    return {
        "images": jnp.asarray(rng.uniform(0, 1, (B, S, S, 3)), jnp.bfloat16),
        "labels": jnp.asarray(labels),
    }


def run(B, remat):
    tx = build_optimizer("sgd", variables["params"], weight_decay=5e-4)
    step = make_train_step(model.apply, loss_fn, tx, remat=remat)
    state = TrainState.create(jax.tree.map(jnp.copy, dict(variables)), tx)
    batch = make_batch(B)
    try:
        state, metrics = step(state, batch, 1e-3)
        float(metrics["loss"])  # compile + drain
        iters = 6
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = step(state, batch, 1e-3)
        float(metrics["loss"])
        ips = B * iters / (time.perf_counter() - t0)
        print(f"bs{B} remat={remat}: {ips:.1f} img/s "
              f"({1000 * B / ips:.1f} ms/batch)", flush=True)
    except Exception as e:  # noqa: BLE001 — OOM is an expected outcome here
        print(f"bs{B} remat={remat}: FAILED ({type(e).__name__}: "
              f"{str(e)[:120]})", flush=True)


for B in SIZES:
    run(B, remat=False)
    run(B, remat=True)
