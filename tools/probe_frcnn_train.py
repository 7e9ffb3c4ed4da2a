"""Faster R-CNN train-step split timings on the real chip (VERDICT r4 #9).

The published 531 img/s was EVAL-only; this prints fwd / fwd+loss(train
forward: RPN + stochastic sampling + RoI align) / fwd+bwd / full SGD step
img/s at bs16/32, plus a bf16 MFU estimate for the full step, VOC-like
config (VGG16, 512px, 20 classes — BASELINE.md FRCNN V100 rows).

Run alone on the chip host: python tools/probe_frcnn_train.py
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

from fastvision_tpu.data.pipeline import normalize_images
from fastvision_tpu.models.detection.faster_rcnn import FasterRCNN
from fastvision_tpu.train import TrainState, build_optimizer
from fastvision_tpu.train.frcnn_steps import make_frcnn_train_step

S, C = 512, 20
model = FasterRCNN(num_classes=C, image_size=S, dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
init_labels = np.full((2, 16, 5), -1, np.float32)
init_labels[:, 0] = [0, 50, 60, 200, 180]
variables = model.init(
    {"params": jax.random.key(0), "sampling": jax.random.key(1),
     "dropout": jax.random.key(2)},
    jnp.zeros((2, S, S, 3), jnp.bfloat16), jnp.asarray(init_labels), train=True)

# v5e bf16 peak ~197 TFLOP/s; VGG16 fwd at 512px ~ 2 * 15.3 GFLOP-MAC/img
# at 224px * (512/224)^2 ~ 160 GFLOP/img; train step ~ 3x fwd
VGG16_FWD_FLOP = 2 * 15.3e9 * (S / 224) ** 2
PEAK = 197e12


def make_batch(B):
    labels = np.full((B, 16, 5), -1, np.float32)
    labels[:, :3] = rng.uniform(0.2, 0.6, (B, 3, 5))
    labels[:, :3, 0] = rng.integers(0, C, (B, 3))
    # frcnn step expects normalized xywh (DetectionLoader contract)
    return {
        "images": jnp.asarray(rng.uniform(0, 1, (B, S, S, 3)), jnp.bfloat16),
        "labels": jnp.asarray(labels),
    }


def timed(fn, *args, iters=6, B=16):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]  # small sync fetch
    t0 = time.perf_counter()
    o = None
    for _ in range(iters):
        o = fn(*args)
    np.asarray(jax.tree.leaves(o)[0]).ravel()[:1]
    return B * iters / (time.perf_counter() - t0)


from fastvision_tpu.train.frcnn_steps import labels_to_pixel_xyxy  # noqa: E402

for B in (16, 32):
    batch = make_batch(B)

    @jax.jit
    def fwd_eval(v, b):
        x = normalize_images(b["images"], model.dtype, imagenet=True)
        return model.apply(v, x, train=False)[0]

    r0 = timed(fwd_eval, variables, batch, B=B)

    @jax.jit
    def fwd_loss(v, b):
        x = normalize_images(b["images"], model.dtype, imagenet=True)
        labels = labels_to_pixel_xyxy(b["labels"], S)
        losses = model.apply(v, x, labels, train=True,
                             rngs={"sampling": jax.random.key(3),
                                   "dropout": jax.random.key(4)})
        return sum(losses.values()).astype(jnp.float32)

    r1 = timed(fwd_loss, variables, batch, B=B)

    @jax.jit
    def fwd_bwd(v, b):
        def f(params):
            x = normalize_images(b["images"], model.dtype, imagenet=True)
            labels = labels_to_pixel_xyxy(b["labels"], S)
            losses = model.apply({**v, "params": params}, x, labels, train=True,
                                 rngs={"sampling": jax.random.key(3),
                                       "dropout": jax.random.key(4)})
            return sum(losses.values()).astype(jnp.float32)
        l, g = jax.value_and_grad(f)(v["params"])
        return l, jax.tree.leaves(g)[0]

    r2 = timed(fwd_bwd, variables, batch, B=B)

    tx = build_optimizer("sgd", variables["params"], weight_decay=5e-4,
                         grad_clip_norm=10.0)
    step = make_frcnn_train_step(model, tx)
    # the step donates its state: seed with copies and THREAD the state
    # through iterations (re-calling with a donated state is a use-after-
    # free on the backend)
    state = TrainState.create(jax.tree.map(jnp.copy, dict(variables)), tx)
    state, m = step(state, batch, 1e-3)
    np.asarray(m["loss"])
    iters = 6
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch, 1e-3)
    np.asarray(m["loss"])
    r3 = B * iters / (time.perf_counter() - t0)
    mfu = r3 * 3 * VGG16_FWD_FLOP / PEAK
    print(f"B={B}: eval fwd {r0:.1f} | train fwd+loss {r1:.1f} | "
          f"+bwd {r2:.1f} | full step {r3:.1f} img/s | "
          f"~MFU {100 * mfu:.0f}% (3x-fwd VGG16 flop model)", flush=True)
