"""Round-5 train-step optimization probe (bs128 @416, live chip).

Quantifies each candidate lever against the full-step baseline:
  a0 fwd(train), no loss     — the bare model forward, BN batch-stats mode
  a. fwd(train)+loss          — adds YOLOv3Loss (assignment+CE+IoU)
  b. fwd(eval)+loss           — BN frozen (what eval pays)
  c. fwd+bwd                  — adds the backward (grads materialized:
                                the result reduces over every grad leaf so
                                XLA cannot dead-code-eliminate the bwd)
  d. full step (baseline)     — bwd + optimizer, donate, as bench.py runs it
  e. full step, no grad_norm  — drops the all-leaves norm reduction
  f. full step, bf16 momentum — optax.trace(accumulator_dtype=bfloat16)

Usage: python tools/probe_train_opt.py [B]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fastvision_tpu.core.mesh import enable_compile_cache
from fastvision_tpu.models.detection import YOLOv3
from fastvision_tpu.ops import COCO_ANCHORS
from fastvision_tpu.train import TrainState, YOLOv3Loss, build_optimizer, make_train_step
from fastvision_tpu.train.optim import decay_mask

enable_compile_cache("/root/.cache/fastvision_tpu_xla")

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
S, C = 416, 80
anchors = COCO_ANCHORS.reshape(3, 3, 2)[::-1].astype(np.float32)
model = YOLOv3(num_classes=C, dtype=jnp.bfloat16)
variables = model.init(jax.random.key(0), jnp.zeros((8, S, S, 3), jnp.bfloat16),
                       train=True)
loss_obj = YOLOv3Loss(anchors, num_classes=C)
rng = np.random.default_rng(0)
labels = np.full((B, 32, 5), -1, np.float32)
labels[:, :4] = rng.uniform(0.2, 0.6, (B, 4, 5))
labels[:, :4, 0] = rng.integers(0, C, (B, 4))
batch = {
    "images": jnp.asarray(rng.uniform(0, 1, (B, S, S, 3)), jnp.bfloat16),
    "labels": jnp.asarray(labels),
}


def loss_fn(heads, b):
    out = loss_obj(heads, b["labels"])
    return out.total, {}


def timed(fn, *args, iters=8):
    o = fn(*args)
    np.asarray(jax.tree.leaves(o)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*args)
    np.asarray(jax.tree.leaves(o)[0]).ravel()[:1]
    return B * iters / (time.perf_counter() - t0)


@jax.jit
def fwd_train_bare(p, bs, b):
    heads = model.apply({"params": p, "batch_stats": bs}, b["images"],
                        train=True, mutable=["batch_stats"])[0]
    # reduce every head so none is DCE'd, but skip the loss entirely
    return sum(jnp.sum(h.astype(jnp.float32)) for h in jax.tree.leaves(heads))


@jax.jit
def fwd_train(p, bs, b):
    heads = model.apply({"params": p, "batch_stats": bs}, b["images"],
                        train=True, mutable=["batch_stats"])[0]
    return loss_fn(heads, b)[0]


@jax.jit
def fwd_eval(p, bs, b):
    heads = model.apply({"params": p, "batch_stats": bs}, b["images"],
                        train=False)
    return loss_fn(heads, b)[0]


@jax.jit
def fwd_bwd(p, bs, b):
    def f(p):
        heads = model.apply({"params": p, "batch_stats": bs}, b["images"],
                            train=True, mutable=["batch_stats"])[0]
        return loss_fn(heads, b)[0]

    l, g = jax.value_and_grad(f)(p)
    # reduce over every grad leaf so the backward is actually executed
    return l + sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(g))


print(f"B={B}")
print("a0 fwd(train) bare:", round(timed(fwd_train_bare, variables["params"],
                                          variables["batch_stats"], batch), 1))
print("a fwd(train)+loss :", round(timed(fwd_train, variables["params"],
                                          variables["batch_stats"], batch), 1))
print("b fwd(eval)+loss  :", round(timed(fwd_eval, variables["params"],
                                         variables["batch_stats"], batch), 1))
print("c fwd+bwd         :", round(timed(fwd_bwd, variables["params"],
                                         variables["batch_stats"], batch), 1))


def full_step(tx, **kw):
    step = make_train_step(model.apply, loss_fn, tx, **kw)
    state = TrainState.create(jax.tree.map(jnp.copy, dict(variables)), tx)
    state, m = step(state, batch, 1e-3)
    float(m["loss"])
    iters = 8
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch, 1e-3)
    float(m["loss"])
    return B * iters / (time.perf_counter() - t0)


tx = build_optimizer("sgd", variables["params"], weight_decay=5e-4)
print("d full step       :", round(full_step(tx), 1))
print("e no grad_norm    :", round(full_step(tx, with_grad_norm=False), 1))

tx_bf16 = optax.chain(
    optax.add_decayed_weights(5e-4, mask=decay_mask(variables["params"])),
    optax.trace(decay=0.937, nesterov=True, accumulator_dtype=jnp.bfloat16),
    optax.inject_hyperparams(lambda lr: optax.scale(-lr))(lr=0.0),
)
print("f bf16 momentum   :", round(full_step(tx_bf16), 1))
