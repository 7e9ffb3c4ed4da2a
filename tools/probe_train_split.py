"""Train-step split timings: fwd+loss / +bwd / +opt, batch sweep."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from fastvision_tpu.models.detection import YOLOv3
from fastvision_tpu.ops import COCO_ANCHORS
from fastvision_tpu.train import TrainState, YOLOv3Loss, build_optimizer, make_train_step

S, C = 416, 80
anchors = COCO_ANCHORS.reshape(3, 3, 2)[::-1].astype(np.float32)
model = YOLOv3(num_classes=C, dtype=jnp.bfloat16)
variables = model.init(jax.random.key(0), jnp.zeros((8, S, S, 3), jnp.bfloat16),
                       train=True)
loss_obj = YOLOv3Loss(anchors, num_classes=C)
rng = np.random.default_rng(0)


def make_batch(B):
    labels = np.full((B, 32, 5), -1, np.float32)
    labels[:, :4] = rng.uniform(0.2, 0.6, (B, 4, 5))
    labels[:, :4, 0] = rng.integers(0, C, (B, 4))
    return {
        "images": jnp.asarray(rng.uniform(0, 1, (B, S, S, 3)), jnp.bfloat16),
        "labels": jnp.asarray(labels),
    }


def timed(fn, *args, iters=8, B=32):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    o = None
    for _ in range(iters):
        o = fn(*args)
    np.asarray(jax.tree.leaves(o)[0]).ravel()[:1]
    return B * iters / (time.perf_counter() - t0)


def loss_fn(heads, batch):
    out = loss_obj(heads, batch["labels"])
    return out.total, {}


for B in (32, 64, 128):
    batch = make_batch(B)

    @jax.jit
    def fwd_loss(p, bs, b):
        heads = model.apply({"params": p, "batch_stats": bs}, b["images"],
                            train=True, mutable=["batch_stats"])[0]
        return loss_fn(heads, b)[0]

    r1 = timed(fwd_loss, variables["params"], variables["batch_stats"], batch, B=B)

    @jax.jit
    def fwd_bwd(p, bs, b):
        def f(p):
            heads = model.apply({"params": p, "batch_stats": bs}, b["images"],
                                train=True, mutable=["batch_stats"])[0]
            return loss_fn(heads, b)[0]
        l, g = jax.value_and_grad(f)(p)
        return l, jax.tree.leaves(g)[0]

    r2 = timed(fwd_bwd, variables["params"], variables["batch_stats"], batch, B=B)

    tx = build_optimizer("sgd", variables["params"], weight_decay=5e-4)
    step = make_train_step(model.apply, loss_fn, tx, donate=False)
    state = TrainState.create(variables, tx)
    r3 = timed(step, state, batch, 1e-3, B=B)
    print(f"B={B}: fwd+loss {r1:.1f} | +bwd {r2:.1f} | full step {r3:.1f} img/s",
          flush=True)
