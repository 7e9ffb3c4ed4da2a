"""Jitted train/eval steps — the framework's hot loop.

Replaces the reference's eager per-batch loop (`utils/fit.py:52-66`:
H2D copy, DataParallel scatter/gather, loss.backward, optimizer.step) with
ONE compiled XLA program per step: forward + loss + grad + update, traced
once, executed on the mesh. Data parallelism is expressed by sharding the
batch over the mesh 'data' axis (core.mesh.shard_batch); XLA inserts the
gradient all-reduce over ICI. BatchNorm statistics are computed over the
GLOBAL batch under GSPMD (jnp.mean over a sharded axis is a collective) —
i.e. SyncBN semantics by construction (SURVEY.md §2.5).

bf16 policy: params/opt-state fp32, activations bf16 (model dtype), loss
and grads accumulated fp32.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from .optim import set_lr


def device_batch(batch: dict) -> dict:
    """Drop host-only keys (meta, ids, counts...) so a loader batch can go
    straight into a jitted step: keeps only array-typed values."""
    import numpy as np

    return {
        k: v
        for k, v in batch.items()
        if isinstance(v, (jax.Array, np.ndarray)) or hasattr(v, "__jax_array__")
    }


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray  # scalar int32

    @classmethod
    def create(cls, variables: dict, tx) -> "TrainState":
        params = variables["params"]
        return cls(
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
        )

    def variables(self) -> dict:
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v


def make_train_step(
    apply_fn: Callable,
    loss_fn: Callable[[Any, dict], tuple[jnp.ndarray, dict]],
    tx,
    has_batch_stats: bool = True,
    donate: bool = True,
) -> Callable:
    """Build `train_step(state, batch, lr) -> (state, metrics)`.

    - apply_fn: flax Module.apply
    - loss_fn(outputs, batch) -> (scalar_loss, metrics_dict)
    - batch: dict with 'images' (+ whatever loss_fn reads: 'labels', ...)
    - lr: scalar — the schedule value for this step, set into the injected
      optimizer hyperparam (no recompilation across steps/epochs).
    """

    def compute_loss(params, batch_stats, batch, rng):
        variables = {"params": params}
        mutable = []
        if has_batch_stats:
            variables["batch_stats"] = batch_stats
            mutable = ["batch_stats"]
        out = apply_fn(
            variables,
            batch["images"],
            train=True,
            mutable=mutable,
            rngs={"dropout": rng} if rng is not None else None,
        )
        outputs, updates = out if mutable else (out, {})
        loss, metrics = loss_fn(outputs, batch)
        return loss.astype(jnp.float32), (metrics, updates.get("batch_stats", batch_stats))

    grad_fn = jax.value_and_grad(compute_loss, has_aux=True)

    def train_step(state: TrainState, batch: dict, lr, rng=None):
        (loss, (metrics, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, batch, rng
        )
        opt_state = set_lr(state.opt_state, lr)
        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = TrainState(params, new_stats, opt_state, state.step + 1)
        metrics = dict(metrics)
        metrics["loss"] = loss
        metrics["grad_norm"] = jnp.sqrt(
            sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in jax.tree.leaves(grads))
        )
        return new_state, metrics

    jitted = jax.jit(train_step, donate_argnums=(0,) if donate else ())

    def wrapper(state, batch, lr, rng=None):
        return jitted(state, device_batch(batch), lr, rng)

    return wrapper


def make_eval_step(apply_fn: Callable, postprocess: Callable | None = None) -> Callable:
    """Build `eval_step(state, batch) -> outputs` (train=False, no mutation).

    `postprocess(outputs, batch)` runs inside the same jit (e.g. decode+NMS
    for detection val, ref utils/fit.py:95)."""

    def eval_step(state: TrainState, batch: dict):
        out = apply_fn(state.variables(), batch["images"], train=False)
        if postprocess is not None:
            out = postprocess(out, batch)
        return out

    jitted = jax.jit(eval_step)
    return lambda state, batch: jitted(state, device_batch(batch))
