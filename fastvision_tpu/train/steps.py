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
    accum_steps: int = 1,
    remat: bool = False,
    batch_transform: Callable | None = None,
    transform_seed: int = 0,
    with_grad_norm: bool = True,
) -> Callable:
    """Build `train_step(state, batch, lr) -> (state, metrics)`.

    - apply_fn: flax Module.apply
    - loss_fn(outputs, batch) -> (scalar_loss, metrics_dict)
    - batch: dict with 'images' (+ whatever loss_fn reads: 'labels', ...)
    - lr: scalar — the schedule value for this step, set into the injected
      optimizer hyperparam (no recompilation across steps/epochs).
    - accum_steps: IN-STEP gradient accumulation — the batch is split into
      this many microbatches along axis 0 (must divide the batch size) and
      lax.scan'ed, so peak activation memory is one microbatch while the
      optimizer sees the full-batch mean grads in ONE update. Exact-equal
      to full-batch grads for mean-reduced losses without BN; with BN,
      statistics chain per-microbatch like every framework's accumulation.
      (Orthogonal to `build_optimizer(accum_steps=N)` = optax MultiSteps,
      which accumulates ACROSS loader batches and updates every Nth call.)
    - remat: jax.checkpoint the forward — activations are recomputed
      during backward instead of stored, trading ~1/3 more FLOPs for a
      large activation-memory cut (the TPU lever for big batch/resolution).
    - batch_transform(batch, key) -> batch: in-jit stochastic batch edit
      (mixup/cutmix, train/mix.py) run before the forward; its key is
      folded from (transform_seed, state.step), so the stream is
      reproducible and resume-consistent with no host RNG plumbing.
    """

    def compute_loss(params, batch_stats, batch, rng):
        variables = {"params": params}
        mutable = []
        if has_batch_stats:
            variables["batch_stats"] = batch_stats
            mutable = ["batch_stats"]

        def fwd(variables, images):
            # only pass mutable when non-empty: flax returns an
            # (outputs, vars) tuple for ANY explicit mutable, even []
            kw = {"mutable": mutable} if mutable else {}
            return apply_fn(
                variables,
                images,
                train=True,
                rngs={"dropout": rng} if rng is not None else None,
                **kw,
            )

        if remat:
            fwd = jax.checkpoint(fwd)
        out = fwd(variables, batch["images"])
        outputs, updates = out if mutable else (out, {})
        loss, metrics = loss_fn(outputs, batch)
        return loss.astype(jnp.float32), (metrics, updates.get("batch_stats", batch_stats))

    grad_fn = jax.value_and_grad(compute_loss, has_aux=True)

    def grads_single(state, batch, rng):
        (loss, (metrics, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, batch, rng
        )
        return loss, metrics, new_stats, grads

    def grads_accum(state, batch, rng):
        # [B, ...] -> [accum_steps, B/accum_steps, ...]; scan microbatches,
        # chaining batch_stats and summing grads (fp32 params -> fp32 sums)
        def split(x):
            b = x.shape[0]
            if b % accum_steps:
                raise ValueError(
                    f"batch size {b} not divisible by accum_steps={accum_steps}"
                )
            return x.reshape(accum_steps, b // accum_steps, *x.shape[1:])

        mbs = jax.tree.map(split, batch)

        def micro(carry, xs):
            stats, gsum = carry
            mb, i = xs
            r = None if rng is None else jax.random.fold_in(rng, i)
            (loss, (metrics, new_stats)), g = grad_fn(state.params, stats, mb, r)
            gsum = jax.tree.map(jnp.add, gsum, g)
            return (new_stats, gsum), (loss, metrics)

        zeros = jax.tree.map(jnp.zeros_like, state.params)
        (new_stats, gsum), (losses, metricses) = jax.lax.scan(
            micro, (state.batch_stats, zeros),
            (mbs, jnp.arange(accum_steps)),
        )
        grads = jax.tree.map(lambda g: g / accum_steps, gsum)
        metrics = jax.tree.map(lambda a: a.mean(0), metricses)
        return losses.mean(), metrics, new_stats, grads

    def train_step(state: TrainState, batch: dict, lr, rng=None):
        if batch_transform is not None:
            key = jax.random.fold_in(jax.random.key(transform_seed), state.step)
            batch = batch_transform(batch, key)
        loss, metrics, new_stats, grads = (
            grads_single(state, batch, rng) if accum_steps == 1
            else grads_accum(state, batch, rng)
        )
        opt_state = set_lr(state.opt_state, lr)
        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = TrainState(params, new_stats, opt_state, state.step + 1)
        metrics = dict(metrics)
        metrics["loss"] = loss
        if with_grad_norm:
            # one extra read of every gradient leaf — cheap but not free;
            # with_grad_norm=False drops it (tools/probe_train_opt.py case e)
            metrics["grad_norm"] = jnp.sqrt(
                sum(jnp.sum(g.astype(jnp.float32) ** 2)
                    for g in jax.tree.leaves(grads))
            )
        return new_state, metrics

    jitted = jax.jit(train_step, donate_argnums=(0,) if donate else ())

    def wrapper(state, batch, lr, rng=None):
        return jitted(state, device_batch(batch), lr, rng)

    # expose the jitted callable for AOT introspection (bench.py lowers it
    # to read the compiler's FLOP estimate for MFU accounting)
    wrapper.jitted = jitted
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
