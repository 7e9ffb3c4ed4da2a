"""Optimizers: SGD/Adam with the reference's 3-parameter-group policy.

The reference builds three torch param groups — BN/bias without weight
decay, conv/linear kernels with decay (generate/template-yolov3/train.py:48-64,
demos/yolov3_huaweiShip/train.py:70-87). The optax-native expression is a
decay *mask* (kernels only, ndim > 1) — identical math, no group plumbing.

The learning rate is an injected hyperparameter so the schedule (including
stateful plateau decay) is driven host-side per step without recompiling:
`set_lr(opt_state, lr)`.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax


def decay_mask(params: Any) -> Any:
    """True for leaves that should receive weight decay: rank>1 kernels
    (conv/linear weights); biases and norm scales/offsets are excluded."""
    return jax.tree.map(lambda p: jnp.ndim(p) > 1, params)


def build_optimizer(
    name: str,
    params: Any,
    weight_decay: float = 5e-4,
    momentum: float = 0.937,
    nesterov: bool = True,
    betas: tuple[float, float] = (0.937, 0.999),
    grad_clip_norm: float = 0.0,
    trainable: Any = None,  # bool pytree from core.checkpoint.trainable_mask
    accum_steps: int = 1,  # gradient accumulation (large effective batch)
) -> optax.GradientTransformation:
    """SGD (huaweiShip recipe, train.py:70-87) or Adam (yolov3_u recipe,
    train.py:68 betas=(0.937, 0.999)), with masked decoupled weight decay,
    optional global-norm clipping (demos/faster_rcnn/cfg/_fit.py:6-17), and
    optional frozen-parameter masking (ref SqueezeModel freeze)."""
    chain = []
    if grad_clip_norm and grad_clip_norm > 0:
        chain.append(optax.clip_by_global_norm(grad_clip_norm))
    if weight_decay and weight_decay > 0:
        chain.append(optax.add_decayed_weights(weight_decay, mask=decay_mask(params)))
    if name == "sgd":
        chain.append(optax.trace(decay=momentum, nesterov=nesterov))
    elif name == "adam":
        chain.append(optax.scale_by_adam(b1=betas[0], b2=betas[1]))
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    # lr applied last, negated for descent
    chain.append(optax.inject_hyperparams(lambda lr: optax.scale(-lr))(lr=0.0))
    tx = optax.chain(*chain)
    if trainable is not None:
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()},
            jax.tree.map(lambda t: "train" if t else "freeze", trainable),
        )
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx


def set_lr(opt_state: Any, lr) -> Any:
    """Functionally set the injected learning rate inside an opt_state."""

    def replace(node):
        if isinstance(node, optax.InjectStatefulHyperparamsState) or (
            hasattr(node, "hyperparams") and "lr" in getattr(node, "hyperparams", {})
        ):
            hp = dict(node.hyperparams)
            hp["lr"] = jnp.asarray(lr, jnp.float32)
            return node._replace(hyperparams=hp)
        return node

    return jax.tree.map(
        replace,
        opt_state,
        is_leaf=lambda n: hasattr(n, "hyperparams"),
    )


def get_lr(opt_state: Any) -> float:
    """Read the injected learning rate back out (for logging)."""
    found = []

    def visit(node):
        if hasattr(node, "hyperparams") and "lr" in node.hyperparams:
            found.append(node.hyperparams["lr"])
        return node

    jax.tree.map(visit, opt_state, is_leaf=lambda n: hasattr(n, "hyperparams"))
    return float(np.asarray(found[0])) if found else 0.0
