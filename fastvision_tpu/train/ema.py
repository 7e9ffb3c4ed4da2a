"""Exponential moving average of model parameters.

Not in the reference, but standard in the recipes its checkpoints came from
(ultralytics trains YOLOv3 with EMA) and usually worth ~0.5-1 mAP — part of
the beat-the-baseline toolkit. Decay warms up as min(decay, (1+t)/(10+t))
so early steps aren't anchored to the init.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def ema_update(ema_params: Any, params: Any, step, decay: float = 0.9999) -> Any:
    """One EMA step (jit-friendly; `step` may be traced)."""
    step = jnp.asarray(step, jnp.float32)
    d = jnp.minimum(decay, (1.0 + step) / (10.0 + step))
    return jax.tree.map(lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
                        ema_params, params)


def make_ema_update(decay: float = 0.9999):
    return jax.jit(lambda ema, params, step: ema_update(ema, params, step, decay))
