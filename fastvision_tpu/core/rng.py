"""RNG discipline: explicit, splittable, fold-in-keyed randomness.

Replaces the reference's global seeding (`utils/seed.py:7` sets
PYTHONHASHSEED / random / numpy / torch / cudnn flags — and then flips
`cudnn.benchmark = True` inside the deterministic branch, seed.py:17, a bug
we don't inherit): JAX keys are values, so determinism is structural.
`step_key` gives a per-step, per-purpose stream without key reuse.
"""
from __future__ import annotations

import os
import random

import jax
import numpy as np


def set_random_seeds(seed: int = 0) -> jax.Array:
    """Seed host-side RNGs (python/numpy, used by the data pipeline) and
    return the root JAX key. Ref surface: utils/seed.py:7."""
    os.environ["PYTHONHASHSEED"] = str(seed)
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.key(seed)


def step_key(root: jax.Array, step: int, purpose: str = "") -> jax.Array:
    """Deterministic per-step key: fold the step (and an optional purpose tag)
    into the root key. Never reuses streams across steps/purposes."""
    k = jax.random.fold_in(root, step)
    if purpose:
        k = jax.random.fold_in(k, abs(hash(purpose)) % (2**31))
    return k
