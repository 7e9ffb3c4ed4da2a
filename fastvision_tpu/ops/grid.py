"""Grid-cell offset generation for anchor-based detectors.

TPU-native version of `detection/tools/GRID.py:4`: a single jnp function,
static shapes, used to decode YOLO xy offsets.
"""
from __future__ import annotations

import jax.numpy as jnp


def grid(height: int, width: int, mode: str = "xy", dtype=jnp.float32) -> jnp.ndarray:
    """Meshgrid of integer cell offsets.

    Returns shape [height, width, 2]; ``mode='xy'`` puts the x (column) offset
    first in the last axis, ``mode='yx'`` puts the y (row) offset first.
    Matches the semantics of detection/tools/GRID.py:4 (the channel ordering,
    not its transposed-axes quirk — we always index [row, col, :]).
    """
    ys = jnp.arange(height, dtype=dtype)
    xs = jnp.arange(width, dtype=dtype)
    oy, ox = jnp.meshgrid(ys, xs, indexing="ij")  # each [H, W]
    if mode == "xy":
        return jnp.stack([ox, oy], axis=-1)
    if mode == "yx":
        return jnp.stack([oy, ox], axis=-1)
    raise ValueError("mode must be 'xy' or 'yx'")
