"""One-hot encoding (ref: datasets/common/id_2_onehot.py:4)."""
from __future__ import annotations

import jax.numpy as jnp


def one_hot(labels: jnp.ndarray, num_classes: int, dtype=jnp.float32) -> jnp.ndarray:
    """Integer labels [...,] -> one-hot [..., num_classes]."""
    labels = jnp.asarray(labels)
    return (labels[..., None] == jnp.arange(num_classes, dtype=labels.dtype)).astype(dtype)
