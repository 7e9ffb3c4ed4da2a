"""Top-k accuracy metric (ref metrics/accuracy.py:3)."""
from __future__ import annotations

import jax.numpy as jnp


def accuracy(logits: jnp.ndarray, labels: jnp.ndarray, topk: int = 1) -> jnp.ndarray:
    """logits [N, C], labels [N] -> scalar top-k accuracy in [0, 1]."""
    if topk == 1:
        return jnp.mean(jnp.argmax(logits, axis=-1) == labels)
    top = jnp.argsort(-logits, axis=-1)[:, :topk]
    return jnp.mean(jnp.any(top == labels[:, None], axis=-1))


class Accuracy:
    """Streaming accuracy accumulator (reference class surface)."""

    def __init__(self, topk: int = 1):
        self.topk = topk
        self.correct = 0
        self.total = 0

    def __call__(self, logits, labels) -> float:
        import numpy as np

        logits = np.asarray(logits)
        labels = np.asarray(labels)
        if self.topk == 1:
            c = int((logits.argmax(-1) == labels).sum())
        else:
            top = np.argsort(-logits, axis=-1)[:, : self.topk]
            c = int((top == labels[:, None]).any(-1).sum())
        self.correct += c
        self.total += len(labels)
        return c / max(len(labels), 1)

    def fetch(self) -> float:
        return self.correct / max(self.total, 1)
