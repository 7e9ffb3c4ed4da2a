"""LR schedules: cosine / linear / exponential between (initial, final),
warmup + cosine(+restarts), step decay, and plateau.

Covers the reference's scheduler surface as pure step->lr functions:
  - utils/sheduler.py: CosineLR :6, LinearLR :21, ExponentialLR :37,
    WarmupCosineLR :46 (warmup + multi-cycle cosine);
  - demos/yolov3_huaweiShip/cfg/_fit.py:43-47 per-iter linear warmup +
    CosineAnnealingWarmRestarts (train.py:146);
  - demos/faster_rcnn/cfg/_fit.py:23-25 step decay (x0.1 every 8 epochs);
  - demos/yolov3_u/cfg/_fit.py:20-30 plateau decay (x0.1 after `patience`
    epochs without val improvement) -> `PlateauScheduler` (stateful,
    host-side — it depends on val loss, not step count).

All step-based schedules are plain callables usable with optax or with the
framework's explicit-lr train step.
"""
from __future__ import annotations

import math
from typing import Callable

Schedule = Callable[[int], float]


def cosine_lr(initial_lr: float, final_lr: float, total_steps: int) -> Schedule:
    def fn(step: int) -> float:
        t = min(step, total_steps) / max(total_steps, 1)
        return final_lr + 0.5 * (initial_lr - final_lr) * (1 + math.cos(math.pi * t))

    return fn


def linear_lr(initial_lr: float, final_lr: float, total_steps: int) -> Schedule:
    def fn(step: int) -> float:
        t = min(step, total_steps) / max(total_steps, 1)
        return initial_lr + (final_lr - initial_lr) * t

    return fn


def exponential_lr(initial_lr: float, final_lr: float, total_steps: int) -> Schedule:
    ratio = final_lr / max(initial_lr, 1e-12)

    def fn(step: int) -> float:
        t = min(step, total_steps) / max(total_steps, 1)
        return initial_lr * ratio**t

    return fn


def step_decay_lr(initial_lr: float, decay_every: int, gamma: float = 0.1) -> Schedule:
    def fn(step: int) -> float:
        return initial_lr * gamma ** (step // max(decay_every, 1))

    return fn


def warmup_cosine_lr(
    initial_lr: float,
    final_lr: float,
    total_steps: int,
    warmup_steps: int = 0,
    warmup_init_lr: float = 0.0,
    cycles: int = 1,
) -> Schedule:
    """Linear warmup then `cycles` cosine annealings to final_lr.

    cycles > 1 == CosineAnnealingWarmRestarts behavior (each cycle restarts
    at initial_lr; equal cycle lengths).
    """
    cycle_len = max((total_steps - warmup_steps) // max(cycles, 1), 1)

    def fn(step: int) -> float:
        if step < warmup_steps:
            return warmup_init_lr + (initial_lr - warmup_init_lr) * step / max(warmup_steps, 1)
        s = (step - warmup_steps) % cycle_len
        t = s / cycle_len
        return final_lr + 0.5 * (initial_lr - final_lr) * (1 + math.cos(math.pi * t))

    return fn


def constant_lr(lr: float) -> Schedule:
    return lambda step: lr


class PlateauScheduler:
    """Multiply LR by `gamma` after `patience` epochs without metric
    improvement (ref demos/yolov3_u/cfg/_fit.py:20-30). Host-side state;
    call `update(metric)` once per epoch and multiply its factor into the
    base schedule's value."""

    def __init__(self, patience: int = 3, gamma: float = 0.1, mode: str = "min",
                 min_scale: float = 1e-4):
        self.patience = patience
        self.gamma = gamma
        self.mode = mode
        self.min_scale = min_scale
        self.best = None
        self.bad_epochs = 0
        self.scale = 1.0

    def update(self, metric: float) -> float:
        improved = (
            self.best is None
            or (metric < self.best if self.mode == "min" else metric > self.best)
        )
        if improved:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs >= self.patience:
                self.scale = max(self.scale * self.gamma, self.min_scale)
                self.bad_epochs = 0
        return self.scale


SCHEDULES = {
    "cosine": cosine_lr,
    "linear": linear_lr,
    "exponential": exponential_lr,
}
