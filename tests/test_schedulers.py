"""LR schedule unit tests: endpoint values, warmup, restarts, plateau."""
import numpy as np

from fastvision_tpu.train import (
    PlateauScheduler,
    constant_lr,
    cosine_lr,
    exponential_lr,
    linear_lr,
    step_decay_lr,
    warmup_cosine_lr,
)


def test_cosine_endpoints():
    s = cosine_lr(1.0, 0.1, 100)
    assert abs(s(0) - 1.0) < 1e-9
    assert abs(s(100) - 0.1) < 1e-9
    assert abs(s(50) - 0.55) < 1e-9  # midpoint = mean
    assert abs(s(200) - 0.1) < 1e-9  # clamps past the end


def test_linear_endpoints():
    s = linear_lr(1.0, 0.0, 10)
    np.testing.assert_allclose([s(0), s(5), s(10)], [1.0, 0.5, 0.0])


def test_exponential_geometric():
    s = exponential_lr(1.0, 0.01, 100)
    assert abs(s(50) - 0.1) < 1e-9  # geometric midpoint
    assert abs(s(100) - 0.01) < 1e-9


def test_step_decay():
    s = step_decay_lr(1.0, decay_every=8, gamma=0.1)
    assert s(0) == 1.0 and s(7) == 1.0
    assert abs(s(8) - 0.1) < 1e-12
    assert abs(s(16) - 0.01) < 1e-12


def test_warmup_cosine():
    s = warmup_cosine_lr(1.0, 0.0, total_steps=110, warmup_steps=10, warmup_init_lr=0.0)
    assert s(0) == 0.0
    assert abs(s(5) - 0.5) < 1e-9  # linear warmup
    assert abs(s(10) - 1.0) < 1e-9  # peak at warmup end
    assert s(60) < 1.0


def test_warmup_cosine_restarts():
    s = warmup_cosine_lr(1.0, 0.0, total_steps=100, warmup_steps=0, cycles=2)
    assert abs(s(0) - 1.0) < 1e-9
    assert abs(s(49) - 0.0) < 1e-2  # end of cycle 1
    assert abs(s(50) - 1.0) < 1e-9  # restart


def test_constant():
    assert constant_lr(0.3)(12345) == 0.3


def test_plateau_decays_after_patience():
    p = PlateauScheduler(patience=2, gamma=0.1, mode="min")
    assert p.update(1.0) == 1.0  # first = best
    assert p.update(0.9) == 1.0  # improved
    assert p.update(0.95) == 1.0  # bad 1
    assert abs(p.update(0.95) - 0.1) < 1e-12  # bad 2 -> decay
    assert abs(p.update(0.5) - 0.1) < 1e-12  # improvement keeps scale
    # max mode
    p = PlateauScheduler(patience=1, gamma=0.5, mode="max")
    p.update(0.5)
    assert abs(p.update(0.4) - 0.5) < 1e-12


def test_plateau_min_scale_floor():
    p = PlateauScheduler(patience=1, gamma=0.1, min_scale=1e-2)
    p.update(1.0)
    for _ in range(5):
        p.update(2.0)
    assert p.scale >= 1e-2
