"""Telemetry: structured metric logging, step timing, and profiler hooks.

The reference's observability is `print()` + tqdm and an *empty* logger stub
(utils/logger.py is 0 bytes; SURVEY.md §5). This module is the real thing:

  - `MetricLogger`: JSONL metrics file + stdout lines, epoch/step tagged;
  - `StepTimer`: wall-clock per-step timing with warmup skip and
    images/sec derivation (blocks on device work via block_until_ready);
  - `trace()`: context manager around `jax.profiler` for on-demand traces.
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any

import jax


class MetricLogger:
    def __init__(self, log_dir: str | None = None, name: str = "train", stdout: bool = True):
        self.stdout = stdout
        self._fh = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._fh = open(os.path.join(log_dir, f"{name}.jsonl"), "a")

    def log(self, step: int, **metrics: Any) -> None:
        rec = {"step": step, "time": time.time()}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        if self.stdout:
            parts = " ".join(
                f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in rec.items()
                if k != "time"
            )
            print(f"[fastvision] {parts}", flush=True)

    def close(self):
        if self._fh:
            self._fh.close()


class StepTimer:
    """Per-step timing; call `tick(result)` once per step."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.count = 0
        self.total = 0.0
        self._last = None

    def start(self):
        self._last = time.perf_counter()

    def tick(self, result: Any = None) -> float:
        if result is not None:
            jax.block_until_ready(result)
        now = time.perf_counter()
        dt = now - (self._last if self._last is not None else now)
        self._last = now
        self.count += 1
        if self.count > self.warmup:
            self.total += dt
        return dt

    @property
    def mean(self) -> float:
        n = max(self.count - self.warmup, 1)
        return self.total / n


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/fastvision_trace"):
    """Capture a jax.profiler trace around a code region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


# ----------------------------------------------------------------------------
# MFU accounting (shared by bench.py, tools/probe_zoo_throughput.py, doctor)
# ----------------------------------------------------------------------------
# v5e peak rates per chip. mfu_* numbers everywhere in the repo use these
# denominators; `doctor` measures the practically-achievable MXU ceiling
# (~147 TFLOP/s bf16 = 75% of peak) to judge them against.
V5E_PEAK_BF16 = 197e12  # FLOP/s
V5E_PEAK_INT8 = 394e12  # OP/s


def flops_of(jitted, *args) -> float | None:
    """Compiler FLOP estimate of a jitted callable via AOT lowering (with a
    persistent compile cache the extra compile() is a disk hit). Returns
    None on backends without cost analysis."""
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        f = cost.get("flops")
        return float(f) if f else None
    except Exception:
        return None
