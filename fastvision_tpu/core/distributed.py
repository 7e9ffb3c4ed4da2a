"""Multi-host initialization + device/axis utilities.

The reference's device management is `set_device` writing
CUDA_VISIBLE_DEVICES (utils/device.py:4) and its multi-process story is a
dead DDP import (SURVEY.md §2.5). TPU-native equivalents:

  - `initialize_multihost()`: `jax.distributed.initialize` — after it, the
    same `create_mesh()` spans all hosts' devices, ICI within a slice and
    DCN across slices handled by XLA;
  - `set_visible_devices(n)`: limit local devices (debug parity with
    set_device);
  - `process_info()`: (process_index, process_count, local/global devices)
    for logging and per-host input sharding.
"""
from __future__ import annotations

import os
from typing import Sequence

import jax


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize JAX's distributed runtime (multi-host). With no args,
    relies on the TPU environment's auto-detection (the common case on
    Cloud TPU); explicit args support manual clusters."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def set_visible_devices(device_ids: Sequence[int] | int) -> None:
    """Restrict the process to a subset of local devices. Must run before
    the backend initializes (ref utils/device.py:4 semantics)."""
    if isinstance(device_ids, int):
        device_ids = [device_ids]
    os.environ["JAX_VISIBLE_DEVICES"] = ",".join(str(d) for d in device_ids)
    os.environ["TPU_VISIBLE_DEVICES"] = ",".join(str(d) for d in device_ids)


def process_info() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_device_count": jax.local_device_count(),
        "global_device_count": jax.device_count(),
    }
