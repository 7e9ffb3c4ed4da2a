"""Device mesh & sharding utilities — the framework's parallelism backbone.

The reference's only active parallelism is single-process `nn.DataParallel`
(demos/yolov3_u/train.py:85; SURVEY.md §2.5). TPU-native equivalent: a
`jax.sharding.Mesh` with named axes and NamedSharding annotations; XLA
inserts the collectives (grad psum, BN pmean) over ICI. Axis names:

  - ``data``  : batch sharding (data parallel) — the default strategy;
  - ``model`` : channel/tensor sharding hooks (unused by default);
  - ``time``  : video time-axis sharding hooks for long clips (SlowFast).

Multi-host: call `jax.distributed.initialize()` before `create_mesh` and the
same code scales over DCN.
"""
from __future__ import annotations

import dataclasses
import os
from contextlib import contextmanager
from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
TIME_AXIS = "time"


def create_mesh(
    data: int | None = None,
    model: int = 1,
    time: int = 1,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a ('data', 'model', 'time') mesh over the available devices.

    With no arguments, all devices go to the data axis — the DataParallel
    replacement. Axis sizes must multiply to the device count.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // (model * time)
    if data * model * time != n:
        raise ValueError(f"mesh {data}x{model}x{time} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, model, time)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS, TIME_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (params, small state)."""
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, per_host: bool = False) -> Any:
    """Device-put a host pytree with its leading dim sharded over 'data'.

    Replaces the reference's `.cuda(non_blocking=True)` H2D transfer
    (utils/fit.py:54-55) + DataParallel scatter in one step.

    Multi-host (`jax.process_count() > 1`):

    - ``per_host=False`` (default): every process holds the same FULL
      global batch; device_put places each process's addressable shards.
    - ``per_host=True``: each process holds only its LOCAL 1/P slice of
      the batch dim (loaders built with ``host_shard='auto'`` — each host
      decodes a disjoint 1/P of the data); the global array is assembled
      with `jax.make_array_from_process_local_data`. The data axis must
      span processes in process order (what `create_mesh` builds, since
      `jax.devices()` orders by process).

    With one process the two modes are identical, so callers can pass
    ``per_host`` unconditionally.
    """
    sharding = batch_sharding(mesh)
    if per_host and jax.process_count() > 1:
        pc = jax.process_count()

        def put(x):
            x = np.asarray(x)
            return jax.make_array_from_process_local_data(
                sharding, x, (x.shape[0] * pc, *x.shape[1:])
            )

        return jax.tree.map(put, batch)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Device-put a pytree fully replicated (params/opt state)."""
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def local_batch_size(global_batch_size: int, mesh: Mesh) -> int:
    n = mesh.shape[DATA_AXIS]
    if global_batch_size % n:
        raise ValueError(f"global batch {global_batch_size} not divisible by data axis {n}")
    return global_batch_size // n


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Serializable mesh description (goes into the run config)."""

    data: int | None = None
    model: int = 1
    time: int = 1

    def build(self, devices: Sequence[jax.Device] | None = None) -> Mesh:
        return create_mesh(self.data, self.model, self.time, devices)


@contextmanager
def maybe_mesh(mesh: Mesh | None):
    """Enter the mesh context if one is given, else no-op."""
    if mesh is None:
        yield None
    else:
        with mesh:
            yield mesh


def enable_compile_cache(cache_dir: str) -> None:
    """Persistent XLA compilation cache: executables survive restarts.

    First jit of the big programs costs 20-40s on TPU; with this on,
    serving cold-start / training resume / later multiscale epochs load
    the compiled binary from `cache_dir` instead. Safe to share across
    processes; keyed by HLO + compile options + backend version.
    """
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything, not just >1s compiles, and regardless of size
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
