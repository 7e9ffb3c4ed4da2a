"""FSDP (ZeRO-3-style) parameter sharding over the data axis.

The reference's only multi-GPU strategy replicates parameters on every
device (`nn.DataParallel`, SURVEY.md §2.5). On TPU, fully-sharded data
parallelism is a sharding annotation, not an algorithm: shard every
parameter leaf's largest divisible dimension over the mesh's existing
'data' axis and run the SAME jitted train step. GSPMD inserts an
all-gather before each use in forward/backward, emits the gradient
reduction as a reduce-scatter back to the shard layout, and the optimizer
update runs shard-local — parameters, gradients, AND optimizer state all
live 1/N-sized per device (the scaling-book FSDP recipe). No step-code
changes; the contract is fsdp-trained == replicated-dp-trained
(tests/test_fsdp.py).

Sharding rule (by shape only, like tensor_shard.tp_spec):

  - shard the LARGEST dimension divisible by the axis size (ties -> the
    last such dim, which for conv kernels [Kh, Kw, Cin, Cout] prefers
    channel dims over the tiny spatial ones);
  - leaves smaller than `min_size` elements replicate — gathering a
    64-float BN vector costs more in collective latency than its
    replication costs in HBM;
  - scalars and non-divisible leaves replicate. Correctness never
    depends on divisibility.

Compose freely with the other axes: params sharded over 'data' (FSDP)
can ALSO carry a 'model' split from tensor_shard on another dim — pass
`axis=("data", "model")`-style meshes per leaf yourself if you need
hybrid; this module keeps the common case one call.
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.mesh import DATA_AXIS


def fsdp_spec(x, axis_size: int, axis: str = DATA_AXIS,
              min_size: int = 1024) -> P:
    """The FSDP PartitionSpec for one parameter leaf (see module rule)."""
    shape = np.shape(x)
    if not shape or int(np.prod(shape)) < max(min_size, axis_size):
        return P()
    best, best_len = -1, 0
    for i, s in enumerate(shape):
        if s % axis_size == 0 and s >= best_len:
            best, best_len = i, s
    if best < 0:
        return P()
    spec = [None] * len(shape)
    spec[best] = axis
    return P(*spec)


def fsdp_shard_variables(
    variables: Any, mesh: Mesh, axis: str = DATA_AXIS, min_size: int = 1024
) -> Any:
    """device_put a flax variables pytree (or any param/opt-state tree)
    with each leaf sharded per `fsdp_spec` over the mesh's data axis.

    Drop the result into the same jitted step you run data-parallel.
    Works on TrainState fields too: shard `state.params` and the optax
    state (same tree structure -> same specs) and the whole optimizer
    sweep runs on 1/N of each parameter.
    """
    n = mesh.shape[axis]

    def put(x):
        return jax.device_put(
            x, NamedSharding(mesh, fsdp_spec(x, n, axis, min_size)))

    return jax.tree.map(put, variables)
