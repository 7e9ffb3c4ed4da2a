"""Tensor (model-axis) parallelism: channel-sharded parameters.

The reference never shards a model — its one GPU strategy is
`nn.DataParallel` (SURVEY.md §2.5) — but this framework's mesh carries a
'model' axis precisely so models larger than one chip's HBM can split
channels over it. TPU-native recipe (the scaling-book pattern): annotate
PARAMETER shardings only, run the SAME jitted forward/train step under
the mesh, and let GSPMD propagate activation shardings and insert the
collectives over ICI. No model-code changes, no hand-written collectives.

Sharding rule (Megatron-style for conv nets, applied by array rank/shape):

  - conv kernels  [Kh, Kw, Cin, Cout] -> P(None, None, None, 'model')
    (output-channel sharded: each shard computes a channel slice; the
    next conv contracts over its Cin = an ICI all-reduce GSPMD inserts
    where needed);
  - dense kernels [Cin, Cout]         -> P(None, 'model');
  - per-channel vectors [C] (BN scale/bias/mean/var, biases) ->
    P('model') when C is divisible by the axis, else replicated;
  - everything else (scalars, stems with tiny C) -> replicated.

`shard_variables` device_puts a whole flax variables pytree (params +
batch_stats + quant + ...) under these rules. Channel dims smaller than
the axis size (or not divisible) stay replicated — correctness never
depends on divisibility.
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.mesh import MODEL_AXIS


def tp_spec(x, axis_size: int) -> P:
    """The tensor-parallel PartitionSpec for one parameter array."""
    shape = np.shape(x)
    if not shape or shape[-1] % axis_size:
        return P()
    none = (None,) * (len(shape) - 1)
    return P(*none, MODEL_AXIS)


def shard_variables(
    variables: Any, mesh: Mesh, axis: str = MODEL_AXIS
) -> Any:
    """device_put a flax variables pytree with trailing (channel) dims
    sharded over the mesh's model axis; non-divisible leaves replicate.

    Returns the same pytree structure with committed, sharded arrays —
    drop it into the same `jit`ted step you run data-parallel; GSPMD does
    the rest (tested sharded == single-device in
    tests/test_tensor_shard.py).
    """
    n = mesh.shape[axis]

    def put(x):
        return jax.device_put(x, NamedSharding(mesh, tp_spec(x, n)))

    return jax.tree.map(put, variables)
