"""Video time-axis (sequence) parallelism building blocks.

The reference has no attention; its "long context" axis is video time
(SURVEY.md §2.5, §5): SlowFast/C3D clips. Scaling clip length beyond one
chip's memory means sharding the time axis over a `time` mesh dimension —
the CV analogue of sequence parallelism. Temporal convolutions then need
`halo` neighbor frames from adjacent shards, exchanged with `ppermute`
over ICI (ring neighbor exchange, no all-gather).

Usage inside `shard_map(..., mesh, in_specs=P(None, 'time'), ...)`:

    x = halo_exchange_time(x_local, 'time', halo=1)   # [B, T/n + 2h, ...]
    y = conv_time_valid(x)                            # consumes the halo

`time_sharded_conv` packages the pattern for a [B, T, H, W, C] clip and a
caller-supplied per-shard function.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def halo_exchange_time(x: jnp.ndarray, axis_name: str = "time", halo: int = 1) -> jnp.ndarray:
    """Exchange `halo` boundary frames with ring neighbors along a sharded
    time axis (axis 1 of [B, T_local, ...]).

    Returns [B, T_local + 2*halo, ...]; the first/last shard's outer halo is
    zero-padded (conv 'valid' over it == 'same' zero padding globally).
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    fwd = [(i, (i + 1) % n) for i in range(n)]  # send to right neighbor
    bwd = [(i, (i - 1) % n) for i in range(n)]  # send to left neighbor

    right_halo_src = x[:, -halo:]  # my tail -> right neighbor's left halo
    left_halo_src = x[:, :halo]  # my head -> left neighbor's right halo
    from_left = jax.lax.ppermute(right_halo_src, axis_name, fwd)
    from_right = jax.lax.ppermute(left_halo_src, axis_name, bwd)
    # zero the wrap-around edges (non-periodic time)
    from_left = jnp.where(idx == 0, jnp.zeros_like(from_left), from_left)
    from_right = jnp.where(idx == n - 1, jnp.zeros_like(from_right), from_right)
    return jnp.concatenate([from_left, x, from_right], axis=1)


def time_sharded_conv(
    fn: Callable[[jnp.ndarray], jnp.ndarray],
    clip: jnp.ndarray,  # [B, T, H, W, C] global
    mesh: Mesh,
    halo: int = 1,
    axis_name: str = "time",
) -> jnp.ndarray:
    """Run a temporal-window function over a time-sharded clip.

    `fn` receives the local shard EXTENDED by `halo` frames on each side
    ([B, T/n + 2*halo, H, W, C]) and must return exactly [B, T/n, ...]
    (i.e. consume the halo — a 'valid' conv of kernel 2*halo+1 does).
    Output is resharded the same way; collectives ride ICI.
    """

    def local(x_local):
        return fn(halo_exchange_time(x_local, axis_name, halo))

    return shard_map(
        local,
        mesh=mesh,
        in_specs=P(None, axis_name),
        out_specs=P(None, axis_name),
    )(clip)
