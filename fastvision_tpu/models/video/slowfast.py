"""SlowFast networks, NDHWC flax (ref videoRecognition/models/slowfast.py:324-345).

Two pathways over one clip [B, T, H, W, 3]:
  - Slow: temporal stride alpha (default 8) -> T/alpha frames, full channels;
  - Fast: every frame, beta (default 1/8) of the channels;
  - 4 lateral connections (time-strided conv on fast features, slowfast.py
    :181-190) concatenated into the slow pathway after stem and each of the
    first three stages (:281-290);
  - concat of both pathways' global averages -> classifier.

Time-axis sharding (long clips — SURVEY.md §2.5 SP analogue): set
`time_axis='time'` and run under a mesh with a 'time' dimension. The FAST
pathway (the T-heavy one: every frame at full rate) is constrained to stay
sharded over that axis; GSPMD then partitions its temporal convolutions
with automatic halo exchange over ICI (the compiler inserts the same
ppermute pattern `parallel.time_shard.halo_exchange_time` builds by hand).
The slow pathway carries T/alpha frames and stays unconstrained.

    mesh = create_mesh(data=1, time=8)
    model = slowfast_resnet50(num_classes=..., time_axis='time')
    with mesh:
        logits = jax.jit(model.apply)(vars, clip)   # clip [B, T, H, W, 3]
"""
from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .resnet3d import ConvBN3D, SpatioTemporalBlock, SpatioTemporalBottleneck


class Lateral(nn.Module):
    """Fast->Slow lateral: time-strided conv matching slow's frame rate."""

    features: int
    alpha: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, fast, train: bool = False):
        return ConvBN3D(
            self.features, (5, 1, 1), (self.alpha, 1, 1), dtype=self.dtype, name="conv"
        )(fast, train)


class SlowFast(nn.Module):
    block_cls: type
    stage_sizes: Sequence[int]
    num_classes: int = 400
    alpha: int = 8  # fast/slow frame-rate ratio
    beta_inv: int = 8  # slow/fast channel ratio
    dtype: Any = jnp.float32
    time_axis: str | None = None  # mesh axis to shard the fast pathway's T over

    def _time_constrain(self, x):
        """Pin [B, T, H, W, C] activations to stay T-sharded over the mesh
        `time_axis` (no-op when unset). GSPMD partitions the temporal convs
        between constraints, inserting halo exchanges over ICI."""
        if self.time_axis is None:
            return x
        # UNCONSTRAINED on every non-time dim: a hard `None` (replicated)
        # on the batch dim would clobber an outer data-parallel sharding —
        # on a ('data' x 'time') mesh GSPMD then resharded batch->time by
        # full rematerialization every constraint (observed in the driver
        # dryrun). Leaving them open lets batch stay data-sharded.
        u = P.UNCONSTRAINED
        return jax.lax.with_sharding_constraint(
            x, P(u, self.time_axis, u, u, u)
        )

    def _pathway(self, x, width_mult: float, temporal_stem: bool, prefix: str, train):
        """Build one pathway's stages, returning per-stage features."""
        base = max(int(64 * width_mult), 8)
        x = ConvBN3D(
            base, (5 if temporal_stem else 1, 7, 7), (1, 2, 2),
            dtype=self.dtype, name=f"{prefix}_stem",
        )(x, train)
        x = nn.max_pool(x, (1, 3, 3), (1, 2, 2), "SAME")
        return x, base

    @nn.compact
    def __call__(self, x, train: bool = False):
        slow_in = x[:, :: self.alpha]  # temporal stride alpha (slowfast.py:324-333)
        fast_in = self._time_constrain(x)

        slow, slow_base = self._pathway(slow_in, 1.0, False, "slow", train)
        fast, fast_base = self._pathway(fast_in, 1.0 / self.beta_inv, True, "fast", train)
        fast = self._time_constrain(fast)
        # lateral after stem
        lat = Lateral(fast_base * 2, self.alpha, self.dtype, name="lateral_stem")(fast, train)
        slow = jnp.concatenate([slow, lat], axis=-1)

        exp = self.block_cls.expansion
        for i, n_blocks in enumerate(self.stage_sizes):
            s_feat = 64 * 2**i
            f_feat = max(s_feat // self.beta_inv, 8)
            for j in range(n_blocks):
                strides = (1, 2, 2) if (i > 0 and j == 0) else (1, 1, 1)
                slow = self.block_cls(s_feat, strides, dtype=self.dtype,
                                      name=f"slow_s{i + 1}_b{j}")(slow, train)
                fast = self._time_constrain(
                    self.block_cls(f_feat, strides, dtype=self.dtype,
                                   name=f"fast_s{i + 1}_b{j}")(fast, train)
                )
            if i < len(self.stage_sizes) - 1:  # laterals after stages 1-3
                lat = Lateral(f_feat * exp * 2, self.alpha, self.dtype,
                              name=f"lateral_s{i + 1}")(fast, train)
                slow = jnp.concatenate([slow, lat], axis=-1)

        slow = jnp.mean(slow, axis=(1, 2, 3))
        fast = jnp.mean(fast, axis=(1, 2, 3))
        feat = jnp.concatenate([slow, fast], axis=-1)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(feat)


slowfast_resnet18 = partial(SlowFast, SpatioTemporalBlock, (2, 2, 2, 2))
slowfast_resnet34 = partial(SlowFast, SpatioTemporalBlock, (3, 4, 6, 3))
slowfast_resnet50 = partial(SlowFast, SpatioTemporalBottleneck, (3, 4, 6, 3))
slowfast_resnet101 = partial(SlowFast, SpatioTemporalBottleneck, (3, 4, 23, 3))
slowfast_resnet152 = partial(SlowFast, SpatioTemporalBottleneck, (3, 8, 36, 3))
