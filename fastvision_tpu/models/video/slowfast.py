"""SlowFast networks, NDHWC flax (ref videoRecognition/models/slowfast.py:324-345).

Two pathways over one clip [B, T, H, W, 3]:
  - Slow: temporal stride alpha (default 8) -> T/alpha frames, full channels;
  - Fast: every frame, beta (default 1/8) of the channels;
  - 4 lateral connections — bare time-strided (5,1,1)/(alpha,1,1) convs, no
    norm/act (slowfast.py:181-190) — concatenated into the slow pathway
    after the stem pool and each of the first three stages (:281-290);
  - concat of [fast, slow] global averages (:319) -> classifier.

Structure-exact to the reference's own Bottleneck (slowfast.py:45-107),
verified by executed-reference forward parity
(tests/test_reference_video_parity.py):
  - conv1 is temporal (3,1,1) only on the FIRST block of a stage that was
    built with tempral_size=3, else pointwise (1,1,1) (the reference's
    _make_layer passes tempral_size only to block 0, :196-203);
  - slow pathway: stages res2/res3 are all-pointwise, res4/res5 start
    temporal (:251-258); fast pathway: every stage starts temporal (:183-192);
  - conv2 (1,3,3) carries the spatial stride; time is never downsampled
    inside a pathway (:73);
  - slow stem (1,7,7), fast stem (5,7,7), both stride (1,2,2) (:172,:241).

Padding is explicit torch-style (k//2) — see resnet3d.py note on XLA SAME
vs torch at stride 2.

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

from .resnet3d import ConvBN3D


class SFBottleneck(nn.Module):
    """The reference SlowFast's own bottleneck (slowfast.py:45-107):
    conv1 (3,1,1) if `temporal_conv1` else (1,1,1); conv2 (1,3,3) with the
    spatial stride; conv3 (1,1,1) expand; strided 1x1x1 skip on mismatch."""

    features: int
    strides: tuple = (1, 1, 1)
    temporal_conv1: bool = False
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        k1 = (3, 1, 1) if self.temporal_conv1 else (1, 1, 1)
        y = ConvBN3D(self.features, k1, dtype=self.dtype, name="conv1")(x, train)
        y = ConvBN3D(self.features, (1, 3, 3), self.strides, dtype=self.dtype,
                     name="conv2")(y, train)
        y = ConvBN3D(self.features * self.expansion, (1, 1, 1), act=False,
                     dtype=self.dtype, name="conv3")(y, train)
        if residual.shape != y.shape:
            residual = ConvBN3D(self.features * self.expansion, (1, 1, 1),
                                self.strides, act=False, dtype=self.dtype,
                                name="downsample")(x, train)
        return nn.relu(y + residual)


class Lateral(nn.Module):
    """Fast->Slow lateral: bare time-strided conv matching slow's frame rate
    (slowfast.py:181-190 Conv3x1x1 — no BN, no activation, no bias)."""

    features: int
    alpha: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, fast):
        return nn.Conv(self.features, (5, 1, 1), strides=(self.alpha, 1, 1),
                       padding=((2, 2), (0, 0), (0, 0)), use_bias=False,
                       dtype=self.dtype, name="conv")(fast)


class SlowFast(nn.Module):
    stage_sizes: Sequence[int]
    num_classes: int = 400
    alpha: int = 8  # fast/slow frame-rate ratio
    beta_inv: int = 8  # slow/fast channel ratio
    dtype: Any = jnp.float32
    time_axis: str | None = None  # mesh axis to shard the fast pathway's T over
    expansion: int = 4

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

    def _stem(self, x, features: int, temporal: bool, prefix: str, train):
        x = ConvBN3D(features, (5 if temporal else 1, 7, 7), (1, 2, 2),
                     dtype=self.dtype, name=f"{prefix}_stem")(x, train)
        return nn.max_pool(x, (1, 3, 3), (1, 2, 2),
                           padding=((0, 0), (1, 1), (1, 1)))

    @nn.compact
    def __call__(self, x, train: bool = False):
        slow_in = x[:, :: self.alpha]  # temporal stride alpha (slowfast.py:324-333)
        fast_in = self._time_constrain(x)

        fast_base = max(64 // self.beta_inv, 1)
        slow = self._stem(slow_in, 64, False, "slow", train)
        fast = self._time_constrain(self._stem(fast_in, fast_base, True, "fast", train))
        # lateral after the stem pool (slowfast.py:213,281)
        lat = Lateral(fast_base * 2, self.alpha, self.dtype, name="lateral_stem")(fast)
        slow = jnp.concatenate([slow, lat], axis=-1)

        exp = self.expansion
        for i, n_blocks in enumerate(self.stage_sizes):
            s_feat = 64 * 2**i
            f_feat = max(s_feat // self.beta_inv, 1)
            for j in range(n_blocks):
                strides = (1, 2, 2) if (i > 0 and j == 0) else (1, 1, 1)
                # tempral_size pattern (slowfast.py:183-192,251-258): first
                # block only; slow pathway temporal from stage res4 (i=2) on.
                slow = SFBottleneck(
                    s_feat, strides, temporal_conv1=(j == 0 and i >= 2),
                    expansion=exp, dtype=self.dtype,
                    name=f"slow_s{i + 1}_b{j}")(slow, train)
                fast = self._time_constrain(SFBottleneck(
                    f_feat, strides, temporal_conv1=(j == 0),
                    expansion=exp, dtype=self.dtype,
                    name=f"fast_s{i + 1}_b{j}")(fast, train))
            if i < len(self.stage_sizes) - 1:  # laterals after stages 1-3
                lat = Lateral(f_feat * exp * 2, self.alpha, self.dtype,
                              name=f"lateral_s{i + 1}")(fast)
                slow = jnp.concatenate([slow, lat], axis=-1)

        slow = jnp.mean(slow, axis=(1, 2, 3))
        fast = jnp.mean(fast, axis=(1, 2, 3))
        # [fast, slow] order matches the reference concat (slowfast.py:319)
        feat = jnp.concatenate([fast, slow], axis=-1)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(feat)


# The reference builds every slowfast variant from its Bottleneck
# (slowfast.py:324-345; its resnet34 factory even reuses [3,4,6,3]).
slowfast_resnet18 = partial(SlowFast, (2, 2, 2, 2))
slowfast_resnet34 = partial(SlowFast, (3, 4, 6, 3))
slowfast_resnet50 = partial(SlowFast, (3, 4, 6, 3))
slowfast_resnet101 = partial(SlowFast, (3, 4, 23, 3))
slowfast_resnet152 = partial(SlowFast, (3, 8, 36, 3))
