"""Time-axis sharding: temporal conv over a sharded clip == unsharded conv."""
import jax
import jax.numpy as jnp
import numpy as np

from fastvision_tpu.core.mesh import create_mesh
from fastvision_tpu.parallel import time_sharded_conv


def temporal_conv_valid(x, kernel):
    """[B, T, H, W, C] 'valid' conv along time with kernel [K]."""
    k = kernel.shape[0]
    out = sum(
        x[:, i : x.shape[1] - (k - 1 - i)] * kernel[i] for i in range(k)
    )
    return out


def test_time_sharded_conv_matches_global(rng):
    mesh = create_mesh(data=1, model=1, time=8)
    b, t, h, w, c = 2, 32, 4, 4, 3
    clip = jnp.asarray(rng.normal(0, 1, (b, t, h, w, c)), jnp.float32)
    kernel = jnp.asarray([0.25, 0.5, 0.25])

    # global reference: zero-pad 1 frame each side, then valid conv
    padded = jnp.pad(clip, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    want = temporal_conv_valid(padded, kernel)

    with mesh:
        got = time_sharded_conv(
            lambda x: temporal_conv_valid(x, kernel), clip, mesh, halo=1
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_time_sharded_conv_jits(rng):
    mesh = create_mesh(data=1, model=1, time=8)
    clip = jnp.asarray(rng.normal(0, 1, (1, 16, 2, 2, 2)), jnp.float32)
    kernel = jnp.asarray([1.0, 1.0, 1.0])

    @jax.jit
    def run(x):
        return time_sharded_conv(lambda y: temporal_conv_valid(y, kernel), x, mesh, 1)

    with mesh:
        out = run(clip)
    assert out.shape == (1, 16, 2, 2, 2)


def test_slowfast_time_sharded_matches_unsharded(rng):
    """SlowFast with time_axis='time' under a time mesh == the unsharded
    model (GSPMD partitions the fast pathway's temporal convs with halo
    exchange; VERDICT r1 item 7)."""
    from fastvision_tpu.models.video.slowfast import SlowFast

    # expansion=1 keeps the reference-exact bottleneck stages tiny; the
    # fast pathway's temporal convs are what the halo exchange partitions
    kw = dict(stage_sizes=(1, 1, 1, 1), num_classes=5, alpha=4, beta_inv=4,
              expansion=1)
    plain = SlowFast(**kw)
    sharded = SlowFast(**kw, time_axis="time")

    b, t, s = 2, 8, 32
    clip = jnp.asarray(rng.normal(0, 1, (b, t, s, s, 3)), jnp.float32)
    variables = plain.init(jax.random.key(0), clip, train=False)

    want = plain.apply(variables, clip, train=False)
    mesh = create_mesh(data=1, model=1, time=4, devices=jax.devices()[:4])
    with mesh:
        got = jax.jit(lambda v, x: sharded.apply(v, x, train=False))(variables, clip)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)
