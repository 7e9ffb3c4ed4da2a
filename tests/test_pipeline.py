"""Pipeline parallelism: GPipe microbatch schedule == sequential chain."""
import jax
import jax.numpy as jnp
import numpy as np

from fastvision_tpu.core.mesh import create_mesh
from fastvision_tpu.parallel import pipeline_apply, stack_stage_params

N_STAGES, C, N_MICRO, MB = 4, 16, 8, 2


def stage_fn(p, x):
    return jnp.tanh(x @ p["w"] + p["b"])


def make_params(rng):
    return [
        {"w": jnp.asarray(rng.normal(0, 0.5, (C, C)), jnp.float32),
         "b": jnp.asarray(rng.normal(0, 0.1, (C,)), jnp.float32)}
        for _ in range(N_STAGES)
    ]


def sequential(params_list, mbs):
    def one(x):
        for p in params_list:
            x = stage_fn(p, x)
        return x
    return jax.vmap(one)(mbs)


def test_pipeline_matches_sequential(rng):
    params_list = make_params(rng)
    stacked = stack_stage_params(params_list)
    mbs = jnp.asarray(rng.normal(0, 1, (N_MICRO, MB, C)), jnp.float32)

    want = sequential(params_list, mbs)
    mesh = create_mesh(data=2, model=N_STAGES, time=1)
    with mesh:
        got = jax.jit(
            lambda s, m: pipeline_apply(stage_fn, s, m, mesh)
        )(stacked, mbs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_pipeline_grad_matches_sequential(rng):
    """jax.grad through the ppermute schedule IS GPipe backward."""
    params_list = make_params(rng)
    stacked = stack_stage_params(params_list)
    mbs = jnp.asarray(rng.normal(0, 1, (N_MICRO, MB, C)), jnp.float32)
    mesh = create_mesh(data=2, model=N_STAGES, time=1)

    def loss_seq(stk):
        plist = [jax.tree.map(lambda a: a[i], stk) for i in range(N_STAGES)]
        return (sequential(plist, mbs) ** 2).sum()

    def loss_pipe(stk):
        with mesh:
            return (pipeline_apply(stage_fn, stk, mbs, mesh) ** 2).sum()

    g_seq = jax.grad(loss_seq)(stacked)
    with mesh:
        g_pipe = jax.jit(jax.grad(loss_pipe))(stacked)
    for a, b in zip(jax.tree.leaves(g_seq), jax.tree.leaves(g_pipe)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_pipeline_vit_matches_plain_apply(rng):
    """A REAL zoo model through the pipeline: pipelined ViT forward ==
    model.apply, logits exact to fp tolerance (VERDICT r3 weak-4)."""
    from fastvision_tpu.models.classification.vit import ViT
    from fastvision_tpu.parallel import pipeline_vit_apply

    model = ViT(num_classes=5, patch=8, dim=32, depth=4, heads=2)
    images = jnp.asarray(rng.normal(0, 1, (8, 32, 32, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), images)
    want = model.apply(variables, images)

    mesh = create_mesh(data=2, model=4, time=1)
    with mesh:
        got = jax.jit(
            lambda v, im: pipeline_vit_apply(model, v, im, mesh, n_micro=4)
        )(variables, images)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_pipeline_vit_grad_matches_plain(rng):
    """GPipe backward through the staged ViT == plain backward (grads on
    the encoder blocks AND the replicated prefix/suffix params)."""
    from fastvision_tpu.models.classification.vit import ViT
    from fastvision_tpu.parallel import pipeline_vit_apply

    model = ViT(num_classes=3, patch=8, dim=16, depth=2, heads=2)
    images = jnp.asarray(rng.normal(0, 1, (4, 16, 16, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 3, 4), jnp.int32)
    variables = model.init(jax.random.key(1), images)
    mesh = create_mesh(data=4, model=2, time=1)

    def ce(logits):
        lp = jax.nn.log_softmax(logits)
        return -lp[jnp.arange(4), labels].mean()

    g_plain = jax.grad(lambda v: ce(model.apply(v, images)))(variables)
    with mesh:
        g_pipe = jax.jit(jax.grad(
            lambda v: ce(pipeline_vit_apply(model, v, images, mesh, n_micro=2))
        ))(variables)
    flat_a = jax.tree.leaves(g_plain)
    flat_b = jax.tree.leaves(g_pipe)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_vit_stage_split_rejects_indivisible_depth(rng):
    from fastvision_tpu.models.classification.vit import ViT
    from fastvision_tpu.parallel import vit_stage_split

    model = ViT(num_classes=3, patch=8, dim=16, depth=3, heads=2)
    images = jnp.zeros((2, 16, 16, 3))
    variables = model.init(jax.random.key(0), images)
    import pytest

    with pytest.raises(ValueError, match="not divisible"):
        vit_stage_split(model, variables["params"], 2)


def test_pipeline_fewer_microbatches_than_stages(rng):
    """Drain-phase correctness when n_micro < n_stages (bubble-dominated)."""
    params_list = make_params(rng)
    stacked = stack_stage_params(params_list)
    mbs = jnp.asarray(rng.normal(0, 1, (2, MB, C)), jnp.float32)  # 2 < 4
    want = sequential(params_list, mbs)
    mesh = create_mesh(data=2, model=N_STAGES, time=1)
    with mesh:
        got = jax.jit(
            lambda s, m: pipeline_apply(stage_fn, s, m, mesh)
        )(stacked, mbs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
