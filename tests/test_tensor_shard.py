"""Tensor (model-axis) parallelism: sharded params == single-device.

GSPMD propagates from parameter shardings alone (parallel/tensor_shard.py)
— the same jitted program must produce identical results with channel-
sharded parameters on a 'model' mesh axis, including a full dp x tp 2D
mesh and a train step with BN stat updates.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastvision_tpu.core.mesh import create_mesh, replicate, shard_batch
from fastvision_tpu.parallel import shard_variables, tp_spec
from jax.sharding import PartitionSpec as P


def test_tp_spec_rules():
    assert tp_spec(np.zeros((3, 3, 16, 64)), 8) == P(None, None, None, "model")
    assert tp_spec(np.zeros((128, 256)), 8) == P(None, "model")
    assert tp_spec(np.zeros((64,)), 8) == P("model")
    # non-divisible trailing dim replicates
    assert tp_spec(np.zeros((3, 3, 3, 12)), 8) == P()
    assert tp_spec(np.zeros(()), 8) == P()


@pytest.fixture(scope="module")
def resnet_and_batch():
    from fastvision_tpu.models.classification import resnet18

    model = resnet18(num_classes=8)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (8, 64, 64, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=True)
    return model, variables, x


def test_tp_forward_matches_single_device(resnet_and_batch):
    model, variables, x = resnet_and_batch
    want = model.apply(variables, x, train=False)

    mesh = create_mesh(data=1, model=8, time=1)
    fwd = jax.jit(lambda v, im: model.apply(v, im, train=False))
    with mesh:
        v_tp = shard_variables(variables, mesh)
        got = fwd(v_tp, shard_batch(x, mesh))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_dp_tp_2d_train_step_matches_single_device(resnet_and_batch):
    from fastvision_tpu.train import (
        TrainState,
        build_optimizer,
        cross_entropy,
        make_train_step,
    )

    model, variables, x = resnet_and_batch
    labels = np.arange(8, dtype=np.int32) % 8

    def loss_fn(logits, batch):
        return cross_entropy(logits, batch["labels"]), {}

    def one_step(v_put, batch_put, mesh):
        tx = build_optimizer("sgd", variables["params"])
        step = make_train_step(model.apply, loss_fn, tx, donate=False)
        state = TrainState(
            v_put(variables["params"]),
            v_put(variables["batch_stats"]),
            v_put(tx.init(variables["params"])),
            0,
        )
        batch = batch_put({"images": np.asarray(x), "labels": labels})
        if mesh is None:
            state, metrics = step(state, batch, 1e-2)
        else:
            with mesh:
                state, metrics = step(state, batch, 1e-2)
        return (
            float(metrics["loss"]),
            jax.device_get(state.params),
            jax.device_get(state.batch_stats),
        )

    loss_ref, params_ref, stats_ref = one_step(lambda t: t, lambda b: b, None)

    mesh = create_mesh(data=2, model=4, time=1)
    loss_tp, params_tp, stats_tp = one_step(
        lambda t: shard_variables(t, mesh),
        lambda b: shard_batch(b, mesh),
        mesh,
    )
    # tolerances are ABSOLUTE: after one lr=1e-2 step the sharded run's
    # fp32 reassociation noise (hierarchical all-reduce + BN stat chains)
    # measures ~2e-4 max abs on params / 6e-6 on stats / 9e-6 on loss; a
    # real sharding bug produces O(1) divergence
    assert abs(loss_tp - loss_ref) < 1e-4
    for a, b in zip(jax.tree.leaves(params_ref), jax.tree.leaves(params_tp)):
        np.testing.assert_allclose(b, a, atol=1e-3)
    for a, b in zip(jax.tree.leaves(stats_ref), jax.tree.leaves(stats_tp)):
        np.testing.assert_allclose(b, a, atol=1e-4)


def test_checkpoint_roundtrip_sharded_params(tmp_path, resnet_and_batch):
    """Distributed checkpointing contract: device_get on mesh-sharded
    params gathers exactly (save path), restore reproduces the original
    tree bit-for-bit, and re-sharding the restored tree onto a fresh mesh
    gives the same forward — i.e. a tp/dp run can checkpoint, restart,
    and continue without drift."""
    from fastvision_tpu.core.checkpoint import CheckpointManager

    model, variables, x = resnet_and_batch
    want = model.apply(variables, x, train=False)

    mesh = create_mesh(data=2, model=4, time=1)
    with mesh:
        v_tp = shard_variables(variables, mesh)
    gathered = jax.device_get(v_tp)  # what Fit.save writes
    for a, b in zip(jax.tree.leaves(variables), jax.tree.leaves(gathered)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(0, gathered["params"], batch_stats=gathered["batch_stats"])
    mgr.wait()
    restored = mgr.restore(like={"params": variables["params"],
                                 "batch_stats": variables["batch_stats"]})["state"]
    for a, b in zip(jax.tree.leaves(variables["params"]),
                    jax.tree.leaves(restored["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # restart: re-shard the restored tree onto a new mesh, same forward
    mesh2 = create_mesh(data=1, model=8, time=1)
    fwd = jax.jit(lambda v, im: model.apply(v, im, train=False))
    with mesh2:
        v2 = shard_variables({"params": restored["params"],
                              "batch_stats": restored["batch_stats"]}, mesh2)
        got = fwd(v2, shard_batch(x, mesh2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)
