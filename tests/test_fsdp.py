"""FSDP (ZeRO-3-style) sharding: fsdp-trained == replicated-dp-trained.

parallel/fsdp.py shards every parameter leaf's largest divisible dim over
the 'data' axis; GSPMD all-gathers at use, reduce-scatters gradients, and
the optimizer runs shard-local. The contract is numerical equality with
plain data parallelism (which the reference's nn.DataParallel defines),
plus proof the leaves actually live sharded (1/N addressable bytes).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from fastvision_tpu.core.mesh import DATA_AXIS, create_mesh, shard_batch
from fastvision_tpu.parallel import fsdp_shard_variables, fsdp_spec
from test_fit import det_data  # noqa: F401 — fixture


def test_fsdp_spec_rules():
    # conv kernel: largest divisible dim = Cout (ties prefer the last dim)
    assert fsdp_spec(np.zeros((3, 3, 64, 64)), 8) == P(None, None, None, "data")
    # Cin larger and divisible -> shard Cin
    assert fsdp_spec(np.zeros((3, 3, 256, 64)), 8) == P(None, None, "data", None)
    assert fsdp_spec(np.zeros((128, 256)), 8) == P(None, "data")
    # small vectors replicate (min_size)
    assert fsdp_spec(np.zeros((64,)), 8) == P()
    assert fsdp_spec(np.zeros((4096,)), 8) == P("data")
    # nothing divisible -> replicate
    assert fsdp_spec(np.zeros((33, 65)), 8) == P()
    assert fsdp_spec(np.zeros(()), 8) == P()


@pytest.fixture(scope="module")
def resnet_and_batch():
    from fastvision_tpu.models.classification import resnet18

    model = resnet18(num_classes=8)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, (8, 64, 64, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=True)
    return model, variables, x


def test_fsdp_forward_matches_single_device(resnet_and_batch):
    model, variables, x = resnet_and_batch
    want = model.apply(variables, x, train=False)

    mesh = create_mesh(data=8, model=1, time=1)
    fwd = jax.jit(lambda v, im: model.apply(v, im, train=False))
    with mesh:
        v_fsdp = fsdp_shard_variables(variables, mesh)
        got = fwd(v_fsdp, shard_batch(x, mesh))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_fsdp_params_actually_sharded(resnet_and_batch):
    """The memory contract: big leaves hold 1/N of their bytes per device."""
    model, variables, x = resnet_and_batch
    mesh = create_mesh(data=8, model=1, time=1)
    v_fsdp = fsdp_shard_variables(variables["params"], mesh)
    sharded = 0
    for leaf in jax.tree.leaves(v_fsdp):
        if leaf.size < 1024:
            continue
        shard = leaf.addressable_shards[0].data
        assert shard.size == leaf.size // 8, leaf.shape
        sharded += 1
    assert sharded >= 20  # every conv kernel past the stem


def test_fit_fsdp_placement(det_data, tmp_path):
    """Fit(fsdp=True) on a data mesh lands parameters data-sharded (the
    tp test's placement probe, for the fsdp switch) and one epoch runs."""
    from test_fit import make_yolo_fit

    mesh = create_mesh(data=8, model=1, time=1)
    fit = make_yolo_fit(det_data, tmp_path / "fsdp", epochs=1, mesh=mesh,
                        eval_every=10, fsdp=True)
    sharded = [
        leaf for leaf in jax.tree.leaves(fit.state.params)
        if any(a == DATA_AXIS
               for a in (getattr(leaf.sharding, "spec", None) or ()) if a)
    ]
    assert sharded, "no parameter landed data-sharded under fsdp=True"
    state = fit.run()
    assert all(np.isfinite(x).all() for x in jax.tree.leaves(
        jax.device_get(state.params)))


def test_cli_train_cls_fsdp_smoke(tmp_path):
    """fsdp is a user-facing switch, not just a primitive: `train-cls
    fsdp=true` runs end-to-end from the CLI (1 epoch, toy 2-class set)
    like the tp smoke test."""
    import json
    import os

    import cv2

    from fastvision_tpu.cli import main

    root = tmp_path / "clsdata"
    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        for ci, c in enumerate(("dark", "light")):
            d = root / split / c
            os.makedirs(d)
            for i in range(8):
                img = rng.integers(0, 40, (32, 32, 3)).astype(np.uint8) + 200 * ci
                cv2.imwrite(str(d / f"{i}.jpg"), img)
    ckpt = str(tmp_path / "ckpt_fsdp")
    main([
        "train-cls",
        f"data.data_root={root}", "data.input_size=32", "data.batch_size=8",
        "model.num_classes=2", "model.backbone=resnet18",
        f"train.ckpt_dir={ckpt}", "train.epochs=1", "train.lr=0.001",
        "train.warmup_epochs=0", "train.bf16=false",
        "train.save_every_epoch=false",
        "fsdp=true",
    ])
    recs = [json.loads(l) for l in open(os.path.join(ckpt, "train.jsonl"))]
    assert any("accuracy" in r for r in recs)
    assert any("train_loss" in r for r in recs)


def test_fsdp_train_matches_plain_dp(resnet_and_batch):
    """3 SGD+momentum steps on the SAME 8-device mesh with the SAME
    batch sharding: FSDP-sharded params AND optimizer state must track
    replicated data parallelism (what nn.DataParallel computes) to fp32
    reassociation noise. Same-mesh comparison isolates the parameter
    sharding — the only variable — from batch-split reduction order."""
    from fastvision_tpu.core.mesh import replicate
    from fastvision_tpu.train import (
        TrainState,
        build_optimizer,
        cross_entropy,
        make_train_step,
    )

    model, variables, x = resnet_and_batch
    labels = np.arange(8, dtype=np.int32) % 8
    mesh = create_mesh(data=8, model=1, time=1)

    def loss_fn(logits, batch):
        return cross_entropy(logits, batch["labels"]), {}

    def run(v_put, nsteps):
        tx = build_optimizer("sgd", variables["params"], momentum=0.9)
        step = make_train_step(model.apply, loss_fn, tx, donate=False)
        state = TrainState(
            v_put(variables["params"]),
            v_put(variables["batch_stats"]),
            v_put(tx.init(variables["params"])),
            0,
        )
        batch = shard_batch({"images": np.asarray(x), "labels": labels}, mesh)
        with mesh:
            for _ in range(nsteps):
                state, metrics = step(state, batch, 1e-2)
        return (float(metrics["loss"]), jax.device_get(state.params),
                jax.device_get(state.opt_state))

    # one step: the math itself must be exact to fp32 bit noise (measured
    # 1.2e-7 max abs; reduce-scatter vs all-reduce reassociation only)
    loss_ref, params_ref, opt_ref = run(lambda t: replicate(t, mesh), 1)
    loss_f, params_f, opt_f = run(lambda t: fsdp_shard_variables(t, mesh), 1)
    assert abs(loss_f - loss_ref) < 1e-5
    for a, b in zip(jax.tree.leaves(params_ref), jax.tree.leaves(params_f)):
        np.testing.assert_allclose(b, a, atol=1e-5)
    # ZeRO-3: momentum buffers were sharded through the run and must equal
    # the replicated run's
    for a, b in zip(jax.tree.leaves(opt_ref), jax.tree.leaves(opt_f)):
        if np.shape(a):
            np.testing.assert_allclose(b, a, atol=1e-5)

    # three steps: BN-normalized training is chaotic (each step amplifies
    # the 1e-7 bit noise ~1000x: 1.4e-4 at step 2, ~1e-3 at step 3), so
    # only a loose bound separates noise from a real divergence
    loss_ref3, params_ref3, _ = run(lambda t: replicate(t, mesh), 3)
    loss_f3, params_f3, _ = run(lambda t: fsdp_shard_variables(t, mesh), 3)
    assert abs(loss_f3 - loss_ref3) < 1e-3
    for a, b in zip(jax.tree.leaves(params_ref3), jax.tree.leaves(params_f3)):
        np.testing.assert_allclose(b, a, atol=2e-2)
