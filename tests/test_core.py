"""Core tests: mesh/sharding, config overrides, RNG, checkpoint partial load."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastvision_tpu.core import (
    Config,
    apply_overrides,
    create_mesh,
    flatten_params,
    local_batch_size,
    partial_load,
    set_random_seeds,
    shard_batch,
    step_key,
    to_dict,
    trainable_mask,
    update_dataclass,
)


def test_mesh_all_data(mesh):
    assert mesh.shape["data"] == 8
    assert mesh.shape["model"] == 1


def test_mesh_2d():
    m = create_mesh(data=4, model=2)
    assert m.shape["data"] == 4 and m.shape["model"] == 2


def test_mesh_bad_factorization():
    with pytest.raises(ValueError):
        create_mesh(data=3, model=2)


def test_shard_batch_and_psum(mesh):
    batch = {"x": np.arange(16, dtype=np.float32).reshape(16, 1)}
    sharded = shard_batch(batch, mesh)
    assert sharded["x"].sharding.is_fully_replicated is False
    # a jitted global sum over the sharded array must see all data
    total = jax.jit(lambda b: jnp.sum(b["x"]))(sharded)
    assert float(total) == float(np.arange(16).sum())
    assert local_batch_size(16, mesh) == 2


def test_config_overrides():
    cfg = Config()
    cfg = apply_overrides(cfg, ["train.lr=0.01", "data.input_size=640", "train.bf16=false"])
    assert cfg.train.lr == 0.01
    assert cfg.data.input_size == 640
    assert cfg.train.bf16 is False
    d = to_dict(cfg)
    assert d["train"]["lr"] == 0.01


def test_config_unknown_key():
    with pytest.raises(KeyError):
        update_dataclass(Config(), {"nope": 1})


def test_config_yaml_roundtrip(tmp_path):
    import yaml

    from fastvision_tpu.core import from_yaml

    path = tmp_path / "cfg.yaml"
    path.write_text(yaml.safe_dump({"train": {"lr": 0.5}, "data": {"num_classes": 20}}))
    cfg = from_yaml(Config, str(path), overrides=["train.epochs=3"])
    assert cfg.train.lr == 0.5
    assert cfg.data.num_classes == 20
    assert cfg.train.epochs == 3


def test_config_accepts_reference_flat_descriptor(tmp_path):
    """Drop-in compat: the reference's FLAT datasets/data/*.yaml schema
    (data_root/train_dir/.../num_classes/categories at top level) loads
    directly into Config, nesting under data and seeding model.num_classes."""
    import os

    import yaml

    from fastvision_tpu.core import from_yaml

    ref = "/root/reference/datasets/data/coco.yaml"
    if os.path.exists(ref):
        cfg = from_yaml(Config, ref)
        assert cfg.data.num_classes == 80
        assert cfg.model.num_classes == 80
        assert cfg.data.categories[0] == "person"
        assert cfg.data.train_dir == "train"
    # synthetic flat descriptor: explicit nested sections win over flat keys
    path = tmp_path / "flat.yaml"
    path.write_text(yaml.safe_dump({
        "data_root": "/tmp/x", "num_classes": 20,
        "categories": ["a", "b"],
        "model": {"num_classes": 21},
    }))
    cfg = from_yaml(Config, str(path))
    assert cfg.data.data_root == "/tmp/x"
    assert cfg.data.num_classes == 20
    assert cfg.model.num_classes == 21  # explicit model section preserved
    # a nested data.num_classes beats the flat key AND seeds the model head
    # (regression: model once seeded from the stale flat value)
    path2 = tmp_path / "flat2.yaml"
    path2.write_text(yaml.safe_dump({
        "data_root": "/tmp/x", "num_classes": 20,
        "data": {"num_classes": 80},
    }))
    cfg2 = from_yaml(Config, str(path2))
    assert cfg2.data.num_classes == 80
    assert cfg2.model.num_classes == 80


def test_rng_discipline():
    root = set_random_seeds(0)
    k1 = step_key(root, 1, "dropout")
    k2 = step_key(root, 1, "mosaic")
    k3 = step_key(root, 2, "dropout")
    vals = [float(jax.random.uniform(k)) for k in (k1, k2, k3)]
    assert len(set(vals)) == 3  # distinct streams
    # determinism
    assert float(jax.random.uniform(step_key(set_random_seeds(0), 1, "dropout"))) == vals[0]


def test_partial_load_shape_filtering():
    target = {"a": {"w": np.zeros((3, 3)), "b": np.zeros(3)}, "head": np.zeros(5)}
    source = flatten_params(
        {"a": {"w": np.ones((3, 3)), "b": np.ones(7)}, "other": np.ones(1)}
    )
    out = partial_load(target, source, verbose=False)
    np.testing.assert_array_equal(out["a"]["w"], np.ones((3, 3)))  # loaded
    np.testing.assert_array_equal(out["a"]["b"], np.zeros(3))  # shape mismatch -> kept
    np.testing.assert_array_equal(out["head"], np.zeros(5))  # missing -> kept


def test_trainable_mask():
    params = {"backbone": {"conv": np.zeros(1)}, "head": {"conv": np.zeros(1)}}
    mask = trainable_mask(params, ["backbone"])
    assert mask["backbone"]["conv"] is False
    assert mask["head"]["conv"] is True


def test_checkpoint_manager_roundtrip(tmp_path):
    from fastvision_tpu.core import CheckpointManager

    params = {"w": jnp.arange(4.0), "b": jnp.ones((2, 2))}
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    mgr.save(1, params, extra={"epoch": 1}, metric=0.5)
    mgr.save(2, jax.tree.map(lambda x: x * 2, params), extra={"epoch": 2}, metric=0.7)
    mgr.wait()
    assert mgr.latest_step() == 2
    restored = mgr.restore(like={"params": params})
    np.testing.assert_allclose(np.asarray(restored["state"]["params"]["w"]), np.arange(4.0) * 2)
    assert restored["meta"]["epoch"] == 2
    mgr.close()


def test_torch_import_layout():
    from fastvision_tpu.core import conv_oihw_to_hwio, linear_oi_to_io

    w = np.arange(2 * 3 * 5 * 7).reshape(2, 3, 5, 7).astype(np.float32)
    hwio = conv_oihw_to_hwio(w)
    assert hwio.shape == (5, 7, 3, 2)
    assert hwio[1, 2, 1, 0] == w[0, 1, 1, 2]
    lw = linear_oi_to_io(np.zeros((10, 4)))
    assert lw.shape == (4, 10)


def test_enable_compile_cache_writes_entries(tmp_path):
    """Persistent XLA compile cache (cfg.compile_cache): jit writes
    executables to the directory so restarts skip recompilation."""
    import os

    from fastvision_tpu.core.mesh import enable_compile_cache

    d = str(tmp_path / "xla_cache")
    # capture ALL config enable_compile_cache touches so nothing leaks
    # process-wide into later tests
    keys = ("jax_compilation_cache_dir",
            "jax_persistent_cache_min_compile_time_secs",
            "jax_persistent_cache_min_entry_size_bytes")
    before = {k: getattr(jax.config, k) for k in keys}
    enable_compile_cache(d)
    try:
        jax.jit(lambda x: x * 3 + 1)(jnp.ones((8,))).block_until_ready()
        assert len(os.listdir(d)) > 0
    finally:
        for k, v in before.items():
            jax.config.update(k, v)
