"""Classification zoo tests: shapes, backbone contract, param counts, train mode."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastvision_tpu.models.classification import (
    darknet53,
    resnet18,
    resnet50,
    resnext50_32x4d,
    vgg11_bn,
    vgg16,
)


def init_and_apply(model, x, train=False):
    variables = model.init(jax.random.key(0), x, train=True)
    if train:
        out, _ = model.apply(
            variables, x, train=True,
            mutable=["batch_stats"], rngs={"dropout": jax.random.key(1)},
        )
        return out
    return model.apply(variables, x, train=False, rngs={"dropout": jax.random.key(1)})


X = jnp.zeros((2, 64, 64, 3), jnp.float32)


def param_count(model, x):
    variables = model.init(jax.random.key(0), x, train=True)
    return sum(np.prod(p.shape) for p in jax.tree.leaves(variables["params"]))


@pytest.mark.parametrize(
    "factory", [resnet18, resnet50, resnext50_32x4d, darknet53, vgg16, vgg11_bn]
)
def test_classifier_logits_shape(factory):
    model = factory(num_classes=10)
    out = init_and_apply(model, X)
    assert out.shape == (2, 10)
    assert np.isfinite(np.asarray(out)).all()


def test_resnet50_param_count_matches_torchvision():
    # torchvision resnet50 (1000 classes): 25,557,032 params
    model = resnet50(num_classes=1000)
    n = param_count(model, X)
    assert abs(n - 25_557_032) / 25_557_032 < 0.01, n


def test_darknet53_backbone_contract():
    model = darknet53(including_top=False)
    feats = init_and_apply(model, X)
    assert isinstance(feats, list) and len(feats) == 3
    # deepest first: stride 32, 16, 8 with channels 1024, 512, 256
    assert feats[0].shape == (2, 2, 2, 1024)
    assert feats[1].shape == (2, 4, 4, 512)
    assert feats[2].shape == (2, 8, 8, 256)
    assert model.strides_per_level == [32, 16, 8]
    assert model.channels_per_level == [1024, 512, 256]


def test_resnet_backbone_contract():
    model = resnet50(including_top=False)
    feats = init_and_apply(model, X)
    assert feats[0].shape == (2, 2, 2, 2048)
    assert feats[1].shape == (2, 4, 4, 1024)
    assert feats[2].shape == (2, 8, 8, 512)


def test_vgg_backbone_stride16():
    model = vgg16(including_top=False, drop_last_pool=True)
    feats = init_and_apply(model, X)
    assert feats.shape == (2, 4, 4, 512)  # stride 16


def test_batchstats_update_in_train_mode():
    model = resnet18(num_classes=4)
    variables = model.init(jax.random.key(0), X, train=True)
    x = jnp.asarray(np.random.default_rng(0).normal(2.0, 1.0, X.shape), jnp.float32)
    _, updates = model.apply(variables, x, train=True, mutable=["batch_stats"])
    # running mean must move toward the batch mean (2.0)
    old = jax.tree.leaves(variables["batch_stats"])[0]
    new = jax.tree.leaves(updates["batch_stats"])[0]
    assert not np.allclose(np.asarray(old), np.asarray(new))


def test_bf16_compute():
    model = darknet53(num_classes=4, dtype=jnp.bfloat16)
    variables = model.init(jax.random.key(0), X, train=True)
    # params stay fp32 (param_dtype default), compute in bf16
    p0 = jax.tree.leaves(variables["params"])[0]
    assert p0.dtype == jnp.float32
    out = model.apply(variables, X.astype(jnp.bfloat16), train=False)
    assert out.dtype == jnp.bfloat16


def test_vit_param_count_matches_timm():
    """ViT-Ti/16 @224 with 1000 classes: 5,717,416 params (timm
    vit_tiny_patch16_224) — layout-exact, so equality not tolerance."""
    from fastvision_tpu.models.classification import vit_tiny_patch16

    model = vit_tiny_patch16(num_classes=1000)
    n = param_count(model, jnp.zeros((1, 224, 224, 3), jnp.float32))
    assert n == 5_717_416, n


def test_vit_forward_and_tokens():
    from fastvision_tpu.models.classification import ViT

    model = ViT(num_classes=7, dim=32, depth=2, heads=2, patch=16)
    out = init_and_apply(model, X)
    assert out.shape == (2, 7) and np.isfinite(np.asarray(out)).all()
    tok = ViT(dim=32, depth=2, heads=2, patch=16, including_top=False)
    t = init_and_apply(tok, X)
    assert t.shape == (2, 1 + (64 // 16) ** 2, 32)
    with pytest.raises(ValueError, match="divisible"):
        init_and_apply(ViT(dim=32, depth=1, heads=2, patch=16),
                       jnp.zeros((1, 50, 50, 3)))


def test_vit_train_step_decreases_loss():
    """rng-free module: runs under the standard jitted train step."""
    from fastvision_tpu.models.classification import ViT
    from fastvision_tpu.train import (
        TrainState, build_optimizer, cross_entropy, make_train_step,
    )

    model = ViT(num_classes=4, dim=32, depth=2, heads=2, patch=16)
    variables = model.init(jax.random.key(0), X, train=True)

    def loss_fn(logits, batch):
        return cross_entropy(logits, batch["labels"]), {}

    tx = build_optimizer("adam", variables["params"])
    step = make_train_step(model.apply, loss_fn, tx)
    state = TrainState.create(variables, tx)
    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)), jnp.float32),
        "labels": jnp.asarray([0, 3]),
    }
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch, 1e-3)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
