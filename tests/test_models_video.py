"""Video model tests: shapes, train mode, tiny variants."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastvision_tpu.models.video import (
    c3d,
    c3d_bn,
    resnet18_3d,
    resnet50_3d,
    slowfast_resnet18,
    slowfast_resnet50,
)

CLIP = jnp.zeros((2, 16, 64, 64, 3), jnp.float32)


def run(model, x=CLIP, train=False):
    variables = model.init(jax.random.key(0), x, train=True)
    if train:
        out, _ = model.apply(variables, x, train=True, mutable=["batch_stats"],
                             rngs={"dropout": jax.random.key(1)})
        return out
    return model.apply(variables, x, train=False, rngs={"dropout": jax.random.key(1)})


def test_c3d_shapes():
    out = run(c3d(num_classes=7))
    assert out.shape == (2, 7)
    assert np.isfinite(np.asarray(out)).all()


def test_c3d_bn_train_mode():
    out = run(c3d_bn(num_classes=5), train=True)
    assert out.shape == (2, 5)


@pytest.mark.parametrize("factory", [resnet18_3d, resnet50_3d])
def test_resnet3d(factory):
    out = run(factory(num_classes=11))
    assert out.shape == (2, 11)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("factory", [slowfast_resnet18, slowfast_resnet50])
def test_slowfast(factory):
    out = run(factory(num_classes=9))
    assert out.shape == (2, 9)
    assert np.isfinite(np.asarray(out)).all()


def test_slowfast_alpha_requires_enough_frames():
    model = slowfast_resnet18(num_classes=3, alpha=4)
    x = jnp.zeros((1, 8, 64, 64, 3))
    out = run(model, x)
    assert out.shape == (1, 3)


def test_resnet3d_jit_grad():
    model = resnet18_3d(num_classes=4)
    variables = model.init(jax.random.key(0), CLIP, train=True)

    @jax.jit
    def loss(params):
        out = model.apply({"params": params, "batch_stats": variables["batch_stats"]},
                          CLIP, train=False)
        return jnp.sum(out**2)

    g = jax.grad(loss)(variables["params"])
    assert np.isfinite(float(jax.tree.leaves(g)[0].sum()))


def test_slowfast_expansion_forwarded_to_blocks():
    """SlowFast(expansion=k) must size the bottleneck OUTPUT convs by k,
    not silently keep SFBottleneck's default 4 (regression: the knob once
    only resized laterals)."""
    from fastvision_tpu.models.video.slowfast import SlowFast

    model = SlowFast(stage_sizes=(1, 1, 1, 1), num_classes=3, alpha=4,
                     beta_inv=4, expansion=1)
    clip = jnp.zeros((1, 8, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.key(0), clip, train=False)
    params = variables["params"]
    # stage-1 slow block: features=64, expansion=1 -> conv3 outputs 64
    conv3 = params["slow_s1_b0"]["conv3"]["conv"]["kernel"]
    assert conv3.shape[-1] == 64, conv3.shape
    out = model.apply(variables, clip, train=False)
    assert out.shape == (1, 3)
