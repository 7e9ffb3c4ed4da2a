"""SavedModel export: jax2tf graph == jax forward, float and int8.

Covers infer/export.py (the reference's "onnx" exporter was a misnamed
copy of its inference script — demos/yolov3_u/pytorch_2_onnx.py; this is
a real exporter, so it gets a real round-trip test). Tiny model keeps the
TF import + conversion under ~a minute on the 1-core CI box.
"""
import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
tf = pytest.importorskip("tensorflow")

import flax.linen as nn
import jax

from fastvision_tpu.infer.export import export_savedmodel
from fastvision_tpu.nn.layers import ConvBN


class Tiny(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        x = ConvBN(8, 3, act="silu", dtype=jnp.float32)(x, train)
        x = ConvBN(16, 3, strides=2, act="silu", dtype=jnp.float32)(x, train)
        return x.mean(axis=(1, 2))


def test_savedmodel_roundtrip(tmp_path, rng):
    model = Tiny()
    x = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=True)

    def infer(v, im):
        return model.apply(v, im, train=False)

    want = np.asarray(infer(variables, x))
    path = export_savedmodel(infer, variables, [np.asarray(x)],
                             str(tmp_path / "sm"), input_names=["images"])
    loaded = tf.saved_model.load(path)
    got = loaded.f(np.asarray(x)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_savedmodel_int8_bakes_quant(tmp_path, rng):
    """Exporting quantized variables routes ConvBN through the int8 path
    inside the frozen graph (cli export --int8)."""
    from fastvision_tpu.infer.quantize import quantize_model

    model = Tiny()
    x = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=True)
    qv = quantize_model(model, variables, [x])

    def infer(v, im):
        return model.apply(v, im, train=False)

    want = np.asarray(infer(qv, x))  # jax int8 path
    fwant = np.asarray(infer(variables, x))  # float path differs from int8
    assert np.abs(want - fwant).max() > 0  # quantization actually engaged

    path = export_savedmodel(infer, qv, [np.asarray(x)],
                             str(tmp_path / "sm_q"), input_names=["images"])
    got = tf.saved_model.load(path).f(np.asarray(x)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
