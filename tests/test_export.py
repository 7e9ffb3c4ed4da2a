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


def _tflite_run(blob_path, x):
    interp = tf.lite.Interpreter(model_path=blob_path)
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    out = interp.get_output_details()[0]
    interp.set_tensor(inp["index"], x)
    interp.invoke()
    return interp.get_tensor(out["index"])


def test_tflite_roundtrip(tmp_path, rng):
    """export_tflite flatbuffer == jax forward through tf.lite.Interpreter
    (cli export --tflite; edge deployment the reference never had —
    its 'onnx' exporter demos/yolov3_u/pytorch_2_onnx.py exports nothing)."""
    from fastvision_tpu.infer.export import export_tflite

    model = Tiny()
    x = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=True)

    def infer(v, im):
        return model.apply(v, im, train=False)

    want = np.asarray(infer(variables, x))
    path = export_tflite(infer, variables, [np.asarray(x)],
                         str(tmp_path / "m.tflite"), input_names=["images"])
    got = _tflite_run(path, np.asarray(x))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_tflite_int8_ptq(tmp_path, rng):
    """Converter-side int8 PTQ (representative dataset) — the TFLite
    analogue of our device w8a8 (which TFLite builtins can't express:
    they need QI8 quantized types, not raw s8 arithmetic). Asserts the
    quantized flatbuffer is close to the float forward and smaller than
    the float flatbuffer."""
    from fastvision_tpu.infer.export import export_tflite

    model = Tiny()
    x = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=True)

    def infer(v, im):
        return model.apply(v, im, train=False)

    want = np.asarray(infer(variables, x))
    fpath = export_tflite(infer, variables, [np.asarray(x)],
                          str(tmp_path / "m.tflite"), input_names=["images"])
    qpath = export_tflite(
        infer, variables, [np.asarray(x)], str(tmp_path / "mq.tflite"),
        input_names=["images"],
        representative_inputs=[np.asarray(x)],
    )
    got = _tflite_run(qpath, np.asarray(x))
    # int8 quantization error, not exactness
    np.testing.assert_allclose(got, want, rtol=0.2, atol=0.05)
    import os
    assert os.path.getsize(qpath) < os.path.getsize(fpath)


def test_stablehlo_roundtrip(tmp_path, rng):
    """jax.export artifact: serialize -> deserialize -> call == jax forward,
    including a quantized-variables program (raw s8 is fine in StableHLO,
    unlike TFLite builtins)."""
    from fastvision_tpu.infer.export import export_stablehlo, load_stablehlo
    from fastvision_tpu.infer.quantize import quantize_model

    model = Tiny()
    x = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=True)

    def infer(v, im):
        return model.apply(v, im, train=False)

    for tag, v in [("f", variables),
                   ("q", quantize_model(model, variables, [x]))]:
        want = np.asarray(infer(v, x))
        path = export_stablehlo(infer, v, [np.asarray(x)],
                                str(tmp_path / f"m_{tag}.stablehlo"))
        fn = load_stablehlo(path)
        got = np.asarray(fn(np.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_cli_export_task_cls_roundtrip(tmp_path, rng):
    """export --task cls: a classification zoo model exports to a
    SavedModel whose probs match jax (uint8 in, softmax out)."""
    from fastvision_tpu.cli import main
    from fastvision_tpu.data import normalize_images
    from fastvision_tpu.models.classification import resnet18

    out = str(tmp_path / "sm_cls")
    main(["export", "--task", "cls", "--out", out, "--batch", "2",
          "model.backbone=resnet18", "model.num_classes=4",
          "data.input_size=32", "train.bf16=false"])
    loaded = tf.saved_model.load(out)
    x = rng.integers(0, 255, (2, 32, 32, 3)).astype(np.uint8)
    got = loaded.f(x)["probs"].numpy()
    assert got.shape == (2, 4)
    np.testing.assert_allclose(got.sum(-1), 1.0, rtol=1e-5)

    # exact parity vs the jax program with the same (seed-0) init
    model = resnet18(num_classes=4, dtype=jnp.float32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
                           train=True)
    logits = model.apply(variables,
                         normalize_images(jnp.asarray(x), jnp.float32,
                                          imagenet=True), train=False)
    want = np.asarray(jax.nn.softmax(logits.astype(jnp.float32)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)
