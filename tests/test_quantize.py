"""Post-training int8 quantization (infer/quantize.py + ConvBN int8 path)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastvision_tpu.infer.quantize import calibrate, quantize_model, quantize_variables
from fastvision_tpu.nn.layers import ConvBN


def _randomized_convbn(key, features=16, kernel_size=3, cin=8, act="silu"):
    """ConvBN with non-trivial BN stats/affine so folding is actually tested."""
    m = ConvBN(features, kernel_size=kernel_size, act=act)
    x = jax.random.normal(key, (2, 16, 16, cin))
    v = m.init(jax.random.key(0), x, train=True)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    v = jax.tree.map(np.asarray, v)
    v["params"]["bn"]["bn"]["scale"] = np.asarray(
        jax.random.uniform(k1, (features,), minval=0.5, maxval=2.0))
    v["params"]["bn"]["bn"]["bias"] = np.asarray(
        jax.random.normal(k2, (features,)) * 0.3)
    v["batch_stats"]["bn"]["bn"]["mean"] = np.asarray(
        jax.random.normal(k3, (features,)) * 0.2)
    v["batch_stats"]["bn"]["bn"]["var"] = np.asarray(
        jax.random.uniform(k4, (features,), minval=0.3, maxval=1.5))
    return m, v, x


def test_single_convbn_int8_close_to_float():
    m, v, x = _randomized_convbn(jax.random.key(1))
    ref = m.apply(v, x, train=False)
    qv = quantize_model(m, v, [x])
    out = m.apply(qv, x, train=False)
    err = float(jnp.abs(out - ref).max() / (jnp.abs(ref).max() + 1e-9))
    assert err < 0.05, err  # per-channel w8a8 is typically ~1%
    # correlation is the sharper check than max error
    c = np.corrcoef(np.asarray(ref).ravel(), np.asarray(out).ravel())[0, 1]
    assert c > 0.999, c


def test_quant_path_actually_int8():
    """The quantized forward must not silently fall back to float: with a
    huge in_scale every input quantizes to 0 -> output == act(bias)."""
    m, v, x = _randomized_convbn(jax.random.key(2))
    qv = quantize_model(m, v, [x])
    qv["quant"]["in_scale"] = np.float32(1e9)
    out = m.apply(qv, x, train=False)
    bias = qv["quant"]["bias"]
    expect = jax.nn.silu(jnp.broadcast_to(bias, out.shape))
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), atol=1e-5)


def test_train_mode_ignores_quant():
    m, v, x = _randomized_convbn(jax.random.key(3))
    qv = quantize_model(m, v, [x])
    ref, _ = m.apply(v, x, train=True, mutable=["batch_stats"])
    out, _ = m.apply(qv, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=1e-6)


def test_stacked_convbn_error_bounded():
    import flax.linen as nn

    class Stack(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            x = ConvBN(16, 3, name="c1")(x, train)
            x = ConvBN(32, 3, strides=2, name="c2")(x, train)
            x = ConvBN(32, 1, name="c3")(x, train)
            return x

    m = Stack()
    x = jax.random.normal(jax.random.key(4), (2, 32, 32, 3))
    v = m.init(jax.random.key(0), x, train=True)
    v = _adapt_bn(m, v, x)
    ref = m.apply(v, x, train=False)
    qv = quantize_model(m, v, [x])
    assert set(qv["quant"].keys()) == {"c1", "c2", "c3"}
    out = m.apply(qv, x, train=False)
    err = float(jnp.abs(out - ref).max() / (jnp.abs(ref).max() + 1e-9))
    assert err < 0.08, err  # 3 chained int8 layers
    c = np.corrcoef(np.asarray(ref).ravel(), np.asarray(out).ravel())[0, 1]
    assert c > 0.995, c


def test_skip_filters_paths():
    import flax.linen as nn

    class Stack(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            x = ConvBN(8, 3, name="stem")(x, train)
            return ConvBN(8, 3, name="body")(x, train)

    m = Stack()
    x = jax.random.normal(jax.random.key(5), (1, 8, 8, 3))
    v = m.init(jax.random.key(0), x, train=True)
    qv = quantize_model(m, v, [x], skip=("stem",))
    assert "stem" not in qv["quant"] and "body" in qv["quant"]


def test_missing_calibration_raises():
    m, v, x = _randomized_convbn(jax.random.key(6))
    with pytest.raises(ValueError, match="at least one batch"):
        calibrate(m, v, [])
    with pytest.raises(ValueError, match="no calibration absmax"):
        quantize_variables(v, {"amax_wrong": np.float32(1)})


def _adapt_bn(model, v, x, passes=25):
    """Converge running BN stats onto x's activation statistics (momentum
    0.9 -> ~8% residual after 25 passes). Freshly-initialized stats
    (mean 0 / var 1) are wildly wrong for a random net whose activations
    shrink with depth — quantization (like any trained-model tool) assumes
    stats that match the data, so the tests must too."""
    for _ in range(passes):
        _, mut = model.apply(v, x, train=True, mutable=["batch_stats"])
        v = {**v, "batch_stats": mut["batch_stats"]}
    return v


def test_bn_free_convbn_quantizes():
    """VGG-style ConvBN(use_bn=False, bias) quantizes without BN folding."""
    m = ConvBN(16, 3, use_bn=False, act="relu")
    x = jax.random.normal(jax.random.key(11), (2, 16, 16, 8))
    v = m.init(jax.random.key(0), x, train=True)
    ref = m.apply(v, x, train=False)
    qv = quantize_model(m, v, [x])
    out = m.apply(qv, x, train=False)
    err = float(jnp.abs(out - ref).max() / (jnp.abs(ref).max() + 1e-9))
    assert err < 0.05, err


def test_faster_rcnn_quantizes_backbone_not_rpn():
    """The RPN head's plain nn.Conv named 'conv' must NOT be treated as a
    ConvBN (it never sows calibration data); the VGG backbone quantizes."""
    from fastvision_tpu.models.detection.faster_rcnn import FasterRCNN

    model = FasterRCNN(num_classes=3, image_size=64,
                       rpn_pre_nms_train=32, rpn_post_nms_train=8,
                       rpn_pre_nms_eval=32, rpn_post_nms_eval=8,
                       roi_pos=2, roi_neg=6)
    x = jnp.zeros((1, 64, 64, 3))
    v = model.init({"params": jax.random.key(0), "sampling": jax.random.key(1),
                    "dropout": jax.random.key(2)}, x,
                   jnp.asarray([[[0, 10, 10, 40, 40]]], jnp.float32), train=True)
    qv = quantize_model(model, v, [x])
    assert "backbone" in qv["quant"] and "rpn" not in qv["quant"]
    boxes, scores, classes, valid = model.apply(qv, x, train=False)
    assert bool(jnp.isfinite(boxes).all())


def test_detector_quantize_in_place():
    """Detector.quantize switches to int8 and predictions stay consistent."""
    from fastvision_tpu.infer import Detector
    from fastvision_tpu.models.detection import YOLOv3
    from fastvision_tpu.ops import COCO_ANCHORS

    S = 128
    anchors = (COCO_ANCHORS.reshape(3, 3, 2)[::-1] * (S / 416)).astype(np.float32)
    model = YOLOv3(num_classes=4)
    x = jax.random.uniform(jax.random.key(9), (2, S, S, 3))
    v = model.init(jax.random.key(0), x, train=True)
    v = _adapt_bn(model, v, x, passes=10)
    det = Detector(model, v, anchors, input_size=S, batch_size=1, conf_thres=0.01,
                   dtype=jnp.float32)
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (160, 200, 3), np.uint8)
    before = det.predict_image(img)
    det.quantize([img])
    assert "quant" in det.variables
    after = det.predict_image(img)
    assert np.isfinite(after["boxes"]).all()
    # random-weight detections are noisy; count should be in the same regime
    assert abs(len(before["boxes"]) - len(after["boxes"])) <= max(
        5, len(before["boxes"]) // 2)


def test_yolov3_full_quantization_runs():
    from fastvision_tpu.models.detection import YOLOv3

    model = YOLOv3(num_classes=8)
    x = jax.random.uniform(jax.random.key(7), (2, 128, 128, 3))
    v = model.init(jax.random.key(0), x, train=True)
    v = _adapt_bn(model, v, x)
    qv = quantize_model(model, v, [x])

    def count(t):
        return sum(count(v) for v in t.values()) if isinstance(t, dict) and "w_q" not in t else 1

    n = count(qv["quant"])
    assert n > 50, n  # darknet53 + neck ConvBNs all quantized
    ref = model.apply(v, x, train=False)
    out = model.apply(qv, x, train=False)
    for r, o in zip(ref, out):
        assert o.shape == r.shape and bool(jnp.isfinite(o).all())
    # head logits correlate strongly with the float model's
    c = np.corrcoef(np.asarray(ref[0]).ravel(), np.asarray(out[0]).ravel())[0, 1]
    assert c > 0.98, c


def test_percentile_calibration_clips_outliers():
    """percentile=True uses the calibrated 99.9th-percentile |x| instead of
    absmax: an injected outlier widens the absmax grid but not the
    percentile one, so the percentile path reconstructs the bulk better."""
    m, v, x = _randomized_convbn(jax.random.key(5))
    x_out = np.asarray(x).copy()
    x_out[0, 0, 0, 0] = 500.0  # single extreme outlier
    x_out = jnp.asarray(x_out)
    amax = calibrate(m, v, [x_out])

    def in_scale(qv):
        return float(np.asarray(qv["quant"]["in_scale"]))

    q_abs = quantize_variables(v, amax)
    q_pct = quantize_variables(v, amax, percentile=True)
    assert in_scale(q_pct) < in_scale(q_abs) / 10  # outlier excluded
    ref = m.apply(v, x, train=False)  # outlier-free eval batch
    err_abs = float(jnp.abs(m.apply(q_abs, x, train=False) - ref).mean())
    err_pct = float(jnp.abs(m.apply(q_pct, x, train=False) - ref).mean())
    assert err_pct < err_abs
