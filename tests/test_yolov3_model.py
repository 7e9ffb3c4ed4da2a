"""YOLOv3 model + decode tests: shapes, decode math golden values, jit."""
import jax
import jax.numpy as jnp
import numpy as np

from fastvision_tpu.infer.decode import decode_level, decode_predictions
from fastvision_tpu.models.detection import YOLOv3, upsample2x
from fastvision_tpu.ops.anchors import COCO_ANCHORS


def test_upsample2x():
    x = jnp.arange(4.0).reshape(1, 2, 2, 1)
    y = np.asarray(upsample2x(x))
    assert y.shape == (1, 4, 4, 1)
    np.testing.assert_allclose(y[0, :2, :2, 0], [[0, 0], [0, 0]])
    np.testing.assert_allclose(y[0, 2:, 2:, 0], [[3, 3], [3, 3]])


def test_yolov3_head_shapes():
    model = YOLOv3(num_classes=20)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.key(0), x, train=True)
    heads = model.apply(variables, x, train=False)
    assert len(heads) == 3
    assert heads[0].shape == (1, 2, 2, 3, 25)  # stride 32
    assert heads[1].shape == (1, 4, 4, 3, 25)  # stride 16
    assert heads[2].shape == (1, 8, 8, 3, 25)  # stride 8


def test_decode_v5_golden():
    # one level, 2x2 grid, stride 32, single anchor (10, 20)
    head = np.zeros((1, 2, 2, 1, 6), np.float32)  # zero logits
    anchors = jnp.array([[10.0, 20.0]])
    out = np.asarray(decode_level(jnp.asarray(head), anchors, 32, style="v5"))
    assert out.shape == (1, 4, 6)
    # sigmoid(0)=0.5: xy = (2*0.5-0.5+grid)*32 = (0.5+grid)*32
    # cell (0,0) -> (16,16); wh = (2*0.5)^2*anchor = anchor
    np.testing.assert_allclose(out[0, 0, :4], [16, 16, 10, 20], rtol=1e-5)
    # cell (row 0, col 1) -> x=48, y=16
    np.testing.assert_allclose(out[0, 1, :4], [48, 16, 10, 20], rtol=1e-5)
    # obj/cls are sigmoided -> 0.5
    np.testing.assert_allclose(out[0, :, 4:], 0.5, rtol=1e-6)


def test_decode_v3_golden():
    head = np.zeros((1, 2, 2, 1, 6), np.float32)
    anchors = jnp.array([[10.0, 20.0]])
    out = np.asarray(decode_level(jnp.asarray(head), anchors, 32, style="v3"))
    # xy = (0.5+grid)*32 -> (16,16); wh = e^0*anchor = anchor
    np.testing.assert_allclose(out[0, 0, :4], [16, 16, 10, 20], rtol=1e-5)


def test_decode_predictions_concat_and_jit():
    heads = [
        jnp.zeros((2, 2, 2, 3, 85)),
        jnp.zeros((2, 4, 4, 3, 85)),
        jnp.zeros((2, 8, 8, 3, 85)),
    ]
    anchors = jnp.asarray(COCO_ANCHORS.reshape(3, 3, 2)[::-1].copy())  # deepest first
    fn = jax.jit(lambda hs: decode_predictions(hs, anchors, (32, 16, 8), "v5"))
    out = fn(heads)
    assert out.shape == (2, (4 + 16 + 64) * 3, 85)
    assert np.isfinite(np.asarray(out)).all()


def test_yolov3_custom_backbone_injection():
    from fastvision_tpu.models.classification.resnet import resnet18

    model = YOLOv3(
        num_classes=5,
        backbone_fn=lambda **kw: resnet18(including_top=False, **kw),
        channels=(512, 256, 128),
    )
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.key(0), x, train=True)
    heads = model.apply(variables, x, train=False)
    assert heads[0].shape == (1, 2, 2, 3, 10)
    assert heads[2].shape == (1, 8, 8, 3, 10)
