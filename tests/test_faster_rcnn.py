"""Faster R-CNN tests: roi_align parity vs torchvision(cpu), box coder,
anchors, fixed-size sampling, proposal filtering, full train/eval forward."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastvision_tpu.models.detection import (
    FasterRCNN,
    anchor_grid,
    fastrcnn_postprocess,
    filter_proposals,
    make_base_anchors,
    random_sample_mask,
)
from fastvision_tpu.ops import decode_boxes, encode_boxes, roi_align


def test_box_coder_roundtrip(rng):
    ref = rng.uniform(10, 100, (20, 4)).astype(np.float32)
    ref[:, 2:] = ref[:, :2] + np.abs(ref[:, 2:]) + 5
    tgt = ref + rng.uniform(-3, 3, ref.shape).astype(np.float32)
    tgt[:, 2:] = np.maximum(tgt[:, 2:], tgt[:, :2] + 1)
    deltas = encode_boxes(jnp.asarray(ref), jnp.asarray(tgt), (0.1, 0.1, 0.2, 0.2))
    back = decode_boxes(jnp.asarray(ref), deltas, (0.1, 0.1, 0.2, 0.2))
    np.testing.assert_allclose(np.asarray(back), tgt, rtol=1e-3, atol=1e-2)


def test_base_anchors_areas():
    base = np.asarray(make_base_anchors((8, 16, 32), (0.5, 1.0, 2.0), 16))
    assert base.shape == (9, 4)
    areas = (base[:, 2] - base[:, 0]) * (base[:, 3] - base[:, 1])
    # all ratios of one scale share the same area
    np.testing.assert_allclose(areas[0], (8 * 16) ** 2, rtol=1e-5)
    ratios = (base[:, 3] - base[:, 1]) / (base[:, 2] - base[:, 0])
    np.testing.assert_allclose(sorted(set(np.round(ratios, 3))), [0.5, 1.0, 2.0], rtol=1e-3)


def test_anchor_grid_layout():
    base = make_base_anchors((8,), (1.0,), 16)
    grid = np.asarray(anchor_grid(2, 3, 16, base))
    assert grid.shape == (6, 4)
    # first anchor centered at (8, 8)
    np.testing.assert_allclose((grid[0, :2] + grid[0, 2:]) / 2, [8, 8])
    np.testing.assert_allclose((grid[1, :2] + grid[1, 2:]) / 2, [24, 8])


def roi_align_reference(feat, boxes, out=7, scale=1 / 16, ratio=2):
    """Plain-python roi_align with torchvision aligned=False semantics."""
    h, w, c = feat.shape

    def bilinear(y, x):
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        wy, wx = y - y0, x - x0
        y0c, x0c = min(max(y0, 0), h - 1), min(max(x0, 0), w - 1)
        y1c, x1c = min(y0c + 1, h - 1), min(x0c + 1, w - 1)
        return (feat[y0c, x0c] * (1 - wy) * (1 - wx) + feat[y0c, x1c] * (1 - wy) * wx
                + feat[y1c, x0c] * wy * (1 - wx) + feat[y1c, x1c] * wy * wx)

    res = np.zeros((len(boxes), out, out, c), np.float32)
    for bi, (x1, y1, x2, y2) in enumerate(boxes * scale):
        bw, bh = max(x2 - x1, 1.0), max(y2 - y1, 1.0)
        for i in range(out):
            for j in range(out):
                acc = np.zeros(c, np.float32)
                for ki in range(ratio):
                    for kj in range(ratio):
                        y = y1 + (i + (ki + 0.5) / ratio) * bh / out
                        x = x1 + (j + (kj + 0.5) / ratio) * bw / out
                        acc += bilinear(y, x)
                res[bi, i, j] = acc / ratio**2
    return res


def test_roi_align_matches_reference(rng):
    feat = rng.normal(0, 1, (24, 24, 8)).astype(np.float32)
    boxes = np.array([[16.0, 16.0, 200.0, 150.0], [0.0, 0.0, 100.0, 100.0],
                      [50.0, 30.0, 350.0, 350.0], [-10.0, -10.0, 40.0, 40.0]],
                     np.float32)
    ours = np.asarray(
        roi_align(jnp.asarray(feat[None]), jnp.asarray(boxes[None]),
                  output_size=7, spatial_scale=1 / 16, sampling_ratio=2)
    )[0]
    want = roi_align_reference(feat, boxes)
    np.testing.assert_allclose(ours, want, rtol=1e-4, atol=1e-4)


def test_random_sample_mask_statistics():
    mask = jnp.zeros(100, bool).at[jnp.arange(0, 100, 10)].set(True)  # 10 True
    idx, w = random_sample_mask(jax.random.key(0), mask, 4)
    assert idx.shape == (4,) and w.shape == (4,)
    assert w.sum() == 4  # enough candidates
    assert all(int(i) % 10 == 0 for i in np.asarray(idx))
    # fewer candidates than k -> padded with zero weight
    mask2 = jnp.zeros(100, bool).at[3].set(True)
    idx2, w2 = random_sample_mask(jax.random.key(1), mask2, 4)
    assert w2.sum() == 1
    assert int(idx2[np.argmax(np.asarray(w2))]) == 3
    # different keys -> different samples (randomness)
    idx3, _ = random_sample_mask(jax.random.key(2), mask, 4)
    assert not np.array_equal(np.asarray(idx), np.asarray(idx3))


def test_filter_proposals_static_shapes(rng):
    k = 24 * 24 * 9
    anchors = anchor_grid(24, 24, 16, make_base_anchors())
    obj = jnp.asarray(rng.normal(0, 1, (2, k)), jnp.float32)
    deltas = jnp.asarray(rng.normal(0, 0.1, (2, k, 4)), jnp.float32)
    props, scores, valid = filter_proposals(anchors, obj, deltas, 384,
                                            pre_nms_top_n=256, post_nms_top_n=64)
    assert props.shape == (2, 64, 4)
    assert valid.dtype == bool
    v = np.asarray(props)[np.asarray(valid)]
    assert (v[:, 2] >= v[:, 0]).all() and (v[:, :2] >= 0).all() and (v[:, 2:] <= 384).all()
    s = np.asarray(scores)
    assert (np.diff(s, axis=1) <= 1e-6).all()  # sorted


@pytest.fixture(scope="module")
def small_frcnn():
    model = FasterRCNN(
        num_classes=3, image_size=128,
        rpn_pre_nms_train=128, rpn_post_nms_train=32,
        rpn_pre_nms_eval=128, rpn_post_nms_eval=16,
        roi_pos=4, roi_neg=12,
    )
    x = jnp.zeros((1, 128, 128, 3))
    labels = jnp.asarray([[[0, 20, 20, 80, 90], [2, 60, 60, 120, 120],
                           [-1, 0, 0, 0, 0]]], jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0), "sampling": jax.random.key(1),
         "dropout": jax.random.key(2)},
        x, labels, train=True,
    )
    return model, variables, x, labels


def test_frcnn_train_forward_losses(small_frcnn):
    model, variables, x, labels = small_frcnn
    losses = model.apply(
        variables, x, labels, train=True,
        rngs={"sampling": jax.random.key(3), "dropout": jax.random.key(4)},
    )
    assert set(losses) == {"rpn_cls", "rpn_reg", "cls", "reg"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
        assert float(v) >= 0, k


def test_frcnn_train_grads_flow(small_frcnn):
    model, variables, x, labels = small_frcnn

    def total(params):
        losses = model.apply(
            {"params": params}, x, labels, train=True,
            rngs={"sampling": jax.random.key(3), "dropout": jax.random.key(4)},
        )
        return sum(losses.values())

    g = jax.grad(total)(variables["params"])
    gsum = sum(float(jnp.abs(l).sum()) for l in jax.tree.leaves(g))
    assert np.isfinite(gsum) and gsum > 0


def test_frcnn_eval_forward_and_postprocess(small_frcnn):
    model, variables, x, labels = small_frcnn
    cls_logits, boxes, proposals, valid = model.apply(variables, x, train=False)
    assert cls_logits.shape == (1, 16, 4)  # C+1
    assert boxes.shape == (1, 16, 3, 4)
    det = fastrcnn_postprocess(cls_logits, boxes, valid, score_thresh=0.0,
                               max_det=10)
    assert det.boxes.shape == (1, 10, 4)
    assert np.isfinite(np.asarray(det.scores)).all()


def test_frcnn_eval_jits(small_frcnn):
    model, variables, x, labels = small_frcnn

    @jax.jit
    def infer(v, im):
        cls_logits, boxes, proposals, valid = model.apply(v, im, train=False)
        return fastrcnn_postprocess(cls_logits, boxes, valid, max_det=5)

    det = infer(variables, x)
    assert det.boxes.shape == (1, 5, 4)


def test_roi_align_mxu_matches_gather(rng):
    from fastvision_tpu.ops import roi_align_mxu

    feat = jnp.asarray(rng.normal(0, 1, (2, 24, 20, 8)), jnp.float32)
    boxes = jnp.asarray(
        rng.uniform(0, 280, (2, 6, 2)).repeat(2, axis=-1)
        + np.concatenate([np.zeros((2, 6, 2)), rng.uniform(20, 60, (2, 6, 2))], -1),
        jnp.float32,
    )  # in-bounds-ish boxes
    a = np.asarray(roi_align(feat, boxes, 7, 1 / 16, 2))
    b = np.asarray(roi_align_mxu(feat, boxes, 7, 1 / 16, 2))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_roi_align_mxu_jit_grad(rng):
    from fastvision_tpu.ops import roi_align_mxu

    feat = jnp.asarray(rng.normal(0, 1, (1, 16, 16, 4)), jnp.float32)
    boxes = jnp.asarray([[[10.0, 10.0, 120.0, 140.0]]])

    @jax.jit
    def loss(f):
        return jnp.sum(roi_align_mxu(f, boxes) ** 2)

    g = jax.grad(loss)(feat)
    assert np.isfinite(np.asarray(g)).all()
