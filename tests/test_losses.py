"""Loss tests: hand values for CE/BCE/focal/IoU-loss, YOLO loss behavior."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastvision_tpu.train import (
    YOLOv3Loss,
    YOLOv3LossPerCell,
    binary_cross_entropy,
    cross_entropy,
    focal_loss,
    iou_loss,
    smooth_l1,
)


def test_cross_entropy_hand_value():
    logits = jnp.array([[2.0, 0.0], [0.0, 2.0]])
    labels = jnp.array([0, 1])
    # -log(softmax) = log(1 + e^-2)
    want = float(np.log(1 + np.exp(-2.0)))
    got = float(cross_entropy(logits, labels))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_cross_entropy_weights():
    logits = jnp.array([[2.0, 0.0], [0.0, 2.0]])
    labels = jnp.array([0, 1])
    w = jnp.array([1.0, 0.0])
    got = float(cross_entropy(logits, labels, weights=w))
    want = float(np.log(1 + np.exp(-2.0)))  # only first sample, weighted mean
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_bce_logits_vs_probs_agree():
    logits = jnp.array([0.5, -1.0, 2.0])
    targets = jnp.array([1.0, 0.0, 1.0])
    a = float(binary_cross_entropy(logits, targets, from_logits=True))
    b = float(binary_cross_entropy(jax.nn.sigmoid(logits), targets, from_logits=False))
    np.testing.assert_allclose(a, b, rtol=1e-4)


def test_focal_reduces_easy_examples():
    easy = jnp.array([[5.0, -5.0]])  # confident correct
    hard = jnp.array([[0.0, 0.0]])
    labels = jnp.array([0])
    assert float(focal_loss(easy, labels)) < float(focal_loss(hard, labels))


def test_iou_loss_zero_for_identical():
    b = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    assert abs(float(iou_loss(b, b, kind="ciou"))) < 1e-5
    assert float(iou_loss(b, b + 100, kind="giou")) > 1.0


def test_smooth_l1():
    np.testing.assert_allclose(
        float(smooth_l1(jnp.array([0.5]), jnp.array([0.0]))), 0.125, rtol=1e-6
    )
    np.testing.assert_allclose(
        float(smooth_l1(jnp.array([2.0]), jnp.array([0.0]))), 1.5, rtol=1e-6
    )


# ---------------------------------------------------------------------------
# YOLO losses
# ---------------------------------------------------------------------------
ANCHORS = jnp.asarray(
    [[[116, 90], [156, 198], [373, 326]],
     [[30, 61], [62, 45], [59, 119]],
     [[10, 13], [16, 30], [33, 23]]],
    jnp.float32,
)


def make_heads(b=2, base=2, c=20, rng=None, scale=0.01):
    shapes = [(b, base, base, 3, 5 + c), (b, base * 2, base * 2, 3, 5 + c),
              (b, base * 4, base * 4, 3, 5 + c)]
    if rng is None:
        return [jnp.zeros(s) for s in shapes]
    return [jnp.asarray(rng.normal(0, scale, s), jnp.float32) for s in shapes]


def make_labels(b=2, m=8):
    """one real box per image, rest padded."""
    labels = np.full((b, m, 5), -1, np.float32)
    labels[:, 0] = [1, 0.5, 0.5, 0.3, 0.4]  # class 1 centered box
    return jnp.asarray(labels)


@pytest.mark.parametrize("loss_cls", [YOLOv3Loss, YOLOv3LossPerCell])
def test_yolo_loss_finite_and_positive(loss_cls, rng):
    loss = loss_cls(ANCHORS, num_classes=20)
    out = loss(make_heads(rng=rng), make_labels())
    assert np.isfinite(float(out.total))
    assert float(out.total) > 0
    for part in (out.box, out.obj, out.cls):
        assert np.isfinite(float(part)) and float(part) >= 0


def test_yolo_loss_all_padding_no_nan():
    loss = YOLOv3Loss(ANCHORS, num_classes=20)
    labels = jnp.full((2, 8, 5), -1.0)  # no real boxes at all
    out = loss(make_heads(), labels)
    assert np.isfinite(float(out.total))
    assert float(out.box) == 0.0  # no positives -> no box loss
    assert float(out.cls) == 0.0


def test_yolo_loss_grad_flows(rng):
    loss = YOLOv3Loss(ANCHORS, num_classes=20, decode_style="v5")
    heads = make_heads(rng=rng)
    labels = make_labels()

    def f(hs):
        return loss(hs, labels).total

    grads = jax.grad(f)(heads)
    total = sum(float(jnp.abs(g).sum()) for g in grads)
    assert np.isfinite(total) and total > 0


def test_yolo_loss_jits(rng):
    loss = YOLOv3Loss(ANCHORS, num_classes=20)
    fn = jax.jit(lambda hs, lb: loss(hs, lb).total)
    v = fn(make_heads(rng=rng), make_labels())
    assert np.isfinite(float(v))


def test_yolo_loss_better_prediction_lower_loss():
    """A head predicting the GT box at the right cell scores lower than one
    predicting elsewhere."""
    c = 20
    loss = YOLOv3Loss(ANCHORS, num_classes=c, decode_style="v5", ratio_thres=4.0)
    labels = make_labels(b=1)

    heads_good = [np.zeros((1, s, s, 3, 5 + c), np.float32) for s in (2, 4, 8)]
    heads_bad = [h.copy() for h in heads_good]
    # make the 'good' head confident about the right class at all cells of
    # the matching level; the 'bad' head confident about a wrong class
    for h in heads_good:
        h[..., 4] = -4.0
        h[..., 5 + 1] = 4.0  # class 1 (GT)
        h[..., 5 + 0] = -4.0
    for h in heads_bad:
        h[..., 4] = -4.0
        h[..., 5 + 1] = -4.0
        h[..., 5 + 0] = 4.0  # wrong class
    lg = float(loss([jnp.asarray(h) for h in heads_good], labels).cls)
    lb = float(loss([jnp.asarray(h) for h in heads_bad], labels).cls)
    assert lg < lb


def test_yolo_percell_ignore_mask_reduces_obj_loss(rng):
    """Confident predictions overlapping GT should be ignored as negatives."""
    c = 5
    loss = YOLOv3LossPerCell(ANCHORS, num_classes=c, ignore_iou_thres=0.5)
    labels = make_labels(b=1, m=4)
    # heads where many cells predict boxes ~ at the GT location
    heads = make_heads(b=1, c=c)
    out = loss(heads, labels)
    assert np.isfinite(float(out.total))


def test_yolo_loss_v3_decode_style(rng):
    loss = YOLOv3Loss(ANCHORS, num_classes=20, decode_style="v3")
    out = loss(make_heads(rng=rng), make_labels())
    assert np.isfinite(float(out.total))


def test_neighbor_cells_expand_positives():
    from fastvision_tpu.train.losses import _dense_targets

    anchors_feat = jnp.asarray([[3.0, 4.0]])
    # one box centered at (4.3, 4.7) in an 8x8 grid -> neighbors west + south
    labels = jnp.asarray([[[0, 4.3 / 8, 4.7 / 8, 3.0 / 8, 4.0 / 8]]])
    t0 = _dense_targets(labels, anchors_feat, (8, 8), ratio_thres=4.0,
                        neighbor_cells=False)
    t1 = _dense_targets(labels, anchors_feat, (8, 8), ratio_thres=4.0,
                        neighbor_cells=True)
    assert float(t0["pos"].sum()) == 1.0
    assert float(t1["pos"].sum()) == 3.0  # center + west + south
    pos = np.asarray(t1["pos"][0, :, :, 0])
    assert pos[4, 4] == 1 and pos[4, 3] == 1 and pos[5, 4] == 1
    # neighbor offsets are outside [0,1): west cell sees offset x = 1.3
    box = np.asarray(t1["box"][0])
    np.testing.assert_allclose(box[4, 3, 0, 0], 1.3, rtol=1e-5)
    np.testing.assert_allclose(box[5, 4, 0, 1], -0.3, rtol=1e-4, atol=1e-5)


def test_yolo_loss_neighbor_cells_trains(rng):
    loss = YOLOv3Loss(ANCHORS, num_classes=20, neighbor_cells=True)
    heads = make_heads(rng=rng)
    out = loss(heads, make_labels())
    assert np.isfinite(float(out.total))

    g = jax.grad(lambda hs: loss(hs, make_labels()).total)(heads)
    assert np.isfinite(sum(float(jnp.abs(x).sum()) for x in g))


def test_dense_targets_collision_consistent():
    """ADVICE r1 (low): when two GTs match the same cell/anchor slot, the
    scattered box and class must come from the SAME GT (single fused
    scatter), never box-from-one + class-from-the-other."""
    from fastvision_tpu.train.losses import _dense_targets

    anchors_feat = jnp.asarray([[2.0, 2.0]])
    gts = [(1, 0.52, 0.52, 0.25, 0.25), (3, 0.55, 0.55, 0.30, 0.30)]
    labels = jnp.asarray([[list(g) for g in gts]], jnp.float32)
    t = _dense_targets(labels, anchors_feat, (8, 8), ratio_thres=4.0)
    pos = np.asarray(t["pos"])[0]
    ys, xs, aa = np.nonzero(pos)
    assert len(ys) == 1  # both GTs collide into one slot, clamped to 1
    y, x, a = int(ys[0]), int(xs[0]), int(aa[0])
    cls = int(np.asarray(t["cls"])[0, y, x, a])
    box = np.asarray(t["box"])[0, y, x, a]
    expected = {
        c: np.array([cx * 8 - x, cy * 8 - y, wn * 8, hn * 8], np.float32)
        for c, cx, cy, wn, hn in gts
    }
    assert cls in expected
    np.testing.assert_allclose(box, expected[cls], rtol=1e-5)


def test_binary_focal_loss():
    """gamma=0 + alpha=None degenerates to BCE; gamma>0 down-weights easy
    examples (ref RPN FocalLoss, rpn.py:312)."""
    from fastvision_tpu.train.losses import binary_cross_entropy, binary_focal_loss

    logits = jnp.asarray([2.0, -1.0, 0.5, -3.0])
    targets = jnp.asarray([1.0, 0.0, 0.0, 1.0])
    np.testing.assert_allclose(
        binary_focal_loss(logits, targets, gamma=0.0),
        binary_cross_entropy(logits, targets), rtol=1e-6)
    # easy positive (logit 2, target 1): focal << bce; per-element check
    f = binary_focal_loss(logits, targets, gamma=2.0, reduction="none")
    b = binary_cross_entropy(logits, targets, reduction="none")
    assert float(f[0]) < 0.2 * float(b[0])
    # hard positive keeps most of its weight
    assert float(f[3]) > 0.8 * float(b[3])
    # alpha weighting scales pos vs neg terms
    fa = binary_focal_loss(logits, targets, gamma=0.0, alpha=0.25, reduction="none")
    np.testing.assert_allclose(np.asarray(fa[0]), 0.25 * np.asarray(b[0]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(fa[1]), 0.75 * np.asarray(b[1]), rtol=1e-6)
