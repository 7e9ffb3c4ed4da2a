"""NMS tests: exactness vs a reference O(N^2) greedy implementation,
class-offset behavior, static shapes, batching, jit."""
import jax
import jax.numpy as jnp
import numpy as np

from fastvision_tpu.ops import batched_non_max_suppression, nms, non_max_suppression
from fastvision_tpu.ops.nms import suppression_mask


def greedy_nms_reference(boxes, scores, iou_thres):
    """Plain-python greedy NMS (torchvision semantics)."""
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(scores), bool)
    for i in order:
        if suppressed[i] or not np.isfinite(scores[i]):
            continue
        keep.append(i)
        for j in order:
            if suppressed[j] or j == i:
                continue
            tl = np.maximum(boxes[i, :2], boxes[j, :2])
            br = np.minimum(boxes[i, 2:], boxes[j, 2:])
            inter = np.prod(np.clip(br - tl, 0, None))
            ua = (
                np.prod(boxes[i, 2:] - boxes[i, :2])
                + np.prod(boxes[j, 2:] - boxes[j, :2])
                - inter
            )
            if inter / (ua + 1e-7) > iou_thres:
                suppressed[j] = True
    return sorted(keep)


def random_boxes(rng, n):
    xy = rng.uniform(0, 80, (n, 2))
    wh = rng.uniform(5, 40, (n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def test_nms_matches_greedy_reference(rng):
    for trial in range(5):
        boxes = random_boxes(rng, 64)
        scores = rng.uniform(0, 1, 64).astype(np.float32)
        keep_mask = np.asarray(nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
        got = sorted(np.nonzero(keep_mask)[0].tolist())
        want = greedy_nms_reference(boxes, scores, 0.5)
        assert got == want, f"trial {trial}: {got} != {want}"


def test_suppression_mask_sorted_input(rng):
    boxes = jnp.array(
        [
            [0, 0, 10, 10],
            [1, 1, 11, 11],  # heavy overlap with 0 -> suppressed
            [50, 50, 60, 60],  # disjoint -> kept
        ],
        dtype=jnp.float32,
    )
    scores = jnp.array([0.9, 0.8, 0.7])
    keep = np.asarray(suppression_mask(boxes, scores, 0.5))
    np.testing.assert_array_equal(keep, [True, False, True])


def test_non_max_suppression_end_to_end(rng):
    # two classes, overlapping boxes of different classes must both survive
    n, c = 32, 3
    pred = np.zeros((n, 5 + c), np.float32)
    pred[:, :4] = [50, 50, 20, 20]  # all same xywh box
    pred[:, 4] = 0.01  # below conf: all invalid...
    pred[0, 4] = 0.9
    pred[0, 5] = 1.0  # class 0
    pred[1, 4] = 0.8
    pred[1, 7] = 1.0  # class 2, same box, different class -> kept
    pred[2, 4] = 0.7
    pred[2, 5] = 1.0  # class 0 duplicate -> suppressed
    det = non_max_suppression(jnp.asarray(pred), conf_thres=0.25, iou_thres=0.45, max_det=10, pre_nms_top_k=16)
    valid = np.asarray(det.valid)
    assert valid.sum() == 2
    kept_classes = sorted(np.asarray(det.classes)[valid].tolist())
    assert kept_classes == [0, 2]
    assert det.boxes.shape == (10, 4)  # static shape


def test_class_agnostic_suppresses_across_classes():
    pred = np.zeros((8, 7), np.float32)
    pred[0] = [50, 50, 20, 20, 0.9, 1.0, 0.0]
    pred[1] = [50, 50, 20, 20, 0.8, 0.0, 1.0]
    det = non_max_suppression(jnp.asarray(pred), conf_thres=0.25, class_agnostic=True, max_det=4, pre_nms_top_k=8)
    assert int(np.asarray(det.valid).sum()) == 1


def test_batched_and_jit(rng):
    pred = rng.uniform(0, 1, (2, 64, 85)).astype(np.float32)
    pred[..., :2] = rng.uniform(100, 300, (2, 64, 2))
    pred[..., 2:4] = rng.uniform(10, 50, (2, 64, 2))
    fn = jax.jit(
        lambda p: batched_non_max_suppression(p, conf_thres=0.3, max_det=20, pre_nms_top_k=32)
    )
    det = fn(jnp.asarray(pred))
    assert det.boxes.shape == (2, 20, 4)
    assert det.scores.shape == (2, 20)
    # scores sorted descending within each image
    s = np.asarray(det.scores)
    assert (np.diff(s, axis=1) <= 1e-6).all()


def test_max_det_truncation(rng):
    boxes = random_boxes(rng, 128)
    # spread boxes out so nothing suppresses
    boxes[:, :2] = np.arange(128)[:, None] * 100.0
    boxes[:, 2:] = boxes[:, :2] + 10
    scores = rng.uniform(0.5, 1, 128).astype(np.float32)
    keep = np.asarray(nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, max_out=5))
    assert keep.sum() == 5
    # the 5 kept are the top-5 scores
    top5 = set(np.argsort(-scores)[:5].tolist())
    assert set(np.nonzero(keep)[0].tolist()) == top5


def test_multilabel_keeps_multiple_classes_per_box():
    from fastvision_tpu.ops import non_max_suppression_multilabel

    pred = np.zeros((8, 9), np.float32)  # 4 classes
    # one box confidently two classes
    pred[0] = [50, 50, 20, 20, 0.9, 0.9, 0.8, 0.0, 0.0]
    det = non_max_suppression_multilabel(
        jnp.asarray(pred), conf_thres=0.1, iou_thres=0.6, max_det=8, pre_nms_top_k=16
    )
    valid = np.asarray(det.valid)
    kept_classes = sorted(np.asarray(det.classes)[valid].tolist())
    assert kept_classes == [0, 1]  # both labels survive (multi-label)
    # single-label variant keeps only the argmax class
    det_single = non_max_suppression(
        jnp.asarray(pred), conf_thres=0.1, iou_thres=0.6, max_det=8, pre_nms_top_k=16
    )
    v = np.asarray(det_single.valid)
    assert sorted(np.asarray(det_single.classes)[v].tolist()) == [0]


def test_multilabel_suppresses_within_class(rng):
    from fastvision_tpu.ops import non_max_suppression_multilabel

    pred = np.zeros((8, 7), np.float32)  # 2 classes
    pred[0] = [50, 50, 20, 20, 0.9, 1.0, 0.0]
    pred[1] = [51, 51, 20, 20, 0.8, 1.0, 0.0]  # same class, overlapping
    det = non_max_suppression_multilabel(
        jnp.asarray(pred), conf_thres=0.1, max_det=8, pre_nms_top_k=16
    )
    assert int(np.asarray(det.valid).sum()) == 1


def test_class_offset_for_bound():
    """class_offset_for: never below the historical constant; exceeds the
    coordinate bound once coordinates outgrow it (VERDICT r2 weak-6)."""
    from fastvision_tpu.ops.nms import CLASS_OFFSET, class_offset_for

    assert class_offset_for(100.0) == CLASS_OFFSET
    assert class_offset_for(3 * 416.0) == CLASS_OFFSET
    assert class_offset_for(10000.0) == 10001.0


def test_class_offset_prevents_cross_class_collision():
    """With coordinates beyond the default offset, adjacent classes' shifted
    regions collide and cross-class suppression corrupts results; a derived
    offset keeps both detections."""
    # class-1 box at x~50 shifted by 4096 lands exactly on the class-0 box
    # at x~4146 -> identical boxes after offset -> one wrongly suppressed
    pred = np.zeros((4, 7), np.float32)  # 2 classes, xywh+obj+cls
    pred[0] = [4146, 4146, 20, 20, 0.9, 1.0, 0.0]  # class 0, large coords
    pred[1] = [50, 50, 20, 20, 0.8, 0.0, 1.0]    # class 1
    kw = dict(conf_thres=0.1, iou_thres=0.5, max_det=8, pre_nms_top_k=8)

    bad = non_max_suppression(jnp.asarray(pred), **kw)  # default 4096
    assert int(np.asarray(bad.valid).sum()) == 1  # demonstrates the hazard

    from fastvision_tpu.ops.nms import class_offset_for

    good = non_max_suppression(
        jnp.asarray(pred), class_offset=class_offset_for(8192.0), **kw
    )
    assert int(np.asarray(good.valid).sum()) == 2
