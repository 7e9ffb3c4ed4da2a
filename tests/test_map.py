"""mAP tests: hand-computed AP values, matching semantics, padded inputs."""
import numpy as np

from fastvision_tpu.ops import MeanAveragePrecision, compute_ap, match_predictions


def test_compute_ap_perfect():
    # perfect detector: precision 1 at all recalls
    r = np.array([0.5, 1.0])
    p = np.array([1.0, 1.0])
    assert abs(compute_ap(r, p, "coco") - 1.0) < 0.02  # 101-pt interp ~1
    assert abs(compute_ap(r, p, "voc2009") - 1.0) < 1e-6
    assert abs(compute_ap(r, p, "voc2007") - 1.0) < 1e-6


def test_compute_ap_half():
    # one TP then one FP over 1 GT: recall [1, 1], precision [1, .5] -> AP 1
    ap = compute_ap(np.array([1.0, 1.0]), np.array([1.0, 0.5]), "voc2009")
    assert abs(ap - 1.0) < 1e-6
    # one FP then one TP: recall [0, 1], precision [0, .5] -> AP 0.5
    ap = compute_ap(np.array([0.0, 1.0]), np.array([0.0, 0.5]), "voc2009")
    assert abs(ap - 0.5) < 1e-6


def test_match_predictions_greedy():
    thrs = np.array([0.5, 0.75])
    gt = np.array([[0, 0, 10, 10]], np.float32)
    gt_cls = np.array([1])
    # two predictions on the same GT: higher-IoU one wins
    pred = np.array([[0, 0, 10, 10], [0, 0, 10, 8]], np.float32)
    pred_cls = np.array([1, 1])
    correct = match_predictions(pred, pred_cls, gt, gt_cls, thrs)
    assert correct[0].tolist() == [True, True]  # exact match at both thresholds
    assert correct[1].tolist() == [False, False]  # GT already consumed


def test_match_wrong_class_never_matches():
    thrs = np.array([0.5])
    gt = np.array([[0, 0, 10, 10]], np.float32)
    correct = match_predictions(
        np.array([[0, 0, 10, 10]], np.float32), np.array([2]), gt, np.array([1]), thrs
    )
    assert not correct.any()


def test_streaming_map_perfect_detector():
    m = MeanAveragePrecision(iou_thresholds=[0.5])
    for _ in range(4):
        gt = np.array([[10, 10, 50, 50], [60, 60, 90, 90]], np.float32)
        gt_cls = np.array([0, 1])
        m.update(gt.copy(), np.array([0.9, 0.8]), gt_cls.copy(), gt, gt_cls)
    res = m.compute()
    assert abs(res.map50 - 1.0) < 0.02
    assert res.classes == [0, 1]


def test_streaming_map_with_fp():
    m = MeanAveragePrecision(iou_thresholds=[0.5], method="voc2009")
    gt = np.array([[10, 10, 50, 50]], np.float32)
    # one TP (conf .9) + one FP (conf .8, far away): AP stays 1.0 (TP first)
    preds = np.array([[10, 10, 50, 50], [200, 200, 240, 240]], np.float32)
    m.update(preds, np.array([0.9, 0.8]), np.array([0, 0]), gt, np.array([0]))
    res = m.compute()
    assert abs(res.map50 - 1.0) < 1e-6
    # FP with HIGHER conf than the TP: AP = 0.5
    m.reset()
    m.update(preds, np.array([0.7, 0.95]), np.array([0, 0]), gt, np.array([0]))
    res = m.compute()
    assert abs(res.map50 - 0.5) < 1e-6


def test_padded_inputs_with_valid_mask():
    m = MeanAveragePrecision(iou_thresholds=[0.5])
    pred_boxes = np.zeros((300, 4), np.float32)
    pred_boxes[0] = [10, 10, 50, 50]
    pred_scores = np.zeros(300, np.float32)
    pred_scores[0] = 0.9
    pred_cls = np.zeros(300, np.int32)
    pred_valid = np.zeros(300, bool)
    pred_valid[0] = True
    gt_boxes = np.zeros((120, 4), np.float32)
    gt_boxes[0] = [10, 10, 50, 50]
    gt_cls = np.zeros(120, np.int32)
    gt_valid = np.zeros(120, bool)
    gt_valid[0] = True
    m.update(pred_boxes, pred_scores, pred_cls, gt_boxes, gt_cls, pred_valid, gt_valid)
    res = m.compute()
    assert abs(res.map50 - 1.0) < 0.02


def test_empty_everything():
    m = MeanAveragePrecision()
    res = m.compute()
    assert res.map_per_iou.shape == (10,)
    assert res.map50 == 0.0
