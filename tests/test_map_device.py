"""Device-side mAP matching (ops/map.py::match_predictions_device).

North star: the per-image correct-matrix matching runs INSIDE the jitted
eval program (ref host loop: metrics/map.py:16-84). These tests pin the
device matcher to the host matcher exactly on randomized padded cases, and
Detector.evaluate's device path to its host path end-to-end.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastvision_tpu.ops.map import (
    MeanAveragePrecision,
    match_predictions,
    match_predictions_device,
)

THRESHOLDS = np.linspace(0.5, 0.95, 10)


def _random_case(rng, n_pred, n_gt, n_cls, quantize=False):
    def boxes(n):
        xy = rng.uniform(0, 80, (n, 2))
        wh = rng.uniform(4, 40, (n, 2))
        b = np.concatenate([xy, xy + wh], 1).astype(np.float32)
        return np.round(b) if quantize else b

    return (boxes(n_pred), rng.integers(0, n_cls, n_pred).astype(np.float32),
            boxes(n_gt), rng.integers(0, n_cls, n_gt).astype(np.float32))


@pytest.mark.parametrize("quantize", [False, True])  # True forces IoU ties
def test_device_matcher_equals_host_randomized(rng, quantize):
    P, G = 24, 12
    batch_pb, batch_pc, batch_pv = [], [], []
    batch_tb, batch_tc, batch_tv = [], [], []
    expected = []
    for _ in range(16):
        n_pred = int(rng.integers(0, P + 1))
        n_gt = int(rng.integers(0, G + 1))
        pb, pc, tb, tc = _random_case(rng, n_pred, n_gt, 3, quantize)
        expected.append(match_predictions(pb, pc, tb, tc, THRESHOLDS))
        # pad to fixed shapes with garbage rows masked invalid
        pad_p, pad_g = P - n_pred, G - n_gt
        batch_pb.append(np.concatenate([pb, rng.uniform(0, 90, (pad_p, 4))]).astype(np.float32))
        batch_pc.append(np.concatenate([pc, rng.integers(0, 3, pad_p)]).astype(np.float32))
        batch_pv.append(np.arange(P) < n_pred)
        batch_tb.append(np.concatenate([tb, rng.uniform(0, 90, (pad_g, 4))]).astype(np.float32))
        batch_tc.append(np.concatenate([tc, np.full(pad_g, -1)]).astype(np.float32))
        batch_tv.append(np.arange(G) < n_gt)
    got = jax.jit(match_predictions_device)(
        jnp.asarray(np.stack(batch_pb)), jnp.asarray(np.stack(batch_pc)),
        jnp.asarray(np.stack(batch_pv)), jnp.asarray(np.stack(batch_tb)),
        jnp.asarray(np.stack(batch_tc)), jnp.asarray(np.stack(batch_tv)),
        jnp.asarray(THRESHOLDS.astype(np.float32)),
    )
    got = np.asarray(got)
    for i, exp in enumerate(expected):
        n_pred = exp.shape[0]
        np.testing.assert_array_equal(got[i, :n_pred], exp, err_msg=f"case {i}")
        assert not got[i, n_pred:].any(), f"case {i}: padded preds matched"


def test_device_matcher_all_invalid(rng):
    pb, pc, tb, tc = _random_case(rng, 8, 4, 2)
    out = match_predictions_device(
        jnp.asarray(pb[None]), jnp.asarray(pc[None]),
        jnp.zeros((1, 8), bool),  # no valid predictions
        jnp.asarray(tb[None]), jnp.asarray(tc[None]),
        jnp.ones((1, 4), bool), jnp.asarray(THRESHOLDS.astype(np.float32)),
    )
    assert not np.asarray(out).any()
    out = match_predictions_device(
        jnp.asarray(pb[None]), jnp.asarray(pc[None]), jnp.ones((1, 8), bool),
        jnp.asarray(tb[None]), jnp.asarray(tc[None]),
        jnp.zeros((1, 4), bool),  # no valid GT
        jnp.asarray(THRESHOLDS.astype(np.float32)),
    )
    assert not np.asarray(out).any()


def test_update_matched_equals_update(rng):
    """Feeding a precomputed correct-matrix (update_matched) must reproduce
    exactly what update() computes from raw boxes."""
    m_host, m_dev = MeanAveragePrecision(), MeanAveragePrecision()
    for _ in range(10):
        pb, pc, tb, tc = _random_case(rng, int(rng.integers(1, 20)),
                                      int(rng.integers(1, 8)), 3)
        scores = rng.uniform(0.05, 1.0, len(pb)).astype(np.float32)
        m_host.update(pb, scores, pc, tb, tc)
        correct = match_predictions(pb, pc, tb, tc, m_dev.iou_thresholds)
        m_dev.update_matched(correct, scores, pc, tc)
    a, b = m_host.compute(), m_dev.compute()
    np.testing.assert_allclose(a.map_per_iou, b.map_per_iou)
    np.testing.assert_allclose(a.ap_per_class_per_iou, b.ap_per_class_per_iou)


def test_detector_evaluate_device_matches_host(tmp_path, rng):
    """End-to-end: Detector.evaluate device-matched == host-matched on a
    real (toy) dataset, for both rgb and i420 input formats."""
    import cv2

    from fastvision_tpu.data import DetectionDataset
    from fastvision_tpu.infer import Detector
    from fastvision_tpu.models.detection import YOLOv3

    anchors = np.asarray(
        [[[60, 50], [70, 60], [80, 70]],
         [[40, 35], [50, 40], [55, 45]],
         [[20, 18], [28, 24], [34, 30]]], np.float32)
    root = tmp_path / "ds"
    os.makedirs(root / "val" / "images")
    os.makedirs(root / "val" / "labels")
    for i in range(5):  # odd count: exercises the ragged last batch
        cv2.imwrite(str(root / "val" / "images" / f"i{i}.jpg"),
                    rng.integers(0, 255, (90, 120, 3)).astype(np.uint8))
        (root / "val" / "labels" / f"i{i}.txt").write_text(
            "0 10 10 60 50\n1 30 20 100 80\n2 5 40 40 85\n")
    ds = DetectionDataset(str(root), "val")

    model = YOLOv3(num_classes=3)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 96, 96, 3)),
                           train=True)
    for fmt in ("rgb", "i420"):
        det = Detector(model, variables, anchors, input_size=96, batch_size=2,
                       conf_thres=0.05, dtype=jnp.float32, input_format=fmt)
        dev = det.evaluate(ds, device_matching=True)
        host = det.evaluate(ds, device_matching=False)
        assert dev["images"] == host["images"] == 5
        assert dev["map50"] == pytest.approx(host["map50"], abs=1e-7), fmt
        assert dev["map"] == pytest.approx(host["map"], abs=1e-7), fmt


def test_detector_evaluate_on_mesh_matches_single(tmp_path, rng, mesh):
    """Multi-chip eval: Detector(mesh=...).evaluate shards each batch over
    the data axis through the prefetch stream; results == single-device,
    for both device- and host-matched paths and for pipelined TTA."""
    import cv2

    from fastvision_tpu.data import DetectionDataset
    from fastvision_tpu.infer import Detector
    from fastvision_tpu.models.detection import YOLOv3

    anchors = np.asarray(
        [[[60, 50], [70, 60], [80, 70]],
         [[40, 35], [50, 40], [55, 45]],
         [[20, 18], [28, 24], [34, 30]]], np.float32)
    root = tmp_path / "ds"
    os.makedirs(root / "val" / "images")
    os.makedirs(root / "val" / "labels")
    for i in range(10):  # ragged: 10 imgs at bs8 -> padded last batch
        cv2.imwrite(str(root / "val" / "images" / f"i{i}.jpg"),
                    rng.integers(0, 255, (90, 120, 3)).astype(np.uint8))
        (root / "val" / "labels" / f"i{i}.txt").write_text(
            "0 10 10 60 50\n1 30 20 100 80\n")
    ds = DetectionDataset(str(root), "val")

    model = YOLOv3(num_classes=3)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 96, 96, 3)),
                           train=True)
    kw = dict(input_size=96, batch_size=8, conf_thres=0.05, dtype=jnp.float32)
    single = Detector(model, variables, anchors, **kw)
    sharded = Detector(model, variables, anchors, mesh=mesh, **kw)
    for kwargs in ({}, {"device_matching": False}, {"tta": True}):
        a = single.evaluate(ds, **kwargs)
        b = sharded.evaluate(ds, **kwargs)
        assert b["images"] == 10
        assert b["map50"] == pytest.approx(a["map50"], abs=1e-6), kwargs
        assert b["map"] == pytest.approx(a["map"], abs=1e-6), kwargs


def test_evaluate_device_matching_rejects_unsupported(tmp_path, rng):
    from fastvision_tpu.infer import Detector
    from fastvision_tpu.models.detection import YOLOv3

    anchors = np.asarray([[[60, 50], [70, 60], [80, 70]],
                          [[40, 35], [50, 40], [55, 45]],
                          [[20, 18], [28, 24], [34, 30]]], np.float32)
    model = YOLOv3(num_classes=3)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 96, 96, 3)),
                           train=True)
    det = Detector(model, variables, anchors, input_size=96, batch_size=2,
                   dtype=jnp.float32)
    with pytest.raises(ValueError, match="device_matching"):
        det.evaluate([], device_matching=True, tta=True)
