"""mAP parity: execute the reference CalculateMAP (metrics/map.py, with its
removed np.float/np.long aliases shimmed at runtime) on randomized
detections and require identical per-IoU mAP from our evaluator.

Note: our matcher re-matches greedily PER threshold (ultralytics
semantics); the reference derives higher-threshold correctness from the
base-threshold matching. On jittered-GT data (unambiguous matches) the two
coincide exactly; pathological overlapping-detection cases can differ.
"""
import importlib.util
import inspect
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_map_cls():
    tv = types.ModuleType("torchvision")
    tv.ops = types.SimpleNamespace(nms=None, roi_align=None)
    sys.modules.setdefault("torchvision", tv)
    if "fastvision" not in sys.modules:
        spec = importlib.util.spec_from_file_location(
            "fastvision", "/root/reference/__init__.py",
            submodule_search_locations=["/root/reference"],
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules["fastvision"] = mod
        spec.loader.exec_module(mod)
    import fastvision.metrics.map as ref_map_mod

    src = inspect.getsource(ref_map_mod)
    src = src.replace("np.float)", "np.float64)").replace("np.long)", "np.int64)")
    ns = dict(ref_map_mod.__dict__)
    exec(compile(src, ref_map_mod.__file__, "exec"), ns)
    return ns["CalculateMAP"]


def test_map_matches_reference(ref_map_cls):
    from fastvision_tpu.ops import MeanAveragePrecision

    rng = np.random.default_rng(0)
    thrs = np.linspace(0.5, 0.95, 10)
    ref = ref_map_cls(thrs)
    ours = MeanAveragePrecision(thrs)
    for _ in range(12):
        n_gt = rng.integers(1, 5)
        gt_boxes = np.zeros((n_gt, 4), np.float32)
        gt_boxes[:, :2] = rng.uniform(0, 300, (n_gt, 2))
        gt_boxes[:, 2:] = gt_boxes[:, :2] + rng.uniform(20, 120, (n_gt, 2))
        gt_cls = rng.integers(0, 3, n_gt).astype(np.float32)
        n_fp = rng.integers(0, 4)
        pred_boxes = np.concatenate(
            [gt_boxes + rng.normal(0, 6, gt_boxes.shape),
             rng.uniform(0, 300, (n_fp, 4))]).astype(np.float32)
        pred_boxes[:, 2:] = np.maximum(pred_boxes[:, 2:], pred_boxes[:, :2] + 5)
        pred_cls = np.concatenate([gt_cls, rng.integers(0, 3, n_fp)]).astype(np.float32)
        pred_conf = rng.uniform(0.1, 1.0, len(pred_boxes)).astype(np.float32)
        y_pred = torch.tensor(
            np.concatenate([pred_cls[:, None], pred_conf[:, None], pred_boxes], 1))
        y_true = torch.tensor(np.concatenate([gt_cls[:, None], gt_boxes], 1))
        ref.process_one(y_pred, y_true)
        ours.update(pred_boxes, pred_conf, pred_cls, gt_boxes, gt_cls)

    map_each_iou, _, _ = ref.fetch()
    res = ours.compute()
    np.testing.assert_allclose(res.map_per_iou, map_each_iou, atol=1e-9)
