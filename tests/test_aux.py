"""Aux subsystem tests: accuracy, plots, distributed info, telemetry."""
import json
import os

import jax.numpy as jnp
import numpy as np

from fastvision_tpu.core import plot_anchors, plot_metrics, plot_pr_curves, process_info
from fastvision_tpu.core.telemetry import MetricLogger, StepTimer
from fastvision_tpu.ops import Accuracy, accuracy


def test_accuracy_top1():
    logits = jnp.array([[1.0, 0.0], [0.0, 1.0], [1.0, 0.0]])
    labels = jnp.array([0, 1, 1])
    assert abs(float(accuracy(logits, labels)) - 2 / 3) < 1e-6


def test_accuracy_topk():
    logits = jnp.array([[3.0, 2.0, 1.0, 0.0]])
    assert float(accuracy(logits, jnp.array([1]), topk=1)) == 0.0
    assert float(accuracy(logits, jnp.array([1]), topk=2)) == 1.0


def test_accuracy_streaming():
    m = Accuracy()
    m(np.array([[1.0, 0.0]]), np.array([0]))
    m(np.array([[1.0, 0.0]]), np.array([1]))
    assert m.fetch() == 0.5


def test_metric_logger_and_plot(tmp_path):
    logger = MetricLogger(str(tmp_path), stdout=False)
    for step in range(5):
        logger.log(step, loss=1.0 / (step + 1), lr=0.01)
    logger.close()
    jsonl = tmp_path / "train.jsonl"
    assert jsonl.exists()
    rows = [json.loads(l) for l in open(jsonl)]
    assert len(rows) == 5 and rows[0]["loss"] == 1.0
    out = plot_metrics(str(jsonl), str(tmp_path / "curves.png"))
    assert os.path.getsize(out) > 1000


def test_plot_anchors(tmp_path, rng):
    wh = rng.uniform(5, 100, (50, 2))
    centers = np.array([[10, 10], [80, 80]], np.float32)
    assign = (wh[:, 0] > 40).astype(int)
    out = plot_anchors(wh, centers, assign, str(tmp_path / "a.png"))
    assert os.path.getsize(out) > 1000


def test_plot_pr_curves(tmp_path):
    from fastvision_tpu.ops.map import MAPResult

    res = MAPResult(
        map_per_iou=np.linspace(0.8, 0.2, 10),
        ap_per_class_per_iou=np.random.default_rng(0).uniform(0, 1, (3, 10)),
        classes=[0, 1, 2],
        precision=np.array([0.8, 0.7, 0.9]),
        recall=np.array([0.6, 0.5, 0.7]),
        iou_thresholds=np.linspace(0.5, 0.95, 10),
    )
    paths = plot_pr_curves(res, str(tmp_path), ["a", "b", "c"])
    assert len(paths) == 2 and all(os.path.getsize(p) > 1000 for p in paths)


def test_step_timer():
    t = StepTimer(warmup=1)
    t.start()
    for _ in range(3):
        t.tick()
    assert t.mean >= 0


def test_process_info():
    info = process_info()
    assert info["process_count"] == 1
    assert info["global_device_count"] == 8
