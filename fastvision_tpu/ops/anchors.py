"""Anchor generation by IoU-distance k-means over dataset box shapes.

Re-design of `detection/tools/ANCHOR.py:11-120` (KMeans + AnchorGenerator):
  - numpy host-side (a one-off dataset statistics pass, not a hot op);
  - deterministic via an explicit seed (the reference shuffles with global
    numpy state);
  - cache is JSON, not `eval()` of a text file (fixes the reference's
    eval-based cache, ANCHOR.py:92);
  - anchors sorted by area ascending (small -> large), grouped per level.
"""
from __future__ import annotations

import json
import os
from typing import Sequence

import numpy as np


def _wh_iou_matrix_np(wh1: np.ndarray, wh2: np.ndarray, eps: float = 1e-7) -> np.ndarray:
    inter = np.minimum(wh1[:, None, 0], wh2[None, :, 0]) * np.minimum(
        wh1[:, None, 1], wh2[None, :, 1]
    )
    union = wh1[:, 0:1] * wh1[:, 1:2] + (wh2[:, 0] * wh2[:, 1])[None, :] - inter + eps
    return inter / union


def _kmeanspp_init(wh: np.ndarray, k: int, rng: np.random.Generator) -> np.ndarray:
    """k-means++ seeding under the (1 - wh-IoU) metric: each next center is
    sampled proportionally to its squared distance from the nearest chosen
    center — spreads seeds across scales, more stable than uniform picks."""
    centers = np.empty((k, 2), np.float64)
    centers[0] = wh[rng.integers(wh.shape[0])]
    d2 = (1.0 - _wh_iou_matrix_np(wh, centers[:1])[:, 0]) ** 2
    for i in range(1, k):
        p = d2 / max(d2.sum(), 1e-12)
        centers[i] = wh[rng.choice(wh.shape[0], p=p)]
        d_new = (1.0 - _wh_iou_matrix_np(wh, centers[i : i + 1])[:, 0]) ** 2
        d2 = np.minimum(d2, d_new)
    return centers


def kmeans_anchors(
    wh: np.ndarray, k: int = 9, iters: int = 100, seed: int = 0,
    init: str = "random",
) -> tuple[np.ndarray, np.ndarray]:
    """K-means with (1 - wh-IoU) distance. Ref: ANCHOR.py:11 KMeans.

    Args:
      wh: [N, 2] box widths/heights (any consistent unit).
      init: 'random' (reference behavior: uniform sample of k boxes) or
        '++' (k-means++ seeding under the IoU metric).
    Returns:
      (centers [k, 2] sorted by area ascending, assignment [N] in [0, k)).
    """
    wh = np.asarray(wh, np.float64).reshape(-1, 2)
    if wh.shape[0] < k:
        raise ValueError(f"need at least k={k} boxes, got {wh.shape[0]}")
    rng = np.random.default_rng(seed)
    if init == "++":
        centers = _kmeanspp_init(wh, k, rng)
    elif init == "random":
        centers = wh[rng.permutation(wh.shape[0])[:k]].copy()
    else:
        raise ValueError(f"init must be 'random' or '++', got {init!r}")
    assign = np.zeros(wh.shape[0], np.int64)
    for _ in range(iters):
        dist = 1.0 - _wh_iou_matrix_np(wh, centers)
        assign = np.argmin(dist, axis=1)
        for ci in range(k):
            members = wh[assign == ci]
            if members.shape[0]:
                centers[ci] = members.mean(axis=0)
    order = np.argsort(centers[:, 0] * centers[:, 1])  # area ascending
    remap = np.empty(k, np.int64)
    remap[order] = np.arange(k)
    return centers[order], remap[assign]


class AnchorGenerator:
    """Dataset pass + k-means + cache (ref: ANCHOR.py:51 AnchorGenerator).

    ``datasets`` is any iterable of (image, labels) pairs or label arrays
    where labels rows are [class, x1, y1, x2, y2] in pixels, or an iterable
    of normalized wh pairs — pass ``wh`` directly via `get_anchors(wh=...)`
    to skip the scan.
    """

    def __init__(
        self,
        datasets: Sequence | None = None,
        k: int = 9,
        iters: int = 100,
        cache_dir: str = "./cache",
        use_cache: bool = False,
        seed: int = 0,
        init: str = "random",
    ):
        self.datasets = datasets or []
        self.k = k
        self.iters = iters
        self.cache_path = os.path.join(cache_dir, "anchors.json")
        self.use_cache = use_cache
        self.seed = seed
        self.init = init

    def _scan_wh(self) -> np.ndarray:
        whs = []
        for ds in self.datasets:
            for item in ds:
                labels = item[1] if isinstance(item, (tuple, list)) else item
                labels = np.asarray(labels, np.float32).reshape(-1, 5)
                wh = labels[:, 3:5] - labels[:, 1:3]  # (x2-x1, y2-y1)
                whs.append(wh)
        return np.concatenate(whs, axis=0) if whs else np.zeros((0, 2), np.float32)

    def get_anchors(self, wh: np.ndarray | None = None) -> np.ndarray:
        if self.use_cache and os.path.exists(self.cache_path):
            with open(self.cache_path) as f:
                return np.asarray(json.load(f), np.float32).reshape(-1, 2)
        if wh is None:
            wh = self._scan_wh()
        centers, _ = kmeans_anchors(wh, k=self.k, iters=self.iters,
                                    seed=self.seed, init=self.init)
        centers = centers.astype(np.float32)
        os.makedirs(os.path.dirname(self.cache_path), exist_ok=True)
        with open(self.cache_path, "w") as f:
            json.dump(centers.tolist(), f)
        return centers


# The fixed COCO anchors used by the working demo pipelines
# (demos/yolov3_u/train.py:60-62, pixel units at 416 input, small->large).
COCO_ANCHORS = np.array(
    [
        [10, 13], [16, 30], [33, 23],       # P3 / stride 8
        [30, 61], [62, 45], [59, 119],      # P4 / stride 16
        [116, 90], [156, 198], [373, 326],  # P5 / stride 32
    ],
    dtype=np.float32,
)
