"""Mean-average-precision (mAP) over multiple IoU thresholds.

Re-design of the reference's two mAP implementations
(`metrics/map.py:6` CalculateMAP and `demos/yolov3_u/utils/map.py:318`
mean_average_precision_ultralytics): a single streaming evaluator with

  - per-image matching fully vectorised (correct-matrix), computed on host
    in numpy — detections arrive as fixed-size padded arrays straight from
    the device NMS (`ops.nms.Detections`), so per-image work is tiny;
  - greedy IoU matching per threshold (sort by IoU desc, unique pred,
    unique target — demos/yolov3_u/utils/map.py:318-358 semantics);
  - 101-point COCO interpolation, voc2009 continuous AUC, and voc2007
    11-point AP (the reference left voc2007 unimplemented, metrics/map.py
    compute_ap raises — completed here);
  - per-class and per-IoU-threshold breakdown plus P/R/F1 curves.

Device/host split rationale: SURVEY.md §7 "mAP on device vs host".
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np


def _box_iou_np(a: np.ndarray, b: np.ndarray, eps: float = 1e-7) -> np.ndarray:
    """All-pairs IoU for xyxy numpy boxes: [N,4] x [M,4] -> [N,M]."""
    tl = np.maximum(a[:, None, :2], b[None, :, :2])
    br = np.minimum(a[:, None, 2:], b[None, :, 2:])
    inter = np.prod(np.clip(br - tl, 0, None), axis=2)
    area_a = np.prod(a[:, 2:] - a[:, :2], axis=1)
    area_b = np.prod(b[:, 2:] - b[:, :2], axis=1)
    return inter / (area_a[:, None] + area_b[None, :] - inter + eps)


def match_predictions(
    pred_boxes: np.ndarray,
    pred_classes: np.ndarray,
    true_boxes: np.ndarray,
    true_classes: np.ndarray,
    iou_thresholds: np.ndarray,
) -> np.ndarray:
    """Correct-matrix for one image: [num_pred, num_thresholds] bool.

    correct[p, t] is True iff prediction p greedily matches some GT of the
    same class at IoU >= iou_thresholds[t] (each GT used at most once, pairs
    taken in descending-IoU order).
    """
    num_pred = pred_boxes.shape[0]
    correct = np.zeros((num_pred, len(iou_thresholds)), dtype=bool)
    if num_pred == 0 or true_boxes.shape[0] == 0:
        return correct
    iou = _box_iou_np(true_boxes, pred_boxes)  # [T, P]
    cls_ok = true_classes[:, None] == pred_classes[None, :]
    iou = np.where(cls_ok, iou, 0.0)
    for ti, thr in enumerate(iou_thresholds):
        t_idx, p_idx = np.nonzero(iou >= thr)
        if t_idx.size == 0:
            continue
        pair_iou = iou[t_idx, p_idx]
        order = np.argsort(-pair_iou)
        t_idx, p_idx = t_idx[order], p_idx[order]
        # unique prediction, then unique target (keep highest-IoU pair)
        keep = np.unique(p_idx, return_index=True)[1]
        t_idx, p_idx = t_idx[keep], p_idx[keep]
        keep = np.unique(t_idx, return_index=True)[1]
        correct[p_idx[keep], ti] = True
    return correct


def match_predictions_device(
    pred_boxes,
    pred_classes,
    pred_valid,
    true_boxes,
    true_classes,
    true_valid,
    iou_thresholds,
):
    """Batched on-device correct-matrix: [B, P, T] bool (jit-traceable).

    Device re-design of :func:`match_predictions` (ref metrics/map.py:16-84
    per-image host loop): the greedy "sort pairs by IoU desc, unique pred,
    unique target" dedup collapses to two argmaxes, because

      * unique-pred keeps each prediction's highest-IoU GT — its row argmax
        (ties -> smallest GT index, exactly np.unique-on-sorted-pairs order);
      * unique-target then keeps, per GT, the surviving prediction with the
        highest IoU (ties -> smallest pred index, ditto);
      * both winners are THRESHOLD-INDEPENDENT: if a GT's best-pointing
        prediction fails `iou >= thr`, every other prediction pointing at it
        fails too — so correct[p, t] = eligible(p, t) & is_winner(p), and the
        whole [B, P, T] matrix falls out of one masked IoU matrix with no
        loop over thresholds or images.

    Inputs are fixed-size padded device arrays straight from batched NMS
    (ops.nms.Detections) + the loader's padded labels; invalid rows are
    masked. Boxes must share one coordinate space per image — IoU is
    invariant under the letterbox similarity transform, so input-space
    matching equals original-pixel matching (up to fp rounding at exact
    threshold boundaries). Zero-IoU pairs never match (thresholds are
    assumed > 0, as in the 0.5:0.95 COCO grid).
    """
    import jax
    import jax.numpy as jnp

    def one(pb, pc, pv, tb, tc, tv):
        tl = jnp.maximum(tb[:, None, :2], pb[None, :, :2])
        br = jnp.minimum(tb[:, None, 2:], pb[None, :, 2:])
        inter = jnp.prod(jnp.clip(br - tl, 0, None), axis=2)
        area_t = jnp.prod(tb[:, 2:] - tb[:, :2], axis=1)
        area_p = jnp.prod(pb[:, 2:] - pb[:, :2], axis=1)
        iou = inter / (area_t[:, None] + area_p[None, :] - inter + 1e-7)
        ok = (tc[:, None] == pc[None, :]) & tv[:, None] & pv[None, :]
        iou = jnp.where(ok, iou, 0.0)  # [G, P]
        best_iou = iou.max(axis=0)  # [P] each pred's best same-class GT
        best_g = iou.argmax(axis=0)  # first max -> smallest GT index
        # per-GT winner among preds whose best GT is g (max IoU, then
        # smallest pred index — argmax returns the first maximum)
        points_at = jax.nn.one_hot(best_g, tb.shape[0], dtype=bool).T  # [G, P]
        score = jnp.where(points_at, best_iou[None, :], -1.0)
        winner = score.argmax(axis=1)  # [G]
        is_winner = winner[best_g] == jnp.arange(pb.shape[0])
        eligible = best_iou[:, None] >= iou_thresholds[None, :]  # [P, T]
        return eligible & (is_winner & (best_iou > 0) & pv)[:, None]

    return jax.vmap(one)(
        pred_boxes, pred_classes, pred_valid,
        true_boxes, true_classes, true_valid,
    )


def compute_ap(recall: np.ndarray, precision: np.ndarray, method: str = "coco") -> float:
    """AP from a PR curve. Methods: 'coco' (101-pt), 'voc2009', 'voc2007'.

    Ref: metrics/map.py:85 (voc2007 completed here rather than raising).
    """
    m_rec = np.concatenate(([0.0], recall, [1.0]))
    m_pre = np.concatenate(([1.0], precision, [0.0]))
    m_pre = np.flip(np.maximum.accumulate(np.flip(m_pre)))
    if method == "coco":
        x = np.linspace(0, 1, 101)
        trapezoid = getattr(np, "trapezoid", np.trapz)
        return float(trapezoid(np.interp(x, m_rec, m_pre), x))
    if method == "voc2009":
        i = np.nonzero(m_rec[1:] != m_rec[:-1])[0]
        return float(np.sum((m_rec[i + 1] - m_rec[i]) * m_pre[i + 1]))
    if method == "voc2007":
        return float(np.mean([m_pre[m_rec >= t].max() if (m_rec >= t).any() else 0.0
                              for t in np.linspace(0, 1, 11)]))
    raise ValueError(f"unknown AP method {method!r}")


@dataclasses.dataclass
class MAPResult:
    map_per_iou: np.ndarray  # [T] mAP at each IoU threshold
    ap_per_class_per_iou: np.ndarray  # [C_seen, T]
    classes: list  # class ids, aligned with rows above
    precision: np.ndarray  # [C_seen] P at max-F1 conf, IoU thr[0]
    recall: np.ndarray  # [C_seen]
    iou_thresholds: np.ndarray

    @property
    def map50(self) -> float:
        return float(self.map_per_iou[0])

    @property
    def map(self) -> float:
        return float(self.map_per_iou.mean())


class MeanAveragePrecision:
    """Streaming mAP evaluator (ref: metrics/map.py:6 CalculateMAP).

    Usage:
        m = MeanAveragePrecision()
        for image: m.update(det_boxes, det_scores, det_classes, gt_boxes, gt_classes)
        result = m.compute()
    Inputs may be padded fixed-size arrays with a validity mask.
    """

    def __init__(self, iou_thresholds: Sequence[float] | None = None, method: str = "coco"):
        self.iou_thresholds = np.asarray(
            iou_thresholds if iou_thresholds is not None else np.linspace(0.5, 0.95, 10)
        )
        self.method = method
        self.reset()

    def reset(self):
        self._stats: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []  # correct, conf, cls
        self._gt_classes: list[np.ndarray] = []

    def update(
        self,
        pred_boxes,
        pred_scores,
        pred_classes,
        true_boxes,
        true_classes,
        pred_valid=None,
        true_valid=None,
    ):
        """Accumulate one image. Boxes are xyxy in a shared coordinate space."""
        pred_boxes = np.asarray(pred_boxes, np.float32).reshape(-1, 4)
        pred_scores = np.asarray(pred_scores, np.float32).reshape(-1)
        pred_classes = np.asarray(pred_classes).reshape(-1)
        true_boxes = np.asarray(true_boxes, np.float32).reshape(-1, 4)
        true_classes = np.asarray(true_classes).reshape(-1)
        if pred_valid is not None:
            m = np.asarray(pred_valid, bool).reshape(-1)
            pred_boxes, pred_scores, pred_classes = pred_boxes[m], pred_scores[m], pred_classes[m]
        if true_valid is not None:
            m = np.asarray(true_valid, bool).reshape(-1)
            true_boxes, true_classes = true_boxes[m], true_classes[m]
        if true_classes.size:
            self._gt_classes.append(true_classes.copy())
        if pred_scores.size == 0:
            return
        correct = match_predictions(
            pred_boxes, pred_classes, true_boxes, true_classes, self.iou_thresholds
        )
        self._stats.append((correct, pred_scores, pred_classes))

    def update_matched(
        self,
        correct,
        pred_scores,
        pred_classes,
        gt_classes,
        pred_valid=None,
        gt_valid=None,
    ):
        """Accumulate one image whose correct-matrix was already computed —
        the device-matching path (:func:`match_predictions_device` runs the
        per-image matching inside the jitted eval program; the host only
        strips padding and stores). `correct` is [P, T] bool aligned with
        this evaluator's iou_thresholds."""
        correct = np.asarray(correct, bool).reshape(-1, len(self.iou_thresholds))
        pred_scores = np.asarray(pred_scores, np.float32).reshape(-1)
        pred_classes = np.asarray(pred_classes).reshape(-1)
        gt_classes = np.asarray(gt_classes).reshape(-1)
        if pred_valid is not None:
            m = np.asarray(pred_valid, bool).reshape(-1)
            correct, pred_scores, pred_classes = correct[m], pred_scores[m], pred_classes[m]
        if gt_valid is not None:
            gt_classes = gt_classes[np.asarray(gt_valid, bool).reshape(-1)]
        if gt_classes.size:
            self._gt_classes.append(gt_classes.copy())
        if pred_scores.size:
            self._stats.append((correct, pred_scores, pred_classes))

    def compute(self) -> MAPResult:
        nt = len(self.iou_thresholds)
        gt_classes = (
            np.concatenate(self._gt_classes) if self._gt_classes else np.zeros((0,), np.int64)
        )
        seen = np.unique(gt_classes).tolist()
        if not self._stats or not seen:
            z = np.zeros((len(seen), nt))
            return MAPResult(
                np.zeros(nt), z, seen, np.zeros(len(seen)), np.zeros(len(seen)),
                self.iou_thresholds,
            )
        correct = np.concatenate([s[0] for s in self._stats], axis=0)
        conf = np.concatenate([s[1] for s in self._stats], axis=0)
        cls = np.concatenate([s[2] for s in self._stats], axis=0)
        order = np.argsort(-conf)
        correct, conf, cls = correct[order], conf[order], cls[order]

        ap = np.zeros((len(seen), nt))
        prec = np.zeros(len(seen))
        rec = np.zeros(len(seen))
        for ci, c in enumerate(seen):
            total_pos = int(np.sum(gt_classes == c))
            mask = cls == c
            n_pred = int(mask.sum())
            if n_pred == 0 or total_pos == 0:
                continue
            tp_cum = np.cumsum(correct[mask], axis=0)  # [n_pred, nt]
            fp_cum = np.cumsum(~correct[mask], axis=0)
            recall = tp_cum / (total_pos + 1e-16)
            precision = tp_cum / (tp_cum + fp_cum + 1e-16)
            for ti in range(nt):
                ap[ci, ti] = compute_ap(recall[:, ti], precision[:, ti], self.method)
            f1 = 2 * precision[:, 0] * recall[:, 0] / (precision[:, 0] + recall[:, 0] + 1e-16)
            best = int(np.argmax(f1))
            prec[ci], rec[ci] = precision[best, 0], recall[best, 0]

        return MAPResult(ap.mean(axis=0), ap, seen, prec, rec, self.iou_thresholds)


# Back-compat alias matching the reference's class name (metrics/map.py:6).
CalculateMAP = MeanAveragePrecision
