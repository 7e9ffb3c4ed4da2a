"""Fixed-size, static-shape NMS for TPU.

The reference outsources NMS to `torchvision.ops.nms` (dynamic shapes,
C++/CUDA — detection/tools/NMS.py:18, demos/yolov3_u/utils/nms.py:47).
XLA requires static shapes, so this module re-designs NMS as:

  1. confidence mask -> masked scores (invalid candidates score -inf),
  2. `lax.top_k` to a fixed pre-NMS candidate count K,
  3. class-aware suppression via the class-offset trick (each class lives in
     a disjoint coordinate region — same trick as demos/yolov3_u/utils/nms.py:44),
  4. greedy suppression over the K x K IoU matrix with a `lax.fori_loop`
     (exact, score-ordered — identical keep-set to torchvision NMS),
  5. fixed `max_det` outputs + validity mask.

Everything is jit-able and vmap-able; the batched entry point vmaps over
images. A Pallas kernel variant lives in `nms_pallas.py` for the hot path.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .box import xywh2xyxy
from .iou import box_iou_matrix

# Default coordinate offset separating classes during suppression; matches
# the demo's constant (demos/yolov3_u/utils/nms.py:44). SAFETY BOUND: the
# offset must exceed every box coordinate magnitude or adjacent classes'
# regions overlap and cross-class suppression corrupts results. 4096 covers
# input sizes up to ~1365 px with the 3x out-of-canvas decode margin; for
# larger coordinate spaces derive one with `class_offset_for`.
CLASS_OFFSET = 4096.0


def class_offset_for(coord_bound: float) -> float:
    """Smallest safe per-class offset for boxes whose coordinates lie in
    (-coord_bound, coord_bound): classes then occupy disjoint regions.

    Decoded YOLO boxes can exceed the input canvas (large anchors; v5 wh
    up to 4x anchor), so callers should pass a bound with margin — the
    Detector uses 3 * input_size. Never smaller than the historical
    CLASS_OFFSET so behavior is unchanged for standard input sizes."""
    return float(max(CLASS_OFFSET, coord_bound + 1.0))


class Detections(NamedTuple):
    """Fixed-size NMS output. Padded entries have valid == False."""

    boxes: jnp.ndarray  # [max_det, 4] xyxy
    scores: jnp.ndarray  # [max_det]
    classes: jnp.ndarray  # [max_det] int32
    valid: jnp.ndarray  # [max_det] bool


def suppression_mask(boxes: jnp.ndarray, scores: jnp.ndarray, iou_thres: float) -> jnp.ndarray:
    """Greedy NMS keep-mask over score-sorted boxes.

    Args:
      boxes: [K, 4] xyxy, already sorted by descending score.
      scores: [K] (entries <= -inf/masked are never kept).
    Returns: bool [K] keep mask — exact torchvision-NMS semantics.
    """
    k = boxes.shape[0]
    iou = box_iou_matrix(boxes, boxes)  # [K, K]
    # overlap[i, j]: candidate j would be suppressed by i if i is kept
    overlap = iou > iou_thres

    def body(i, state):
        keep, suppressed = state
        keep_i = jnp.logical_not(suppressed[i]) & (scores[i] > -jnp.inf)
        keep = keep.at[i].set(keep_i)
        # if kept, suppress all later boxes overlapping i
        later = jnp.arange(k) > i
        suppressed = jnp.where(keep_i & later & overlap[i], True, suppressed)
        return keep, suppressed

    keep, _ = jax.lax.fori_loop(
        0, k, body, (jnp.zeros((k,), bool), jnp.zeros((k,), bool))
    )
    return keep


def nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_thres: float = 0.45,
    max_out: int | None = None,
) -> jnp.ndarray:
    """Class-agnostic NMS. Returns a keep mask aligned with the inputs.

    Unlike torchvision's index-list API this returns a fixed-shape boolean
    mask; use `jnp.nonzero` outside jit or top_k to extract.
    """
    order = jnp.argsort(-scores)
    keep_sorted = suppression_mask(boxes[order], scores[order], iou_thres)
    keep = jnp.zeros_like(keep_sorted).at[order].set(keep_sorted)
    if max_out is not None and max_out < boxes.shape[0]:
        # keep only the max_out highest-scoring survivors
        surv_scores = jnp.where(keep, scores, -jnp.inf)
        thresh = jax.lax.top_k(surv_scores, max_out)[0][-1]
        keep = keep & (surv_scores >= thresh)
    return keep


def non_max_suppression(
    prediction: jnp.ndarray,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 300,
    pre_nms_top_k: int = 1024,
    class_agnostic: bool = False,
    box_format: str = "xywh",
    class_offset: float = CLASS_OFFSET,
    score_mode: str = "obj_cls",
) -> Detections:
    """Single-image detection NMS over raw predictions [N, 5 + C].

    Layout per row: (box[4], objectness, class scores[C]) — the reference's
    contract (detection/tools/NMS.py:5). Steps mirror the reference:
    objectness filter, score = obj * cls, class argmax, NMS, top-max_det —
    but with fixed shapes end-to-end.

    score_mode: 'obj_cls' (default) ranks and reports obj * cls_max;
    'obj' ranks and reports raw objectness — the yolov3_u demo's NMS
    semantics (demos/yolov3_u/utils/nms.py:29-52 keeps prediction[:, 4]
    as the score; its obj*cls rescore line is commented out). Class
    assignment is argmax(obj * cls) in both modes.
    """
    if prediction.ndim != 2:
        raise ValueError(
            f"non_max_suppression expects [N, 5+C] for one image, got shape "
            f"{prediction.shape}; use batched_non_max_suppression for batches"
        )
    num_classes = prediction.shape[-1] - 5
    obj = prediction[:, 4]
    cls_scores = prediction[:, 5:] * obj[:, None]
    scores_all = obj if score_mode == "obj" else jnp.max(cls_scores, axis=-1)
    classes_all = jnp.argmax(cls_scores, axis=-1).astype(jnp.int32)
    valid = obj > conf_thres

    masked_scores = jnp.where(valid, scores_all, -jnp.inf)
    k = min(pre_nms_top_k, prediction.shape[0])
    top_scores, top_idx = jax.lax.top_k(masked_scores, k)
    # bf16 predictions are accepted (half the HBM traffic through decode +
    # scoring); everything after the K-gather runs fp32 (no-op casts for
    # fp32 input). Caveat: with bf16 input the top-K *selection* sees
    # bf16-rounded scores, so near-tied candidates at the K boundary can
    # swap vs an fp32 run — mAP-neutral for realistic confidence profiles
    # (few confident boxes over a near-zero tail; driven on-chip 2026-08-16)
    top_scores = top_scores.astype(jnp.float32)
    boxes = prediction[top_idx, :4].astype(jnp.float32)
    if box_format == "xywh":
        boxes = xywh2xyxy(boxes)
    top_classes = classes_all[top_idx]

    if class_agnostic or num_classes == 1:
        nms_boxes = boxes
    else:
        nms_boxes = boxes + (top_classes.astype(boxes.dtype) * class_offset)[:, None]

    keep = suppression_mask(nms_boxes, top_scores, iou_thres)
    final_scores = jnp.where(keep, top_scores, -jnp.inf)
    out_scores, out_idx = jax.lax.top_k(final_scores, min(max_det, k))
    out_valid = out_scores > -jnp.inf
    out_scores = jnp.where(out_valid, out_scores, 0.0)
    return Detections(
        boxes=jnp.where(out_valid[:, None], boxes[out_idx], 0.0),
        scores=out_scores,
        classes=jnp.where(out_valid, top_classes[out_idx], -1),
        valid=out_valid,
    )


def non_max_suppression_multilabel(
    prediction: jnp.ndarray,
    conf_thres: float = 0.001,
    iou_thres: float = 0.6,
    max_det: int = 300,
    pre_nms_top_k: int = 1024,
    box_format: str = "xywh",
    class_offset: float = CLASS_OFFSET,
    min_wh: float = 2.0,
    max_wh: float = 7680.0,
) -> Detections:
    """Multi-label NMS: every (box, class) pair above threshold is its own
    candidate — the serving variant (ref customize_service.py:224-317
    ultralytics NMS with multi_label=True, conf .001 / iou .6).

    min_wh/max_wh replicate the ultralytics width-height constraint
    (customize_service.py:243 `min_wh, max_wh = 2, 7680`): boxes with any
    side outside (min_wh, max_wh) get objectness zeroed, so no candidate
    pair survives the confidence threshold. Requires box_format='xywh'
    input (the constraint reads w/h columns); pass min_wh=0 to disable
    for pre-converted xyxy input."""
    if prediction.ndim != 2:
        raise ValueError(f"expected [N, 5+C], got {prediction.shape}")
    n, width = prediction.shape
    c = width - 5
    if min_wh > 0 and box_format == "xywh":
        wh_ok = (
            (prediction[:, 2] >= min_wh) & (prediction[:, 2] <= max_wh)
            & (prediction[:, 3] >= min_wh) & (prediction[:, 3] <= max_wh)
        )
        prediction = prediction.at[:, 4].set(
            jnp.where(wh_ok, prediction[:, 4], 0.0)
        )
    scores = prediction[:, 5:] * prediction[:, 4:5]  # [N, C]
    flat_scores = jnp.where(scores > conf_thres, scores, -jnp.inf).reshape(-1)
    k = min(pre_nms_top_k, n * c)
    top_scores, top_idx = jax.lax.top_k(flat_scores, k)
    top_scores = top_scores.astype(jnp.float32)
    box_idx = top_idx // c
    top_classes = (top_idx % c).astype(jnp.int32)
    boxes = prediction[box_idx, :4].astype(jnp.float32)
    if box_format == "xywh":
        boxes = xywh2xyxy(boxes)
    nms_boxes = boxes + (top_classes.astype(boxes.dtype) * class_offset)[:, None]
    keep = suppression_mask(nms_boxes, top_scores, iou_thres)
    final_scores = jnp.where(keep, top_scores, -jnp.inf)
    out_scores, out_idx = jax.lax.top_k(final_scores, min(max_det, k))
    valid = out_scores > -jnp.inf
    return Detections(
        boxes=jnp.where(valid[:, None], boxes[out_idx], 0.0),
        scores=jnp.where(valid, out_scores, 0.0),
        classes=jnp.where(valid, top_classes[out_idx], -1),
        valid=valid,
    )


def batched_non_max_suppression(
    prediction: jnp.ndarray,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 300,
    pre_nms_top_k: int = 1024,
    class_agnostic: bool = False,
    box_format: str = "xywh",
    class_offset: float = CLASS_OFFSET,
) -> Detections:
    """Batch NMS: [B, N, 5 + C] -> Detections with leading batch dim.

    Replaces the reference's per-image Python loop
    (demos/yolov3_u/utils/nms.py:55 batch variant) with vmap.
    """
    fn = lambda p: non_max_suppression(
        p,
        conf_thres=conf_thres,
        iou_thres=iou_thres,
        max_det=max_det,
        pre_nms_top_k=pre_nms_top_k,
        class_agnostic=class_agnostic,
        box_format=box_format,
        class_offset=class_offset,
    )
    return jax.vmap(fn)(prediction)
