"""Ops toolbox: boxes, grids, IoU family, NMS, anchors, mAP, one-hot.

TPU-native counterpart of the reference's `detection/tools/` + `metrics/`
(SURVEY.md §2.1): all device ops are pure jnp with static shapes; dataset
statistics (anchor k-means) and metric accumulation (mAP) run host-side.
"""
from .box import (
    box_area,
    clip_boxes,
    xywh2xyxy,
    xywhn2xyxy,
    xyxy2xywh,
    xyxy2xywhn,
)
from .grid import grid
from .iou import (
    box_iou,
    box_iou_matrix,
    cal_iou,
    cal_iou_batch,
    wh_iou,
    wh_iou_matrix,
)
from .nms import (
    Detections,
    batched_non_max_suppression,
    nms,
    non_max_suppression,
    non_max_suppression_multilabel,
)
from .anchors import COCO_ANCHORS, AnchorGenerator, kmeans_anchors
from .image import (
    hflip_boxes_xywhn,
    hflip_images,
    letterbox_batch,
    letterbox_single,
    pack_canvas,
)
from .box_coder import decode_boxes, encode_boxes
from .roi_align import roi_align, roi_align_mxu, roi_align_single
from .accuracy import Accuracy, accuracy
from .map import (
    CalculateMAP,
    MAPResult,
    MeanAveragePrecision,
    compute_ap,
    match_predictions,
    match_predictions_device,
)
from .one_hot import one_hot

__all__ = [
    "box_area", "clip_boxes", "xywh2xyxy", "xywhn2xyxy", "xyxy2xywh", "xyxy2xywhn",
    "grid", "box_iou", "box_iou_matrix", "cal_iou", "cal_iou_batch", "wh_iou",
    "wh_iou_matrix", "Detections", "batched_non_max_suppression", "nms",
    "non_max_suppression", "COCO_ANCHORS", "AnchorGenerator", "kmeans_anchors",
    "CalculateMAP", "MAPResult", "MeanAveragePrecision", "compute_ap",
    "match_predictions", "one_hot",
]
