"""Detection models (ref: detection/ + demos/yolov3_u + demos/faster_rcnn)."""
from .faster_rcnn import (
    FasterRCNN,
    FastHead,
    RPNHead,
    anchor_grid,
    faster_rcnn,
    fastrcnn_postprocess,
    filter_proposals,
    make_base_anchors,
    random_sample_mask,
    rpn_loss,
    sample_rois,
)
from .yolov3 import YOLOv3, YOLOv3Head, YOLOv3Neck, YoloBlock, upsample2x, yolov3
