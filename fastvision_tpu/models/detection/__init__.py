"""Detection models (ref: detection/ + demos/yolov3_u + demos/faster_rcnn)."""
from .yolov3 import YOLOv3, YOLOv3Head, YOLOv3Neck, YoloBlock, upsample2x, yolov3
