"""Inference: decode, pre/postprocess, predictor, serving."""
from .decode import decode_level, decode_predictions
from .export import (
    export_savedmodel,
    export_stablehlo,
    export_tflite,
    load_stablehlo,
)
from .postprocess import detections_to_original, scale_coords
from .predictor import Detector, VideoClassifier, detections_to_coco
from .preprocess import preprocess_batch, preprocess_image
from .quantize import calibrate, quantize_model, quantize_variables
from .serving import VisionService, serve
from .voc_submit import write_voc_submission
