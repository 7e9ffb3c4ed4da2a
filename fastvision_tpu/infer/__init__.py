"""Inference: decode, pre/postprocess, predictor, serving."""
from .decode import decode_level, decode_predictions
from .postprocess import detections_to_original, scale_coords
from .preprocess import preprocess_batch, preprocess_image
