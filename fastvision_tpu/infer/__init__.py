"""Inference: decode, pre/postprocess, predictor, serving."""
from .decode import decode_level, decode_predictions
