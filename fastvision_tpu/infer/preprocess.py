"""Inference preprocessing: resize-by-max + pad + batch assembly.

Mirrors the demo preProcess (demos/yolov3_u/inference.py:28-55: resize by
long side, pad to input size, to-tensor /255) and the serving _preprocess
(customize_service.py:384-419). Host side: decode + letterbox only; the
/255 normalize runs on device (data.pipeline.normalize_images).
"""
from __future__ import annotations

from typing import Sequence

import numpy as np

from ..data.dataset import imread_rgb, imread_rgb_scaled, letterbox


def preprocess_image(
    image: np.ndarray | str,
    input_size: int = 416,
    pad_value: int = 114,
    fast_decode: bool = False,
) -> tuple[np.ndarray, dict]:
    """RGB uint8 (or path) -> (letterboxed uint8 [S,S,3], meta).

    meta carries scale/pad/orig_hw for postprocess unscaling. For path
    inputs, `fast_decode` uses libjpeg DCT-domain downscaling on >=2x
    oversized JPEGs; meta's scale becomes a per-axis (sx, sy) pair mapping
    TRUE original pixels to letterboxed pixels, so postprocess coordinates
    stay exact."""
    if isinstance(image, str):
        if fast_decode:
            image, orig_hw = imread_rgb_scaled(image, input_size)
        else:
            image = imread_rgb(image)
            orig_hw = image.shape[:2]
    else:
        orig_hw = image.shape[:2]
    rh, rw = image.shape[:2]
    out, scale, pad = letterbox(image, input_size, pad_value)
    if (rh, rw) != tuple(orig_hw):
        # combined original -> letterboxed-content scale, per axis (the
        # resize target dims round h and w independently)
        nh, nw = round(rh * scale), round(rw * scale)
        scale = (nw / orig_hw[1], nh / orig_hw[0])
    return out, {"scale": scale, "pad": pad, "orig_hw": orig_hw}


def preprocess_batch(
    images: Sequence[np.ndarray | str],
    input_size: int = 416,
    pad_value: int = 114,
    fast_decode: bool = False,
) -> tuple[np.ndarray, list[dict]]:
    """-> (uint8 [B,S,S,3], metas)."""
    outs, metas = [], []
    for im in images:
        o, m = preprocess_image(im, input_size, pad_value, fast_decode)
        outs.append(o)
        metas.append(m)
    return np.stack(outs), metas
