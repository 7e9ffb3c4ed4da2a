"""RoI Align: bilinear region pooling over feature maps.

The reference delegates to `torchvision.ops.roi_align` (C++/CUDA,
demos/faster_rcnn/models/fast.py:227-231,258). TPU-native version: fully
vectorized jnp bilinear gather — for each of the fixed `N` proposals and
each output bin, average `sampling_ratio^2` bilinearly-interpolated samples.
Static shapes ([B, N, 4] boxes -> [B, N, out, out, C]); invalid (padded)
proposals simply pool garbage that downstream masks out.

Follows torchvision's aligned=False convention (continuous coords scaled by
`spatial_scale`, no half-pixel shift) so imported heads behave identically.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _bilinear_gather(features: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray):
    """features [H, W, C]; ys/xs [...] continuous coords -> [..., C]."""
    h, w, _ = features.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy1 = ys - y0
    wx1 = xs - x0
    y0 = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    f00 = features[y0, x0]
    f01 = features[y0, x1]
    f10 = features[y1, x0]
    f11 = features[y1, x1]
    wy1 = wy1[..., None]
    wx1 = wx1[..., None]
    return (
        f00 * (1 - wy1) * (1 - wx1)
        + f01 * (1 - wy1) * wx1
        + f10 * wy1 * (1 - wx1)
        + f11 * wy1 * wx1
    )


def roi_align_single(
    features: jnp.ndarray,  # [H, W, C]
    boxes: jnp.ndarray,  # [N, 4] xyxy in IMAGE coords
    output_size: int = 7,
    spatial_scale: float = 1.0 / 16,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """-> [N, output_size, output_size, C]."""
    boxes = boxes * spatial_scale
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    bw = jnp.maximum(x2 - x1, 1.0)  # torchvision clamps roi size to >= 1
    bh = jnp.maximum(y2 - y1, 1.0)

    n = boxes.shape[0]
    s = sampling_ratio
    o = output_size
    bin_h = bh / o  # [N]
    bin_w = bw / o
    # sample grid: for bin (i, j), samples at (i + (k+.5)/s) * bin_h + y1
    bin_idx = jnp.arange(o, dtype=boxes.dtype)
    samp_idx = (jnp.arange(s, dtype=boxes.dtype) + 0.5) / s
    # [o, s] offsets in bin units
    off = bin_idx[:, None] + samp_idx[None, :]
    ys = y1[:, None, None] + off[None] * bin_h[:, None, None]  # [N, o, s]
    xs = x1[:, None, None] + off[None] * bin_w[:, None, None]
    # full grid [N, o, s, o, s]
    ys_full = jnp.broadcast_to(ys[:, :, :, None, None], (n, o, s, o, s))
    xs_full = jnp.broadcast_to(xs[:, None, None, :, :], (n, o, s, o, s))
    vals = _bilinear_gather(features, ys_full, xs_full)  # [N, o, s, o, s, C]
    return jnp.mean(vals, axis=(2, 4))  # average samples -> [N, o, o, C]


def roi_align(
    features: jnp.ndarray,  # [B, H, W, C]
    boxes: jnp.ndarray,  # [B, N, 4] xyxy image coords
    output_size: int = 7,
    spatial_scale: float = 1.0 / 16,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """Batched RoI Align -> [B, N, output_size, output_size, C]."""
    fn = lambda f, b: roi_align_single(f, b, output_size, spatial_scale, sampling_ratio)
    return jax.vmap(fn)(features, boxes)
