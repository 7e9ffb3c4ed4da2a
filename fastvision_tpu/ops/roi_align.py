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


# ---------------------------------------------------------------------------
# MXU (matmul) formulation
# ---------------------------------------------------------------------------
def _interp_weights(coords: jnp.ndarray, extent: int) -> jnp.ndarray:
    """Bilinear interpolation weight rows.

    coords: [..., S] continuous positions (already clipped to [0, extent-1]).
    Returns [..., S -> averaged, extent]: for each position the tent weights
    relu(1 - |y - h|) over all integer rows h, averaged over the S samples.
    Bilinear interpolation is linear in the feature rows, so this is EXACT.
    """
    grid = jnp.arange(extent, dtype=coords.dtype)
    w = jnp.maximum(1.0 - jnp.abs(coords[..., None] - grid), 0.0)  # [..., S, extent]
    return jnp.mean(w, axis=-2)  # average the sampling_ratio points


def roi_align_mxu(
    features: jnp.ndarray,  # [B, H, W, C]
    boxes: jnp.ndarray,  # [B, N, 4] xyxy image coords
    output_size: int = 7,
    spatial_scale: float = 1.0 / 16,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """RoI Align as two dense contractions — the TPU-native formulation.

    Interpolation + sample averaging are linear, so pooling factorizes into
    per-proposal weight matrices Wy [N, o, H] and Wx [N, o, W]:

        out[n, i, j, c] = sum_{h, w} Wy[n, i, h] * Wx[n, j, w] * feat[h, w, c]

    i.e. one einsum over H then one over W — completely regular compute on
    the MXU, no data-dependent gathers (SURVEY.md §2.6 item 2's "Pallas
    kernel" need is met by making XLA's systolic array do it instead).
    Sample coordinates are clipped into the feature map, which matches the
    gather version for all in-bounds boxes (fringe rows of far out-of-bounds
    boxes differ from torchvision's zero-extension).
    """
    bsz, h, w, c = features.shape
    n = boxes.shape[1]
    o, s = output_size, sampling_ratio
    scaled = boxes * spatial_scale
    x1, y1, x2, y2 = (scaled[..., i] for i in range(4))  # [B, N]
    bw = jnp.maximum(x2 - x1, 1.0)
    bh = jnp.maximum(y2 - y1, 1.0)

    bin_idx = jnp.arange(o, dtype=features.dtype)
    samp = (jnp.arange(s, dtype=features.dtype) + 0.5) / s
    off = (bin_idx[:, None] + samp[None, :]).reshape(-1)  # [o*s] in bin units
    ys = y1[..., None] + off * (bh / o)[..., None]  # [B, N, o*s]
    xs = x1[..., None] + off * (bw / o)[..., None]
    ys = jnp.clip(ys, 0, h - 1).reshape(bsz, n, o, s)
    xs = jnp.clip(xs, 0, w - 1).reshape(bsz, n, o, s)

    wy = _interp_weights(ys, h)  # [B, N, o, H]
    wx = _interp_weights(xs, w)  # [B, N, o, W]
    # contract H, then W — two MXU matmuls
    tmp = jnp.einsum("bnih,bhwc->bniwc", wy, features)
    return jnp.einsum("bnjw,bniwc->bnijc", wx, tmp)
