"""On-device image geometry: batched letterbox (aspect-preserving resize +
center pad) as MXU matmuls, plus flips.

North-star item (BASELINE.json): fuse the reference's host-side cv2
letterbox (datasets/detection_dataloader.py:43-79 load_image + resize) into
the XLA program. The host then only DECODES into a fixed-size uint8 canvas
(one memcpy, no resize) and ships (canvas, true sizes) to the device.

TPU-first formulation: bilinear resize is linear in the image, so a
per-image resize is two matmuls with sparse interpolation-weight matrices

    out = Wv @ img @ Wu^T        Wv: [S, Hmax], Wu: [S, Wmax]

built on the fly from the per-image scale (each row holds the two bilinear
taps). The contraction runs on the MXU — the same trick as
ops/roi_align.py's two-einsum RoI Align — and vmaps over the batch with
XLA batching the matmuls. No gathers, no dynamic shapes.

Convention matches cv2.INTER_LINEAR (half-pixel centers) and
data/dataset.py::letterbox geometry: scale = S / max(h, w),
(nh, nw) = round(h*scale), round(w*scale), centered pad with `pad_value`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _axis_weights(out_size: int, in_max: int, n_in, n_out, offset, dtype):
    """[S, in_max] bilinear weight matrix for one axis.

    Output pixel i (content index i - offset) samples input coordinate
    u = (i - offset + 0.5) * (n_in / n_out) - 0.5 with the two taps
    floor(u), floor(u)+1 — exactly cv2.resize INTER_LINEAR's mapping of an
    [n_in] signal to [n_out], placed at `offset` inside the padded output.
    Rows outside [offset, offset + n_out) are all-zero (pad region).
    """
    i = jnp.arange(out_size, dtype=dtype)
    ic = i - offset.astype(dtype)  # content coords
    inside = (ic >= 0) & (ic < n_out.astype(dtype))
    u = (ic + 0.5) * (n_in.astype(dtype) / n_out.astype(dtype)) - 0.5
    u = jnp.clip(u, 0.0, n_in.astype(dtype) - 1.0)
    u0 = jnp.floor(u)
    frac = u - u0
    src = jnp.arange(in_max, dtype=dtype)[None, :]  # [1, in_max]
    w = (
        (src == u0[:, None]) * (1.0 - frac[:, None])
        + (src == u0[:, None] + 1.0) * frac[:, None]
    )
    return jnp.where(inside[:, None], w, 0.0)


def letterbox_single(image, size_hw, out_size: int, pad_value: float,
                     dtype=jnp.float32):
    """One image from a fixed canvas -> letterboxed [S, S, C] float.

    image: [Hmax, Wmax, C] (uint8 or float); content in the top-left
    (h, w) region. size_hw: int32 [2] true (h, w).
    Returns (out [S,S,C], scale_xy [2], pad_xy [2]) — scale/pad match the
    host letterbox meta (per-axis scale, see infer.preprocess).
    """
    h = size_hw[0]
    w = size_hw[1]
    hmax, wmax, _ = image.shape
    fdt = jnp.float32
    scale = out_size / jnp.maximum(h, w).astype(fdt)
    nh = jnp.round(h.astype(fdt) * scale).astype(jnp.int32)
    nw = jnp.round(w.astype(fdt) * scale).astype(jnp.int32)
    top = (out_size - nh) // 2
    left = (out_size - nw) // 2

    wv = _axis_weights(out_size, hmax, h, nh, top, fdt)      # [S, Hmax]
    wu = _axis_weights(out_size, wmax, w, nw, left, fdt)     # [S, Wmax]
    img = image.astype(fdt)
    # rows: [S, Hmax] @ [Hmax, Wmax*C] ; cols: [S, Wmax] applied on width
    tmp = jnp.einsum("sh,hwc->swc", wv, img, precision=jax.lax.Precision.HIGHEST)
    out = jnp.einsum("tw,swc->stc", wu, tmp, precision=jax.lax.Precision.HIGHEST)
    # pad regions have zero weight-coverage; fill with pad_value
    cover = (wv.sum(1) > 0)[:, None] & (wu.sum(1) > 0)[None, :]
    out = jnp.where(cover[..., None], out, jnp.asarray(pad_value, fdt))
    scale_xy = jnp.stack([nw.astype(fdt) / w.astype(fdt),
                          nh.astype(fdt) / h.astype(fdt)])
    pad_xy = jnp.stack([left, top])
    return out.astype(dtype), scale_xy, pad_xy


def letterbox_batch(images, sizes_hw, out_size: int, pad_value: float = 114.0,
                    dtype=jnp.float32):
    """Batched on-device letterbox.

    images: [B, Hmax, Wmax, C] canvas (content top-left per image);
    sizes_hw: int32 [B, 2]. Returns (out [B,S,S,C] `dtype`,
    scales_xy [B,2] fp32, pads_xy [B,2] int32).
    """
    return jax.vmap(
        lambda im, sz: letterbox_single(im, sz, out_size, pad_value, dtype)
    )(images, sizes_hw)


def i420_to_rgb(y, u, v, dtype=jnp.float32):
    """On-device I420 (YUV 4:2:0) -> RGB float in [0, 255].

    y: [B, S, S] uint8; u, v: [B, S/2, S/2] uint8. Matches
    cv2.cvtColor(..., COLOR_YUV2RGB_I420): studio-swing (video-range)
    BT.601 coefficients — Y' = 1.164383*(Y-16) — with 2x nearest-neighbor
    chroma upsampling.

    Why: the host->device link is the jpeg->boxes bottleneck on thin-pipe
    hosts (tunnel/remote-device setups; docs/PERF.md). JPEG stores 4:2:0
    chroma already, so shipping I420 instead of RGB halves the transfer
    bytes (1.5 B/px vs 3 B/px) with no information the JPEG ever had being
    lost; the upsample + color matrix fuse into the jitted program as
    cheap elementwise work.
    """
    # cv2 uses studio-swing BT.601 (ITU-R): Y' = 1.164383*(Y-16)
    yf = jnp.asarray(1.164383, dtype) * (y.astype(dtype) - 16.0)
    uf = jnp.repeat(jnp.repeat(u.astype(dtype) - 128.0, 2, axis=1), 2, axis=2)
    vf = jnp.repeat(jnp.repeat(v.astype(dtype) - 128.0, 2, axis=1), 2, axis=2)
    r = yf + jnp.asarray(1.596027, dtype) * vf
    g = yf - jnp.asarray(0.391762, dtype) * uf - jnp.asarray(0.812968, dtype) * vf
    b = yf + jnp.asarray(2.017232, dtype) * uf
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 255.0)


def rgb_batch_to_i420(batch):
    """HOST helper: [B, S, S, 3] uint8 RGB -> (y [B,S,S], u, v [B,S/2,S/2]).

    Uses cv2's RGB2YUV_I420 (the exact inverse of `i420_to_rgb`). S must be
    even. ~0.2 ms/img at 416; runs in the loader/prefetch worker so it
    overlaps device compute."""
    import cv2
    import numpy as np

    b, s, s2, _ = batch.shape
    if s % 2 or s2 % 2:
        raise ValueError(f"I420 needs even dims, got {(s, s2)}")
    y = np.empty((b, s, s2), np.uint8)
    u = np.empty((b, s // 2, s2 // 2), np.uint8)
    v = np.empty((b, s // 2, s2 // 2), np.uint8)
    quarter = (s // 2) * (s2 // 2)
    for i in range(b):
        yuv = cv2.cvtColor(batch[i], cv2.COLOR_RGB2YUV_I420)  # [S*3/2, S]
        y[i] = yuv[:s]
        chroma = yuv[s:].reshape(-1)
        u[i] = chroma[:quarter].reshape(s // 2, s2 // 2)
        v[i] = chroma[quarter:].reshape(s // 2, s2 // 2)
    return y, u, v


def i420_packed_to_rgb(buf, dtype=jnp.float32):
    """On-device packed I420 buffer [B, S*3/2, S] uint8 -> RGB float.

    The packed layout is exactly what cv2.cvtColor(..., RGB2YUV_I420)
    emits: S rows of Y, then S/4 rows holding the U plane, then S/4 rows
    holding V. Used by the training pipeline (`DetectionLoader(emit=
    'i420')`) so train batches also ship at 1.5 B/px."""
    b, rows, s = buf.shape
    if rows != (s * 3) // 2:
        raise ValueError(f"not a packed I420 buffer: {buf.shape}")
    y = buf[:, :s, :]
    chroma = buf[:, s:, :]
    u = chroma[:, : s // 4, :].reshape(b, s // 2, s // 2)
    v = chroma[:, s // 4 :, :].reshape(b, s // 2, s // 2)
    return i420_to_rgb(y, u, v, dtype)


def rgb_batch_to_i420_packed(batch):
    """HOST: [B, S, S, 3] uint8 RGB -> packed I420 [B, S*3/2, S] uint8."""
    import cv2
    import numpy as np

    return np.stack([cv2.cvtColor(im, cv2.COLOR_RGB2YUV_I420) for im in batch])


def hflip_images(images):
    """Horizontal flip, NHWC."""
    return images[:, :, ::-1, :]


def hflip_boxes_xywhn(labels):
    """Flip normalized-xywh labels [..., 5] (class, cx, cy, w, h) to match
    hflip_images; padding rows (class == -1) pass through unchanged."""
    cx = jnp.where(labels[..., 0:1] >= 0, 1.0 - labels[..., 1:2], labels[..., 1:2])
    return jnp.concatenate([labels[..., 0:1], cx, labels[..., 2:5]], axis=-1)


def pack_canvas(arrs, hmax: int = 0, wmax: int = 0, pad_value: int = 114):
    """HOST helper: variable-size uint8 images -> fixed canvas + sizes.

    One memcpy per image (the host's only remaining per-pixel work besides
    decode). Returns (canvas [B, Hmax, Wmax, 3] uint8, sizes int32 [B, 2]).
    """
    import numpy as np

    hmax = hmax or max(a.shape[0] for a in arrs)
    wmax = wmax or max(a.shape[1] for a in arrs)
    canvas = np.full((len(arrs), hmax, wmax, 3), pad_value, np.uint8)
    sizes = np.zeros((len(arrs), 2), np.int32)
    for i, a in enumerate(arrs):
        h, w = a.shape[:2]
        if h > hmax or w > wmax:  # oversized: host pre-shrink (rare path)
            import cv2

            s = min(hmax / h, wmax / w)
            a = cv2.resize(a, (int(w * s), int(h * s)),
                           interpolation=cv2.INTER_AREA)
            h, w = a.shape[:2]
        canvas[i, :h, :w] = a
        sizes[i] = (h, w)
    return canvas, sizes
