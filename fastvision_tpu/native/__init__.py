"""Native (C++) host kernels, loaded via ctypes.

The TPU compute path is XLA/Pallas; the host-side input pipeline is the
framework's native-runtime component (the reference leaned on torch's C++
DataLoader workers, SURVEY.md §2.6 item 6). Kernels are compiled on first
import with g++ -O3 into a cached shared object; every caller has a pure
-Python fallback, so a missing toolchain only costs speed.

Kernels:
  - letterbox.cpp — batched resize+pad. Measured (single core, 64x
    640x480 -> 416): cv2's SIMD resize does ~1126 img/s vs ~532 for this
    scalar kernel, so loaders default to cv2 and treat this as the no-cv2
    fallback / many-core batch path.
  - jpeg_i420.cpp — fused JPEG decode -> letterboxed packed I420 (the win
    the letterbox measurement pointed at: fuse the DECODE, don't re-race
    cv2's resize). Decodes the file's stored YCbCr planes via
    jpeg_read_raw_data (libjpeg-turbo SIMD huffman+IDCT, NO chroma
    upsample, NO RGB round-trip) and letterboxes in plane space.
    Measured 2026-08-19 (single core, 256x 640x480 -> 416, q90), img/s:
    bare kernel 581 vs cv2 imdecode alone 596 / cv2 RGB chain
    (imdecode+BGR2RGB+letterbox) 456 / cv2 i420 chain 428; through
    DetectionLoader: 505 (i420 native) vs 348 (rgb emit) — the fused
    kernel beats even the RGB-only per-core budget by 1.45x AND halves the
    bytes shipped to the device. (BENCH_r03's 244 img/s reading ran last
    in the bench, after the DecodePool scaling runs — contaminated; the
    bench now measures it first.) Output is also MORE faithful to the
    original image (it keeps the encoder's chroma instead of low-passing
    it twice; tests/test_native_jpeg.py).
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "letterbox.cpp")
_SRC_JPEG = os.path.join(_DIR, "jpeg_i420.cpp")
_LIB = None
_HAS_JPEG = False
_TRIED = False


def _compile(srcs: list[str], extra: list[str]) -> str:
    h = hashlib.sha256()
    for s in srcs:
        with open(s, "rb") as f:
            h.update(f.read())
    digest = h.hexdigest()[:16]
    so_path = os.path.join(tempfile.gettempdir(), f"fastvision_native_{digest}.so")
    if not os.path.exists(so_path):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             "-pthread", *srcs, "-o", so_path + ".tmp", *extra],
            check=True, capture_output=True,
        )
        os.replace(so_path + ".tmp", so_path)
    return so_path


def _build_and_load():
    global _LIB, _TRIED, _HAS_JPEG
    if _TRIED:
        return _LIB
    _TRIED = True
    try:
        try:  # full build: letterbox + fused jpeg->i420 decode (-ljpeg)
            so_path = _compile([_SRC, _SRC_JPEG], ["-ljpeg"])
            _HAS_JPEG = True
        except Exception:  # no libjpeg dev on this host: letterbox only
            so_path = _compile([_SRC], [])
        lib = ctypes.CDLL(so_path)
        lib.letterbox_batch.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),  # srcs
            ctypes.POINTER(ctypes.c_int32),  # hs
            ctypes.POINTER(ctypes.c_int32),  # ws
            ctypes.c_int32,  # n
            ctypes.c_int32,  # size
            ctypes.c_uint8,  # pad_value
            ctypes.c_void_p,  # out
            ctypes.c_void_p,  # scales
            ctypes.c_void_p,  # pads
            ctypes.c_int32,  # num_threads
        ]
        lib.letterbox_batch.restype = None
        if _HAS_JPEG:
            lib.jpeg_decode_i420_letterbox.argtypes = [
                ctypes.c_char_p,  # jpeg bytes
                ctypes.c_size_t,  # len
                ctypes.c_int32,  # out_size
                ctypes.c_uint8,  # pad_y (studio-swing luma pad)
                ctypes.c_int32,  # reduce_target (0 = full decode)
                ctypes.c_void_p,  # out [S*3/2, S]
                ctypes.c_void_p,  # scale f32[1]
                ctypes.c_void_p,  # pads i32[2] (left, top)
                ctypes.c_void_p,  # dims i32[4] (oh, ow, dh, dw)
            ]
            lib.jpeg_decode_i420_letterbox.restype = ctypes.c_int32
        _LIB = lib
    except Exception as e:  # noqa: BLE001 — fallback boundary
        print(f"[native] build/load failed ({e}); using Python fallback")
        _LIB = None
    return _LIB


def available() -> bool:
    return _build_and_load() is not None


def jpeg_i420_available() -> bool:
    return _build_and_load() is not None and _HAS_JPEG


def decode_jpeg_i420(
    data: bytes,
    size: int,
    pad_value: int = 114,
    reduce_target: int = 0,
):
    """Fused JPEG decode -> letterboxed packed I420 (native/jpeg_i420.cpp).

    Decodes the file's stored YCbCr planes directly (no chroma upsample,
    no RGB round-trip) and letterboxes them into the packed [S*3/2, S]
    uint8 buffer the i420 device path consumes, converting JFIF full-range
    to the studio-swing BT.601 convention of cv2's RGB2YUV_I420 (what
    ops/image.py::i420_to_rgb inverts on device). Letterbox geometry is
    identical to data/dataset.py::letterbox.

    `reduce_target` > 0 enables DCT-domain 1/2-1/8 reduced decode with the
    same threshold rule as imread_rgb_scaled (fast_decode).

    Returns (packed, scale, (pad_left, pad_top), (orig_h, orig_w),
    (decoded_h, decoded_w)) or None when the file needs the cv2 fallback
    (non-JPEG, CMYK, exotic sampling) — raises ValueError only for data
    that IS a plain JPEG but fails to decode.
    """
    lib = _build_and_load()
    if lib is None or not _HAS_JPEG:
        return None
    if size % 2:
        raise ValueError(f"i420 needs an even input_size, got {size}")
    # studio-swing luma value of RGB gray(pad_value); chroma pad is 128
    pad_y = int(np.clip(np.round(16 + 219 * pad_value / 255), 0, 255))
    out = np.empty((size * 3 // 2, size), np.uint8)
    scale = np.empty(1, np.float32)
    pads = np.empty(2, np.int32)
    dims = np.empty(4, np.int32)
    rc = lib.jpeg_decode_i420_letterbox(
        data, len(data), size, pad_y, reduce_target,
        out.ctypes.data, scale.ctypes.data, pads.ctypes.data, dims.ctypes.data,
    )
    if rc == 1:  # unsupported colorspace/sampling -> caller falls back
        return None
    if rc != 0:
        if data[:2] != b"\xff\xd8":
            return None  # not a JPEG at all (png/bmp): fallback silently
        raise ValueError("corrupt JPEG (native decode failed)")
    return (
        out,
        float(scale[0]),
        (int(pads[0]), int(pads[1])),
        (int(dims[0]), int(dims[1])),
        (int(dims[2]), int(dims[3])),
    )


def letterbox_batch(
    images: list[np.ndarray],
    size: int,
    pad_value: int = 114,
    num_threads: int = 0,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batched letterbox via the C++ kernel.

    images: list of HWC uint8 RGB arrays (contiguous).
    Returns (batch [N, size, size, 3] uint8, scales [N] f32, pads [N, 2] i32).
    Raises RuntimeError if the native library is unavailable — use
    `available()` or the per-image Python `data.dataset.letterbox`.
    """
    lib = _build_and_load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    n = len(images)
    images = [np.ascontiguousarray(im, np.uint8) for im in images]
    for im in images:
        if im.ndim != 3 or im.shape[2] != 3:
            raise ValueError(f"expected HWC RGB uint8, got {im.shape}")
    srcs = (ctypes.c_void_p * n)(*[im.ctypes.data for im in images])
    hs = np.asarray([im.shape[0] for im in images], np.int32)
    ws = np.asarray([im.shape[1] for im in images], np.int32)
    out = np.empty((n, size, size, 3), np.uint8)
    scales = np.empty(n, np.float32)
    pads = np.empty((n, 2), np.int32)
    if num_threads <= 0:
        num_threads = min(os.cpu_count() or 1, 8)
    lib.letterbox_batch(
        srcs,
        hs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ws.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n, size, pad_value,
        out.ctypes.data, scales.ctypes.data, pads.ctypes.data,
        num_threads,
    )
    return out, scales, pads
