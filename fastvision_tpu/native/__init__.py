"""Native (C++) host kernels, loaded via ctypes.

The TPU compute path is XLA/Pallas; the host-side input pipeline is the
framework's native-runtime component (the reference leaned on torch's C++
DataLoader workers, SURVEY.md §2.6 item 6). Kernels are compiled on first
import with g++ -O3 into a cached shared object; every caller has a pure
-Python fallback, so a missing toolchain only costs speed.

Measured (this image, single core, batch of 64 640x480 -> 416): cv2's SIMD
resize path does ~1126 img/s vs ~532 img/s for this scalar kernel, so the
loaders default to cv2 and treat this as the no-cv2 fallback / many-core
batch path. (cv2 is itself a native C++ backend — the win to chase next is
fusing JPEG decode + resize, not re-implementing resize.)
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "letterbox.cpp")
_LIB = None
_TRIED = False


def _build_and_load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    try:
        with open(_SRC, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
        so_path = os.path.join(
            tempfile.gettempdir(), f"fastvision_native_{digest}.so"
        )
        if not os.path.exists(so_path):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
                 "-pthread", _SRC, "-o", so_path + ".tmp"],
                check=True, capture_output=True,
            )
            os.replace(so_path + ".tmp", so_path)
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
        _LIB = lib
    except Exception as e:  # noqa: BLE001 — fallback boundary
        print(f"[native] build/load failed ({e}); using Python fallback")
        _LIB = None
    return _LIB


def available() -> bool:
    return _build_and_load() is not None


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
