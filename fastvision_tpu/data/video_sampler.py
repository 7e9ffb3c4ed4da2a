"""Video frame samplers (ref datasets/common/video_sampler.py).

Strategies over a video file (or a pre-decoded frame array):
  consecutive (:37), random (:63), average-stride (:88), and
  random-within-clips (:114); plus real-frame recount when the container
  header lies (:6 countRealFrames). Decode is host-side (cv2); the output is
  a fixed [T, H, W, 3] uint8 clip — static shapes for the video models.
"""
from __future__ import annotations

import numpy as np


def count_real_frames(path: str) -> int:
    """Walk the container when the header frame count is wrong
    (ref video_sampler.py:6)."""
    import cv2

    cap = cv2.VideoCapture(path)
    header = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    # verify by seeking to the end; fall back to walking
    cap.set(cv2.CAP_PROP_POS_FRAMES, max(header - 1, 0))
    ok, _ = cap.read()
    if ok:
        cap.release()
        return header
    cap.set(cv2.CAP_PROP_POS_FRAMES, 0)
    n = 0
    while cap.read()[0]:
        n += 1
    cap.release()
    return n


def sample_indices(
    total: int,
    num_frames: int,
    strategy: str = "consecutive",
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """Frame indices [num_frames] for a clip, clamped into [0, total)."""
    rng = rng or np.random.default_rng()
    if total <= 0:
        return np.zeros(num_frames, np.int64)
    if strategy == "consecutive":
        start = int(rng.integers(0, max(total - num_frames, 0) + 1))
        idx = np.arange(start, start + num_frames)
    elif strategy == "random":
        idx = np.sort(rng.choice(total, size=min(num_frames, total), replace=total < num_frames))
        if len(idx) < num_frames:
            idx = np.resize(idx, num_frames)
    elif strategy == "average":
        stride = max(total // num_frames, 1)
        start = int(rng.integers(0, max(total - stride * num_frames, 0) + 1))
        idx = start + np.arange(num_frames) * stride
    elif strategy == "clip_random":
        # split into num_frames clips; sample one frame per clip
        bounds = np.linspace(0, total, num_frames + 1)
        idx = np.array(
            [int(rng.integers(int(bounds[i]), max(int(bounds[i + 1]), int(bounds[i]) + 1)))
             for i in range(num_frames)]
        )
    else:
        raise ValueError(f"unknown strategy {strategy!r}")
    return np.clip(idx, 0, total - 1).astype(np.int64)


def load_clip(
    path: str,
    num_frames: int = 16,
    strategy: str = "consecutive",
    size: int | None = None,
    rng: np.random.Generator | None = None,
    verify_frames: bool = False,
    indices: np.ndarray | None = None,
) -> np.ndarray:
    """Decode a [T, H, W, 3] RGB uint8 clip from a video file.

    `indices` overrides `strategy` with explicit frame positions (clamped
    to the real frame count)."""
    import cv2

    total = count_real_frames(path) if verify_frames else None
    cap = cv2.VideoCapture(path)
    if total is None:
        total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    if total <= 0:
        cap.release()
        raise ValueError(f"cannot decode video (no frames): {path}")
    idx = (np.clip(indices, 0, total - 1) if indices is not None
           else sample_indices(total, num_frames, strategy, rng))
    frames = []
    last = None
    for i in np.sort(idx):
        cap.set(cv2.CAP_PROP_POS_FRAMES, int(i))
        ok, frame = cap.read()
        if not ok:
            # headers over-count frames routinely (count_real_frames exists
            # for that) — repeat the last good frame. But if NOTHING ever
            # decoded this is a corrupt file, and a silent black clip would
            # poison training: raise instead.
            if last is None:
                cap.release()
                raise ValueError(f"cannot decode video: {path}")
            frame = last
        frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        if size is not None:
            frame = cv2.resize(frame, (size, size))
        frames.append(frame)
        last = frame
    cap.release()
    return np.stack(frames, axis=0)


def sample_clip_from_array(
    frames: np.ndarray,
    num_frames: int = 16,
    strategy: str = "consecutive",
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """Sampler over pre-decoded frames [T, H, W, C] (tests, in-memory data)."""
    idx = sample_indices(frames.shape[0], num_frames, strategy, rng)
    return frames[idx]
