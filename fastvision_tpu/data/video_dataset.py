"""Video recognition datasets + clip loader (first-class train-video path).

Covers the reference's videoRecognition data story (folder-per-class clips,
frame samplers — datasets/common/video_sampler.py) as a library component
feeding the same Fit/eval harness as images:

  - `VideoFolderDataset`: `<root>/<split>/<class_name>/<clip>` where each
    clip is a video file (.mp4/.avi/...) OR a directory of frame images —
    both common layouts for Kinetics/UCF-101 style datasets;
  - `VideoClipLoader`: fixed-shape batches {images [B,T,S,S,3] uint8,
    labels [B] int32, num_real} with deterministic per-sample sampling
    (rng seeded by (seed, epoch, position) — same discipline as
    DetectionLoader) and an optional thread pool for decode overlap
    (cv2 video decode releases the GIL).

Normalization runs on device inside the jitted step (`normalize_images`
handles NDHWC), matching the detection/classification paths.
"""
from __future__ import annotations

import os

import numpy as np

from .dataset import IMG_EXTS
from .video_sampler import load_clip, sample_indices

VIDEO_EXTS = (".mp4", ".avi", ".mov", ".mkv", ".webm")


class VideoFolderDataset:
    """Folder-per-class clips: video files or frame directories.

    `categories` pins the class-index mapping (e.g. from a dataset YAML
    descriptor); default is the sorted folder names of the split.
    """

    def __init__(self, root: str, split: str = "train",
                 categories: list[str] | None = None):
        self.dir = os.path.join(root, split)
        found = sorted(
            d for d in os.listdir(self.dir)
            if os.path.isdir(os.path.join(self.dir, d))
        )
        self.classes = list(categories) if categories else found
        index = {c: i for i, c in enumerate(self.classes)}
        self.samples: list[tuple[str, int]] = []
        for c in found:
            if c not in index:
                raise ValueError(
                    f"split folder {c!r} not in categories {self.classes}")
            cdir = os.path.join(self.dir, c)
            for f in sorted(os.listdir(cdir)):
                p = os.path.join(cdir, f)
                if f.lower().endswith(VIDEO_EXTS) or os.path.isdir(p):
                    self.samples.append((p, index[c]))
        if not self.samples:
            raise ValueError(f"no clips found under {self.dir}")

    def __len__(self) -> int:
        return len(self.samples)

    def clip_length(self, idx: int) -> int:
        """Total frames of clip `idx` (frame-dir file count or the video
        header's count — good enough for window PLACEMENT; reads clamp)."""
        path, _ = self.samples[idx]
        if os.path.isdir(path):
            return len([f for f in os.listdir(path)
                        if f.lower().endswith(IMG_EXTS)])
        import cv2

        cap = cv2.VideoCapture(path)
        n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        cap.release()
        return n

    def load_clip(
        self,
        idx: int,
        num_frames: int,
        strategy: str,
        size: int,
        rng: np.random.Generator,
        indices: np.ndarray | None = None,
    ) -> tuple[np.ndarray, int]:
        """-> ([T, size, size, 3] uint8 RGB clip, class index).

        `indices` overrides the sampling strategy with explicit frame
        positions (clamped to the clip length) — the multi-clip eval
        protocol uses this for evenly spaced deterministic windows."""
        import cv2

        path, label = self.samples[idx]
        if os.path.isdir(path):  # frame-directory clip
            frames = sorted(
                f for f in os.listdir(path) if f.lower().endswith(IMG_EXTS)
            )
            if not frames:
                raise ValueError(f"frame directory has no images: {path}")
            take = (np.clip(indices, 0, len(frames) - 1) if indices is not None
                    else sample_indices(len(frames), num_frames, strategy, rng))
            clip = []
            for i in take:
                fp = os.path.join(path, frames[int(i)])
                img = cv2.imread(fp)
                if img is None:  # corrupt frame — fail loudly, never a
                    raise ValueError(f"cannot decode frame: {fp}")  # black clip
                img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
                clip.append(cv2.resize(img, (size, size)))
            return np.stack(clip), label
        return load_clip(path, num_frames, strategy, size, rng,
                         indices=indices), label


class VideoClipLoader:
    """Fixed-shape clip batches for training/eval.

    train=True shuffles per epoch and samples clips stochastically (but
    deterministically given (seed, epoch, position)); train=False walks in
    order with the strategy's rng fixed per position, pads the ragged last
    batch and reports `num_real`.
    """

    def __init__(
        self,
        dataset: VideoFolderDataset,
        num_frames: int = 16,
        size: int = 112,
        batch_size: int = 8,
        strategy: str = "average",
        train: bool = True,
        seed: int = 0,
        num_workers: int = 0,
        # 'thread' (default): cv2 video decode releases the GIL, but clip
        # assembly + frame seeks serialize in Python. 'process' (optionally
        # ':fork|forkserver|spawn', same semantics as DetectionLoader):
        # DecodePool worker processes + shared-memory [T,S,S,3] slots —
        # everything scales with cores on many-core TPU-VM hosts.
        worker_backend: str = "thread",
        # 'skip' substitutes the next clip index on decode failure (see
        # DetectionLoader.on_corrupt); 'raise' (default) fails fast
        on_corrupt: str = "raise",
        # multi-host input sharding: None/'auto'/'i/n'/(i, n) — see
        # data/pipeline.py::resolve_host_shard. batch_size stays per-host.
        host_shard=None,
    ):
        self.ds = dataset
        self.num_frames = num_frames
        self.size = size
        self.batch_size = batch_size
        self.strategy = strategy
        self.train = train
        self.seed = seed
        from .pipeline import resolve_host_shard

        self.host_index, self.host_count = resolve_host_shard(host_shard)
        backend, _, start = worker_backend.partition(":")
        if backend not in ("thread", "process") or (
            start and (backend != "process"
                       or start not in ("fork", "forkserver", "spawn"))
        ):
            raise ValueError(
                "worker_backend must be 'thread', 'process', or "
                f"'process:fork|forkserver|spawn', got {worker_backend!r}"
            )
        self.worker_backend = backend
        self.worker_start_method = start or None
        self.num_workers = num_workers
        if on_corrupt not in ("raise", "skip"):
            raise ValueError(f"on_corrupt must be 'raise' or 'skip', got {on_corrupt!r}")
        self.on_corrupt = on_corrupt
        self._pool = None
        self._decode_pool = None
        if num_workers and num_workers > 1 and backend == "thread":
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(max_workers=num_workers)

    def __getstate__(self):
        # process workers pickle this loader via the work fn: strip live pools
        state = self.__dict__.copy()
        state["_pool"] = None
        state["_decode_pool"] = None
        return state

    def _clip_work(self, item):
        """Per-clip host work, runnable inside a DecodePool worker:
        (clip uint8 [T,S,S,3], label) under the corrupt policy."""
        pos, idx, epoch_idx = item
        sample_rng = np.random.default_rng((self.seed, epoch_idx, pos))
        from .pipeline import fetch_with_corrupt_policy

        return fetch_with_corrupt_policy(
            self.ds, self.on_corrupt,
            lambda j: self.ds.load_clip(j, self.num_frames, self.strategy,
                                        self.size, sample_rng),
            int(idx),
        )

    def _epoch_process(self, epoch_idx: int, order: np.ndarray, gpos: np.ndarray):
        if self._decode_pool is None:
            import sys

            from .decode_pool import DecodePool

            start = self.worker_start_method or (
                "forkserver" if "jax" in sys.modules else "fork"
            )
            self._decode_pool = DecodePool(
                self._clip_work, self.num_workers,
                (self.num_frames, self.size, self.size, 3),
                n_slots=max(4 * self.num_workers, 2 * self.batch_size),
                start_method=start,
            )
        n = (len(self) * self.batch_size if self.train else len(order))
        items = ((int(gpos[pos]), order[pos], epoch_idx)
                 for pos in range(min(n, len(order))))
        batch = np.empty(
            (self.batch_size, self.num_frames, self.size, self.size, 3),
            np.uint8)
        labels, i = [], 0
        for view, label in self._decode_pool.imap(items):
            batch[i] = view
            labels.append(label)
            i += 1
            if i == self.batch_size:
                yield {"images": batch.copy(),
                       "labels": np.asarray(labels, np.int32),
                       "num_real": i}
                labels, i = [], 0
        if i and not self.train:  # ragged last eval batch
            real = i
            while i < self.batch_size:
                batch[i] = batch[real - 1]
                labels.append(labels[-1])
                i += 1
            yield {"images": batch.copy(),
                   "labels": np.asarray(labels, np.int32), "num_real": real}

    def __len__(self) -> int:
        from .pipeline import _host_local_len

        n = _host_local_len(len(self.ds), self.host_count)
        return n // self.batch_size if self.train else -(-n // self.batch_size)

    def epoch(self, epoch_idx: int = 0):
        from .pipeline import host_shard_order

        rng = np.random.default_rng((self.seed, epoch_idx))
        order = (rng.permutation(len(self.ds)) if self.train
                 else np.arange(len(self.ds)))
        order, gpos = host_shard_order(order, self.host_index, self.host_count)
        if self.num_workers > 1 and self.worker_backend == "process":
            yield from self._epoch_process(epoch_idx, order, gpos)
            return

        def load(pos_idx):
            pos, i = pos_idx
            sample_rng = np.random.default_rng((self.seed, epoch_idx, pos))
            from .pipeline import fetch_with_corrupt_policy

            return fetch_with_corrupt_policy(
                self.ds, self.on_corrupt,
                lambda j: self.ds.load_clip(j, self.num_frames, self.strategy,
                                            self.size, sample_rng),
                int(i),
            )

        for b in range(len(self)):
            idxs = order[b * self.batch_size : (b + 1) * self.batch_size]
            work = [(int(gpos[p]), int(i))
                    for p, i in enumerate(idxs, start=b * self.batch_size)]
            if self._pool is not None:
                outs = list(self._pool.map(load, work))
            else:
                outs = [load(w) for w in work]
            real = len(outs)
            while len(outs) < self.batch_size:  # ragged last eval batch
                outs.append(outs[-1])
            clips = np.stack([o[0] for o in outs])
            labels = np.asarray([o[1] for o in outs], np.int32)
            yield {"images": clips, "labels": labels, "num_real": real}

    def __iter__(self):
        return self.epoch(0)
