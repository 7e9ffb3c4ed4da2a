"""Input pipeline: host decode/augment -> fixed-shape batches -> device.

Replaces the reference's torch DataLoader worker pool + dynamic collate
(datasets/detection_dataloader.py:98,163-172) with:

  - deterministic per-epoch sampling (numpy Generator seeded by
    (seed, epoch) — reproducible, resumable);
  - fixed-shape output: images uint8 [B, S, S, 3] NHWC, labels [B, M, 5]
    normalized xywh with class == -1 padding;
  - `prefetch_to_device`: a background thread pipelines host work with
    device compute and lands batches pre-sharded over the mesh 'data' axis
    (the double-buffered jax.device_put plan, SURVEY.md §2.6 item 6);
  - normalization fused into the jitted step via `normalize_images`
    (uint8 -> model dtype on device; north star: on-device image ops).
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from ..core.mesh import shard_batch
from .augment import IMAGENET_MEAN, IMAGENET_STD, Augmentation
from .dataset import boxes_to_normalized_xywh, letterbox, pad_labels
from .mosaic import mosaic4


def normalize_images(
    images: jnp.ndarray,
    dtype=jnp.float32,
    imagenet: bool = False,
) -> jnp.ndarray:
    """On-device uint8 -> float in [0,1], optional imagenet standardization.

    Call INSIDE the jitted step so the divide/subtract fuses into the first
    conv (demo ToTensor /255, data_gen.py:351-356; lib imagenet-norm,
    detection_dataloader.py aug).

    A rank-3 input is a packed I420 buffer [B, S*3/2, S] (DetectionLoader
    emit='i420' — half the host->device bytes): it is color-decoded on
    device first (ops/image.py), then normalized identically."""
    if images.ndim == 3:
        if images.shape[-1] == 3:
            raise ValueError(
                f"normalize_images got a single unbatched RGB image "
                f"{images.shape}; add a batch dimension (images[None]). "
                "Rank-3 inputs are interpreted as packed I420 buffers "
                "[B, S*3/2, S]."
            )
        from ..ops.image import i420_packed_to_rgb

        images = i420_packed_to_rgb(images, dtype)
    x = images.astype(dtype) / jnp.asarray(255.0, dtype)
    if imagenet:
        x = (x - jnp.asarray(IMAGENET_MEAN, dtype)) / jnp.asarray(IMAGENET_STD, dtype)
    return x


def fetch_with_corrupt_policy(ds, on_corrupt: str, fn, idx: int):
    """Run per-sample work `fn(index)` under a corrupt-file policy:
    'raise' passes errors through; 'skip' substitutes the next dataset
    index (deterministic, up to 8 tries) with a warning. Decode-class
    failures only (OSError incl. FileNotFoundError, ValueError) —
    anything else is a bug and always raises."""
    if on_corrupt == "raise":
        return fn(int(idx))
    import warnings

    n = len(ds)
    last: Exception | None = None
    for k in range(min(8, n)):
        j = (int(idx) + k) % n
        try:
            out = fn(j)
            if k:
                warnings.warn(
                    f"skipped {k} corrupt sample(s) starting at dataset "
                    f"index {int(idx)} ({last}); substituted index {j}",
                    stacklevel=2,
                )
            return out
        except (OSError, ValueError) as e:
            last = e
    raise RuntimeError(
        f"{min(8, n)} consecutive corrupt samples from index {int(idx)}"
    ) from last


def resolve_host_shard(host_shard) -> tuple[int, int]:
    """Normalize a loader ``host_shard`` spec to ``(index, count)``.

    Multi-host input sharding (SURVEY.md §5 distributed comm): each host's
    loader decodes a disjoint 1/P slice of every epoch instead of all P
    hosts redundantly decoding the full global batch. Accepted forms:

    - ``None`` / ``""``: no sharding — ``(0, 1)``;
    - ``'auto'``: ``(jax.process_index(), jax.process_count())`` — the
      right thing on any initialized multi-host cluster (and a no-op on a
      single process);
    - ``'i/n'`` string (e.g. ``'0/2'``) or ``(i, n)`` tuple: explicit —
      for manual clusters and tests.
    """
    if host_shard is None or host_shard == "":
        return 0, 1
    if host_shard == "auto":
        return jax.process_index(), jax.process_count()
    if isinstance(host_shard, str):
        try:
            index, count = (int(p) for p in host_shard.split("/"))
        except ValueError:
            raise ValueError(
                f"host_shard string must be 'auto' or 'i/n', got {host_shard!r}"
            ) from None
    else:
        index, count = (int(p) for p in host_shard)
    if count < 1 or not 0 <= index < count:
        raise ValueError(f"host_shard index {index} not in [0, {count})")
    return index, count


def host_shard_order(
    order: np.ndarray, index: int, count: int
) -> tuple[np.ndarray, np.ndarray]:
    """Slice a global epoch order into this host's shard.

    Returns ``(local_order, global_positions)``: disjoint equal-length
    strided slices (the remainder ``len(order) % count`` is dropped so
    every host yields the same number of batches — the collective-lockstep
    requirement). ``global_positions[p]`` is local sample ``p``'s position
    in the full single-host epoch; loaders seed the per-sample rng from it
    ((seed, epoch, position)), so the union of all hosts' samples is
    byte-identical to the single-host epoch."""
    if count == 1:
        return order, np.arange(len(order))
    n = len(order) - len(order) % count
    gpos = np.arange(index, n, count)
    return order[gpos], gpos


def _host_local_len(n: int, count: int) -> int:
    """Per-host dataset length under host sharding (remainder dropped)."""
    return n if count == 1 else (n - n % count) // count


class DetectionLoader:
    """Batches of letterboxed images + padded normalized-xywh labels.

    train=True: optional mosaic + augmentation pipeline; val: letterbox only,
    with per-image meta (scale, pad, original hw, pixel-space GT) for
    eval-time unscaling and mAP (demos/yolov3_u/inference.py:92-109).
    """

    def __init__(
        self,
        dataset,
        input_size: int = 416,
        batch_size: int = 16,
        max_boxes: int = 120,
        train: bool = True,
        augmentation: Augmentation | None = None,
        mosaic_prob: float = 0.0,
        seed: int = 0,
        drop_last: bool | None = None,
        pad_value: int = 114,
        # Measured on this host (1 core, 64x 640x480->416): cv2's SIMD resize
        # 1126 img/s vs our scalar C++ kernel 532 img/s — cv2 stays the
        # default native backend; flip on where cv2 is unavailable or on
        # many-core hosts where the kernel's batch threading wins.
        use_native: bool = False,
        # decode/augment worker pool. 0/1 = serial; on multi-core TPU-VM
        # hosts set ~ cores-2.
        num_workers: int = 0,
        # 'thread': cv2 releases the GIL but the surrounding Python work
        # still serializes — tops out ~1.3x on decode-heavy loads.
        # 'process': DecodePool fork workers + shared-memory ring (the
        # torch-DataLoader-equivalent, data/decode_pool.py) — decode,
        # letterbox, augment AND label work all scale with cores.
        worker_backend: str = "thread",
        # 'rgb' ships [B,S,S,3] uint8; 'i420' ships a packed YUV 4:2:0
        # buffer [B,S*3/2,S] (half the H2D bytes; normalize_images decodes
        # it on device). Augmentation/mosaic still run in RGB upstream.
        emit: str = "rgb",
        # Fused native JPEG->I420 decode (native/jpeg_i420.cpp: decode the
        # file's stored YCbCr planes, no RGB round-trip — ~1.5x the cv2
        # chain per core). None = auto: on for emit='i420' eval loads
        # (train=False, no augmentation/mosaic) when the dataset exposes
        # sample_i420 and the native lib built. False forces the cv2 path.
        native_jpeg: bool | None = None,
        # 'raise' (default): a corrupt/undecodable file kills the epoch —
        # right for eval (silently dropping images corrupts metrics).
        # 'skip': substitute the next dataset index (up to 8 tries) with a
        # warning — right for long training runs where one bad file must
        # not kill days of work (the reference's torch loader crashes).
        on_corrupt: str = "raise",
        # Multi-host input sharding: None/'' = off, 'auto' = shard the
        # epoch by (jax.process_index(), jax.process_count()), 'i/n' or
        # (i, n) = explicit. Each host decodes a disjoint 1/P of the data;
        # batch_size stays PER-HOST (global batch = batch_size * P) and
        # prefetch_to_device(per_host=True) assembles the global array
        # (core/mesh.py::shard_batch). See resolve_host_shard.
        host_shard=None,
    ):
        self.ds = dataset
        self.input_size = input_size
        self.batch_size = batch_size
        self.max_boxes = max_boxes
        self.train = train
        self.augmentation = augmentation
        self.mosaic_prob = mosaic_prob
        self.seed = seed
        self.drop_last = train if drop_last is None else drop_last
        self.host_index, self.host_count = resolve_host_shard(host_shard)
        self.pad_value = pad_value
        if use_native:
            from .. import native

            use_native = native.available()
        self.use_native = use_native
        if emit not in ("rgb", "i420"):
            raise ValueError(f"emit must be 'rgb' or 'i420', got {emit!r}")
        self.emit = emit
        self.num_workers = num_workers
        # 'process' may carry a start-method suffix: 'process:forkserver'
        # or 'process:spawn' for environments where forking a threaded
        # parent is unacceptable (work_fn pickles — loader state is plain
        # data). Bare 'process' auto-picks at pool-creation time:
        # forkserver once jax is imported (fork()ing a multithreaded JAX
        # parent risks deadlock — the r3 bench tail tripped exactly that
        # warning), plain fork otherwise (fastest, no pickling).
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
        self.worker_start_method = start or None  # None = auto-detect
        eligible = (
            emit == "i420" and not train and augmentation is None
            and mosaic_prob == 0 and hasattr(dataset, "sample_i420")
        )
        if native_jpeg is None:
            if eligible:
                from .. import native

                native_jpeg = native.jpeg_i420_available()
            else:
                native_jpeg = False
        elif native_jpeg and not eligible:
            raise ValueError(
                "native_jpeg=True needs emit='i420', train=False, no "
                "augmentation/mosaic, and a dataset with sample_i420"
            )
        self.native_jpeg = native_jpeg
        if on_corrupt not in ("raise", "skip"):
            raise ValueError(f"on_corrupt must be 'raise' or 'skip', got {on_corrupt!r}")
        self.on_corrupt = on_corrupt
        self._pool = None
        self._decode_pool = None
        self._decode_pool_shape = None
        if num_workers and num_workers > 1 and worker_backend == "thread":
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(max_workers=num_workers)

    def __len__(self) -> int:
        n = _host_local_len(len(self.ds), self.host_count)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _fetch(self, fn, idx: int):
        return fetch_with_corrupt_policy(self.ds, self.on_corrupt, fn, idx)

    def _load_raw(self, idx: int, rng: np.random.Generator):
        """Decode + mosaic + augment one sample; labels stay pixel xyxy.

        `rng` is per-sample (seeded from (seed, epoch, position)) so results
        are deterministic regardless of worker threading."""
        image, labels, sid = self._fetch(self.ds.__getitem__, idx)
        if self.train and self.mosaic_prob > 0 and rng.uniform() < self.mosaic_prob:
            others = rng.integers(0, len(self.ds), 3)
            samples = [(image, labels)] + [
                self._fetch(lambda j: self.ds[j][:2], int(j)) for j in others
            ]
            image, labels = mosaic4(samples, self.input_size, rng, self.pad_value)
        if self.train and self.augmentation is not None:
            image, labels = self.augmentation(image, labels, rng)
        return image, labels, sid

    def _finalize(self, labels, scale, px, py):
        """Pixel-xyxy labels + letterbox transform -> padded normalized xywh."""
        if len(labels):
            lab = labels.copy()
            lab[:, 1:5] = lab[:, 1:5] * scale
            lab[:, [1, 3]] += px
            lab[:, [2, 4]] += py
            xywhn = boxes_to_normalized_xywh(lab[:, 1:5], self.input_size, self.input_size)
            return pad_labels(lab[:, 0], xywhn, self.max_boxes)
        return pad_labels(np.zeros(0), np.zeros((0, 4)), self.max_boxes)

    def _sample_i420(self, idx: int):
        """Fused-native per-sample i420 eval path: JPEG -> letterboxed
        packed I420 in one C++ pass (native/jpeg_i420.cpp), cv2-chain
        fallback per image for non-JPEG / exotic files. Returns
        (packed uint8 [S*3/2, S], (padded_labels, meta))."""
        return self._fetch(self._sample_i420_one, idx)

    def _sample_i420_one(self, idx: int):
        r = self.ds.sample_i420(int(idx), self.input_size, self.pad_value)
        if r is not None:
            packed, lab, sid, scale, (px, py), dhw = r
        else:
            from ..ops.image import rgb_batch_to_i420_packed

            image, lab, sid = self.ds[int(idx)]
            out, scale, (px, py) = letterbox(image, self.input_size, self.pad_value)
            packed = rgb_batch_to_i420_packed(out[None])[0]
            dhw = image.shape[:2]
        padded = self._finalize(lab, scale, px, py)
        meta = {
            "id": sid, "scale": scale, "pad": (px, py),
            "orig_hw": dhw, "gt_pixels": lab,
        }
        return packed, (padded, meta)

    # -- process backend ------------------------------------------------
    def _sample_work(self, item):
        """Full per-sample host pipeline, run inside a DecodePool worker:
        decode + mosaic + augment + letterbox + label finalize. Returns
        (canvas uint8 [S,S,3] — or packed i420 [S*3/2, S] on the
        native-jpeg path — , (padded_labels, meta))."""
        pos, idx, epoch_idx = item
        if self.native_jpeg:
            return self._sample_i420(int(idx))
        sample_rng = np.random.default_rng((self.seed, epoch_idx, pos))
        image, lab, sid = self._load_raw(int(idx), sample_rng)
        out, scale, (px, py) = letterbox(image, self.input_size, self.pad_value)
        padded = self._finalize(lab, scale, px, py)
        meta = {
            "id": sid, "scale": scale, "pad": (px, py),
            "orig_hw": image.shape[:2], "gt_pixels": lab,
        }
        return out, (padded, meta)

    def _batch_shape(self):
        s = self.input_size
        return (s * 3 // 2, s) if self.native_jpeg else (s, s, 3)

    def _get_decode_pool(self):
        # Rebuild on input_size change (multi-scale training): the workers
        # fork with a snapshot of this loader — both their letterbox target
        # and the shared-memory slot shape are frozen at fork time.
        shape = self._batch_shape()
        if self._decode_pool is not None and self._decode_pool_shape != shape:
            self._decode_pool.close()
            self._decode_pool = None
        if self._decode_pool is None:
            import sys

            from .decode_pool import DecodePool

            # auto start-method, decided when the pool is actually built:
            # never fork() a process that already imported jax (its client
            # threads make fork deadlock-prone)
            start = self.worker_start_method or (
                "forkserver" if "jax" in sys.modules else "fork"
            )
            self._decode_pool = DecodePool(
                self._sample_work, self.num_workers, shape,
                n_slots=max(4 * self.num_workers, 2 * self.batch_size),
                start_method=start,
            )
            self._decode_pool_shape = shape
        return self._decode_pool

    def __getstate__(self):
        # forkserver/spawn workers pickle this loader via _sample_work:
        # strip the unpicklable live pools (workers never use them)
        state = self.__dict__.copy()
        state["_pool"] = None
        state["_decode_pool"] = None
        return state

    def _epoch_process(
        self, epoch_idx: int, order: np.ndarray, gpos: np.ndarray
    ) -> Iterator[dict]:
        pool = self._get_decode_pool()
        nb = len(self)
        n = nb * self.batch_size if self.drop_last else len(order)
        items = ((int(gpos[pos]), order[pos], epoch_idx)
                 for pos in range(min(n, len(order))))
        batch = np.empty((self.batch_size, *self._batch_shape()), np.uint8)
        labels, metas, i = [], [], 0
        for view, (padded, meta) in pool.imap(items):
            batch[i] = view
            labels.append(padded)
            metas.append(meta)
            i += 1
            if i == self.batch_size:
                yield self._emit_batch(batch.copy(), labels, metas, i)
                labels, metas, i = [], [], 0
        if i and not self.drop_last:  # ragged last batch: replicate images,
            real = i                  # pad labels empty (as the thread path)
            while i < self.batch_size:
                batch[i] = batch[real - 1]
                labels.append(np.full((self.max_boxes, 5), -1, np.float32))
                i += 1
            yield self._emit_batch(batch.copy(), labels, metas, real)

    def _emit_batch(self, batch, labels, metas, real) -> dict:
        if self.emit == "i420" and not self.native_jpeg:  # native path is
            from ..ops.image import rgb_batch_to_i420_packed  # packed already

            batch = rgb_batch_to_i420_packed(batch)
        return {
            "images": batch,
            "labels": np.stack(labels),
            "num_real": real,
            "meta": metas,
        }

    def epoch(self, epoch_idx: int = 0) -> Iterator[dict]:
        rng = np.random.default_rng((self.seed, epoch_idx))
        order = rng.permutation(len(self.ds)) if self.train else np.arange(len(self.ds))
        # host sharding: same seeded global order on every host, disjoint
        # strided slice per host; gpos keeps per-sample rng streams
        # byte-identical to the single-host epoch
        order, gpos = host_shard_order(order, self.host_index, self.host_count)
        if self.num_workers > 1 and self.worker_backend == "process":
            yield from self._epoch_process(epoch_idx, order, gpos)
            return
        nb = len(self)

        def load(pos_idx):
            pos, i = pos_idx
            sample_rng = np.random.default_rng((self.seed, epoch_idx, pos))
            return self._load_raw(int(i), sample_rng)

        for b in range(nb):
            idxs = order[b * self.batch_size : (b + 1) * self.batch_size]
            if self.native_jpeg:
                if self._pool is not None:
                    outs = list(self._pool.map(self._sample_i420, idxs))
                else:
                    outs = [self._sample_i420(int(i)) for i in idxs]
                real = len(outs)
                labels = [o[1][0] for o in outs]
                metas = [o[1][1] for o in outs]
                while len(outs) < self.batch_size:  # ragged last eval batch
                    outs.append(outs[-1])
                    labels.append(np.full((self.max_boxes, 5), -1, np.float32))
                yield {
                    "images": np.stack([o[0] for o in outs]),
                    "labels": np.stack(labels),
                    "num_real": real,
                    "meta": metas,
                }
                continue
            work = [(int(gpos[p]), int(i))
                    for p, i in enumerate(idxs, start=b * self.batch_size)]
            if self._pool is not None:
                raws = list(self._pool.map(load, work))
            else:
                raws = [load(w) for w in work]
            real = len(raws)
            while len(raws) < self.batch_size:  # ragged last eval batch
                raws.append(raws[-1])

            raw_images = [r[0] for r in raws]
            if self.use_native:
                # one C++ pass: bilinear resize + pad for the whole batch
                from .. import native

                batch, scales, pads = native.letterbox_batch(
                    raw_images, self.input_size, self.pad_value
                )
                geo = [(scales[i], pads[i, 0], pads[i, 1]) for i in range(len(raws))]
            else:
                outs = [letterbox(im, self.input_size, self.pad_value) for im in raw_images]
                batch = np.stack([o[0] for o in outs])
                geo = [(o[1], o[2][0], o[2][1]) for o in outs]

            labels, metas = [], []
            for i, (image, lab, sid) in enumerate(raws):
                scale, px, py = geo[i]
                padded = self._finalize(lab, scale, px, py) if i < real else np.full(
                    (self.max_boxes, 5), -1, np.float32
                )
                labels.append(padded)
                if i < real:
                    metas.append({
                        "id": sid,
                        "scale": scale,
                        "pad": (px, py),
                        "orig_hw": image.shape[:2],
                        "gt_pixels": lab,  # original-space GT for mAP
                    })
            if self.emit == "i420":
                from ..ops.image import rgb_batch_to_i420_packed

                batch = rgb_batch_to_i420_packed(batch)
            yield {
                "images": batch,
                "labels": np.stack(labels),
                "num_real": real,
                "meta": metas,
            }

    def __iter__(self):
        return self.epoch(0)


class ClassificationLoader:
    """Classification batches: images [B,S,S,3] uint8, labels [B].

    `num_workers` / `worker_backend` mirror DetectionLoader and
    VideoClipLoader: 'thread' overlaps JPEG decode across a pool (cv2
    releases the GIL), 'process' (optionally ':fork|forkserver|spawn')
    decodes over cores via DecodePool shared-memory slots — at ImageNet
    scale the host decode, not the device, bounds a classification train
    step. Augmentation rng is per-sample ((seed, epoch, position), the
    package-wide determinism discipline), so every backend and worker
    count yields byte-identical batches."""

    def __init__(self, dataset, input_size=224, batch_size=32, train=True,
                 augmentation: Augmentation | None = None, seed=0,
                 on_corrupt: str = "raise", num_workers: int = 0,
                 worker_backend: str = "thread", host_shard=None):
        self.ds = dataset
        self.input_size = input_size
        self.batch_size = batch_size
        self.train = train
        self.augmentation = augmentation
        self.seed = seed
        self.host_index, self.host_count = resolve_host_shard(host_shard)
        if on_corrupt not in ("raise", "skip"):
            raise ValueError(f"on_corrupt must be 'raise' or 'skip', got {on_corrupt!r}")
        self.on_corrupt = on_corrupt
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

    def __len__(self):
        n = _host_local_len(len(self.ds), self.host_count)
        return n // self.batch_size if self.train else -(-n // self.batch_size)

    def _sample_work(self, item):
        """Per-image host work (decode + augment + resize), runnable
        inside a DecodePool worker: (uint8 [S,S,3], label)."""
        import cv2

        pos, idx, epoch_idx = item
        img, lab = fetch_with_corrupt_policy(
            self.ds, self.on_corrupt, self.ds.__getitem__, int(idx))
        if self.train and self.augmentation is not None:
            sample_rng = np.random.default_rng((self.seed, epoch_idx, pos))
            img, _ = self.augmentation(img, None, sample_rng)
        img = cv2.resize(img, (self.input_size, self.input_size))
        return np.ascontiguousarray(img), lab

    def _epoch_process(self, epoch_idx: int, order: np.ndarray, gpos: np.ndarray):
        if self._decode_pool is None:
            import sys

            from .decode_pool import DecodePool

            start = self.worker_start_method or (
                "forkserver" if "jax" in sys.modules else "fork"
            )
            self._decode_pool = DecodePool(
                self._sample_work, self.num_workers,
                (self.input_size, self.input_size, 3),
                n_slots=max(4 * self.num_workers, 2 * self.batch_size),
                start_method=start,
            )
        n = (len(self) * self.batch_size if self.train else len(order))
        items = ((int(gpos[pos]), order[pos], epoch_idx)
                 for pos in range(min(n, len(order))))
        batch = np.empty(
            (self.batch_size, self.input_size, self.input_size, 3), np.uint8)
        labels, i = [], 0
        for view, label in self._decode_pool.imap(items):
            batch[i] = view
            labels.append(label)
            i += 1
            if i == self.batch_size:
                yield {"images": batch.copy(),
                       "labels": np.asarray(labels, np.int32), "num_real": i}
                labels, i = [], 0
        if i and not self.train:  # ragged last eval batch
            real = i
            while i < self.batch_size:
                batch[i] = batch[real - 1]
                labels.append(labels[-1])
                i += 1
            yield {"images": batch.copy(),
                   "labels": np.asarray(labels, np.int32), "num_real": real}

    def epoch(self, epoch_idx: int = 0):
        rng = np.random.default_rng((self.seed, epoch_idx))
        order = rng.permutation(len(self.ds)) if self.train else np.arange(len(self.ds))
        order, gpos = host_shard_order(order, self.host_index, self.host_count)
        if self.num_workers > 1 and self.worker_backend == "process":
            yield from self._epoch_process(epoch_idx, order, gpos)
            return
        for b in range(len(self)):
            work = [(int(gpos[pos]), order[pos], epoch_idx)
                    for pos in range(b * self.batch_size,
                                     min((b + 1) * self.batch_size, len(order)))]
            if self._pool is not None:
                outs = list(self._pool.map(self._sample_work, work))
            else:
                outs = [self._sample_work(w) for w in work]
            real = len(outs)
            while len(outs) < self.batch_size:  # ragged last eval batch
                outs.append(outs[-1])
            yield {"images": np.stack([o[0] for o in outs]),
                   "labels": np.asarray([o[1] for o in outs], np.int32),
                   "num_real": real}

    def __iter__(self):
        return self.epoch(0)


def prefetch_to_device(
    iterator: Iterator[dict],
    mesh=None,
    buffer_size: int = 2,
    device_keys: tuple[str, ...] = ("images", "labels"),
    per_host: bool = False,
) -> Iterator[dict]:
    """Two-stage background prefetch + device placement.

    Stage 1 (decode thread) pulls host batches from `iterator`; stage 2
    (a separate transfer thread) device_puts them, sharded over the mesh
    'data' axis when a mesh is given. Decoupling decode from upload means
    JPEG decode of batch k+2, the H2D copy of batch k+1, and device
    compute of batch k all overlap — on link-bound hosts the upload alone
    then sets the pipeline rate instead of decode+upload in series
    (BENCH ceiling_fraction; VERDICT r3 weak-1). Host keys (meta,
    num_real) pass through untouched. Exceptions raised in either stage
    (decode errors, indivisible batch sizes) re-raise in the consumer.

    `per_host=True` declares the iterator's batches host-LOCAL slices of a
    multi-host global batch (loaders built with host_shard): shard_batch
    assembles the global array from each process's slice. Pass
    ``per_host=loader.host_count > 1``; single-process it is a no-op."""
    q_host: queue.Queue = queue.Queue(maxsize=buffer_size)
    q_dev: queue.Queue = queue.Queue(maxsize=buffer_size)
    sentinel = object()
    stop = threading.Event()  # consumer gone (early break/close): unblock
    # and terminate the workers so abandoned prefetch threads don't keep
    # holding buffered device batches / contending for the transfer link
    errors: list[BaseException] = []

    def enqueue(q: queue.Queue, item) -> bool:
        while True:
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                if stop.is_set():
                    return False

    def to_device(batch) -> dict:
        device_part = {k: batch[k] for k in device_keys if k in batch}
        if mesh is not None:
            from ..core.mesh import DATA_AXIS

            n = mesh.shape[DATA_AXIS]
            bs = next(iter(device_part.values())).shape[0] if device_part else 0
            pc = jax.process_count() if per_host else 1
            if (bs * pc) % n:
                raise ValueError(
                    f"batch size {bs}{f' x {pc} hosts' if pc > 1 else ''} is "
                    f"not divisible by the mesh 'data' axis ({n} devices) — "
                    f"pick batch_size as a multiple of {max(1, n // pc)}"
                )
            device_part = shard_batch(device_part, mesh, per_host=per_host)
        else:
            device_part = jax.tree.map(jnp.asarray, device_part)
        out = dict(batch)
        out.update(device_part)
        return out

    def decode_worker():
        try:
            for batch in iterator:
                if stop.is_set() or not enqueue(q_host, batch):
                    return
        except BaseException as e:  # surface in the consumer, don't hang it
            errors.append(e)
        finally:
            enqueue(q_host, sentinel)

    def transfer_worker():
        try:
            while True:
                try:
                    item = q_host.get(timeout=0.1)
                except queue.Empty:
                    if stop.is_set():
                        return
                    continue
                if item is sentinel:
                    return
                if stop.is_set() or not enqueue(q_dev, to_device(item)):
                    return
        except BaseException as e:
            errors.append(e)
        finally:
            enqueue(q_dev, sentinel)

    threads = (
        threading.Thread(target=decode_worker, daemon=True),
        threading.Thread(target=transfer_worker, daemon=True),
    )
    for t in threads:
        t.start()
    try:
        while True:
            item = q_dev.get()
            if item is sentinel:
                break
            yield item
        if errors:
            raise errors[0]
    finally:
        stop.set()
        for q in (q_dev, q_host):
            try:  # drain buffered items so the workers unblock promptly
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
