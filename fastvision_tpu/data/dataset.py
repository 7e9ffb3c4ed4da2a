"""Datasets over the fastvision on-disk format.

The data contract (ref datasets/detection_dataloader.py:105-118 + the
converters): `<root>/{train,val,test}/images/<id>.jpg` + `labels/<id>.txt`,
each label line `category_idx xmin ymin xmax ymax` in original pixel
coordinates, classes 0-based.

TPU-first redesign vs the reference loader (detection_dataloader.py):
  - sample scan cached as JSON, not `eval()`-ed text (:122-127 security fix);
  - letterbox returns (image, scale, pad) so eval can map boxes back;
  - output batches are FIXED SHAPE: labels padded to `max_boxes` rows of
    (class, cx, cy, w, h) normalized, class == -1 padding — replaces the
    dynamic batch-idx-stamped collate (:98);
  - images stay uint8 on host; normalize runs on device (BASELINE.json
    north star: fuse normalize into the XLA program).
"""
from __future__ import annotations

import json
import os
from typing import Sequence

import numpy as np

IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp")


def imread_rgb(path: str) -> np.ndarray:
    """Host-side JPEG/PNG decode -> RGB uint8 HWC."""
    import cv2

    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(f"cannot decode image: {path}")
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


# SOF markers that carry frame dimensions (all except DHT C4, JPG C8, DAC CC)
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def jpeg_dimensions(path: str, max_header: int = 262144) -> tuple[int, int] | None:
    """(height, width) from the JPEG SOF header without decoding pixels.

    Returns None for non-JPEG files or headers longer than `max_header`
    (callers fall back to a full decode)."""
    with open(path, "rb") as f:
        data = f.read(max_header)
    if data[:2] != b"\xff\xd8":
        return None
    i = 2
    n = len(data)
    while i + 9 < n:
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in _JPEG_SOF:
            return (
                int.from_bytes(data[i + 5 : i + 7], "big"),
                int.from_bytes(data[i + 7 : i + 9], "big"),
            )
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:  # standalone
            i += 2
            continue
        i += 2 + int.from_bytes(data[i + 2 : i + 4], "big")
    return None


def imread_rgb_scaled(path: str, target_size: int) -> tuple[np.ndarray, tuple[int, int]]:
    """JPEG decode with libjpeg DCT-domain downscaling when the image is
    >= 2x/4x/8x larger than `target_size` on its long side — ~3-4x cheaper
    than full decode + resize (replaces the full-decode letterbox path of
    ref datasets/detection_dataloader.py:43-79 for large images).

    Returns (rgb image — possibly reduced, TRUE original (h, w)). The
    reduced dims are ceil(orig / factor), so callers that need exact
    original-pixel coordinates must scale per-axis by (reduced/orig)."""
    import cv2

    dims = (
        jpeg_dimensions(path)
        if path.lower().endswith((".jpg", ".jpeg"))
        else None
    )
    if dims is not None:
        oh, ow = dims
        m = max(oh, ow)
        for factor, flag in (
            (8, cv2.IMREAD_REDUCED_COLOR_8),
            (4, cv2.IMREAD_REDUCED_COLOR_4),
            (2, cv2.IMREAD_REDUCED_COLOR_2),
        ):
            if m >= factor * target_size:
                img = cv2.imread(path, flag)
                if img is not None:
                    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB), (oh, ow)
                break  # undecodable reduced -> full fallback
    img = imread_rgb(path)
    return img, img.shape[:2]


def read_label_file(path: str) -> np.ndarray:
    """labels/<id>.txt -> [N, 5] float32 (cls, x1, y1, x2, y2) pixels."""
    if not os.path.exists(path):
        return np.zeros((0, 5), np.float32)
    rows = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 5:
                rows.append([float(v) for v in parts[:5]])
    return np.asarray(rows, np.float32).reshape(-1, 5)


def letterbox(
    image: np.ndarray,
    size: int,
    pad_value: int = 114,
    position: str = "center",
) -> tuple[np.ndarray, float, tuple[int, int]]:
    """Aspect-preserving resize + pad to (size, size).

    Ref: detection_dataloader.py:43-79 load_image + common/padding.py:3.
    Returns (image, scale, (pad_left, pad_top)) — enough to invert the
    transform for eval (demos/yolov3_u/inference.py:92-109 unpad/unscale).
    """
    import cv2

    h, w = image.shape[:2]
    scale = size / max(h, w)
    nh, nw = round(h * scale), round(w * scale)
    if (nh, nw) != (h, w):
        image = cv2.resize(image, (nw, nh), interpolation=cv2.INTER_LINEAR)
    if position == "center":
        top = (size - nh) // 2
        left = (size - nw) // 2
    else:  # 'lefttop'
        top, left = 0, 0
    out = np.full((size, size, image.shape[2]), pad_value, image.dtype)
    out[top : top + nh, left : left + nw] = image
    return out, scale, (left, top)


def boxes_to_normalized_xywh(boxes_xyxy: np.ndarray, height: int, width: int) -> np.ndarray:
    """Pixel xyxy -> normalized xywh (the label tensor format)."""
    out = np.empty_like(boxes_xyxy)
    out[:, 0] = (boxes_xyxy[:, 0] + boxes_xyxy[:, 2]) / 2 / width
    out[:, 1] = (boxes_xyxy[:, 1] + boxes_xyxy[:, 3]) / 2 / height
    out[:, 2] = (boxes_xyxy[:, 2] - boxes_xyxy[:, 0]) / width
    out[:, 3] = (boxes_xyxy[:, 3] - boxes_xyxy[:, 1]) / height
    return out


def pad_labels(cls: np.ndarray, xywhn: np.ndarray, max_boxes: int) -> np.ndarray:
    """-> [max_boxes, 5] (class, cx, cy, w, h), class == -1 padding."""
    out = np.full((max_boxes, 5), -1, np.float32)
    n = min(len(cls), max_boxes)
    if n:
        out[:n, 0] = cls[:n]
        out[:n, 1:5] = xywhn[:n]
    return out


class DetectionDataset:
    """Detection samples: (rgb uint8 image, [N,5] pixel-xyxy labels, id).

    Ref: BaseDataset, datasets/detection_dataloader.py:157. Scan results are
    cached to `<split_dir>/.samples.json` when `cache=True`.
    """

    def __init__(self, root: str, split: str = "train", cache: bool = False,
                 decode_size: int | None = None):
        """`decode_size`: when set, JPEGs >= 2x larger than it are decoded
        reduced (libjpeg DCT scaling; see imread_rgb_scaled) and the labels
        are rescaled into the reduced image's pixel space — everything
        downstream stays self-consistent, just cheaper. Leave None when
        exact original-pixel coordinates matter."""
        self.dir = os.path.join(root, split)
        self.images_dir = os.path.join(self.dir, "images")
        self.labels_dir = os.path.join(self.dir, "labels")
        self.decode_size = decode_size
        self.ids = self._scan(cache)

    def _scan(self, cache: bool) -> list[str]:
        cache_path = os.path.join(self.dir, ".samples.json")
        if cache and os.path.exists(cache_path):
            with open(cache_path) as f:
                return json.load(f)
        ids = sorted(
            os.path.splitext(name)[0]
            for name in os.listdir(self.images_dir)
            if name.lower().endswith(IMG_EXTS)
        )
        if cache:
            with open(cache_path, "w") as f:
                json.dump(ids, f)
        return ids

    def __len__(self) -> int:
        return len(self.ids)

    def image_path(self, idx: int) -> str:
        base = os.path.join(self.images_dir, self.ids[idx])
        for ext in IMG_EXTS:
            if os.path.exists(base + ext):
                return base + ext
        raise FileNotFoundError(base)

    def __getitem__(self, idx: int):
        labels = read_label_file(os.path.join(self.labels_dir, self.ids[idx] + ".txt"))
        if self.decode_size:
            image, (oh, ow) = imread_rgb_scaled(self.image_path(idx), self.decode_size)
            rh, rw = image.shape[:2]
            if (rh, rw) != (oh, ow) and len(labels):
                labels = labels.copy()
                labels[:, [1, 3]] *= rw / ow
                labels[:, [2, 4]] *= rh / oh
        else:
            image = imread_rgb(self.image_path(idx))
        return image, labels, self.ids[idx]

    def sample_i420(self, idx: int, input_size: int, pad_value: int = 114):
        """Fused native JPEG -> letterboxed packed I420 sample (the fast
        host path for i420 eval/inference; native/jpeg_i420.cpp decodes
        the file's stored YCbCr planes with no RGB round-trip).

        Honors `decode_size` with the same reduction rule as
        `imread_rgb_scaled` (libjpeg DCT scaling); labels are rescaled
        into the decoded pixel space exactly like `__getitem__`.

        Returns (packed [S*3/2, S] uint8, labels [N,5] decoded-space
        pixel xyxy, sample_id, scale, (pad_left, pad_top),
        (decoded_h, decoded_w)) — or None when the file needs the cv2
        fallback (non-JPEG, exotic sampling, native lib unavailable)."""
        from .. import native

        if not native.jpeg_i420_available():
            return None
        path = self.image_path(idx)
        if not path.lower().endswith((".jpg", ".jpeg")):
            return None
        with open(path, "rb") as f:
            data = f.read()
        r = native.decode_jpeg_i420(
            data, input_size, pad_value,
            reduce_target=self.decode_size or 0,
        )
        if r is None:
            return None
        packed, _scale_f32, pad, (oh, ow), (dh, dw) = r
        # recompute in double so downstream label math is bit-identical
        # to the Python letterbox path (the kernel returns float32)
        scale = input_size / max(dh, dw)
        labels = read_label_file(os.path.join(self.labels_dir, self.ids[idx] + ".txt"))
        if (dh, dw) != (oh, ow) and len(labels):
            labels = labels.copy()
            labels[:, [1, 3]] *= dw / ow
            labels[:, [2, 4]] *= dh / oh
        return packed, labels, self.ids[idx], scale, pad, (dh, dw)


class ClassificationDataset:
    """Folder-per-class layout: `<root>/<split>/<class_name>/<img>`.

    Class indices follow sorted folder names (or an explicit `categories`
    list from the dataset YAML descriptor, datasets/data/*.yaml)."""

    def __init__(self, root: str, split: str = "train", categories: Sequence[str] | None = None):
        self.dir = os.path.join(root, split)
        names = categories or sorted(
            d for d in os.listdir(self.dir) if os.path.isdir(os.path.join(self.dir, d))
        )
        self.class_names = list(names)
        self.samples: list[tuple[str, int]] = []
        for ci, name in enumerate(self.class_names):
            cdir = os.path.join(self.dir, name)
            if not os.path.isdir(cdir):
                continue
            for fname in sorted(os.listdir(cdir)):
                if fname.lower().endswith(IMG_EXTS):
                    self.samples.append((os.path.join(cdir, fname), ci))

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, idx: int):
        path, label = self.samples[idx]
        return imread_rgb(path), label
