"""Host-side augmentation pipeline with probability-lock replay.

Re-design of `datasets/common/augmentation.py:8` (composable op list, per-op
probability `p`, and a lock mechanism replaying the same random decisions —
built for TTA / paired-image consistency) plus the demo pipeline's extra ops
(`demos/yolov3_u/data_gen.py:122-150,285-326`: Jitter, ResizeByMax, CLAHE
HistEqualize, HSV jitter, blurs, ChannelShuffle).

Mechanics: every op samples its decisions from an explicit
`np.random.Generator` and RECORDS them; `pipeline.locked()` replays the
recorded decisions on the next call (the reference's lock_prob/_execute
flags, augmentation.py:18, made explicit). Labels ride along as [N, 5]
pixel-xyxy (cls, x1, y1, x2, y2) in `mode='detect'`.

Geometric/color work stays on the host (shape-dynamic, cv2); normalization
belongs on device (see pipeline.normalize_on_device).
"""
from __future__ import annotations

from typing import Sequence

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class Op:
    """Base op: subclasses implement sample(rng, image) -> decision dict and
    apply(image, labels, decision) -> (image, labels)."""

    def __init__(self, p: float = 1.0):
        self.p = p

    def sample(self, rng: np.random.Generator, image: np.ndarray) -> dict:
        return {}

    def apply(self, image, labels, decision):
        raise NotImplementedError


class BGR2RGB(Op):
    def apply(self, image, labels, decision):
        return image[..., ::-1], labels


class Resize(Op):
    """Exact resize to (size, size) or (h, w); labels scaled."""

    def __init__(self, size, p: float = 1.0):
        super().__init__(p)
        self.size = (size, size) if isinstance(size, int) else tuple(size)

    def apply(self, image, labels, decision):
        import cv2

        h, w = image.shape[:2]
        nh, nw = self.size
        image = cv2.resize(image, (nw, nh), interpolation=cv2.INTER_LINEAR)
        if labels is not None and len(labels):
            labels = labels.copy()
            labels[:, [1, 3]] *= nw / w
            labels[:, [2, 4]] *= nh / h
        return image, labels


class ResizeByMax(Op):
    """Long side -> size, aspect preserved (demo data_gen.py ResizeByMax)."""

    def __init__(self, size: int, p: float = 1.0):
        super().__init__(p)
        self.size = size

    def apply(self, image, labels, decision):
        import cv2

        h, w = image.shape[:2]
        scale = self.size / max(h, w)
        image = cv2.resize(
            image, (round(w * scale), round(h * scale)), interpolation=cv2.INTER_LINEAR
        )
        if labels is not None and len(labels):
            labels = labels.copy()
            labels[:, 1:5] *= scale
        return image, labels


class Jitter(Op):
    """Random scale jitter of both axes by (1 +- ratio) (demo Jitter(0.3))."""

    def __init__(self, ratio: float = 0.3, p: float = 1.0):
        super().__init__(p)
        self.ratio = ratio

    def sample(self, rng, image):
        return {
            "sx": 1 + rng.uniform(-self.ratio, self.ratio),
            "sy": 1 + rng.uniform(-self.ratio, self.ratio),
        }

    def apply(self, image, labels, decision):
        import cv2

        h, w = image.shape[:2]
        nw, nh = max(round(w * decision["sx"]), 1), max(round(h * decision["sy"]), 1)
        image = cv2.resize(image, (nw, nh), interpolation=cv2.INTER_LINEAR)
        if labels is not None and len(labels):
            labels = labels.copy()
            labels[:, [1, 3]] *= nw / w
            labels[:, [2, 4]] *= nh / h
        return image, labels


class Padding(Op):
    """Pad to (size, size), center or lefttop (common/padding.py:3)."""

    def __init__(self, size: int, pad_value: int = 114, position: str = "center", p: float = 1.0):
        super().__init__(p)
        self.size = size
        self.pad_value = pad_value
        self.position = position

    def apply(self, image, labels, decision):
        h, w = image.shape[:2]
        size = max(self.size, h, w)
        if self.position == "center":
            top, left = (size - h) // 2, (size - w) // 2
        else:
            top, left = 0, 0
        out = np.full((size, size, image.shape[2]), self.pad_value, image.dtype)
        out[top : top + h, left : left + w] = image
        if labels is not None and len(labels):
            labels = labels.copy()
            labels[:, [1, 3]] += left
            labels[:, [2, 4]] += top
        return out, labels


class _CropBase(Op):
    def __init__(self, size: int, p: float = 1.0):
        super().__init__(p)
        self.size = size

    def _crop(self, image, labels, top, left):
        ch = cw = self.size
        image = image[top : top + ch, left : left + cw]
        if labels is not None and len(labels):
            labels = labels.copy()
            labels[:, [1, 3]] = np.clip(labels[:, [1, 3]] - left, 0, image.shape[1])
            labels[:, [2, 4]] = np.clip(labels[:, [2, 4]] - top, 0, image.shape[0])
            keep = (labels[:, 3] - labels[:, 1] > 1) & (labels[:, 4] - labels[:, 2] > 1)
            labels = labels[keep]
        return image, labels


class CenterCrop(_CropBase):
    def apply(self, image, labels, decision):
        h, w = image.shape[:2]
        return self._crop(image, labels, max((h - self.size) // 2, 0), max((w - self.size) // 2, 0))


class RandomCrop(_CropBase):
    def sample(self, rng, image):
        h, w = image.shape[:2]
        return {
            "top": int(rng.integers(0, max(h - self.size, 0) + 1)),
            "left": int(rng.integers(0, max(w - self.size, 0) + 1)),
        }

    def apply(self, image, labels, decision):
        return self._crop(image, labels, decision["top"], decision["left"])


class HorizontalFlip(Op):
    def apply(self, image, labels, decision):
        w = image.shape[1]
        image = image[:, ::-1]
        if labels is not None and len(labels):
            labels = labels.copy()
            x1 = labels[:, 1].copy()
            labels[:, 1] = w - labels[:, 3]
            labels[:, 3] = w - x1
        return image, labels


class VerticalFlip(Op):
    def apply(self, image, labels, decision):
        h = image.shape[0]
        image = image[::-1]
        if labels is not None and len(labels):
            labels = labels.copy()
            y1 = labels[:, 2].copy()
            labels[:, 2] = h - labels[:, 4]
            labels[:, 4] = h - y1
        return image, labels


class HSVJitter(Op):
    """Random hue/sat/val gains (demo data_gen.py:285-326)."""

    def __init__(self, h_gain=0.015, s_gain=0.7, v_gain=0.4, p: float = 1.0):
        super().__init__(p)
        self.gains = (h_gain, s_gain, v_gain)

    def sample(self, rng, image):
        return {"r": (rng.uniform(-1, 1, 3) * np.asarray(self.gains) + 1).tolist()}

    def apply(self, image, labels, decision):
        import cv2

        r = np.asarray(decision["r"], np.float32)
        hsv = cv2.cvtColor(image, cv2.COLOR_RGB2HSV).astype(np.float32)
        hsv[..., 0] = (hsv[..., 0] * r[0]) % 180
        hsv[..., 1] = np.clip(hsv[..., 1] * r[1], 0, 255)
        hsv[..., 2] = np.clip(hsv[..., 2] * r[2], 0, 255)
        return cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB), labels


class HistEqualize(Op):
    """CLAHE on the luminance channel (demo data_gen.py HistEqualize)."""

    def __init__(self, clip_limit: float = 2.0, p: float = 1.0):
        super().__init__(p)
        self.clip_limit = clip_limit

    def apply(self, image, labels, decision):
        import cv2

        yuv = cv2.cvtColor(image, cv2.COLOR_RGB2YUV)
        clahe = cv2.createCLAHE(clipLimit=self.clip_limit, tileGridSize=(8, 8))
        yuv[..., 0] = clahe.apply(yuv[..., 0])
        return cv2.cvtColor(yuv, cv2.COLOR_YUV2RGB), labels


class Blur(Op):
    def __init__(self, ksize: int = 3, kind: str = "box", p: float = 1.0):
        super().__init__(p)
        self.ksize = ksize
        self.kind = kind

    def apply(self, image, labels, decision):
        import cv2

        if self.kind == "median":
            return cv2.medianBlur(image, self.ksize), labels
        if self.kind == "gaussian":
            return cv2.GaussianBlur(image, (self.ksize, self.ksize), 0), labels
        return cv2.blur(image, (self.ksize, self.ksize)), labels


class ChannelShuffle(Op):
    def sample(self, rng, image):
        return {"perm": rng.permutation(3).tolist()}

    def apply(self, image, labels, decision):
        return image[..., decision["perm"]], labels


class Normalization(Op):
    """uint8 -> float32 imagenet-normalized (host fallback; prefer the
    on-device normalize in data/pipeline.py)."""

    def __init__(self, mean=IMAGENET_MEAN, std=IMAGENET_STD, p: float = 1.0):
        super().__init__(p)
        self.mean, self.std = np.asarray(mean, np.float32), np.asarray(std, np.float32)

    def apply(self, image, labels, decision):
        img = image.astype(np.float32) / 255.0
        return (img - self.mean) / self.std, labels


class Augmentation:
    """Composable pipeline with per-op probability and decision replay.

    >>> aug = Augmentation([HorizontalFlip(p=.5), HSVJitter(p=.5)])
    >>> img1, lab1 = aug(img1, lab1, rng)
    >>> img2, lab2 = aug.replay(img2, lab2)   # identical decisions
    """

    def __init__(self, ops: Sequence[Op], mode: str = "detect"):
        self.ops = list(ops)
        self.mode = mode
        self._last: list[dict | None] = []

    def __call__(self, image, labels=None, rng: np.random.Generator | None = None):
        rng = rng or np.random.default_rng()
        self._last = []
        for op in self.ops:
            if rng.uniform() < op.p:
                decision = op.sample(rng, image)
                image, labels = op.apply(image, labels, decision)
                self._last.append(decision)
            else:
                self._last.append(None)
        return (image, labels) if self.mode == "detect" else (image, labels)

    def replay(self, image, labels=None):
        """Apply the previous call's exact decisions (the lock mechanism,
        ref augmentation.py:18 lock_prob)."""
        if not self._last:
            raise RuntimeError("replay() before any __call__")
        for op, decision in zip(self.ops, self._last):
            if decision is not None:
                image, labels = op.apply(image, labels, decision)
        return image, labels


# Config-driven construction: the reference wires augmentation pipelines in
# per-demo cfg python files (demos/*/cfg/_data_gen.py); here the same
# composition is a plain YAML list on `data.augment` (core/config.py), so
# recipes travel with the config instead of with code.
OP_REGISTRY: dict[str, type] = {
    "bgr2rgb": BGR2RGB,
    "resize": Resize,
    "resize_by_max": ResizeByMax,
    "jitter": Jitter,
    "padding": Padding,
    "center_crop": CenterCrop,
    "random_crop": RandomCrop,
    "hflip": HorizontalFlip,
    "vflip": VerticalFlip,
    "hsv": HSVJitter,
    "hist_equalize": HistEqualize,
    "blur": Blur,
    "channel_shuffle": ChannelShuffle,
    "normalization": Normalization,
}


def build_augmentation(specs, mode: str = "detect") -> "Augmentation | None":
    """Build an Augmentation pipeline from config specs.

    Each spec is either a string `'name'` / `'name:p'` (probability
    shorthand) or a dict `{op: name, **kwargs}` passing the op's
    constructor arguments — e.g. in YAML::

        data:
          augment:
            - hflip:0.5
            - {op: hsv, p: 0.5, s_gain: 0.6}
            - {op: jitter, ratio: 0.3}

    Returns None for an empty/missing list (callers keep their default)."""
    if not specs:
        return None
    ops = []
    for spec in specs:
        if isinstance(spec, str):
            name, _, p = spec.partition(":")
            kw = {"p": float(p)} if p else {}
        elif isinstance(spec, dict):
            kw = dict(spec)
            name = kw.pop("op", None)
            if not name:
                raise ValueError(f"augment spec {spec!r} needs an 'op' key")
        else:
            raise ValueError(
                f"augment spec must be a string or dict, got {spec!r}")
        cls = OP_REGISTRY.get(str(name).lower())
        if cls is None:
            raise ValueError(f"unknown augment op {name!r} "
                             f"(available: {sorted(OP_REGISTRY)})")
        ops.append(cls(**kw))
    return Augmentation(ops, mode=mode)
