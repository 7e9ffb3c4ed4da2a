"""Canonical class-name lists for common datasets.

Role of the reference's `datasets/data/*.yaml` descriptors (data_root /
dirs / num_classes / categories): here the category lists are importable
constants, and `make_descriptor` writes a framework-config YAML for any of
them. The long lists (imagenet, kinetics-400, ucf101, sports-1m) ship as
package data under `descriptors/*.yaml` — full category lists, same
contents as the reference's — loaded lazily via `categories_for`.
"""
from __future__ import annotations

COCO_CLASSES = (
    "person", "bicycle", "car", "motorcycle", "airplane", "bus", "train",
    "truck", "boat", "traffic light", "fire hydrant", "stop sign",
    "parking meter", "bench", "bird", "cat", "dog", "horse", "sheep", "cow",
    "elephant", "bear", "zebra", "giraffe", "backpack", "umbrella",
    "handbag", "tie", "suitcase", "frisbee", "skis", "snowboard",
    "sports ball", "kite", "baseball bat", "baseball glove", "skateboard",
    "surfboard", "tennis racket", "bottle", "wine glass", "cup", "fork",
    "knife", "spoon", "bowl", "banana", "apple", "sandwich", "orange",
    "broccoli", "carrot", "hot dog", "pizza", "donut", "cake", "chair",
    "couch", "potted plant", "bed", "dining table", "toilet", "tv",
    "laptop", "mouse", "remote", "keyboard", "cell phone", "microwave",
    "oven", "toaster", "sink", "refrigerator", "book", "clock", "vase",
    "scissors", "teddy bear", "hair drier", "toothbrush",
)

VOC_CLASSES = (
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor",
)

CIFAR10_CLASSES = (
    "airplane", "automobile", "bird", "cat", "deer", "dog", "frog", "horse",
    "ship", "truck",
)

# descriptor templates: name -> (num_classes, categories or None).
# None = long list shipped as package data under descriptors/<name>.yaml
# (full lists, matching the reference's datasets/data/*.yaml); loaded
# lazily via `categories_for`.
DATASETS = {
    "coco": (80, COCO_CLASSES),
    "voc": (20, VOC_CLASSES),
    "cifar10": (10, CIFAR10_CLASSES),
    "imagenet": (1000, None),
    "kinetics400": (400, None),
    "ucf101": (101, None),
    "sports1m": (487, None),
}

_CATEGORY_CACHE: dict[str, tuple] = {}


def categories_for(name: str) -> tuple:
    """Full category list for a known dataset (lazy-loads the long video /
    imagenet lists from package data)."""
    if name not in DATASETS:
        raise KeyError(f"unknown dataset {name!r}; known: {sorted(DATASETS)}")
    num_classes, categories = DATASETS[name]
    if categories is not None:
        return categories
    if name not in _CATEGORY_CACHE:
        import os

        import yaml

        path = os.path.join(os.path.dirname(__file__), "descriptors", f"{name}.yaml")
        with open(path, encoding="utf-8") as f:
            data = yaml.safe_load(f)
        cats = tuple(data["categories"])
        if len(cats) != num_classes:
            raise ValueError(
                f"{path}: {len(cats)} categories != num_classes {num_classes}"
            )
        _CATEGORY_CACHE[name] = cats
    return _CATEGORY_CACHE[name]


def make_descriptor(
    name: str,
    data_root: str,
    out_path: str | None = None,
    input_size: int = 416,
) -> dict:
    """Build (and optionally write as YAML) a framework data config for a
    known dataset — the `datasets/data/*.yaml` descriptor equivalent."""
    if name not in DATASETS:
        raise KeyError(f"unknown dataset {name!r}; known: {sorted(DATASETS)}")
    num_classes, _ = DATASETS[name]
    categories = categories_for(name)
    desc = {
        "data": {
            "data_root": data_root,
            "train_dir": "train",
            "val_dir": "val",
            "test_dir": "test",
            "num_classes": num_classes,
            "categories": list(categories),
            "input_size": input_size,
        },
        "model": {"num_classes": num_classes},
    }
    if out_path:
        import yaml

        with open(out_path, "w") as f:
            yaml.safe_dump(desc, f, sort_keys=False)
    return desc
