"""Canonical class-name lists for common datasets.

Role of the reference's `datasets/data/*.yaml` descriptors (data_root /
dirs / num_classes / categories): here the category lists are importable
constants, and `make_descriptor` writes a framework-config YAML for any of
them. Datasets whose label lists are long/version-dependent (imagenet,
kinetics-400, ucf101, sports-1m) get descriptor templates with
`num_classes` set and categories left to the dataset's own metadata file.
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

# descriptor templates: name -> (num_classes, categories or None)
DATASETS = {
    "coco": (80, COCO_CLASSES),
    "voc": (20, VOC_CLASSES),
    "cifar10": (10, CIFAR10_CLASSES),
    "imagenet": (1000, None),
    "kinetics400": (400, None),
    "ucf101": (101, None),
    "sports1m": (487, None),
}


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
    num_classes, categories = DATASETS[name]
    desc = {
        "data": {
            "data_root": data_root,
            "train_dir": "train",
            "val_dir": "val",
            "test_dir": "test",
            "num_classes": num_classes,
            "categories": list(categories) if categories else [],
            "input_size": input_size,
        },
        "model": {"num_classes": num_classes},
    }
    if out_path:
        import yaml

        with open(out_path, "w") as f:
            yaml.safe_dump(desc, f, sort_keys=False)
    return desc
