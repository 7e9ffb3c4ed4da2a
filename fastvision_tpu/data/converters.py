"""Dataset converters into the fastvision on-disk format.

Target format (ref datasets/coco2fastvision.py:50, voc2fastvision.py:113):
`<out>/<split>/{images,labels}` with per-image `labels/<id>.txt` lines
`category_idx xmin ymin xmax ymax` (pixels, 0-based classes).

Images are symlinked (copy=False) instead of copied — same bytes, no IO.
"""
from __future__ import annotations

import json
import os
import shutil
import xml.etree.ElementTree as ET
from typing import Sequence


def _place(src: str, dst: str, copy: bool):
    if os.path.exists(dst):
        return
    if copy:
        shutil.copyfile(src, dst)
    else:
        os.symlink(os.path.abspath(src), dst)


def coco_90_to_80_map() -> dict[int, int]:
    """COCO annotation category ids (1..90, gaps) -> contiguous 0..79
    (ref coco2fastvision.py:69-72 category remap)."""
    missing = {12, 26, 29, 30, 45, 66, 68, 69, 71, 83}
    mapping = {}
    idx = 0
    for cid in range(1, 91):
        if cid in missing:
            continue
        mapping[cid] = idx
        idx += 1
    return mapping


def coco_80_to_91_ids() -> list[int]:
    """The 80 contiguous model class indices -> original COCO annotation
    category ids (1..90 with gaps) — the inverse of `coco_90_to_80_map`,
    needed when emitting detections the official COCO evaluator
    (pycocotools) can score against instances_val2017.json."""
    return [cid for cid, _ in sorted(coco_90_to_80_map().items(),
                                     key=lambda kv: kv[1])]


def coco_to_fastvision(
    ann_json: str,
    images_dir: str,
    out_dir: str,
    split: str = "train",
    copy_images: bool = False,
) -> int:
    """COCO instances json -> fastvision layout. Returns image count."""
    with open(ann_json) as f:
        coco = json.load(f)
    cat_map = coco_90_to_80_map()
    img_out = os.path.join(out_dir, split, "images")
    lab_out = os.path.join(out_dir, split, "labels")
    os.makedirs(img_out, exist_ok=True)
    os.makedirs(lab_out, exist_ok=True)

    by_image: dict[int, list] = {}
    for ann in coco.get("annotations", []):
        if ann.get("iscrowd"):
            continue
        x, y, w, h = ann["bbox"]  # COCO xywh (top-left)
        cls = cat_map.get(ann["category_id"])
        if cls is None or w <= 0 or h <= 0:
            continue
        by_image.setdefault(ann["image_id"], []).append((cls, x, y, x + w, y + h))

    count = 0
    for info in coco["images"]:
        stem = os.path.splitext(info["file_name"])[0]
        src = os.path.join(images_dir, info["file_name"])
        if not os.path.exists(src):
            continue
        _place(src, os.path.join(img_out, info["file_name"]), copy_images)
        with open(os.path.join(lab_out, stem + ".txt"), "w") as f:
            for cls, x1, y1, x2, y2 in by_image.get(info["id"], []):
                f.write(f"{cls} {x1:.2f} {y1:.2f} {x2:.2f} {y2:.2f}\n")
        count += 1
    return count


VOC_CLASSES = (
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor",
)


def voc_to_fastvision(
    voc_root: str,
    out_dir: str,
    image_set: str = "train",
    year: str = "2012",
    split: str | None = None,
    copy_images: bool = False,
    classes: Sequence[str] = VOC_CLASSES,
) -> int:
    """VOC XML + ImageSets -> fastvision layout (ref voc2fastvision.py:113).

    voc_root points at `VOCdevkit/VOC<year>`.
    """
    split = split or image_set
    cls_idx = {name: i for i, name in enumerate(classes)}
    set_file = os.path.join(voc_root, "ImageSets", "Main", image_set + ".txt")
    with open(set_file) as f:
        ids = [line.split()[0] for line in f if line.strip()]

    img_out = os.path.join(out_dir, split, "images")
    lab_out = os.path.join(out_dir, split, "labels")
    os.makedirs(img_out, exist_ok=True)
    os.makedirs(lab_out, exist_ok=True)

    count = 0
    for stem in ids:
        src = os.path.join(voc_root, "JPEGImages", stem + ".jpg")
        xml_path = os.path.join(voc_root, "Annotations", stem + ".xml")
        if not (os.path.exists(src) and os.path.exists(xml_path)):
            continue
        rows = []
        root = ET.parse(xml_path).getroot()
        for obj in root.iter("object"):
            name = obj.findtext("name")
            difficult = obj.findtext("difficult")
            if name not in cls_idx or difficult == "1":
                continue
            bb = obj.find("bndbox")
            x1 = float(bb.findtext("xmin")) - 1  # VOC is 1-based
            y1 = float(bb.findtext("ymin")) - 1
            x2 = float(bb.findtext("xmax")) - 1
            y2 = float(bb.findtext("ymax")) - 1
            rows.append(f"{cls_idx[name]} {x1:.2f} {y1:.2f} {x2:.2f} {y2:.2f}")
        _place(src, os.path.join(img_out, stem + ".jpg"), copy_images)
        with open(os.path.join(lab_out, stem + ".txt"), "w") as f:
            f.write("\n".join(rows) + ("\n" if rows else ""))
        count += 1
    return count
