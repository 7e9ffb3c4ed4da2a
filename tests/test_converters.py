"""Converter tests: COCO json / VOC xml -> fastvision on-disk format."""
import json
import os

import numpy as np
import pytest

from fastvision_tpu.data import (
    DetectionDataset,
    coco_80_to_91_ids,
    coco_90_to_80_map,
    coco_to_fastvision,
    voc_to_fastvision,
)


def test_coco_90_to_80_map():
    m = coco_90_to_80_map()
    assert len(m) == 80
    assert m[1] == 0  # person
    assert m[90] == 79  # toothbrush
    assert 12 not in m  # gap id


def test_coco_80_to_91_ids_inverts_the_map():
    ids = coco_80_to_91_ids()
    m = coco_90_to_80_map()
    assert len(ids) == 80
    assert ids[0] == 1 and ids[79] == 90
    assert all(m[cid] == i for i, cid in enumerate(ids))


@pytest.fixture()
def coco_fixture(tmp_path):
    import cv2

    img_dir = tmp_path / "coco_images"
    img_dir.mkdir()
    for i in range(2):
        cv2.imwrite(str(img_dir / f"img{i}.jpg"), np.zeros((50, 60, 3), np.uint8))
    ann = {
        "images": [
            {"id": 1, "file_name": "img0.jpg", "height": 50, "width": 60},
            {"id": 2, "file_name": "img1.jpg", "height": 50, "width": 60},
        ],
        "annotations": [
            {"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 15], "iscrowd": 0},
            {"image_id": 1, "category_id": 13, "bbox": [5, 5, 10, 10], "iscrowd": 0},
            {"image_id": 1, "category_id": 1, "bbox": [0, 0, 5, 5], "iscrowd": 1},  # skip
            {"image_id": 2, "category_id": 90, "bbox": [1, 2, 3, 4], "iscrowd": 0},
        ],
    }
    ann_path = tmp_path / "instances.json"
    ann_path.write_text(json.dumps(ann))
    return str(ann_path), str(img_dir), str(tmp_path / "out")


def test_coco_to_fastvision(coco_fixture):
    ann, imgs, out = coco_fixture
    n = coco_to_fastvision(ann, imgs, out, split="val", copy_images=True)
    assert n == 2
    ds = DetectionDataset(out, "val")
    assert len(ds) == 2
    _, labels, _ = ds[0]
    assert labels.shape == (2, 5)
    # category 1 -> 0, category 13 -> 11 (after gap at 12)
    assert set(labels[:, 0].astype(int)) == {0, 11}
    # bbox xywh -> xyxy
    row = labels[labels[:, 0] == 0][0]
    np.testing.assert_allclose(row[1:], [10, 10, 30, 25])
    _, labels2, _ = ds[1]
    assert int(labels2[0, 0]) == 79


@pytest.fixture()
def voc_fixture(tmp_path):
    import cv2

    root = tmp_path / "VOC2012"
    (root / "JPEGImages").mkdir(parents=True)
    (root / "Annotations").mkdir()
    (root / "ImageSets" / "Main").mkdir(parents=True)
    cv2.imwrite(str(root / "JPEGImages" / "a.jpg"), np.zeros((40, 40, 3), np.uint8))
    (root / "Annotations" / "a.xml").write_text(
        """<annotation><object><name>dog</name><difficult>0</difficult>
        <bndbox><xmin>11</xmin><ymin>21</ymin><xmax>31</xmax><ymax>39</ymax></bndbox></object>
        <object><name>person</name><difficult>1</difficult>
        <bndbox><xmin>1</xmin><ymin>1</ymin><xmax>9</xmax><ymax>9</ymax></bndbox></object>
        </annotation>"""
    )
    (root / "ImageSets" / "Main" / "train.txt").write_text("a\n")
    return str(root), str(tmp_path / "out")


def test_voc_to_fastvision(voc_fixture):
    root, out = voc_fixture
    n = voc_to_fastvision(root, out, image_set="train", copy_images=True)
    assert n == 1
    ds = DetectionDataset(out, "train")
    _, labels, _ = ds[0]
    assert labels.shape == (1, 5)  # difficult object dropped
    assert int(labels[0, 0]) == 11  # dog
    np.testing.assert_allclose(labels[0, 1:], [10, 20, 30, 38])  # 1-based -> 0-based
