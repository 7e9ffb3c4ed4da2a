"""Parity fixture builder (tools/make_parity_fixture.py): COCO-subset ->
fastvision layout + ready config, and end-to-end ultralytics-checkpoint
validation against the EXECUTED reference torch model — the turnkey path
that reproduces metric.txt's 0.5136@640 the day real data exists
(docs/PARITY.md 'Real-data mAP parity')."""
import json
import os
import sys

import numpy as np
import pytest
import yaml

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
sys.path.insert(0, "/root/reference/demos/yolov3_u")


def _tiny_coco(root, n=4):
    import cv2

    img_dir = os.path.join(root, "imgs")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    images, anns = [], []
    for i in range(n):
        name = f"{i:012d}.jpg"
        cv2.imwrite(os.path.join(img_dir, name),
                    rng.integers(0, 255, (120, 160, 3), np.uint8))
        images.append({"id": i + 1, "file_name": name, "height": 120, "width": 160})
        anns.append({"id": 10 + i, "image_id": i + 1, "category_id": 1,
                     "bbox": [10, 10, 60, 50], "iscrowd": 0})
        # category 90 maps to class 79 (coco 90->80 remap)
        anns.append({"id": 100 + i, "image_id": i + 1, "category_id": 90,
                     "bbox": [80, 40, 40, 60], "iscrowd": 0})
    ann_path = os.path.join(root, "instances.json")
    with open(ann_path, "w") as f:
        json.dump({"images": images, "annotations": anns}, f)
    return ann_path, img_dir


def test_build_fixture_layout_and_config(tmp_path):
    from make_parity_fixture import build_fixture

    ann, imgs = _tiny_coco(str(tmp_path))
    out = str(tmp_path / "fv")
    cfg_path = build_fixture(ann, imgs, out, subset=3)
    assert sorted(os.listdir(os.path.join(out, "val", "images")))[0].endswith(".jpg")
    assert len(os.listdir(os.path.join(out, "val", "labels"))) == 3  # subset
    lab = open(os.path.join(out, "val", "labels", "000000000001.txt")).read()
    rows = [l.split() for l in lab.strip().splitlines()]
    assert [r[0] for r in rows] == ["0", "79"]  # 90->80 remap applied
    cfg = yaml.safe_load(open(cfg_path))
    assert cfg["model"]["scale_anchors_with_input"] is False
    assert cfg["data"]["num_classes"] == 80 and cfg["data"]["input_size"] == 640
    assert cfg["nms"]["conf_thres"] == 0.25 and cfg["nms"]["iou_thres"] == 0.45
    # the generated config drives the real CLI loader path
    from fastvision_tpu.core.config import Config, from_yaml

    loaded = from_yaml(Config, cfg_path)
    assert loaded.data.data_root == out


@pytest.mark.slow
def test_validate_ckpt_end_to_end(tmp_path):
    """A reference-format 80-class torch checkpoint round-trips through
    validate_ckpt: import (all tensors land) + smoke eval produce finite
    results. This is the exact code path the real yolov3_u.pt will take."""
    torch = pytest.importorskip("torch")
    from make_parity_fixture import build_fixture, validate_ckpt
    from models.yolov3 import YoloV3  # the reference model, executed

    ann, imgs = _tiny_coco(str(tmp_path), n=2)
    out = str(tmp_path / "fv")
    cfg_path = build_fixture(ann, imgs, out, subset=None)

    torch.manual_seed(0)
    anchors = tuple(torch.ones(3, 2) for _ in range(3))
    model = YoloV3(num_classes=80, anchors=anchors)
    ckpt = str(tmp_path / "yolov3_ref.pt")
    torch.save(model.state_dict(), ckpt)
    validate_ckpt(ckpt, out, cfg_path)  # raises on unmatched keys/non-finite
