"""Reduced JPEG decode (libjpeg DCT-domain scaling) and its coordinate
bookkeeping: jpeg_dimensions header parse, imread_rgb_scaled factor choice,
per-axis scale propagation through preprocess/scale_coords, and the
DetectionDataset.decode_size label rescale."""
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from fastvision_tpu.data.dataset import (  # noqa: E402
    DetectionDataset,
    imread_rgb_scaled,
    jpeg_dimensions,
)
from fastvision_tpu.infer.postprocess import scale_coords  # noqa: E402
from fastvision_tpu.infer.preprocess import preprocess_image  # noqa: E402


def _write_jpeg(path, h, w, quality=95):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (h, w, 3), np.uint8)
    img = cv2.GaussianBlur(img, (5, 5), 0)
    cv2.imwrite(str(path), img, [cv2.IMWRITE_JPEG_QUALITY, quality])
    return img


def test_jpeg_dimensions(tmp_path):
    p = tmp_path / "a.jpg"
    _write_jpeg(p, 123, 457)
    assert jpeg_dimensions(str(p)) == (123, 457)


def test_jpeg_dimensions_non_jpeg(tmp_path):
    p = tmp_path / "a.png"
    cv2.imwrite(str(p), np.zeros((8, 8, 3), np.uint8))
    assert jpeg_dimensions(str(p)) is None


@pytest.mark.parametrize(
    "hw,target,factor",
    [((1700, 2400), 288, 8), ((1200, 1700), 416, 4), ((900, 1300), 416, 2),
     ((640, 480), 416, 1)],
)
def test_imread_rgb_scaled_factor(tmp_path, hw, target, factor):
    p = tmp_path / "img.jpg"
    _write_jpeg(p, *hw)
    img, orig = imread_rgb_scaled(str(p), target)
    assert orig == hw
    assert img.shape[0] == -(-hw[0] // factor)  # libjpeg ceil division
    assert img.shape[1] == -(-hw[1] // factor)
    # reduced decode still >= target on the long side (no upscaling later)
    assert max(img.shape[:2]) >= target


def test_imread_rgb_scaled_pixels_close(tmp_path):
    """Reduced decode approximates full decode + area resize."""
    p = tmp_path / "img.jpg"
    _write_jpeg(p, 832, 832)
    reduced, _ = imread_rgb_scaled(str(p), 416)
    full = cv2.cvtColor(cv2.imread(str(p)), cv2.COLOR_BGR2RGB)
    ref = cv2.resize(full, (416, 416), interpolation=cv2.INTER_AREA)
    diff = np.abs(reduced.astype(np.int16) - ref.astype(np.int16))
    assert np.mean(diff) < 8  # DCT scaling vs area resize: close, not equal


def test_preprocess_scale_roundtrip(tmp_path):
    """A box in true original pixels survives forward-map + scale_coords."""
    p = tmp_path / "img.jpg"
    _write_jpeg(p, 1000, 1500)
    out, meta = preprocess_image(str(p), input_size=416, fast_decode=True)
    assert out.shape == (416, 416, 3)
    assert meta["orig_hw"] == (1000, 1500)
    sx, sy = meta["scale"]
    px, py = meta["pad"]
    box = np.array([300.0, 200.0, 900.0, 800.0])  # orig pixels
    fwd = np.array([box[0] * sx + px, box[1] * sy + py,
                    box[2] * sx + px, box[3] * sy + py])
    back = scale_coords(fwd[None], meta["scale"], meta["pad"], meta["orig_hw"])[0]
    np.testing.assert_allclose(back, box, atol=1e-3)
    # and the mapping lands inside the letterboxed content
    assert 0 <= fwd[0] and fwd[2] <= 416


def test_preprocess_fast_decode_off_matches_old(tmp_path):
    p = tmp_path / "img.jpg"
    _write_jpeg(p, 640, 480)
    out_a, meta_a = preprocess_image(str(p), 416, fast_decode=False)
    out_b, meta_b = preprocess_image(str(p), 416, fast_decode=True)
    # 640 < 2*416: no reduction kicks in, identical results, scalar scale
    assert np.isscalar(meta_a["scale"]) and np.isscalar(meta_b["scale"])
    np.testing.assert_array_equal(out_a, out_b)


def test_dataset_decode_size_rescales_labels(tmp_path):
    root = tmp_path / "ds"
    img_dir = root / "val" / "images"
    lbl_dir = root / "val" / "labels"
    os.makedirs(img_dir)
    os.makedirs(lbl_dir)
    _write_jpeg(img_dir / "x.jpg", 1000, 2000)
    (lbl_dir / "x.txt").write_text("1 200 100 1800 900\n")

    plain = DetectionDataset(str(root), "val")
    img0, lab0, _ = plain[0]
    assert img0.shape[:2] == (1000, 2000)
    np.testing.assert_allclose(lab0[0], [1, 200, 100, 1800, 900])

    fast = DetectionDataset(str(root), "val", decode_size=416)
    img1, lab1, _ = fast[0]
    assert img1.shape[:2] == (250, 500)  # 2000 >= 4*416 -> factor 4
    np.testing.assert_allclose(lab1[0], [1, 50, 25, 450, 225])


def test_scale_coords_scalar_unchanged():
    boxes = np.array([[10.0, 20.0, 110.0, 220.0]])
    out = scale_coords(boxes, 0.5, (5, 7), (600, 400))
    np.testing.assert_allclose(out, [[10.0, 26.0, 210.0, 426.0]])
