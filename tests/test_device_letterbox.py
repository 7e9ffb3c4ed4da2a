"""On-device letterbox (ops/image.py) == host cv2 letterbox, plus the flip
helpers. The device path is two MXU matmuls with bilinear weight matrices;
cv2 uses fixed-point bilinear — allow +-2/255 per pixel."""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fastvision_tpu.data.dataset import letterbox  # noqa: E402
from fastvision_tpu.ops.image import (  # noqa: E402
    hflip_boxes_xywhn,
    hflip_images,
    letterbox_batch,
    pack_canvas,
)


@pytest.mark.parametrize("hw", [(480, 640), (640, 480), (333, 217), (416, 416)])
def test_device_letterbox_matches_host(hw):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (*hw, 3), np.uint8)
    img = cv2.GaussianBlur(img, (3, 3), 0)

    host, h_scale, (h_px, h_py) = letterbox(img, 416)

    canvas, sizes = pack_canvas([img], hmax=640, wmax=640)
    out, scales, pads = jax.jit(
        lambda c, s: letterbox_batch(c, s, 416)
    )(canvas, sizes)
    dev = np.asarray(out[0])

    assert pads[0, 0] == h_px and pads[0, 1] == h_py
    # device scale is per-axis (nw/w, nh/h); host returns S/max(h,w) —
    # equal up to the round() of nh/nw
    nh, nw = round(hw[0] * h_scale), round(hw[1] * h_scale)
    np.testing.assert_allclose(np.asarray(scales[0]), [nw / hw[1], nh / hw[0]],
                               rtol=1e-6)
    diff = np.abs(dev - host.astype(np.float32))
    assert diff.max() <= 2.0 + 1e-3, f"max pixel diff {diff.max()}"
    # pad region exact
    pad_mask = np.ones((416, 416), bool)
    pad_mask[h_py : h_py + nh, h_px : h_px + nw] = False
    assert np.all(dev[pad_mask] == 114.0)


def test_device_letterbox_batch_mixed_sizes():
    rng = np.random.default_rng(1)
    imgs = [rng.integers(0, 255, (h, w, 3), np.uint8)
            for h, w in ((480, 640), (320, 240), (600, 600))]
    canvas, sizes = pack_canvas(imgs)
    out, scales, pads = letterbox_batch(jnp.asarray(canvas), jnp.asarray(sizes), 320)
    assert out.shape == (3, 320, 320, 3)
    for i, img in enumerate(imgs):
        host, _, _ = letterbox(img, 320)
        assert np.abs(np.asarray(out[i]) - host.astype(np.float32)).max() <= 2.0 + 1e-3


def test_pack_canvas_oversized_preshrink():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (1000, 1500, 3), np.uint8)
    canvas, sizes = pack_canvas([img], hmax=640, wmax=640)
    assert canvas.shape == (1, 640, 640, 3)
    h, w = sizes[0]
    assert h <= 640 and w <= 640 and w / h == pytest.approx(1.5, rel=0.01)


def test_hflip_roundtrip():
    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.integers(0, 255, (2, 8, 8, 3), np.uint8))
    assert np.array_equal(hflip_images(hflip_images(imgs)), imgs)
    labels = jnp.asarray([[[0, 0.2, 0.3, 0.1, 0.1], [-1, 0, 0, 0, 0]]], jnp.float32)
    flipped = hflip_boxes_xywhn(labels)
    np.testing.assert_allclose(flipped[0, 0], [0, 0.8, 0.3, 0.1, 0.1])
    np.testing.assert_allclose(flipped[0, 1], [-1, 0, 0, 0, 0])  # pad row kept
    np.testing.assert_allclose(hflip_boxes_xywhn(flipped), labels)
