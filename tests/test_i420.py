"""I420 (YUV 4:2:0) device input path.

The jpeg->boxes pipeline can ship I420 planes instead of RGB (half the
host->device bytes; JPEG chroma is 4:2:0 already) and color-convert on
device (ops/image.py::i420_to_rgb). These tests pin the conversion to
cv2's YUV2RGB_I420 semantics and drive the Detector i420 path end-to-end.
"""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from fastvision_tpu.ops.image import i420_to_rgb, rgb_batch_to_i420  # noqa: E402


def _natural_batch(b=2, s=64, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (b, s // 8, s // 8, 3), np.uint8)
    return np.stack([cv2.resize(im, (s, s)) for im in base])  # smooth-ish


def test_rgb_batch_to_i420_layout_matches_cv2():
    batch = _natural_batch()
    y, u, v = rgb_batch_to_i420(batch)
    s = batch.shape[1]
    for i in range(len(batch)):
        yuv = cv2.cvtColor(batch[i], cv2.COLOR_RGB2YUV_I420)
        np.testing.assert_array_equal(y[i], yuv[:s])
        quarter = (s // 2) * (s // 2)
        chroma = yuv[s:].reshape(-1)
        np.testing.assert_array_equal(u[i], chroma[:quarter].reshape(s // 2, s // 2))
        np.testing.assert_array_equal(v[i], chroma[quarter:].reshape(s // 2, s // 2))


def test_i420_to_rgb_matches_cv2_inverse():
    batch = _natural_batch()
    y, u, v = rgb_batch_to_i420(batch)
    ours = np.asarray(i420_to_rgb(y, u, v)).round().clip(0, 255).astype(np.uint8)
    for i in range(len(batch)):
        s = batch.shape[1]
        yuv = cv2.cvtColor(batch[i], cv2.COLOR_RGB2YUV_I420)
        ref = cv2.cvtColor(yuv, cv2.COLOR_YUV2RGB_I420)
        # same BT.601 math; small coefficient-rounding differences only
        diff = np.abs(ours[i].astype(int) - ref.astype(int))
        assert diff.max() <= 4, diff.max()


def test_i420_roundtrip_close_to_original():
    batch = _natural_batch()
    y, u, v = rgb_batch_to_i420(batch)
    rec = np.asarray(i420_to_rgb(y, u, v))
    # chroma subsample + quantization: small average error on smooth content
    err = np.abs(rec - batch.astype(np.float32)).mean()
    assert err < 6.0, err


class _PixelHeads:
    """Stub whose objectness logit encodes mean(x): any input drift between
    the rgb and i420 paths shows up directly in the detection score."""

    def apply(self, variables, x, train=False):
        import jax.numpy as jnp

        b = x.shape[0]
        m = x.mean(axis=(1, 2, 3))  # normalized pixels in [0,1]
        heads = []
        for gs in (13, 26, 52):
            h = jnp.full((b, gs, gs, 3, 5 + 3), -12.0)
            if gs == 13:
                row = jnp.stack(
                    [jnp.zeros(b), jnp.zeros(b), jnp.zeros(b), jnp.zeros(b),
                     8.0 * m, jnp.full(b, 8.0), jnp.full(b, -12.0),
                     jnp.full(b, -12.0)], axis=-1)
                h = h.at[:, 6, 6, 0, :].set(row)
            heads.append(h)
        return heads


def test_detector_i420_path_matches_rgb_path():
    import jax.numpy as jnp

    from fastvision_tpu.infer import Detector
    from fastvision_tpu.ops import COCO_ANCHORS

    anchors = COCO_ANCHORS.reshape(3, 3, 2)[::-1].astype(np.float32)
    kw = dict(input_size=416, batch_size=2, dtype=jnp.float32, conf_thres=0.25)
    det_rgb = Detector(_PixelHeads(), {}, anchors, **kw)
    det_i420 = Detector(_PixelHeads(), {}, anchors, input_format="i420", **kw)

    img = _natural_batch(1, 500, seed=3)[0]
    r_rgb = det_rgb.predict_image(img)
    r_i420 = det_i420.predict_image(img)
    assert len(r_rgb["boxes"]) == len(r_i420["boxes"]) == 1
    np.testing.assert_allclose(r_rgb["boxes"], r_i420["boxes"], atol=1e-3)
    # score sees mean(x); i420 roundtrip shifts pixels by ~1 LSB on average
    assert abs(float(r_rgb["scores"][0]) - float(r_i420["scores"][0])) < 0.02


def test_packed_i420_matches_plane_version():
    from fastvision_tpu.ops.image import i420_packed_to_rgb, rgb_batch_to_i420_packed

    batch = _natural_batch(2, 64)
    packed = rgb_batch_to_i420_packed(batch)
    assert packed.shape == (2, 96, 64)
    via_packed = np.asarray(i420_packed_to_rgb(packed))
    y, u, v = rgb_batch_to_i420(batch)
    via_planes = np.asarray(i420_to_rgb(y, u, v))
    np.testing.assert_allclose(via_packed, via_planes, atol=1e-5)


def test_normalize_images_decodes_packed_i420():
    from fastvision_tpu.data.pipeline import normalize_images
    from fastvision_tpu.ops.image import rgb_batch_to_i420_packed

    batch = _natural_batch(2, 64)
    rgb_n = np.asarray(normalize_images(batch))
    i420_n = np.asarray(normalize_images(rgb_batch_to_i420_packed(batch)))
    assert i420_n.shape == rgb_n.shape
    # I420 roundtrip error only (chroma subsample + quantization), in [0,1]
    assert np.abs(i420_n - rgb_n).mean() < 6.0 / 255.0


def test_loader_emit_i420(tmp_path):
    from fastvision_tpu.data import DetectionDataset
    from fastvision_tpu.data.pipeline import DetectionLoader

    root = tmp_path / "ds"
    (root / "val" / "images").mkdir(parents=True)
    (root / "val" / "labels").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(3):
        cv2.imwrite(str(root / "val" / "images" / f"{i}.jpg"),
                    rng.integers(0, 255, (50, 70, 3), np.uint8))
        (root / "val" / "labels" / f"{i}.txt").write_text("1 5 5 30 40\n")
    ds = DetectionDataset(str(root), "val")
    kw = dict(input_size=64, batch_size=2, max_boxes=4, train=False,
              drop_last=False)
    b_rgb = next(iter(DetectionLoader(ds, **kw)))
    b_i420 = next(iter(DetectionLoader(ds, emit="i420", **kw)))
    assert b_i420["images"].shape == (2, 96, 64)
    np.testing.assert_array_equal(b_rgb["labels"], b_i420["labels"])
    with pytest.raises(ValueError):
        DetectionLoader(ds, emit="nv12", **kw)


def test_i420_rejects_odd_dims():
    with pytest.raises(ValueError):
        rgb_batch_to_i420(np.zeros((1, 63, 64, 3), np.uint8))


def test_i420_device_letterbox_exclusive():
    import jax
    import jax.numpy as jnp

    from fastvision_tpu.infer import Detector
    from fastvision_tpu.ops import COCO_ANCHORS

    anchors = COCO_ANCHORS.reshape(3, 3, 2)[::-1].astype(np.float32)
    with pytest.raises(ValueError):
        Detector(_PixelHeads(), {}, anchors, input_size=416, batch_size=1,
                 input_format="i420", device_letterbox=True)
