"""Detector(device_letterbox=True) end-to-end coordinate chain == host path.

Uses a stub model emitting constant head logits (input-independent), so both
paths produce the same letterbox-space detection and the test isolates the
geometry chain: pack_canvas (+ optional reduced decode / canvas pre-shrink)
-> on-device letterbox -> NMS -> per-axis unscale to TRUE original pixels.
"""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
import jax.numpy as jnp  # noqa: E402

from fastvision_tpu.infer import Detector  # noqa: E402


class _ConstHeads:
    """YOLO-shaped heads with one strong center detection at stride 32."""

    def apply(self, variables, x, train=False):
        b = x.shape[0]
        heads = []
        for gs in (13, 26, 52):
            h = jnp.full((b, gs, gs, 3, 5 + 3), -12.0)
            if gs == 13:
                h = h.at[:, 6, 6, 0, :].set(
                    jnp.asarray([0.0, 0.0, 0.0, 0.0, 8.0, 8.0, -12.0, -12.0])
                )
            heads.append(h)
        return heads


ANCHORS = jnp.asarray(
    [[[116, 90], [156, 198], [373, 326]],
     [[30, 61], [62, 45], [59, 119]],
     [[10, 13], [16, 30], [33, 23]]],
    jnp.float32,
)


def _detectors():
    kw = dict(anchors=ANCHORS, input_size=416, conf_thres=0.25,
              batch_size=2, dtype=jnp.float32)
    host = Detector(_ConstHeads(), {}, **kw)
    dev = Detector(_ConstHeads(), {}, device_letterbox=True, **kw)
    return host, dev


def test_canvas_path_matches_host_coords(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (480, 640, 3), np.uint8)
    host, dev = _detectors()
    rh = host.predict_image(img)
    rd = dev.predict_image(img)
    assert len(rh["boxes"]) == len(rd["boxes"]) == 1
    np.testing.assert_allclose(rd["boxes"], rh["boxes"], atol=1e-2)
    np.testing.assert_allclose(rd["scores"], rh["scores"], atol=1e-5)
    assert rd["classes"][0] == rh["classes"][0]


def test_canvas_path_large_jpeg_reduced_decode(tmp_path):
    """1500x1000 JPEG: host path uses reduced decode, canvas path adds a
    pre-shrink to the 640 canvas — final original-pixel boxes must agree."""
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (1000, 1500, 3), np.uint8)
    p = str(tmp_path / "big.jpg")
    cv2.imwrite(p, img, [cv2.IMWRITE_JPEG_QUALITY, 95])
    host, dev = _detectors()
    rh = host.predict_image(p)
    rd = dev.predict_image(p)
    assert len(rh["boxes"]) == len(rd["boxes"]) == 1
    # both must land on the same true-original-pixel box (geometry chains
    # differ -> allow ~2px)
    np.testing.assert_allclose(rd["boxes"], rh["boxes"], atol=2.0)
    b = rd["boxes"][0]
    assert 0 <= b[0] < b[2] <= 1500 and 0 <= b[1] < b[3] <= 1000


def test_canvas_path_partial_batch():
    rng = np.random.default_rng(2)
    imgs = [rng.integers(0, 255, (300, 400, 3), np.uint8)]
    _, dev = _detectors()
    out = dev.predict_batch(imgs)  # n=1 < batch_size=2: pads internally
    assert len(out) == 1 and len(out[0]["boxes"]) == 1
