"""Native letterbox kernel: parity vs the Python/cv2 path + perf sanity."""
import numpy as np
import pytest

from fastvision_tpu import native
from fastvision_tpu.data.dataset import letterbox


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native library unavailable")
    return True


def test_native_letterbox_matches_python(lib_ok, rng):
    images = [
        rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
        for h, w in [(100, 200), (64, 64), (31, 97), (417, 233)]
    ]
    batch, scales, pads = native.letterbox_batch(images, 96)
    assert batch.shape == (4, 96, 96, 3)
    for i, im in enumerate(images):
        want, scale, (px, py) = letterbox(im, 96)
        assert abs(scales[i] - scale) < 1e-6
        assert (pads[i] == [px, py]).all()
        # bilinear implementations differ by at most ~1 LSB of rounding
        diff = np.abs(batch[i].astype(int) - want.astype(int))
        assert diff.mean() < 1.0, diff.mean()
        assert (diff <= 2).mean() > 0.99


def test_native_letterbox_pad_value(lib_ok, rng):
    img = rng.integers(0, 255, (50, 100, 3)).astype(np.uint8)
    batch, _, pads = native.letterbox_batch([img], 64, pad_value=7)
    assert batch[0, 0, 0, 0] == 7  # top pad row
    assert pads[0, 0] == 0 and pads[0, 1] == (64 - 32) // 2


def test_native_rejects_bad_input(lib_ok):
    with pytest.raises(ValueError):
        native.letterbox_batch([np.zeros((10, 10), np.uint8)], 32)


def test_native_threads_consistent(lib_ok, rng):
    images = [rng.integers(0, 255, (80, 120, 3)).astype(np.uint8) for _ in range(8)]
    a, _, _ = native.letterbox_batch(images, 64, num_threads=1)
    b, _, _ = native.letterbox_batch(images, 64, num_threads=4)
    np.testing.assert_array_equal(a, b)
