"""Unit tests for box conversions, grid, one-hot (SURVEY.md §4 test plan)."""
import jax.numpy as jnp
import numpy as np

from fastvision_tpu.ops import (
    box_area,
    clip_boxes,
    grid,
    one_hot,
    xywh2xyxy,
    xywhn2xyxy,
    xyxy2xywh,
    xyxy2xywhn,
)


def test_xywh2xyxy_hand_values():
    xywh = jnp.array([[10.0, 20.0, 4.0, 6.0]])
    out = np.asarray(xywh2xyxy(xywh))
    np.testing.assert_allclose(out, [[8.0, 17.0, 12.0, 23.0]])


def test_xyxy2xywh_roundtrip(rng):
    xyxy = jnp.asarray(rng.uniform(0, 100, (50, 4)).astype(np.float32))
    # ensure valid boxes x2>x1, y2>y1
    x1 = jnp.minimum(xyxy[:, 0], xyxy[:, 2])
    x2 = jnp.maximum(xyxy[:, 0], xyxy[:, 2])
    y1 = jnp.minimum(xyxy[:, 1], xyxy[:, 3])
    y2 = jnp.maximum(xyxy[:, 1], xyxy[:, 3])
    xyxy = jnp.stack([x1, y1, x2, y2], axis=-1)
    back = xywh2xyxy(xyxy2xywh(xyxy))
    np.testing.assert_allclose(np.asarray(back), np.asarray(xyxy), rtol=1e-5, atol=1e-4)


def test_xyxy2xywhn_normalizes():
    xyxy = jnp.array([[0.0, 0.0, 100.0, 50.0]])
    out = np.asarray(xyxy2xywhn(xyxy, height=100, width=200))
    np.testing.assert_allclose(out, [[0.25, 0.25, 0.5, 0.5]])
    back = np.asarray(xywhn2xyxy(jnp.asarray(out), height=100, width=200))
    np.testing.assert_allclose(back, [[0.0, 0.0, 100.0, 50.0]], atol=1e-5)


def test_batched_leading_dims():
    xywh = jnp.ones((2, 3, 4))
    assert xywh2xyxy(xywh).shape == (2, 3, 4)


def test_clip_and_area():
    xyxy = jnp.array([[-5.0, -5.0, 15.0, 10.0]])
    clipped = np.asarray(clip_boxes(xyxy, height=8, width=12))
    np.testing.assert_allclose(clipped, [[0.0, 0.0, 12.0, 8.0]])
    assert float(box_area(jnp.asarray(clipped))[0]) == 96.0


def test_grid_xy_yx():
    g = np.asarray(grid(2, 3, mode="xy"))
    assert g.shape == (2, 3, 2)
    # cell [row=1, col=2] has x offset 2, y offset 1
    np.testing.assert_allclose(g[1, 2], [2.0, 1.0])
    gyx = np.asarray(grid(2, 3, mode="yx"))
    np.testing.assert_allclose(gyx[1, 2], [1.0, 2.0])


def test_one_hot():
    oh = np.asarray(one_hot(jnp.array([0, 2]), 3))
    np.testing.assert_allclose(oh, [[1, 0, 0], [0, 0, 1]])
