"""IoU family tests: hand-computed values + corrected-sign properties.

The reference had sign bugs (GIOU_batch/DIOU added their penalties,
SURVEY.md §2.7); these tests pin the correct behavior.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from fastvision_tpu.ops import box_iou, box_iou_matrix, wh_iou, wh_iou_matrix


A = jnp.array([[0.0, 0.0, 10.0, 10.0]])
B = jnp.array([[5.0, 5.0, 15.0, 15.0]])  # overlap 25, union 175
C = jnp.array([[20.0, 20.0, 30.0, 30.0]])  # disjoint from A


def test_iou_hand_value():
    np.testing.assert_allclose(float(box_iou(A, B)[0]), 25 / 175, rtol=1e-5)
    np.testing.assert_allclose(float(box_iou(A, A)[0]), 1.0, rtol=1e-5)
    np.testing.assert_allclose(float(box_iou(A, C)[0]), 0.0, atol=1e-7)


def test_giou_hand_value():
    # enclosing box of A,B is 15x15=225; GIoU = IoU - (C - U)/C
    expected = 25 / 175 - (225 - 175) / 225
    np.testing.assert_allclose(float(box_iou(A, B, kind="giou")[0]), expected, rtol=1e-4)


def test_diou_penalty_subtracted():
    # disjoint boxes: DIoU must be NEGATIVE (reference bug made it positive)
    val = float(box_iou(A, C, kind="diou")[0])
    assert val < 0
    # identical boxes: zero center distance -> DIoU == IoU == 1
    np.testing.assert_allclose(float(box_iou(A, A, kind="diou")[0]), 1.0, rtol=1e-5)


def test_ciou_bounds_and_identity():
    np.testing.assert_allclose(float(box_iou(A, A, kind="ciou")[0]), 1.0, rtol=1e-5)
    v = float(box_iou(A, B, kind="ciou")[0])
    assert -1.0 <= v <= 25 / 175  # ciou <= iou always


@pytest.mark.parametrize("kind", ["iou", "giou", "diou", "ciou"])
def test_matrix_matches_pairwise(kind, rng):
    b1 = rng.uniform(0, 50, (7, 4)).astype(np.float32)
    b2 = rng.uniform(0, 50, (5, 4)).astype(np.float32)
    b1[:, 2:] = b1[:, :2] + np.abs(b1[:, 2:]) + 1
    b2[:, 2:] = b2[:, :2] + np.abs(b2[:, 2:]) + 1
    mat = np.asarray(box_iou_matrix(b1, b2, kind=kind))
    assert mat.shape == (7, 5)
    for i in range(7):
        for j in range(5):
            pij = float(box_iou(b1[i : i + 1], b2[j : j + 1], kind=kind)[0])
            np.testing.assert_allclose(mat[i, j], pij, rtol=1e-4, atol=1e-5)


def test_xywh_format():
    a_xywh = jnp.array([[5.0, 5.0, 10.0, 10.0]])  # == A in xyxy
    b_xywh = jnp.array([[10.0, 10.0, 10.0, 10.0]])  # == B
    np.testing.assert_allclose(
        float(box_iou(a_xywh, b_xywh, fmt="xywh")[0]), 25 / 175, rtol=1e-5
    )


def test_wh_iou():
    np.testing.assert_allclose(float(wh_iou(jnp.array([4.0, 4.0]), jnp.array([2.0, 2.0]))), 0.25, rtol=1e-5)
    m = np.asarray(wh_iou_matrix(jnp.array([[4.0, 4.0], [2.0, 2.0]]), jnp.array([[2.0, 2.0]])))
    np.testing.assert_allclose(m, [[0.25], [1.0]], rtol=1e-5)


def test_grad_flows_through_ciou(rng):
    import jax

    def loss(b):
        return jnp.sum(1.0 - box_iou(b, B, kind="ciou"))

    g = jax.grad(loss)(A)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0
