"""Pallas NMS kernel: exact agreement with the XLA suppression mask."""
import jax.numpy as jnp
import numpy as np

from fastvision_tpu.ops.nms import suppression_mask
from fastvision_tpu.ops.nms_pallas import suppression_mask_pallas


def sorted_random_boxes(rng, n):
    xy = rng.uniform(0, 200, (n, 2))
    wh = rng.uniform(5, 60, (n, 2))
    boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    scores = np.sort(rng.uniform(0, 1, n).astype(np.float32))[::-1].copy()
    return boxes, scores


def test_pallas_matches_xla(rng):
    for n in (64, 128, 256):
        boxes, scores = sorted_random_boxes(rng, n)
        want = np.asarray(suppression_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
        got = np.asarray(
            suppression_mask_pallas(jnp.asarray(boxes), jnp.asarray(scores), 0.5)
        )
        np.testing.assert_array_equal(got, want)


def test_pallas_respects_invalid(rng):
    boxes, scores = sorted_random_boxes(rng, 64)
    scores[32:] = -np.inf
    got = np.asarray(
        suppression_mask_pallas(jnp.asarray(boxes), jnp.asarray(scores), 0.5)
    )
    assert not got[32:].any()
    want = np.asarray(suppression_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
    np.testing.assert_array_equal(got, want)
