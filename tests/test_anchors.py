"""Anchor k-means tests."""
import numpy as np

from fastvision_tpu.ops import AnchorGenerator, kmeans_anchors


def three_cluster_wh(rng, per=100):
    c1 = rng.normal([10, 10], 0.5, (per, 2))
    c2 = rng.normal([50, 40], 1.0, (per, 2))
    c3 = rng.normal([120, 100], 2.0, (per, 2))
    return np.concatenate([c1, c2, c3]).astype(np.float32)


def test_kmeans_finds_clusters(rng):
    wh = three_cluster_wh(rng)
    centers, assign = kmeans_anchors(wh, k=3, iters=50, seed=0)
    assert centers.shape == (3, 2)
    # area-ascending order
    areas = centers[:, 0] * centers[:, 1]
    assert (np.diff(areas) > 0).all()
    np.testing.assert_allclose(centers[0], [10, 10], atol=1.0)
    np.testing.assert_allclose(centers[1], [50, 40], atol=2.0)
    np.testing.assert_allclose(centers[2], [120, 100], atol=4.0)
    assert assign.shape == (300,)


def test_kmeans_deterministic(rng):
    wh = three_cluster_wh(rng)
    c1, _ = kmeans_anchors(wh, k=3, seed=7)
    c2, _ = kmeans_anchors(wh, k=3, seed=7)
    np.testing.assert_array_equal(c1, c2)


def test_generator_cache_roundtrip(tmp_path, rng):
    wh = three_cluster_wh(rng)
    gen = AnchorGenerator(k=3, iters=20, cache_dir=str(tmp_path))
    a1 = gen.get_anchors(wh=wh)
    gen2 = AnchorGenerator(k=3, cache_dir=str(tmp_path), use_cache=True)
    a2 = gen2.get_anchors()
    np.testing.assert_allclose(a1, a2, rtol=1e-6)


def test_generator_scans_datasets(rng):
    # dataset yields (image, labels[cls,x1,y1,x2,y2])
    labels = np.zeros((300, 5), np.float32)
    labels[:, 1:3] = 0
    labels[:, 3:5] = three_cluster_wh(rng)
    ds = [(None, labels[i : i + 1]) for i in range(300)]
    gen = AnchorGenerator(datasets=[ds], k=3, iters=30, cache_dir="/tmp/fv_anchor_test")
    anchors = gen.get_anchors()
    assert anchors.shape == (3, 2)


def test_kmeanspp_init_covers_clusters(rng):
    """k-means++ seeding finds all three scale clusters (with k == 3 a
    uniform draw often seeds two in one cluster; ++ spreads by distance)."""
    wh = three_cluster_wh(rng)
    centers, assign = kmeans_anchors(wh, k=3, iters=30, init="++")
    # one center per cluster: areas separated by > 2x
    areas = centers[:, 0] * centers[:, 1]
    assert areas[1] > 2 * areas[0] and areas[2] > 2 * areas[1]
    assert len(np.unique(assign)) == 3


def test_kmeans_bad_init_rejected(rng):
    with np.testing.assert_raises(ValueError):
        kmeans_anchors(three_cluster_wh(rng), k=3, init="bogus")
