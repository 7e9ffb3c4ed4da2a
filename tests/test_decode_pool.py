"""DecodePool (process-parallel host decode) tests: ordering, reuse,
error propagation, and — the core contract — batch-identical output across
serial / thread / process loader backends (per-sample RNG determinism)."""
import os

import numpy as np
import pytest

from fastvision_tpu.data.decode_pool import DecodePool


def _double(item):
    i = int(item)
    return np.full((4, 4, 3), i % 251, np.uint8), i * 2


def test_pool_ordered_results():
    pool = DecodePool(_double, num_workers=2, slot_shape=(4, 4, 3))
    try:
        outs = list(pool.imap(range(37)))
        assert [aux for _, aux in outs] == [i * 2 for i in range(37)]
        # note: views from earlier iterations are recycled — only check
        # the aux ordering plus a fresh pass for content
        for i, (view, _aux) in enumerate(pool.imap(range(5))):
            assert view.shape == (4, 4, 3)
            assert int(view[0, 0, 0]) == i % 251
    finally:
        pool.close()


def test_pool_serial_fallback():
    pool = DecodePool(_double, num_workers=0, slot_shape=(4, 4, 3))
    outs = list(pool.imap(range(5)))
    assert [aux for _, aux in outs] == [0, 2, 4, 6, 8]


def _sometimes_fail(item):
    if int(item) == 3:
        raise ValueError("boom on 3")
    return np.zeros((4, 4, 3), np.uint8), int(item)


def test_pool_error_propagates_and_pool_survives():
    pool = DecodePool(_sometimes_fail, num_workers=2, slot_shape=(4, 4, 3))
    try:
        with pytest.raises(RuntimeError, match="boom on 3"):
            list(pool.imap(range(8)))
        # the pool is reusable after an error (stale results drained)
        outs = list(pool.imap([0, 1, 2]))
        assert [aux for _, aux in outs] == [0, 1, 2]
    finally:
        pool.close()


def test_pool_abandoned_iteration_then_reuse():
    pool = DecodePool(_double, num_workers=2, slot_shape=(4, 4, 3))
    try:
        it = pool.imap(range(30))
        next(it)
        next(it)
        del it  # abandon mid-flight
        outs = list(pool.imap(range(6)))  # ring must not be corrupted
        assert [aux for _, aux in outs] == [i * 2 for i in range(6)]
    finally:
        pool.close()


@pytest.fixture(scope="module")
def det_root(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("dp_data")
    rng = np.random.default_rng(5)
    os.makedirs(root / "val" / "images")
    os.makedirs(root / "val" / "labels")
    for i in range(10):
        h, w = int(rng.integers(60, 120)), int(rng.integers(60, 120))
        img = rng.integers(0, 255, (h, w, 3), np.uint8)
        cv2.imwrite(str(root / "val" / "images" / f"{i}.jpg"), img)
        (root / "val" / "labels" / f"{i}.txt").write_text(
            f"0 5 5 {w - 5} {h - 5}\n"
        )
    return str(root)


def _collect(loader, epoch=0):
    return [
        (b["images"].copy(), b["labels"].copy(), b["num_real"])
        for b in loader.epoch(epoch)
    ]


@pytest.mark.parametrize("train", [False, True])
def test_loader_backends_identical(det_root, train):
    """Serial, thread, and process backends must produce BYTE-identical
    batches (the per-sample (seed, epoch, position) RNG contract) —
    including mosaic + augmentation on the train path and the ragged
    last eval batch."""
    from fastvision_tpu.data import (
        Augmentation,
        DetectionDataset,
        DetectionLoader,
        HorizontalFlip,
    )

    ds = DetectionDataset(det_root, "val")
    kw = dict(input_size=64, batch_size=4, max_boxes=4, train=train, seed=3)
    if train:
        kw.update(augmentation=Augmentation([HorizontalFlip(p=0.5)]),
                  mosaic_prob=0.5)
    serial = _collect(DetectionLoader(ds, **kw))
    threads = _collect(DetectionLoader(ds, num_workers=3, **kw))
    proc_loader = DetectionLoader(ds, num_workers=3, worker_backend="process", **kw)
    procs = _collect(proc_loader)
    procs2 = _collect(proc_loader, epoch=1)  # pool reuse across epochs
    assert len(serial) == len(threads) == len(procs)
    for (si, sl, sn), (ti, tl, tn), (pi, pl, pn) in zip(serial, threads, procs):
        np.testing.assert_array_equal(si, ti)
        np.testing.assert_array_equal(si, pi)
        np.testing.assert_array_equal(sl, tl)
        np.testing.assert_array_equal(sl, pl)
        assert sn == tn == pn
    if train:  # different epoch -> different shuffle/aug draw
        assert any(
            not np.array_equal(a[0], b[0]) for a, b in zip(procs, procs2)
        )


def test_loader_forkserver_backend_identical(det_root):
    """'process:forkserver' pickles the work_fn into a clean server process
    (no fork-from-threaded-parent) and must match the serial batches."""
    from fastvision_tpu.data import (
        Augmentation,
        DetectionDataset,
        DetectionLoader,
        HorizontalFlip,
    )

    ds = DetectionDataset(det_root, "val")
    kw = dict(input_size=64, batch_size=4, max_boxes=4, train=True, seed=3,
              augmentation=Augmentation([HorizontalFlip(p=0.5)]),
              mosaic_prob=0.5)
    serial = _collect(DetectionLoader(ds, **kw))
    fs_loader = DetectionLoader(ds, num_workers=2,
                                worker_backend="process:forkserver", **kw)
    fs = _collect(fs_loader)
    fs_loader._decode_pool.close()
    for (si, sl, sn), (fi, fl, fn) in zip(serial, fs):
        np.testing.assert_array_equal(si, fi)
        np.testing.assert_array_equal(sl, fl)
        assert sn == fn


def test_loader_bad_backend_suffix_rejected(det_root):
    from fastvision_tpu.data import DetectionDataset, DetectionLoader

    ds = DetectionDataset(det_root, "val")
    for bad in ("process:greenlet", "thread:fork", "procss"):
        with pytest.raises(ValueError):
            DetectionLoader(ds, 64, 4, worker_backend=bad)


def test_loader_process_backend_input_size_change(det_root):
    """Multi-scale training mutates loader.input_size between epochs; the
    process backend must rebuild its forked pool (workers snapshot the
    letterbox target and shm slot shape at fork) and match the serial
    path at the new size."""
    from fastvision_tpu.data import DetectionDataset, DetectionLoader

    ds = DetectionDataset(det_root, "val")
    kw = dict(batch_size=4, max_boxes=4, train=True, seed=3)
    loader = DetectionLoader(ds, input_size=64, num_workers=2,
                             worker_backend="process", **kw)
    a = _collect(loader)
    assert a[0][0].shape[1:] == (64, 64, 3)
    pool_small = loader._decode_pool

    loader.input_size = 96
    b = _collect(loader, epoch=1)
    assert b[0][0].shape[1:] == (96, 96, 3)
    assert loader._decode_pool is not pool_small

    serial = _collect(DetectionLoader(ds, input_size=96, **kw), epoch=1)
    for (bi, bl, bn), (si, sl, sn) in zip(b, serial):
        np.testing.assert_array_equal(bi, si)
        np.testing.assert_array_equal(bl, sl)
        assert bn == sn
    loader._decode_pool.close()
