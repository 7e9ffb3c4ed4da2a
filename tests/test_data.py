"""Data layer tests over a synthetic on-disk fastvision dataset."""
import json
import os

import numpy as np
import pytest

from fastvision_tpu.data import (
    Augmentation,
    DetectionDataset,
    DetectionLoader,
    HorizontalFlip,
    HSVJitter,
    Jitter,
    VerticalFlip,
    boxes_to_normalized_xywh,
    letterbox,
    mosaic4,
    normalize_images,
    pad_labels,
    prefetch_to_device,
    sample_indices,
    sample_clip_from_array,
)


@pytest.fixture(scope="module")
def toy_dataset(tmp_path_factory):
    """8 images with 1-2 boxes each, on disk in fastvision format."""
    import cv2

    root = tmp_path_factory.mktemp("fvdata")
    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        os.makedirs(root / split / "images")
        os.makedirs(root / split / "labels")
        for i in range(8):
            h, w = int(rng.integers(80, 200)), int(rng.integers(80, 200))
            img = rng.integers(0, 255, (h, w, 3), np.uint8)
            cv2.imwrite(str(root / split / "images" / f"im{i}.jpg"), img)
            n = int(rng.integers(1, 3))
            lines = []
            for _ in range(n):
                x1, y1 = rng.uniform(0, w / 2), rng.uniform(0, h / 2)
                x2, y2 = x1 + rng.uniform(10, w / 2), y1 + rng.uniform(10, h / 2)
                cls = int(rng.integers(0, 3))
                lines.append(f"{cls} {x1:.1f} {y1:.1f} {min(x2,w):.1f} {min(y2,h):.1f}")
            (root / split / "labels" / f"im{i}.txt").write_text("\n".join(lines))
    return str(root)


def test_dataset_scan_and_read(toy_dataset):
    ds = DetectionDataset(toy_dataset, "train")
    assert len(ds) == 8
    img, labels, sid = ds[0]
    assert img.dtype == np.uint8 and img.ndim == 3
    assert labels.shape[1] == 5
    assert (labels[:, 3] > labels[:, 1]).all()


def test_dataset_cache(toy_dataset):
    ds = DetectionDataset(toy_dataset, "train", cache=True)
    cache = os.path.join(toy_dataset, "train", ".samples.json")
    assert os.path.exists(cache)
    with open(cache) as f:
        assert json.load(f) == ds.ids


def test_letterbox_geometry():
    img = np.zeros((100, 200, 3), np.uint8)
    out, scale, (px, py) = letterbox(img, 64)
    assert out.shape == (64, 64, 3)
    assert scale == 64 / 200
    assert px == 0 and py == (64 - 32) // 2
    # pad area has pad_value
    assert out[0, 0, 0] == 114


def test_pad_labels_and_normalize():
    xyxy = np.array([[10.0, 20.0, 30.0, 60.0]])
    xywhn = boxes_to_normalized_xywh(xyxy, height=100, width=100)
    np.testing.assert_allclose(xywhn, [[0.2, 0.4, 0.2, 0.4]])
    padded = pad_labels(np.array([2]), xywhn, 5)
    assert padded.shape == (5, 5)
    assert padded[0, 0] == 2 and padded[1, 0] == -1


def test_hflip_labels_roundtrip():
    img = np.zeros((50, 100, 3), np.uint8)
    labels = np.array([[0, 10.0, 5.0, 30.0, 25.0]])
    flip = HorizontalFlip(p=1.0)
    img2, lab2 = flip.apply(img, labels, {})
    np.testing.assert_allclose(lab2[0, 1:], [70, 5, 90, 25])
    _, lab3 = flip.apply(img2, lab2, {})
    np.testing.assert_allclose(lab3, labels)


def test_augmentation_replay_identical(rng):
    img = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
    labels = np.array([[0, 5.0, 5.0, 30.0, 30.0]])
    aug = Augmentation([Jitter(0.3, p=1.0), HorizontalFlip(p=0.5),
                        VerticalFlip(p=0.5), HSVJitter(p=1.0)])
    out1, lab1 = aug(img.copy(), labels.copy(), np.random.default_rng(42))
    out2, lab2 = aug.replay(img.copy(), labels.copy())
    np.testing.assert_array_equal(out1, out2)
    np.testing.assert_allclose(lab1, lab2)


def test_mosaic_output_shape(rng):
    samples = [
        (rng.integers(0, 255, (80, 100, 3)).astype(np.uint8),
         np.array([[0, 10.0, 10.0, 50.0, 50.0]]))
        for _ in range(4)
    ]
    img, labels = mosaic4(samples, 128, np.random.default_rng(0))
    assert img.shape == (128, 128, 3)
    if len(labels):
        assert (labels[:, 1:] >= 0).all() and (labels[:, 1:] <= 128).all()


def test_detection_loader_fixed_shapes(toy_dataset):
    ds = DetectionDataset(toy_dataset, "train")
    loader = DetectionLoader(ds, input_size=96, batch_size=4, max_boxes=10,
                             train=True, mosaic_prob=0.5,
                             augmentation=Augmentation([HorizontalFlip(p=0.5)]))
    batches = list(loader.epoch(0))
    assert len(batches) == 2
    for b in batches:
        assert b["images"].shape == (4, 96, 96, 3)
        assert b["images"].dtype == np.uint8
        assert b["labels"].shape == (4, 10, 5)
        valid = b["labels"][..., 0] >= 0
        # normalized coords within [0,1]
        lab = b["labels"][valid]
        assert (lab[:, 1:] >= -1e-6).all() and (lab[:, 1:] <= 1 + 1e-6).all()


def test_detection_loader_deterministic(toy_dataset):
    ds = DetectionDataset(toy_dataset, "train")
    mk = lambda: DetectionLoader(ds, input_size=64, batch_size=4, train=True,
                                 mosaic_prob=0.5, seed=7)
    b1 = next(iter(mk().epoch(3)))
    b2 = next(iter(mk().epoch(3)))
    np.testing.assert_array_equal(b1["images"], b2["images"])
    np.testing.assert_array_equal(b1["labels"], b2["labels"])
    b3 = next(iter(mk().epoch(4)))
    assert not np.array_equal(b1["images"], b3["images"])


def test_val_loader_meta_and_ragged(toy_dataset):
    ds = DetectionDataset(toy_dataset, "val")
    loader = DetectionLoader(ds, input_size=64, batch_size=3, train=False)
    batches = list(loader.epoch(0))
    assert len(batches) == 3  # 8 / 3 -> 3 batches, last ragged
    assert batches[-1]["num_real"] == 2
    m = batches[0]["meta"][0]
    assert "scale" in m and "pad" in m and m["gt_pixels"].shape[1] == 5


def test_prefetch_to_device(toy_dataset, mesh):
    import jax

    ds = DetectionDataset(toy_dataset, "train")
    loader = DetectionLoader(ds, input_size=64, batch_size=8, train=True)
    got = list(prefetch_to_device(loader.epoch(0), mesh=mesh))
    assert len(got) == 1
    assert isinstance(got[0]["images"], jax.Array)
    assert not got[0]["images"].sharding.is_fully_replicated  # sharded over data
    assert got[0]["meta"][0]["id"].startswith("im")


def test_normalize_images_on_device():
    import jax.numpy as jnp

    x = jnp.full((1, 2, 2, 3), 255, jnp.uint8)
    out = np.asarray(normalize_images(x))
    np.testing.assert_allclose(out, 1.0)
    out_in = np.asarray(normalize_images(x, imagenet=True))
    np.testing.assert_allclose(out_in[..., 0], (1 - 0.485) / 0.229, rtol=1e-5)


def test_video_sample_indices():
    idx = sample_indices(100, 16, "consecutive", np.random.default_rng(0))
    assert len(idx) == 16 and (np.diff(idx) == 1).all()
    idx = sample_indices(100, 16, "average", np.random.default_rng(0))
    assert len(idx) == 16 and (np.diff(idx) == 100 // 16).all()
    idx = sample_indices(10, 16, "random", np.random.default_rng(0))
    assert len(idx) == 16 and idx.max() < 10
    idx = sample_indices(100, 8, "clip_random", np.random.default_rng(0))
    assert len(idx) == 8 and (np.diff(idx) > 0).all()


def test_video_clip_from_array(rng):
    frames = rng.integers(0, 255, (40, 8, 8, 3)).astype(np.uint8)
    clip = sample_clip_from_array(frames, 16, "average", np.random.default_rng(0))
    assert clip.shape == (16, 8, 8, 3)


def test_loader_workers_deterministic_vs_serial(toy_dataset):
    """Threaded decode must produce byte-identical batches to serial."""
    ds = DetectionDataset(toy_dataset, "train")
    mk = lambda nw: DetectionLoader(ds, input_size=64, batch_size=4, train=True,
                                    mosaic_prob=0.5, seed=7, num_workers=nw)
    serial = list(mk(0).epoch(2))
    threaded = list(mk(4).epoch(2))
    assert len(serial) == len(threaded)
    for a, b in zip(serial, threaded):
        np.testing.assert_array_equal(a["images"], b["images"])
        np.testing.assert_array_equal(a["labels"], b["labels"])


def test_full_category_descriptors():
    """imagenet/kinetics-400/ucf101/sports-1m ship FULL category lists
    (ref datasets/data/*.yaml) as package data."""
    from fastvision_tpu.data import categories_for, make_descriptor

    expected = {"imagenet": 1000, "kinetics400": 400, "ucf101": 101,
                "sports1m": 487}
    for name, n in expected.items():
        cats = categories_for(name)
        assert len(cats) == n
        # imagenet famously names BOTH class 134 (bird) and 517 (machine)
        # "crane" — the one legitimate duplicate
        dupes = n - len(set(cats))
        assert dupes == (1 if name == "imagenet" else 0)
        assert all(isinstance(c, str) and c for c in cats)
    assert categories_for("imagenet")[0].startswith("tench")
    assert "ApplyEyeMakeup" in categories_for("ucf101")
    desc = make_descriptor("kinetics400", "/data/k400")
    assert len(desc["data"]["categories"]) == 400
    import pytest

    with pytest.raises(KeyError):
        categories_for("nope")


def test_prefetch_early_break_stops_worker():
    """Abandoning a prefetch generator must terminate its worker thread
    (an orphaned thread would keep buffering batches and contending for
    the host->device link; docs/PERF.md)."""
    import threading
    import time

    import numpy as np

    from fastvision_tpu.data.pipeline import prefetch_to_device

    produced = []

    def batches():
        for i in range(100):
            produced.append(i)
            yield {"images": np.zeros((2, 4, 4, 3), np.uint8), "i": i}

    before = threading.active_count()
    gen = prefetch_to_device(batches())
    assert next(gen)["i"] == 0
    gen.close()  # early abandonment
    deadline = time.time() + 5
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before
    assert len(produced) < 100  # worker stopped long before exhaustion


@pytest.fixture()
def corrupt_dataset(tmp_path):
    """6 images, one of them (index order position 2, 'im2') garbage bytes."""
    import cv2

    root = tmp_path / "corrupt"
    rng = np.random.default_rng(3)
    os.makedirs(root / "train" / "images")
    os.makedirs(root / "train" / "labels")
    for i in range(6):
        p = root / "train" / "images" / f"im{i}.jpg"
        if i == 2:
            p.write_bytes(b"\xff\xd8\xff not actually a jpeg")
        else:
            cv2.imwrite(str(p), rng.integers(0, 255, (60, 80, 3), np.uint8))
        (root / "train" / "labels" / f"im{i}.txt").write_text("0 5 5 30 30\n")
    return str(root)


def test_loader_corrupt_raises_by_default(corrupt_dataset):
    ds = DetectionDataset(corrupt_dataset, "train")
    loader = DetectionLoader(ds, input_size=64, batch_size=3, max_boxes=4,
                             train=False, drop_last=False)
    with pytest.raises(FileNotFoundError, match="cannot decode"):
        list(loader.epoch(0))


def test_loader_on_corrupt_skip_substitutes_next(corrupt_dataset):
    """on_corrupt='skip': the epoch completes, the bad sample is replaced
    by the NEXT dataset index (deterministic), and a warning names it."""
    ds = DetectionDataset(corrupt_dataset, "train")
    loader = DetectionLoader(ds, input_size=64, batch_size=3, max_boxes=4,
                             train=False, drop_last=False, on_corrupt="skip")
    with pytest.warns(UserWarning, match="corrupt"):
        batches = list(loader.epoch(0))
    ids = [m["id"] for b in batches for m in b["meta"]]
    assert len(ids) == 6
    assert ids == ["im0", "im1", "im3", "im3", "im4", "im5"]  # im2 -> im3


def test_loader_on_corrupt_skip_process_backend(corrupt_dataset):
    """The policy applies inside DecodePool workers too (the exception
    must be handled in the worker, not crash the ring)."""
    ds = DetectionDataset(corrupt_dataset, "train")
    loader = DetectionLoader(ds, input_size=64, batch_size=3, max_boxes=4,
                             train=False, drop_last=False, on_corrupt="skip",
                             num_workers=2, worker_backend="process")
    try:
        batches = list(loader.epoch(0))
    finally:
        if loader._decode_pool is not None:
            loader._decode_pool.close()
    ids = [m["id"] for b in batches for m in b["meta"]]
    assert ids == ["im0", "im1", "im3", "im3", "im4", "im5"]


def test_build_augmentation_from_config_specs():
    """Config-driven augmentation (data.augment in YAML): string
    'name[:p]' shorthand, {op: name, **kwargs} dicts, clear errors for
    unknown ops, None for an empty list (callers keep their default)."""
    from fastvision_tpu.data import build_augmentation
    from fastvision_tpu.data.augment import (
        HorizontalFlip,
        HSVJitter,
        Jitter,
    )

    aug = build_augmentation(
        ["hflip:0.5", {"op": "hsv", "p": 0.25, "s_gain": 0.6},
         {"op": "jitter", "ratio": 0.1}])
    assert [type(o) for o in aug.ops] == [HorizontalFlip, HSVJitter, Jitter]
    assert aug.ops[0].p == 0.5 and aug.ops[1].p == 0.25
    assert aug.ops[1].gains[1] == 0.6 and aug.ops[2].ratio == 0.1

    assert build_augmentation([]) is None
    assert build_augmentation(None) is None
    with pytest.raises(ValueError, match="unknown augment op"):
        build_augmentation(["mosaicify"])
    with pytest.raises(ValueError, match="'op' key"):
        build_augmentation([{"p": 0.5}])

    # a p=1 hflip built from config must actually flip
    flip = build_augmentation(["hflip:1.0"])
    img = np.arange(2 * 4 * 3, dtype=np.uint8).reshape(2, 4, 3)
    out, _ = flip(img, None, np.random.default_rng(0))
    np.testing.assert_array_equal(out, img[:, ::-1])


def test_classification_loader_backends_identical(tmp_path):
    """ClassificationLoader's thread and process (DecodePool) backends
    must produce byte-identical batches to the serial path, including
    per-sample augmentation rng and the ragged eval last batch — same
    contract as DetectionLoader / VideoClipLoader."""
    import cv2

    from fastvision_tpu.data import ClassificationDataset, ClassificationLoader
    from fastvision_tpu.data.augment import Augmentation, HorizontalFlip, Jitter

    rng = np.random.default_rng(3)
    for ci, name in enumerate(("a", "b")):
        d = tmp_path / "train" / name
        os.makedirs(d)
        for i in range(5):  # 10 images, batch 4 -> ragged eval tail of 2
            cv2.imwrite(str(d / f"{i}.jpg"),
                        rng.integers(0, 255, (40, 48, 3), np.uint8))
    ds = ClassificationDataset(str(tmp_path), "train")

    def batches(train, **kw):
        aug = Augmentation([HorizontalFlip(p=0.5), Jitter(0.2, p=0.5)])
        loader = ClassificationLoader(ds, input_size=32, batch_size=4,
                                      train=train, seed=11,
                                      augmentation=aug if train else None,
                                      **kw)
        try:
            return list(loader.epoch(1))
        finally:
            if loader._decode_pool is not None:
                loader._decode_pool.close()

    for train in (True, False):
        serial = batches(train)
        assert len(serial) == (2 if train else 3)
        for kw in (dict(num_workers=3),
                   dict(num_workers=2, worker_backend="process:forkserver")):
            other = batches(train, **kw)
            assert len(other) == len(serial)
            for x, y in zip(serial, other):
                np.testing.assert_array_equal(x["images"], y["images"])
                np.testing.assert_array_equal(x["labels"], y["labels"])
                assert x["num_real"] == y["num_real"]
    with pytest.raises(ValueError, match="worker_backend"):
        ClassificationLoader(ds, worker_backend="process:bogus")


def test_classification_loader_on_corrupt_skip(tmp_path):
    import cv2

    from fastvision_tpu.data import ClassificationDataset, ClassificationLoader

    rng = np.random.default_rng(0)
    for ci, name in enumerate(("a", "b")):
        d = tmp_path / "train" / name
        os.makedirs(d)
        for i in range(3):
            p = d / f"{i}.jpg"
            if name == "a" and i == 1:
                p.write_bytes(b"garbage")
            else:
                cv2.imwrite(str(p), rng.integers(0, 255, (32, 32, 3), np.uint8))
    ds = ClassificationDataset(str(tmp_path), "train")
    strict = ClassificationLoader(ds, input_size=32, batch_size=2, train=False)
    with pytest.raises(FileNotFoundError):
        list(strict.epoch(0))
    lax = ClassificationLoader(ds, input_size=32, batch_size=2, train=False,
                               on_corrupt="skip")
    with pytest.warns(UserWarning, match="corrupt"):
        batches = list(lax.epoch(0))
    assert sum(b["num_real"] for b in batches) == 6


# ---- multi-host input sharding (data/pipeline.py::host_shard_order) ----


def test_resolve_host_shard_forms():
    from fastvision_tpu.data import resolve_host_shard

    assert resolve_host_shard(None) == (0, 1)
    assert resolve_host_shard("") == (0, 1)
    # single process: auto degrades to the identity shard
    assert resolve_host_shard("auto") == (0, 1)
    assert resolve_host_shard("1/4") == (1, 4)
    assert resolve_host_shard((2, 3)) == (2, 3)
    with pytest.raises(ValueError, match="'auto' or 'i/n'"):
        resolve_host_shard("half")
    with pytest.raises(ValueError, match="not in"):
        resolve_host_shard((4, 4))
    with pytest.raises(ValueError, match="not in"):
        resolve_host_shard("-1/2")


def test_host_shard_order_partitions_epoch():
    from fastvision_tpu.data import host_shard_order

    order = np.random.default_rng(0).permutation(11)
    shards = [host_shard_order(order, i, 3) for i in range(3)]
    # equal length (remainder dropped), disjoint, union == first 9 of order
    assert all(len(o) == 3 for o, _ in shards)
    seen = np.concatenate([o for o, _ in shards])
    assert len(set(seen.tolist())) == 9
    assert set(seen.tolist()) == set(order[:9].tolist())
    # global positions reconstruct the single-host order
    for i, (o, gpos) in enumerate(shards):
        np.testing.assert_array_equal(gpos, np.arange(i, 9, 3))
        np.testing.assert_array_equal(o, order[gpos])
    # count=1 is the identity
    o, gpos = host_shard_order(order, 0, 1)
    np.testing.assert_array_equal(o, order)
    np.testing.assert_array_equal(gpos, np.arange(11))


def test_detection_loader_host_shard_is_single_host_epoch(toy_dataset):
    """Two host-sharded loaders' batches, interleaved by global position,
    must be BYTE-identical to the single-host epoch (same per-sample
    augmentation rng), with each host decoding a disjoint half."""
    ds = DetectionDataset(toy_dataset, "train")
    aug = Augmentation([HorizontalFlip(p=0.5), HSVJitter(p=0.5)])
    mk = lambda shard: DetectionLoader(
        ds, input_size=64, batch_size=2 if shard else 4, train=True,
        augmentation=aug, seed=7, host_shard=shard)

    def collect(loader):
        bs = list(loader.epoch(2))
        return (np.concatenate([b["images"] for b in bs]),
                np.concatenate([b["labels"] for b in bs]))

    full_im, full_lab = collect(mk(None))
    assert len(full_im) == 8
    for i in range(2):
        im, lab = collect(mk((i, 2)))
        assert len(im) == 4  # half the epoch each, len() agrees
        assert len(mk((i, 2))) == 2
        np.testing.assert_array_equal(im, full_im[i::2])
        np.testing.assert_array_equal(lab, full_lab[i::2])


def test_detection_loader_host_shard_process_backend(toy_dataset):
    """host_shard composes with the DecodePool process backend: the
    worker items carry GLOBAL positions, so sharded process batches are
    byte-identical to the sharded serial path."""
    ds = DetectionDataset(toy_dataset, "train")
    aug = Augmentation([HorizontalFlip(p=0.5), HSVJitter(p=0.5)])

    def collect(**kw):
        loader = DetectionLoader(ds, input_size=64, batch_size=2, train=True,
                                 augmentation=aug, seed=7, host_shard=(1, 2),
                                 **kw)
        try:
            bs = list(loader.epoch(2))
            return (np.concatenate([b["images"] for b in bs]),
                    np.concatenate([b["labels"] for b in bs]))
        finally:
            if loader._decode_pool is not None:
                loader._decode_pool.close()

    ser_im, ser_lab = collect()
    pr_im, pr_lab = collect(num_workers=2, worker_backend="process:forkserver")
    np.testing.assert_array_equal(pr_im, ser_im)
    np.testing.assert_array_equal(pr_lab, ser_lab)


def test_classification_loader_host_shard(tmp_path):
    import cv2

    from fastvision_tpu.data import ClassificationDataset, ClassificationLoader

    rng = np.random.default_rng(5)
    for name in ("a", "b"):
        d = tmp_path / "train" / name
        os.makedirs(d)
        for i in range(4):
            cv2.imwrite(str(d / f"{i}.jpg"),
                        rng.integers(0, 255, (40, 40, 3), np.uint8))
    ds = ClassificationDataset(str(tmp_path), "train")
    full = ClassificationLoader(ds, input_size=32, batch_size=4, seed=3)
    f_im = np.concatenate([b["images"] for b in full.epoch(0)])
    f_lab = np.concatenate([b["labels"] for b in full.epoch(0)])
    for i in range(2):
        half = ClassificationLoader(ds, input_size=32, batch_size=2, seed=3,
                                    host_shard=f"{i}/2")
        assert len(half) == 2
        im = np.concatenate([b["images"] for b in half.epoch(0)])
        lab = np.concatenate([b["labels"] for b in half.epoch(0)])
        np.testing.assert_array_equal(im, f_im[i::2])
        np.testing.assert_array_equal(lab, f_lab[i::2])


def test_video_loader_host_shard(tmp_path):
    """VideoClipLoader shards epochs by host with identical per-position
    clip sampling rng (frame-dir dataset keeps the fixture cheap)."""
    import cv2

    from fastvision_tpu.data import VideoClipLoader, VideoFolderDataset

    rng = np.random.default_rng(9)
    for name in ("x", "y"):
        for v in range(3):  # 6 videos as frame dirs
            d = tmp_path / "train" / name / f"v{v}"
            os.makedirs(d)
            for f in range(6):
                cv2.imwrite(str(d / f"{f:03d}.jpg"),
                            rng.integers(0, 255, (24, 24, 3), np.uint8))
    ds = VideoFolderDataset(str(tmp_path), "train")
    full = VideoClipLoader(ds, num_frames=4, size=16, batch_size=2, seed=1)
    f_im = np.concatenate([b["images"] for b in full.epoch(0)])
    for i in range(2):
        half = VideoClipLoader(ds, num_frames=4, size=16, batch_size=1,
                               seed=1, host_shard=(i, 2))
        assert len(half) == 3
        im = np.concatenate([b["images"] for b in half.epoch(0)])
        np.testing.assert_array_equal(im, f_im[i::2])


def test_shard_batch_per_host_single_process(toy_dataset, mesh):
    """per_host=True degrades to the plain device_put path on one process
    (so callers can pass it unconditionally)."""
    import jax

    from fastvision_tpu.core.mesh import shard_batch

    x = {"images": np.arange(8 * 3, dtype=np.float32).reshape(8, 3)}
    a = shard_batch(x, mesh, per_host=True)
    b = shard_batch(x, mesh)
    assert isinstance(a["images"], jax.Array)
    assert a["images"].sharding == b["images"].sharding
    np.testing.assert_array_equal(np.asarray(a["images"]),
                                  np.asarray(b["images"]))
