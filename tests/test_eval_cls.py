"""`eval --task cls|video`: standalone accuracy eval of a trained
classification/video checkpoint through the CLI (before this existed, the
eval subcommand was detection-only and non-detection users had to write
code to score a val split)."""
import os

import jax
import numpy as np
import pytest

from test_video_data import video_root  # noqa: F401 — fixture


def _save_ckpt(tmp_path, model, variables):
    from fastvision_tpu.core.checkpoint import CheckpointManager

    ckpt = str(tmp_path / "ckpt")
    mgr = CheckpointManager(ckpt)
    mgr.save(0, jax.device_get(variables["params"]),
             batch_stats=(jax.device_get(variables["batch_stats"])
                          if variables.get("batch_stats") else None))
    mgr.wait()  # orbax save is async — flush before the CLI restores it
    return ckpt


@pytest.fixture()
def cls_root(tmp_path):
    import cv2

    root = tmp_path / "clsdata"
    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        for ci, c in enumerate(("dark", "light")):
            d = root / split / c
            os.makedirs(d)
            for i in range(6):
                img = rng.integers(0, 40, (32, 32, 3)).astype(np.uint8) + 200 * ci
                cv2.imwrite(str(d / f"{i}.jpg"), img)
    return str(root)


def test_eval_task_cls(cls_root, tmp_path, capfd):
    import jax.numpy as jnp

    from fastvision_tpu.cli import main
    from fastvision_tpu.models.classification import resnet18

    model = resnet18(num_classes=2)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
                           train=True)
    ckpt = _save_ckpt(tmp_path, model, variables)
    main([
        "eval", "--task", "cls", "--ckpt", ckpt,
        f"data.data_root={cls_root}", "data.input_size=32",
        "data.batch_size=8", "model.num_classes=2",
        "model.backbone=resnet18", "train.bf16=false",
    ])
    out = capfd.readouterr().out
    assert "top-1 accuracy" in out and "img/s" in out
    acc = float(out.split("top-1 accuracy")[1].split()[0])
    assert 0.0 <= acc <= 1.0


def test_eval_task_video_multiclip(video_root, tmp_path, capfd):  # noqa: F811
    import jax.numpy as jnp

    from fastvision_tpu.cli import main
    from fastvision_tpu.models.video import resnet18_3d

    model = resnet18_3d(num_classes=2)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 4, 32, 32, 3)),
                           train=True)
    ckpt = _save_ckpt(tmp_path, model, variables)
    main([
        "eval", "--task", "video", "--ckpt", ckpt,
        f"data.data_root={video_root}", "data.input_size=32",
        "data.batch_size=8", "data.num_frames=4", "data.eval_clips=2",
        "model.num_classes=2", "model.backbone=resnet18_3d",
        "train.bf16=false",
    ])
    out = capfd.readouterr().out
    assert "top-1 accuracy" in out and "2-clip protocol" in out


def test_eval_task_cls_requires_ckpt(cls_root):
    from fastvision_tpu.cli import main

    with pytest.raises(SystemExit, match="needs --ckpt"):
        main(["eval", "--task", "cls", f"data.data_root={cls_root}",
              "model.backbone=resnet18"])
