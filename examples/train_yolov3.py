"""End-to-end YOLOv3 training template (the generate/template-yolov3
equivalent): dataset -> anchors -> model -> loss -> Fit, all public API.

Usage:
    python examples/train_yolov3.py --data-root data/voc --num-classes 20 \
        --input-size 416 --batch-size 32 --epochs 100
"""
import argparse

import jax
import jax.numpy as jnp
import numpy as np

from fastvision_tpu.core import create_mesh, set_random_seeds
from fastvision_tpu.core.telemetry import MetricLogger
from fastvision_tpu.data import (
    Augmentation,
    DetectionDataset,
    DetectionLoader,
    HorizontalFlip,
    HSVJitter,
    normalize_images,
)
from fastvision_tpu.infer.decode import decode_predictions
from fastvision_tpu.models.detection import YOLOv3
from fastvision_tpu.ops import AnchorGenerator, batched_non_max_suppression
from fastvision_tpu.train import (
    Fit,
    YOLOv3Loss,
    build_optimizer,
    detection_evaluator,
    make_eval_step,
    warmup_cosine_lr,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", required=True)
    p.add_argument("--num-classes", type=int, required=True)
    p.add_argument("--input-size", type=int, default=416)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--ckpt-dir", default="./checkpoints")
    p.add_argument("--pretrained", default="", help="torch .pt/.pth to import")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    set_random_seeds(args.seed)
    mesh = create_mesh()

    train_ds = DetectionDataset(args.data_root, "train", cache=True)
    val_ds = DetectionDataset(args.data_root, "val", cache=True)

    # dataset-specific anchors via IoU k-means (cached)
    anchors_flat = AnchorGenerator(datasets=[train_ds], k=9, use_cache=True).get_anchors()
    anchors = jnp.asarray(anchors_flat.reshape(3, 3, 2)[::-1].copy())  # deepest first

    model = YOLOv3(num_classes=args.num_classes, dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.key(args.seed),
        jnp.zeros((2, args.input_size, args.input_size, 3)),
        train=True,
    )
    if args.pretrained:
        from fastvision_tpu.core.checkpoint import load_torch_state
        from fastvision_tpu.models.import_torch import apply_import, yolov3_from_torch

        variables = apply_import(
            dict(variables), yolov3_from_torch(load_torch_state(args.pretrained))
        )

    loss = YOLOv3Loss(anchors, num_classes=args.num_classes)

    def apply_fn(v, images, **kw):
        return model.apply(v, normalize_images(images, model.dtype), **kw)

    def loss_fn(heads, batch):
        out = loss(heads, batch["labels"])
        return out.total, {"box": out.box, "obj": out.obj, "cls": out.cls}

    aug = Augmentation([HorizontalFlip(p=0.5), HSVJitter(p=0.5)])
    train_loader = DetectionLoader(
        train_ds, args.input_size, args.batch_size, train=True,
        augmentation=aug, mosaic_prob=0.5, seed=args.seed,
    )
    val_loader = DetectionLoader(val_ds, args.input_size, args.batch_size, train=False)

    def postprocess(heads, batch):
        pred = decode_predictions(heads, anchors, (32, 16, 8), "v5")
        return batched_non_max_suppression(pred.astype(jnp.float32), max_det=300)

    steps = args.epochs * len(train_loader)
    fit = Fit(
        apply_fn, loss_fn,
        build_optimizer("sgd", variables["params"], weight_decay=5e-4),
        variables, train_loader, val_loader,
        epochs=args.epochs, mesh=mesh,
        schedule=warmup_cosine_lr(args.lr, args.lr * 1e-2, steps,
                                  warmup_steps=3 * len(train_loader)),
        evaluator=detection_evaluator(make_eval_step(apply_fn, postprocess), mesh=mesh),
        ckpt_dir=args.ckpt_dir,
        logger=MetricLogger(args.ckpt_dir),
        metric_key="map50", metric_mode="max",
    )
    fit.run()


if __name__ == "__main__":
    main()
