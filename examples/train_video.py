"""Video classification example: SlowFast/C3D/3D-ResNet on a clip folder.

Dataset layout: <root>/{train,val}/<class_name>/<clip>.mp4 (or frame dirs).
Covers the reference's videoRecognition training path with frame samplers
(datasets/common/video_sampler.py) feeding NDHWC clips.

This is the library-API version; the equivalent CLI is

    python -m fastvision_tpu train-video data.data_root=<root> \
        model.backbone=slowfast_resnet50 data.num_frames=16 \
        data.input_size=112
"""
import argparse

import jax
import jax.numpy as jnp

from fastvision_tpu.core import create_mesh, set_random_seeds
from fastvision_tpu.data import VideoClipLoader, VideoFolderDataset, normalize_images
from fastvision_tpu.models import video as video_zoo
from fastvision_tpu.train import (
    Fit,
    build_optimizer,
    classification_evaluator,
    cross_entropy,
    make_eval_step,
    warmup_cosine_lr,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", required=True)
    p.add_argument("--model", default="slowfast_resnet50",
                   choices=[n for n in dir(video_zoo) if not n.startswith("_")])
    p.add_argument("--num-frames", type=int, default=16)
    p.add_argument("--size", type=int, default=112)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--lr", type=float, default=1e-2)
    args = p.parse_args()

    set_random_seeds(0)
    mesh = create_mesh()
    train_ds = VideoFolderDataset(args.data_root, "train")
    val_ds = VideoFolderDataset(args.data_root, "val", categories=train_ds.classes)
    train_loader = VideoClipLoader(train_ds, args.num_frames, args.size,
                                   args.batch_size)
    val_loader = VideoClipLoader(val_ds, args.num_frames, args.size,
                                 args.batch_size, train=False)
    num_classes = len(train_ds.classes)

    model = getattr(video_zoo, args.model)(num_classes=num_classes, dtype=jnp.bfloat16)
    clip0 = jnp.zeros((2, args.num_frames, args.size, args.size, 3))
    variables = model.init(jax.random.key(0), clip0, train=True)

    def apply_fn(v, clips, **kw):
        return model.apply(v, normalize_images(clips, model.dtype, imagenet=True), **kw)

    def loss_fn(logits, batch):
        return cross_entropy(logits, batch["labels"]), {}

    steps = args.epochs * len(train_loader)
    fit = Fit(
        apply_fn, loss_fn,
        build_optimizer("sgd", variables["params"]),
        variables, train_loader, val_loader,
        epochs=args.epochs, mesh=mesh,
        schedule=warmup_cosine_lr(args.lr, args.lr * 1e-2, steps, warmup_steps=200),
        evaluator=classification_evaluator(make_eval_step(apply_fn), mesh=mesh),
        metric_key="accuracy", metric_mode="max",
        ckpt_dir="./ckpt_video",
    )
    fit.run()


if __name__ == "__main__":
    main()
