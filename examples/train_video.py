"""Video classification example: SlowFast/C3D/3D-ResNet on a clip folder.

Dataset layout: <root>/{train,val}/<class_name>/<clip>.mp4 (or frame dirs).
Covers the reference's videoRecognition training path with frame samplers
(datasets/common/video_sampler.py) feeding NDHWC clips.
"""
import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from fastvision_tpu.core import create_mesh, set_random_seeds
from fastvision_tpu.data import load_clip, normalize_images
from fastvision_tpu.models import video as video_zoo
from fastvision_tpu.train import (
    Fit,
    build_optimizer,
    classification_evaluator,
    cross_entropy,
    make_eval_step,
    warmup_cosine_lr,
)

VIDEO_EXTS = (".mp4", ".avi", ".mov", ".mkv")


class VideoClipLoader:
    """Fixed-shape clip batches: [B, T, S, S, 3] uint8 + labels [B]."""

    def __init__(self, root, split, num_frames=16, size=112, batch_size=8,
                 strategy="average", train=True, seed=0):
        self.dir = os.path.join(root, split)
        self.classes = sorted(os.listdir(self.dir))
        self.samples = [
            (os.path.join(self.dir, c, f), ci)
            for ci, c in enumerate(self.classes)
            for f in sorted(os.listdir(os.path.join(self.dir, c)))
            if f.lower().endswith(VIDEO_EXTS)
        ]
        self.num_frames, self.size = num_frames, size
        self.batch_size, self.strategy = batch_size, strategy
        self.train, self.seed = train, seed

    def __len__(self):
        n = len(self.samples)
        return n // self.batch_size if self.train else -(-n // self.batch_size)

    def epoch(self, epoch_idx=0):
        rng = np.random.default_rng((self.seed, epoch_idx))
        order = rng.permutation(len(self.samples)) if self.train else np.arange(len(self.samples))
        for b in range(len(self)):
            idxs = order[b * self.batch_size : (b + 1) * self.batch_size]
            clips, labels = [], []
            for i in idxs:
                path, label = self.samples[int(i)]
                clips.append(load_clip(path, self.num_frames, self.strategy,
                                       self.size, rng))
                labels.append(label)
            while len(clips) < self.batch_size:
                clips.append(clips[-1])
                labels.append(labels[-1])
            yield {"images": np.stack(clips), "labels": np.asarray(labels, np.int32),
                   "num_real": len(idxs)}


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
    train_loader = VideoClipLoader(args.data_root, "train", args.num_frames,
                                   args.size, args.batch_size)
    val_loader = VideoClipLoader(args.data_root, "val", args.num_frames,
                                 args.size, args.batch_size, train=False)
    num_classes = len(train_loader.classes)

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
