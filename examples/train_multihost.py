"""Multi-host (pod) training template: run the SAME script on every host.

On a Cloud TPU pod slice the runtime auto-detects the cluster — launch the
identical command on every host (e.g. with `gcloud ... ssh --worker=all`):

    python examples/train_multihost.py --data-root /data/imagenet \
        --backbone resnet50 --batch-size 64 [--fsdp]

For a manual / test cluster pass the coordinator explicitly:

    python examples/train_multihost.py ... \
        --coordinator host0:1234 --nproc 2 --pid 0   # and --pid 1 on host1

What this template demonstrates (docs/PARALLEL.md maps each to its proof):

  - `initialize_multihost()`: one `jax.distributed` cluster; after it,
    `create_mesh()` spans EVERY host's chips (data axis over DCN).
  - `host_shard='auto'` loaders: each host decodes a DISJOINT 1/P of every
    epoch — `--batch-size` is PER-HOST, the global batch is P times that —
    and `Fit` assembles global arrays from the local slices
    (`jax.make_array_from_process_local_data` under the hood).
  - `fsdp=True`: ZeRO-3 — params, grads, and optimizer state sharded 1/N
    over the data axis instead of replicated (fits models N x larger).
  - The val loader stays UNsharded: every host evaluates the full val set
    and computes identical metrics (evaluators gather predictions
    host-side, which needs per-host-complete arrays).
  - `ckpt_dir` must be a SHARED filesystem path (e.g. GCS fuse) — orbax
    coordinates the multi-host save.

Single-process this degenerates cleanly: 'auto' resolves to (0, 1) and
fsdp falls back to replication on a 1-wide data axis, so the same script
is the single-host script.
"""
import argparse

import jax
import jax.numpy as jnp

from fastvision_tpu.core import create_mesh, set_random_seeds
from fastvision_tpu.core.distributed import initialize_multihost, process_info
from fastvision_tpu.data import (
    Augmentation,
    ClassificationDataset,
    ClassificationLoader,
    HorizontalFlip,
    normalize_images,
)
from fastvision_tpu.models import classification as cls_zoo
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
    p.add_argument("--backbone", default="resnet50")
    p.add_argument("--num-classes", type=int, default=1000)
    p.add_argument("--input-size", type=int, default=224)
    p.add_argument("--batch-size", type=int, default=64,
                   help="PER-HOST batch (global = this x num hosts)")
    p.add_argument("--epochs", type=int, default=90)
    p.add_argument("--lr", type=float, default=0.4)
    p.add_argument("--ckpt-dir", default="",
                   help="SHARED path (all hosts) — empty disables saving")
    p.add_argument("--fsdp", action="store_true",
                   help="ZeRO-3: shard params/opt-state over 'data'")
    p.add_argument("--num-workers", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    # manual-cluster knobs (Cloud TPU pods auto-detect; leave unset there)
    p.add_argument("--coordinator", default="")
    p.add_argument("--nproc", type=int, default=0)
    p.add_argument("--pid", type=int, default=-1)
    args = p.parse_args()

    if args.coordinator:
        initialize_multihost(args.coordinator, args.nproc, args.pid)
    elif jax.process_count() == 1:
        try:
            initialize_multihost()  # pod auto-detection
        except Exception:
            pass  # plain single-host run
    info = process_info()
    print(f"[multihost] {info}")

    set_random_seeds(args.seed)
    mesh = create_mesh()  # all hosts' devices on the data axis

    aug = Augmentation([HorizontalFlip(p=0.5)])
    train_loader = ClassificationLoader(
        ClassificationDataset(args.data_root, "train"),
        input_size=args.input_size, batch_size=args.batch_size,
        augmentation=aug, seed=args.seed, num_workers=args.num_workers,
        worker_backend="process", on_corrupt="skip",
        host_shard="auto",  # THE multi-host input knob
    )
    val_loader = ClassificationLoader(
        ClassificationDataset(args.data_root, "val"),
        input_size=args.input_size, batch_size=args.batch_size, train=False,
        num_workers=args.num_workers, worker_backend="process",
    )

    model = getattr(cls_zoo, args.backbone)(
        num_classes=args.num_classes, dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.key(args.seed),
        jnp.zeros((2, args.input_size, args.input_size, 3), jnp.bfloat16),
        train=True)
    tx = build_optimizer("sgd", variables["params"], weight_decay=1e-4)

    def apply_fn(v, images, **kw):
        return model.apply(v, normalize_images(images, model.dtype), **kw)

    def loss_fn(logits, batch):
        return cross_entropy(logits, batch["labels"]), {}

    steps = args.epochs * max(len(train_loader), 1)
    fit = Fit(
        apply_fn, loss_fn, tx, variables, train_loader, val_loader,
        epochs=args.epochs, mesh=mesh, seed=args.seed, fsdp=args.fsdp,
        schedule=warmup_cosine_lr(args.lr, args.lr * 1e-2, steps,
                                  warmup_steps=min(1000, steps // 20 + 1)),
        evaluator=classification_evaluator(
            make_eval_step(apply_fn), mesh=mesh),
        ckpt_dir=args.ckpt_dir or None,
        metric_key="accuracy", metric_mode="max",
    )
    fit.run()


if __name__ == "__main__":
    # process-backend loaders re-import this module in forkserver children —
    # the __main__ guard is required (docs/ROADMAP.md environment notes)
    main()
