"""CLI: train / eval / infer / serve / convert / anchors.

Unifies the reference's per-demo run.py argparse entries
(generate/template-yolov3/run.py:80-85, demos/*/run.py) behind one command:

    python -m fastvision_tpu train  --config cfg.yaml train.lr=1e-3
    python -m fastvision_tpu eval   --config cfg.yaml --ckpt ckpts/
    python -m fastvision_tpu infer  --config cfg.yaml --source img_or_dir
    python -m fastvision_tpu serve  --config cfg.yaml --port 8080
    python -m fastvision_tpu convert --kind coco --ann a.json --images d/ --out o/
    python -m fastvision_tpu anchors --config cfg.yaml -k 9 --init ++
    python -m fastvision_tpu export  --config cfg.yaml --ckpt ckpts/ --out sm/
    python -m fastvision_tpu generate --out myproject   # project scaffold

Config = dataclass tree <- YAML <- dotted overrides (core.config); dataset
descriptors use the reference's YAML schema (data_root, dirs, num_classes,
categories).
"""
from __future__ import annotations

import argparse

import numpy as np


def _load_config(args, overrides):
    from .core.config import Config, apply_overrides, from_yaml

    if args.config:
        cfg = from_yaml(Config, args.config, overrides)
    else:
        cfg = apply_overrides(Config(), overrides)
    if cfg.compile_cache:
        from .core.mesh import enable_compile_cache

        enable_compile_cache(cfg.compile_cache)
    return cfg


def _mesh_from_cfg(cfg):
    """Build the (data, model, time) mesh the config asks for.

    mesh_data=0 (the default) means "every device not claimed by the
    model/time axes" — plain data parallel on an unsharded config. A
    mesh_model>1 axis makes the train commands channel-shard parameters
    (tensor parallel, parallel/tensor_shard.py); mesh_time>1 shards the
    SlowFast fast pathway's clip-time axis (parallel/time_shard.py)."""
    if getattr(cfg, "multihost", False):
        # must run before the backend initializes — this is the first
        # jax-touching call in every train command's path
        from .core.distributed import initialize_multihost

        try:
            initialize_multihost()
        except RuntimeError:
            pass  # already initialized (library caller / repeated command)
        except ValueError as e:  # no cluster to auto-detect (dev box)
            import warnings

            warnings.warn(
                f"multihost=true but no cluster detected ({e}); "
                "continuing single-process", stacklevel=2)
    from .core.mesh import create_mesh

    return create_mesh(cfg.mesh_data or None, cfg.mesh_model, cfg.mesh_time)


def _build_detection(cfg, train: bool):
    """Shared model/anchors/loader construction for detection commands."""
    import jax
    import jax.numpy as jnp

    from .data import DetectionDataset, DetectionLoader
    from .models.detection import YOLOv3
    from .ops.anchors import COCO_ANCHORS

    # numpy (not device): these anchors are captured by jit closures
    anchors = COCO_ANCHORS.reshape(3, 3, 2)[::-1].astype(np.float32)
    if cfg.model.scale_anchors_with_input:
        anchors = anchors * (cfg.data.input_size / 416.0)
    model = YOLOv3(
        num_classes=cfg.model.num_classes,
        dtype=jnp.bfloat16 if cfg.train.bf16 else jnp.float32,
    )
    variables = model.init(
        jax.random.key(cfg.train.seed),
        jnp.zeros((2, cfg.data.input_size, cfg.data.input_size, 3)),
        train=True,
    )
    variables = _maybe_import_pretrained(cfg, variables)
    return model, variables, anchors


def _maybe_import_pretrained(cfg, variables):
    """Load `model.pretrained` (a torch checkpoint in any reference naming
    scheme — models/import_torch.py::detect_and_import routes it) into
    freshly-initialized variables via shape-filtered partial load (the
    reference's non-strict LoadStatedict, utils/checkpoints.py:40-53;
    head-dropping import = mismatched shapes falling back to init)."""
    if not cfg.model.pretrained:
        return variables
    from .core.checkpoint import load_torch_state
    from .models.import_torch import apply_import, detect_and_import

    state = load_torch_state(cfg.model.pretrained)
    if "rpn.conv3x3.weight" in state and not cfg.model.reference_compat:
        print("[import] WARNING: this looks like a reference Faster_Rcnn "
              "checkpoint but model.reference_compat is false — its weights "
              "assume integer-grid anchors and h-from-dw decoding; set "
              "model.reference_compat=true or boxes will be degraded")
    return apply_import(dict(variables), detect_and_import(state))


def _preempt_signals(cfg):
    """SIGTERM -> checkpoint-and-exit for all train commands (the signal
    preemptible TPU VMs receive); train.preempt_save=false disables."""
    import signal

    return (signal.SIGTERM,) if cfg.train.preempt_save else ()


def _maybe_step_fn(cfg, apply_fn, loss_fn, tx, has_batch_stats=True,
                   batch_transform=None):
    """A custom jitted step only when train.microbatch / train.remat /
    a batch_transform (mixup/cutmix) ask for one (None lets Fit build
    the default)."""
    if (cfg.train.microbatch <= 1 and not cfg.train.remat
            and batch_transform is None):
        return None
    from .train import make_train_step

    return make_train_step(apply_fn, loss_fn, tx,
                           has_batch_stats=has_batch_stats,
                           accum_steps=cfg.train.microbatch,
                           remat=cfg.train.remat,
                           batch_transform=batch_transform,
                           transform_seed=cfg.train.seed)


def cmd_train(args, overrides):
    import jax

    cfg = _load_config(args, overrides)
    if cfg.model.name == "faster_rcnn":
        return _train_faster_rcnn(cfg, args)
    from .core.rng import set_random_seeds
    from .core.telemetry import MetricLogger
    from .data import (
        Augmentation,
        DetectionDataset,
        DetectionLoader,
        HorizontalFlip,
        HSVJitter,
        normalize_images,
    )
    from .infer.decode import decode_predictions
    from .ops.nms import batched_non_max_suppression
    from .train import (
        Fit,
        YOLOv3Loss,
        build_optimizer,
        detection_evaluator,
        make_eval_step,
        warmup_cosine_lr,
    )

    set_random_seeds(cfg.train.seed)
    mesh = _mesh_from_cfg(cfg)
    model, variables, anchors = _build_detection(cfg, train=True)

    train_ds = DetectionDataset(cfg.data.data_root, cfg.data.train_dir, cfg.data.cache)
    val_ds = DetectionDataset(cfg.data.data_root, cfg.data.val_dir, cfg.data.cache)
    from .data import build_augmentation

    aug = (build_augmentation(cfg.data.augment)
           or Augmentation([HorizontalFlip(p=0.5), HSVJitter(p=0.5)]))
    emit = "i420" if cfg.data.i420 else "rgb"
    workers = dict(num_workers=cfg.data.num_workers,
                   worker_backend=cfg.data.worker_backend)
    # host_shard: train loaders only — the evaluators gather predictions
    # host-side, which needs each host to hold full batches
    train_loader = DetectionLoader(
        train_ds, cfg.data.input_size, cfg.data.batch_size, cfg.data.max_boxes,
        train=True, augmentation=aug, mosaic_prob=0.5, seed=cfg.train.seed,
        emit=emit, on_corrupt=cfg.data.on_corrupt,
        host_shard=cfg.data.host_shard or None, **workers,
    )
    val_loader = DetectionLoader(
        val_ds, cfg.data.input_size, cfg.data.batch_size, cfg.data.max_boxes,
        train=False, emit=emit, **workers,  # eval stays strict (on_corrupt)
    )
    no_aug_loader = DetectionLoader(
        train_ds, cfg.data.input_size, cfg.data.batch_size, cfg.data.max_boxes,
        train=True, seed=cfg.train.seed, emit=emit,
        on_corrupt=cfg.data.on_corrupt,
        host_shard=cfg.data.host_shard or None, **workers,
    )

    loss_obj = YOLOv3Loss(anchors, num_classes=cfg.model.num_classes,
                          neighbor_cells=cfg.train.neighbor_cells)

    def apply_fn(v, images, **kw):
        return model.apply(v, normalize_images(images, model.dtype), **kw)

    def loss_fn(heads, batch):
        out = loss_obj(heads, batch["labels"])
        return out.total, {"box": out.box, "obj": out.obj, "cls": out.cls}

    from .core.checkpoint import trainable_mask

    trainable = (
        trainable_mask(variables["params"], cfg.model.freeze) if cfg.model.freeze else None
    )
    tx = build_optimizer(
        cfg.train.optimizer, variables["params"],
        weight_decay=cfg.train.weight_decay, momentum=cfg.train.momentum,
        nesterov=cfg.train.nesterov, grad_clip_norm=cfg.train.grad_clip_norm,
        trainable=trainable, accum_steps=cfg.train.accum_steps,
    )

    def postprocess(heads, batch):
        pred = decode_predictions(heads, anchors, (32, 16, 8), "v5")
        return batched_non_max_suppression(
            pred.astype(jax.numpy.float32),
            conf_thres=cfg.nms.conf_thres, iou_thres=cfg.nms.iou_thres,
            max_det=cfg.nms.max_det, pre_nms_top_k=cfg.nms.pre_nms_top_k,
        )

    steps_per_epoch = max(len(train_loader), 1)
    fit = Fit(
        apply_fn, loss_fn, tx, variables, train_loader, val_loader,
        epochs=cfg.train.epochs, mesh=mesh, seed=cfg.train.seed,
        fsdp=cfg.fsdp,
        schedule=warmup_cosine_lr(
            cfg.train.lr, cfg.train.final_lr,
            cfg.train.epochs * steps_per_epoch,
            warmup_steps=cfg.train.warmup_epochs * steps_per_epoch,
        ),
        evaluator=detection_evaluator(make_eval_step(apply_fn, postprocess), mesh=mesh),
        ckpt_dir=cfg.train.ckpt_dir,
        save_every_epoch=cfg.train.save_every_epoch,
        eval_every=cfg.train.eval_every,
        no_aug_epochs=cfg.train.no_aug_epochs,
        no_aug_loader=no_aug_loader,
        no_aug_lr=cfg.train.final_lr,
        logger=MetricLogger(cfg.train.ckpt_dir),
        start_epoch=cfg.train.start_epoch,
        resume=args.resume,
        metric_key="map50",
        metric_mode="max",
        ema_decay=cfg.train.ema_decay,
        step_fn=_maybe_step_fn(cfg, apply_fn, loss_fn, tx),
        multiscale=cfg.train.multiscale or None,
        preempt_signals=_preempt_signals(cfg),
    )
    fit.run()


def _train_faster_rcnn(cfg, args):
    """Two-stage training path (ref demos/faster_rcnn/run.py surface)."""
    import jax
    import jax.numpy as jnp

    from .core.rng import set_random_seeds
    from .core.telemetry import MetricLogger
    from .data import DetectionDataset, DetectionLoader
    from .models.detection import FasterRCNN
    from .train import (
        Fit,
        build_optimizer,
        detection_evaluator,
        make_frcnn_eval_step,
        make_frcnn_train_step,
        step_decay_lr,
    )

    set_random_seeds(cfg.train.seed)
    mesh = _mesh_from_cfg(cfg)
    size = cfg.data.input_size
    model = FasterRCNN(
        num_classes=cfg.model.num_classes, image_size=size,
        dtype=jnp.bfloat16 if cfg.train.bf16 else jnp.float32,
        reference_compat=cfg.model.reference_compat,
        **({"anchor_scales": tuple(cfg.model.anchor_scales)}
           if cfg.model.anchor_scales else {}),
    )
    labels0 = jnp.full((2, cfg.data.max_boxes, 5), -1, jnp.float32)
    variables = model.init(
        {"params": jax.random.key(cfg.train.seed),
         "sampling": jax.random.key(1), "dropout": jax.random.key(2)},
        jnp.zeros((2, size, size, 3)), labels0, train=True,
    )
    variables = _maybe_import_pretrained(cfg, variables)
    tx = build_optimizer(
        cfg.train.optimizer, variables["params"],
        weight_decay=cfg.train.weight_decay, momentum=cfg.train.momentum,
        grad_clip_norm=cfg.train.grad_clip_norm or 10.0,  # ref clips to 10
    )
    emit = "i420" if cfg.data.i420 else "rgb"
    workers = dict(num_workers=cfg.data.num_workers,
                   worker_backend=cfg.data.worker_backend)
    from .data import build_augmentation

    train_loader = DetectionLoader(
        DetectionDataset(cfg.data.data_root, cfg.data.train_dir, cfg.data.cache),
        size, cfg.data.batch_size, cfg.data.max_boxes, train=True,
        seed=cfg.train.seed, emit=emit, on_corrupt=cfg.data.on_corrupt,
        augmentation=build_augmentation(cfg.data.augment),
        host_shard=cfg.data.host_shard or None,
        **workers,
    )
    val_loader = DetectionLoader(
        DetectionDataset(cfg.data.data_root, cfg.data.val_dir, cfg.data.cache),
        size, cfg.data.batch_size, cfg.data.max_boxes, train=False, emit=emit,
        **workers,
    )
    steps_per_epoch = max(len(train_loader), 1)
    fit = Fit(
        None, None, tx, variables, train_loader, val_loader,
        epochs=cfg.train.epochs, mesh=mesh, seed=cfg.train.seed,
        fsdp=cfg.fsdp,
        # step decay x0.1 every 8 epochs (demos/faster_rcnn/cfg/_fit.py:23-25)
        schedule=step_decay_lr(cfg.train.lr, 8 * steps_per_epoch),
        evaluator=detection_evaluator(
            make_frcnn_eval_step(model, score_thresh=cfg.nms.conf_thres,
                                 nms_thresh=cfg.nms.iou_thres), mesh=mesh),
        ckpt_dir=cfg.train.ckpt_dir,
        eval_every=cfg.train.eval_every,
        logger=MetricLogger(cfg.train.ckpt_dir),
        start_epoch=cfg.train.start_epoch,
        resume=args.resume,
        metric_key="map50", metric_mode="max",
        step_fn=make_frcnn_train_step(model, tx, seed=cfg.train.seed),
        preempt_signals=_preempt_signals(cfg),
    )
    fit.run()


def cmd_train_cls(args, overrides):
    """Classification training (ref classfication/ + template surface)."""
    import jax
    import jax.numpy as jnp

    cfg = _load_config(args, overrides)
    from .core.rng import set_random_seeds
    from .core.telemetry import MetricLogger
    from .data import (
        Augmentation,
        ClassificationDataset,
        ClassificationLoader,
        HorizontalFlip,
        normalize_images,
    )
    from .models import classification as cls_zoo
    from .train import (
        Fit,
        build_optimizer,
        classification_evaluator,
        cross_entropy,
        make_eval_step,
        warmup_cosine_lr,
    )

    set_random_seeds(cfg.train.seed)
    mesh = _mesh_from_cfg(cfg)
    factory = getattr(cls_zoo, cfg.model.backbone)
    model = factory(
        num_classes=cfg.model.num_classes,
        dtype=jnp.bfloat16 if cfg.train.bf16 else jnp.float32,
    )
    size = cfg.data.input_size
    variables = model.init(jax.random.key(cfg.train.seed),
                           jnp.zeros((2, size, size, 3)), train=True)
    variables = _maybe_import_pretrained(cfg, variables)

    def apply_fn(v, images, **kw):
        return model.apply(v, normalize_images(images, model.dtype, imagenet=True), **kw)

    def loss_fn(logits, batch):
        import jax.numpy as jnp

        acc = jnp.mean(jnp.argmax(logits, -1) == batch["labels"])
        if "soft" in batch:  # mixup/cutmix/smoothing targets (train/mix.py)
            from .train import soft_cross_entropy

            return soft_cross_entropy(logits, batch["soft"]), {"acc": acc}
        return cross_entropy(logits, batch["labels"]), {"acc": acc}

    mix_transform = None
    if (cfg.train.mixup_alpha > 0 or cfg.train.cutmix_alpha > 0
            or cfg.train.label_smoothing > 0):
        from .train import make_classification_mix

        mix_transform = make_classification_mix(
            cfg.model.num_classes,
            mixup_alpha=cfg.train.mixup_alpha,
            cutmix_alpha=cfg.train.cutmix_alpha,
            smoothing=cfg.train.label_smoothing,
        )

    tx = build_optimizer(cfg.train.optimizer, variables["params"],
                         weight_decay=cfg.train.weight_decay,
                         momentum=cfg.train.momentum)
    from .data import build_augmentation

    aug = (build_augmentation(cfg.data.augment)
           or Augmentation([HorizontalFlip(p=0.5)]))
    train_loader = ClassificationLoader(
        ClassificationDataset(cfg.data.data_root, cfg.data.train_dir,
                              cfg.data.categories or None),
        size, cfg.data.batch_size,
        augmentation=aug, seed=cfg.train.seed,
        on_corrupt=cfg.data.on_corrupt,
        num_workers=cfg.data.num_workers,
        worker_backend=cfg.data.worker_backend,
        host_shard=cfg.data.host_shard or None)
    val_loader = ClassificationLoader(
        ClassificationDataset(cfg.data.data_root, cfg.data.val_dir,
                              cfg.data.categories or None),
        size, cfg.data.batch_size, train=False,
        num_workers=cfg.data.num_workers,
        worker_backend=cfg.data.worker_backend)
    steps = cfg.train.epochs * max(len(train_loader), 1)
    fit = Fit(
        apply_fn, loss_fn, tx, variables, train_loader, val_loader,
        epochs=cfg.train.epochs, mesh=mesh, seed=cfg.train.seed,
        fsdp=cfg.fsdp,
        schedule=warmup_cosine_lr(cfg.train.lr, cfg.train.final_lr, steps,
                                  warmup_steps=cfg.train.warmup_epochs
                                  * max(len(train_loader), 1)),
        evaluator=classification_evaluator(make_eval_step(apply_fn), mesh=mesh),
        ckpt_dir=cfg.train.ckpt_dir,
        logger=MetricLogger(cfg.train.ckpt_dir),
        resume=args.resume,
        metric_key="accuracy", metric_mode="max",
        step_fn=_maybe_step_fn(cfg, apply_fn, loss_fn, tx,
                               batch_transform=mix_transform),
        preempt_signals=_preempt_signals(cfg),
    )
    fit.run()


def cmd_train_video(args, overrides):
    """Video recognition training (ref videoRecognition/: C3D / 3D-ResNet /
    SlowFast over folder-per-class clips, frame samplers
    datasets/common/video_sampler.py) — same Fit/checkpoint/telemetry path
    as classification, batches are NDHWC clips."""
    import jax
    import jax.numpy as jnp

    cfg = _load_config(args, overrides)
    from .core.rng import set_random_seeds
    from .core.telemetry import MetricLogger
    from .data import VideoClipLoader, VideoFolderDataset, normalize_images
    from .models import video as video_zoo
    from .train import (
        Fit,
        build_optimizer,
        classification_evaluator,
        cross_entropy,
        make_eval_step,
        video_multiclip_evaluator,
        warmup_cosine_lr,
    )

    set_random_seeds(cfg.train.seed)
    mesh = _mesh_from_cfg(cfg)
    factory = getattr(video_zoo, cfg.model.backbone, None)
    if factory is None:
        names = [n for n in dir(video_zoo) if not n.startswith("_") and n.islower()]
        raise SystemExit(
            f"unknown video model {cfg.model.backbone!r}; pick one of {names}")
    extra = {}
    if cfg.mesh_time > 1:
        import inspect

        from .core.mesh import TIME_AXIS

        if "time_axis" not in inspect.signature(factory).parameters:
            raise SystemExit(
                f"mesh_time={cfg.mesh_time} needs a time-shardable model "
                f"(slowfast_*); {cfg.model.backbone!r} has no time_axis")
        extra["time_axis"] = TIME_AXIS
    model = factory(
        num_classes=cfg.model.num_classes,
        dtype=jnp.bfloat16 if cfg.train.bf16 else jnp.float32,
        **extra,
    )
    size, T = cfg.data.input_size, cfg.data.num_frames
    variables = model.init(jax.random.key(cfg.train.seed),
                           jnp.zeros((2, T, size, size, 3)), train=True)
    variables = _maybe_import_pretrained(cfg, variables)

    def apply_fn(v, images, **kw):
        return model.apply(v, normalize_images(images, model.dtype, imagenet=True), **kw)

    def loss_fn(logits, batch):
        acc = jnp.mean(jnp.argmax(logits, -1) == batch["labels"])
        return cross_entropy(logits, batch["labels"]), {"acc": acc}

    tx = build_optimizer(cfg.train.optimizer, variables["params"],
                         weight_decay=cfg.train.weight_decay,
                         momentum=cfg.train.momentum)
    cats = cfg.data.categories or None
    train_loader = VideoClipLoader(
        VideoFolderDataset(cfg.data.data_root, cfg.data.train_dir, cats),
        num_frames=T, size=size, batch_size=cfg.data.batch_size,
        strategy=cfg.data.frame_strategy, seed=cfg.train.seed,
        num_workers=cfg.data.num_workers,
        worker_backend=cfg.data.worker_backend,
        on_corrupt=cfg.data.on_corrupt,
        host_shard=cfg.data.host_shard or None)
    val_loader = VideoClipLoader(
        VideoFolderDataset(cfg.data.data_root, cfg.data.val_dir, cats),
        num_frames=T, size=size, batch_size=cfg.data.batch_size,
        strategy=cfg.data.frame_strategy, train=False,
        num_workers=cfg.data.num_workers,
        worker_backend=cfg.data.worker_backend)
    steps = cfg.train.epochs * max(len(train_loader), 1)
    fit = Fit(
        apply_fn, loss_fn, tx, variables, train_loader, val_loader,
        epochs=cfg.train.epochs, mesh=mesh, seed=cfg.train.seed,
        fsdp=cfg.fsdp,
        schedule=warmup_cosine_lr(cfg.train.lr, cfg.train.final_lr, steps,
                                  warmup_steps=cfg.train.warmup_epochs
                                  * max(len(train_loader), 1)),
        evaluator=(
            video_multiclip_evaluator(make_eval_step(apply_fn),
                                      n_clips=cfg.data.eval_clips, mesh=mesh)
            if cfg.data.eval_clips > 1
            else classification_evaluator(make_eval_step(apply_fn), mesh=mesh)
        ),
        ckpt_dir=cfg.train.ckpt_dir,
        logger=MetricLogger(cfg.train.ckpt_dir),
        resume=args.resume,
        metric_key="accuracy", metric_mode="max",
        eval_every=cfg.train.eval_every,
        save_every_epoch=cfg.train.save_every_epoch,
        preempt_signals=_preempt_signals(cfg),
    )
    fit.run()


def _restore_variables(ckpt: str, variables: dict) -> dict:
    """Load a run checkpoint for inference: EMA weights when the run
    trained with EMA, else raw params; batch_stats when present."""
    from .core.checkpoint import CheckpointManager

    mgr = CheckpointManager(ckpt)
    like = {"params": variables["params"]}
    if variables.get("batch_stats"):
        like["batch_stats"] = variables["batch_stats"]
    like["ema_params"] = variables["params"]
    restored = mgr.restore(like=like)
    variables = dict(variables)
    variables["params"] = restored["state"].get(
        "ema_params", restored["state"]["params"]
    )
    if "batch_stats" in restored["state"]:
        variables["batch_stats"] = restored["state"]["batch_stats"]
    return variables


def _detector_from_cfg(cfg, ckpt: str | None, fast_decode: bool = False,
                       batch_buckets=()):
    import jax
    import jax.numpy as jnp

    from .infer import Detector

    model, variables, anchors = _build_detection(cfg, train=False)
    if ckpt:
        variables = _restore_variables(ckpt, variables)
    return Detector(
        model, variables, anchors, input_size=cfg.data.input_size,
        conf_thres=cfg.nms.conf_thres, iou_thres=cfg.nms.iou_thres,
        max_det=cfg.nms.max_det, class_names=cfg.data.categories or None,
        dtype=jnp.bfloat16 if cfg.train.bf16 else jnp.float32,
        multi_label=cfg.nms.multi_label,
        input_format="i420" if cfg.data.i420 else "rgb",
        fast_decode=fast_decode,
        batch_buckets=batch_buckets,
    )


def cmd_eval(args, overrides):
    cfg = _load_config(args, overrides)
    if getattr(args, "task", "detect") != "detect":
        return _eval_classifier(cfg, args)
    from .data import DetectionDataset

    det = _detector_from_cfg(cfg, args.ckpt,
                             fast_decode=getattr(args, "fast_decode", False))
    ds = DetectionDataset(cfg.data.data_root, cfg.data.val_dir)
    if getattr(args, "int8", False):
        _quantize_detector(det, ds,
                           percentile=getattr(args, "int8_percentile", False))
    if getattr(args, "sweep", None):
        from .infer.predictor import REFERENCE_SWEEP

        if args.sweep == "reference":
            points = REFERENCE_SWEEP
        else:
            points = [tuple(map(float, p.split(":")))
                      for p in args.sweep.split(",")]
        rows = det.evaluate_sweep(ds, points,
                                  metric_file=args.metric_file or None,
                                  max_images=args.max_images)
        for r in rows:
            print(f"conf {r['conf']:.2f} iou {r['iou']:.2f}  "
                  f"mAP@0.5 {r['map50']:.4f}  mAP@0.5:0.95 {r['map']:.4f}")
        best = max(rows, key=lambda r: r["map50"])
        print(f"best mAP@0.5: {best['map50']:.4f} at conf {best['conf']:.2f} "
              f"iou {best['iou']:.2f}")
        return
    res = det.evaluate(
        ds, metric_file=args.metric_file,
        config_note=f"conf {cfg.nms.conf_thres} iou {cfg.nms.iou_thres} "
                    f"size {cfg.data.input_size}"
                    + (" tta" if args.tta else ""),
        max_images=args.max_images,
        tta=args.tta,
        save_json=args.save_json or None,
        coco_ids=args.coco_ids,
    )
    print(f"mAP@0.5 {res['map50']:.4f}  mAP@0.5:0.95 {res['map']:.4f}  "
          f"({res['images']} imgs, {res['img_per_sec']:.1f} img/s)")
    if args.save_json:
        print(f"detections JSON -> {args.save_json}")


def cmd_infer(args, overrides):
    import os

    cfg = _load_config(args, overrides)
    det = _detector_from_cfg(cfg, args.ckpt,
                             fast_decode=getattr(args, "fast_decode", False))
    from .viz import draw_detections

    os.makedirs(args.out, exist_ok=True)
    import cv2

    def save(path, res):
        from .data.dataset import imread_rgb

        img = imread_rgb(path)
        drawn = draw_detections(img, res["boxes"], res["scores"], res["classes"],
                                det.class_names)
        out_path = os.path.join(args.out, os.path.basename(path))
        cv2.imwrite(out_path, cv2.cvtColor(drawn, cv2.COLOR_RGB2BGR))
        print(f"{path}: {len(res['boxes'])} detections -> {out_path}")

    if os.path.isdir(args.source):
        for path, res in det.predict_dir(args.source):
            save(path, res)
    elif args.source.lower().endswith((".mp4", ".avi", ".mov", ".mkv")):
        n = det.predict_video(args.source,
                              os.path.join(args.out, "annotated.mp4"))
        print(f"{n} frames -> {args.out}/annotated.mp4")
    else:
        save(args.source, det.predict_image(args.source))


def _quantize_detector(det, ds, n_calib: int = 8, percentile: bool = False):
    """int8 PTQ with activation calibration on the first val images."""
    imgs = [ds[i][0] for i in range(min(n_calib, len(ds)))]
    det.quantize(imgs, percentile=percentile)
    kind = "99.9th-percentile" if percentile else "absmax"
    print(f"int8: quantized with {len(imgs)} calibration images ({kind})")


def cmd_serve(args, overrides):
    # serving preset: the reference's competition recipe is MULTI-LABEL NMS
    # at conf .001 / iou .6 (customize_service.py:453) — applied unless the
    # user overrides nms.* explicitly in config/CLI
    overrides = [
        "nms.multi_label=true", "nms.conf_thres=0.001", "nms.iou_thres=0.6",
        *overrides,
    ]
    cfg = _load_config(args, overrides)
    from .infer.serving import VisionService, serve

    # serving compiles 1/2/4-image buckets besides the full batch: a lone
    # request pays a bs1 upload+forward instead of padding to batch_size
    # (docs/PERF.md serving table — the upload IS the latency on thin
    # links); each bucket is one extra cached compile at warmup
    det = _detector_from_cfg(cfg, args.ckpt,
                             fast_decode=getattr(args, "fast_decode", False),
                             batch_buckets=(1, 2, 4))
    if getattr(args, "int8", False):
        calib_dir = getattr(args, "calib_dir", "")
        if calib_dir:
            import os

            from .infer.predictor import IMG_EXTS

            paths = sorted(
                os.path.join(calib_dir, f) for f in os.listdir(calib_dir)
                if f.lower().endswith(IMG_EXTS)
            )[:8]
            if not paths:
                raise SystemExit(f"--calib-dir {calib_dir!r} contains no images")
            det.quantize(paths)
            print(f"int8: quantized with {len(paths)} calibration images")
        else:
            from .data import DetectionDataset

            try:
                ds = DetectionDataset(cfg.data.data_root, cfg.data.val_dir)
            except FileNotFoundError as e:
                raise SystemExit(
                    "int8 serving needs calibration images: the training "
                    f"dataset ({cfg.data.data_root}/{cfg.data.val_dir}) is not "
                    "on this host — pass --calib-dir DIR with a few "
                    "representative images instead"
                ) from e
            _quantize_detector(det, ds)
    window = args.batch_window
    if window != "adaptive":
        window = float(window)
    serve(VisionService(det), host=args.host, port=args.port,
          batch_window_ms=window)


def cmd_convert(args, overrides):
    from .data.converters import coco_to_fastvision, voc_to_fastvision

    if args.kind == "coco":
        n = coco_to_fastvision(args.ann, args.images, args.out, split=args.split)
    else:
        n = voc_to_fastvision(args.voc_root, args.out, image_set=args.split)
    print(f"converted {n} images -> {args.out}")


def cmd_anchors(args, overrides):
    cfg = _load_config(args, overrides)
    from .data import DetectionDataset
    from .ops.anchors import AnchorGenerator

    ds = DetectionDataset(cfg.data.data_root, cfg.data.train_dir)
    gen = AnchorGenerator(datasets=[ds], k=args.k, cache_dir=args.cache_dir,
                          init=args.init)
    if getattr(args, "plot", ""):
        # scatter (w, h) colored by assigned cluster + the anchor centers
        # (ref ANCHOR.py:111-115 plot)
        from .core.plots import plot_anchors
        from .ops.anchors import kmeans_anchors

        wh = gen._scan_wh()
        anchors, assign = kmeans_anchors(wh, k=args.k, init=args.init)
        print(f"anchor plot -> {plot_anchors(wh, anchors, assign, args.plot)}")
    else:
        anchors = gen.get_anchors()
    print("anchors (w, h), area-ascending:")
    for w, h in anchors:
        print(f"  {w:.1f} {h:.1f}")


def _build_zoo_model(cfg, task: str, batch: int = 1):
    """Build a classification/video zoo model + init variables for the
    non-detection CLI paths (`eval --task`, `export --task`); returns
    (model, variables, in_shape) with in_shape = (batch, [T,] S, S, 3)."""
    import jax
    import jax.numpy as jnp

    if task == "video":
        from .models import video as zoo

        S, T = cfg.data.input_size, cfg.data.num_frames
        in_shape = (batch, T, S, S, 3)
    else:
        from .models import classification as zoo

        S = cfg.data.input_size
        in_shape = (batch, S, S, 3)
    factory = getattr(zoo, cfg.model.backbone, None)
    if factory is None:
        raise SystemExit(
            f"unknown {task} model {cfg.model.backbone!r} "
            f"(available: {[n for n in dir(zoo) if not n.startswith('_')]})")
    model = factory(num_classes=cfg.model.num_classes,
                    dtype=jnp.bfloat16 if cfg.train.bf16 else jnp.float32)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, *in_shape[1:])), train=True)
    return model, variables, in_shape


def _eval_classifier(cfg, args):
    """Standalone accuracy eval of a trained classification/video
    checkpoint (`eval --task cls|video --ckpt dir`): top-1 over the val
    split — the same evaluator the train loop uses (ref
    metrics/accuracy.py:3), plus the Kinetics-style multi-clip protocol
    for video when data.eval_clips > 1."""
    import time

    from .data import normalize_images
    from .train import (
        TrainState,
        classification_evaluator,
        make_eval_step,
        video_multiclip_evaluator,
    )

    if not args.ckpt:
        raise SystemExit(f"eval --task {args.task} needs --ckpt")
    model, variables, _ = _build_zoo_model(cfg, args.task)
    variables = _restore_variables(args.ckpt, variables)
    mesh = _mesh_from_cfg(cfg)

    def apply_fn(v, images, **kw):
        x = normalize_images(images, model.dtype, imagenet=True)
        try:
            return model.apply(v, x, **kw)
        except TypeError:  # modules without a train switch (e.g. ViT)
            return model.apply(v, x)

    # place params on the mesh (replicated, or channel-sharded over a real
    # model axis) — batches arrive sharded over 'data', so params left on
    # one device would make the jitted eval step reject the mix
    from .core.mesh import MODEL_AXIS, replicate

    if mesh.shape.get(MODEL_AXIS, 1) > 1:
        from .parallel.tensor_shard import shard_variables as place
    else:
        place = replicate
    state = TrainState(place(variables["params"], mesh),
                       place(variables.get("batch_stats", {}), mesh), None, 0)
    cats = cfg.data.categories or None
    if args.task == "video":
        from .data import VideoClipLoader, VideoFolderDataset

        loader = VideoClipLoader(
            VideoFolderDataset(cfg.data.data_root, cfg.data.val_dir, cats),
            num_frames=cfg.data.num_frames, size=cfg.data.input_size,
            batch_size=cfg.data.batch_size,
            strategy=cfg.data.frame_strategy, train=False,
            num_workers=cfg.data.num_workers,
            worker_backend=cfg.data.worker_backend)
        unit = "clip"
        evaluate = (
            video_multiclip_evaluator(make_eval_step(apply_fn),
                                      n_clips=cfg.data.eval_clips, mesh=mesh)
            if cfg.data.eval_clips > 1
            else classification_evaluator(make_eval_step(apply_fn), mesh=mesh))
    else:
        from .data import ClassificationDataset, ClassificationLoader

        loader = ClassificationLoader(
            ClassificationDataset(cfg.data.data_root, cfg.data.val_dir, cats),
            cfg.data.input_size, cfg.data.batch_size, train=False,
            num_workers=cfg.data.num_workers,
            worker_backend=cfg.data.worker_backend)
        unit = "img"
        evaluate = classification_evaluator(make_eval_step(apply_fn), mesh=mesh)
    t0 = time.perf_counter()
    res = evaluate(state, loader)
    dt = time.perf_counter() - t0
    n = len(loader.ds)
    extra = f" ({res['n_clips']}-clip protocol)" if "n_clips" in res else ""
    print(f"top-1 accuracy {res['accuracy']:.4f}{extra}  "
          f"({n} {unit}s, {n / dt:.1f} {unit}/s)")
    return res


def _export_classifier(cfg, args, tflite: bool, stablehlo: bool):
    """Export a classification/video-recognition program (normalize +
    forward + softmax, uint8 in) — same artifact formats as the detector
    path; --task picks the zoo."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from .data import normalize_images

    model, variables, in_shape = _build_zoo_model(cfg, args.task, args.batch)
    if args.ckpt:
        variables = _restore_variables(args.ckpt, variables)

    def infer_fn(v, images_u8):
        x = normalize_images(jnp.asarray(images_u8), model.dtype, imagenet=True)
        try:
            logits = model.apply(v, x, train=False)
        except TypeError:  # modules without a train switch (e.g. ViT)
            logits = model.apply(v, x)
        return {"probs": jax.nn.softmax(logits.astype(jnp.float32))}

    example = np.zeros(in_shape, np.uint8)
    if tflite:
        from .infer.export import export_tflite

        path = export_tflite(infer_fn, variables, [example], args.out,
                             input_names=["images"])
        kind = "TFLite flatbuffer"
    elif stablehlo:
        from .infer.export import export_stablehlo

        path = export_stablehlo(infer_fn, variables, [example], args.out)
        kind = "StableHLO artifact"
    else:
        from .infer.export import export_savedmodel

        path = export_savedmodel(infer_fn, variables, [example], args.out,
                                 input_names=["images"])
        kind = "SavedModel"
    print(f"{kind} ({cfg.model.backbone}, {'x'.join(map(str, in_shape))} "
          f"uint8 in, probs [B,{cfg.model.num_classes}] out) -> {path}")


def cmd_export(args, overrides):
    """Export the detector program (fwd + decode + NMS) as a SavedModel."""
    import jax.numpy as jnp
    import numpy as np

    cfg = _load_config(args, overrides)
    tflite = getattr(args, "tflite", False) or args.out.endswith(".tflite")
    stablehlo = (getattr(args, "stablehlo", False)
                 or args.out.endswith(".stablehlo"))
    if tflite and stablehlo:
        raise SystemExit(
            "export: --tflite and --stablehlo (or conflicting --out "
            "suffixes) are mutually exclusive — pick one format"
        )
    if tflite:
        # TFLite builtin kernels have no bf16 type — edge artifacts compute
        # in fp32 (quantization, if any, is the converter's job below)
        cfg.train.bf16 = False
    if getattr(args, "task", "detect") != "detect":
        if getattr(args, "int8", False):
            raise SystemExit("export --int8 is detector-only (w8a8 ConvBN "
                             "path); use --tflite converter PTQ instead")
        _export_classifier(cfg, args, tflite, stablehlo)
        return
    det = _detector_from_cfg(cfg, args.ckpt)
    representative = None
    if getattr(args, "int8", False):
        from .data import DetectionDataset

        ds = DetectionDataset(cfg.data.data_root, cfg.data.val_dir)
        if tflite:
            # TFLite builtins need QI8 quantized types, not our raw-s8
            # w8a8 bake — use converter-side PTQ on calibration images
            from .infer.preprocess import preprocess_image

            representative = [
                np.repeat(preprocess_image(ds[i][0], cfg.data.input_size)[0][None],
                          args.batch, axis=0)
                for i in range(min(8, len(ds)))
            ]
        else:
            # quantized variables ('quant' collection) bake into the
            # exported graph: ConvBN routes through its int8 path
            _quantize_detector(det, ds)
    from .infer.export import export_savedmodel, export_tflite

    example = np.zeros((args.batch, cfg.data.input_size, cfg.data.input_size, 3),
                       np.uint8)

    def infer_fn(variables, images_u8):
        d = det._infer(variables, jnp.asarray(images_u8))
        return {"boxes": d.boxes, "scores": d.scores,
                "classes": d.classes, "valid": d.valid}

    if tflite:
        if representative is not None:
            # int8 TFLite exports the PRE-NMS program (normalize+forward+
            # decode): TF's calibrator segfaults walking the flex sort in
            # fixed-K NMS, and edge runtimes do NMS app-side anyway
            fn, note = det._predecode, " pre-NMS [B,N,5+C] out (int8 PTQ)"
        else:
            fn, note = infer_fn, ""
        path = export_tflite(fn, det.variables, [example], args.out,
                             input_names=["images"],
                             representative_inputs=representative)
        kind = f"TFLite flatbuffer{note}"
    elif stablehlo:
        from .infer.export import export_stablehlo

        path = export_stablehlo(infer_fn, det.variables, [example], args.out)
        kind = "StableHLO artifact"
    else:
        path = export_savedmodel(infer_fn, det.variables, [example], args.out,
                                 input_names=["images"])
        kind = "SavedModel"
    outputs = ("pre-NMS [B,N,5+C] out (NMS runs app-side)"
               if tflite and representative is not None
               else "boxes/scores/classes/valid out")
    print(f"{kind} (batch {args.batch}, {cfg.data.input_size}px, "
          f"uint8 NHWC in, {outputs}) -> {path}")


_GENERATED_TRAIN = '''\
"""Training entry for this project — edit freely; the CLI equivalent is
`python -m fastvision_tpu train --config cfg.yaml`. Library-consumer
template (the reference's generate/template-yolov3 scaffold)."""
import sys

from fastvision_tpu.cli import main

if __name__ == "__main__":
    main(["train", "--config", "cfg.yaml", *sys.argv[1:]])
'''

_GENERATED_README = """\
# {name} — fastvision_tpu project

1. Put your dataset at `data.data_root` from `cfg.yaml`
   (`<root>/{{train,val}}/images/*.jpg` + `labels/*.txt`,
   one `cls xmin ymin xmax ymax` pixel-coord line per object), or build it:

       python -m fastvision_tpu convert --kind coco --ann ann.json \\
           --images imgs/ --out data/ --split train

2. Edit `cfg.yaml` (every field is the framework default; any key can
   also be overridden on the command line as `section.key=value`).

3. Run:

       python train.py                           # or: fastvision_tpu train --config cfg.yaml
       python -m fastvision_tpu anchors --config cfg.yaml -k 9
       python -m fastvision_tpu eval   --config cfg.yaml --ckpt checkpoints/
       python -m fastvision_tpu infer  --config cfg.yaml --ckpt checkpoints/ --source img/
       python -m fastvision_tpu serve  --config cfg.yaml --ckpt checkpoints/ --port 8080
       python -m fastvision_tpu export --config cfg.yaml --ckpt checkpoints/ --out sm/
"""


def cmd_doctor(args, overrides):
    """Environment triage for a new deployment host: device visibility,
    link bandwidth, host decode budget, native kernels, compile cache —
    the facts that decide data.num_workers / data.i420 / compile_cache
    before the first real run. Prints one line per check + a JSON line."""
    import json
    import os
    import platform
    import sys
    import time

    report: dict = {"host": platform.node(), "cores": os.cpu_count()}

    def line(key, value, hint=""):
        report[key] = value
        print(f"[doctor] {key:<22} {value}" + (f"   ({hint})" if hint else ""))

    line("python", platform.python_version())
    line("cores", os.cpu_count())

    # --- device backend ---------------------------------------------------
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    devs = jax.devices()
    line("backend", devs[0].platform, f"{len(devs)} device(s), "
         f"visible in {time.perf_counter() - t0:.1f}s")
    report["n_devices"] = len(devs)

    # tiny jit smoke: compile + run (catches broken toolchains early)
    x = jnp.ones((256, 256), jnp.bfloat16)
    f = jax.jit(lambda a: (a @ a).sum())
    t0 = time.perf_counter()
    float(f(x))
    line("jit_smoke_s", round(time.perf_counter() - t0, 2),
         "first compile is slow on remote backends; cached after")

    # MXU headroom: achieved bf16 TFLOP/s on a chain of 4096^3 matmuls —
    # the chip-side ceiling every model MFU (bench.py mfu_*) is judged
    # against. All 128 iterations run inside ONE jitted fori_loop: over a
    # remote tunnel each dispatch costs ~5 ms, which would swamp a single
    # 0.7 ms kernel (separate-dispatch timing reads ~26 "TFLOP/s" here).
    iters, n = 128, 4096

    def _mm_chain(a):
        # rescale each round: keeps the chain data-dependent (nothing for
        # XLA to hoist) and the values finite in bf16
        body = lambda _, a: (a @ a) * jnp.bfloat16(1e-4)
        out = jax.lax.fori_loop(0, iters, body, a)
        return out.astype(jnp.float32).sum()

    mm = jax.jit(_mm_chain)
    a = jnp.full((n, n), 0.5, jnp.bfloat16)  # device-side fill: no 32 MB H2D
    float(mm(a))  # compile + warm
    t0 = time.perf_counter()
    float(mm(a))
    tflops = iters * 2 * n**3 / (time.perf_counter() - t0) / 1e12
    line("matmul_tflops_bf16", round(tflops, 1),
         "v5e peak 197; mfu_* in bench.py uses the same denominator")

    # H2D bandwidth (8 MB uint8, best of 3) — decides whether data.i420
    # (half the bytes) matters on this host
    import numpy as np

    buf = np.random.default_rng(0).integers(0, 255, (8 << 20,), np.uint8)
    np.asarray(jnp.asarray(buf)[0])
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(jnp.asarray(buf)[0])
        best = max(best, 8 / (time.perf_counter() - t0))
    line("h2d_MBps", round(best, 1),
         "i420 batches (data.i420=true) pay off below ~1000 MB/s")

    # --- host decode budget ------------------------------------------------
    import cv2

    line("cv2", cv2.__version__)
    img = np.random.default_rng(0).integers(0, 255, (480, 640, 3), np.uint8)
    jpg = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, 90])[1].tobytes()
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < 0.5:
        cv2.imdecode(np.frombuffer(jpg, np.uint8), cv2.IMREAD_COLOR)
        n += 1
    per_core = n / (time.perf_counter() - t0)
    line("decode_img_s_core", round(per_core, 1),
         f"x{os.cpu_count()} cores with worker_backend='process'")

    # --- native kernels ----------------------------------------------------
    from . import native

    line("native_letterbox", bool(native.available()))
    line("native_jpeg_i420", bool(native.jpeg_i420_available()),
         "fused JPEG->I420 decode for i420 eval loads")

    # --- process workers ---------------------------------------------------
    start = "forkserver" if "jax" in sys.modules else "fork"
    line("worker_start_method", start,
         "auto: never fork() once jax is imported")

    # --- compile cache -----------------------------------------------------
    cache = jax.config.jax_compilation_cache_dir or ""
    line("compile_cache", cache or "(unset)",
         "set cfg.compile_cache to skip recompiles across restarts")

    print(json.dumps(report))


def cmd_generate(args, overrides):
    """Scaffold a ready-to-edit project dir: cfg.yaml (full defaulted
    config), train.py consumer script, README (the reference's
    generate/template-yolov3 scaffold, run.py:1)."""
    import os

    import yaml

    from .core.config import Config, apply_overrides, to_dict

    cfg = apply_overrides(Config(), [f"model.name={args.model}", *overrides])
    out = args.out
    os.makedirs(out, exist_ok=True)
    cfg_path = os.path.join(out, "cfg.yaml")
    if os.path.exists(cfg_path) and not args.force:
        raise SystemExit(f"{cfg_path} exists — pass --force to overwrite")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(to_dict(cfg), f, sort_keys=False)
    with open(os.path.join(out, "train.py"), "w") as f:
        f.write(_GENERATED_TRAIN)
    with open(os.path.join(out, "README.md"), "w") as f:
        f.write(_GENERATED_README.format(name=os.path.basename(
            os.path.abspath(out))))
    print(f"project scaffold -> {out}/ (cfg.yaml, train.py, README.md)")


def make_parser() -> argparse.ArgumentParser:
    """The CLI surface (superset of the reference's run.py argparse flags,
    generate/template-yolov3/run.py + demos/*/run.py; unknown key=value
    args flow through as dotted config overrides)."""
    parser = argparse.ArgumentParser("fastvision_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    def common(p):
        p.add_argument("--config", default="", help="YAML config file")
        return p

    p = common(sub.add_parser("train"))
    p.add_argument("--resume", action="store_true")
    p = common(sub.add_parser("train-cls"))
    p.add_argument("--resume", action="store_true")
    p = common(sub.add_parser("train-video",
                              help="video recognition (C3D/3D-ResNet/"
                                   "SlowFast) over folder-per-class clips"))
    p.add_argument("--resume", action="store_true")
    p = common(sub.add_parser("eval"))
    p.add_argument("--task", choices=["detect", "cls", "video"],
                   default="detect",
                   help="detect: mAP over a detection val split (default); "
                        "cls/video: top-1 accuracy of a trained "
                        "classification/video checkpoint (video honors "
                        "data.eval_clips for the multi-clip protocol)")
    p.add_argument("--ckpt", default="")
    p.add_argument("--metric-file", default="")
    p.add_argument("--max-images", type=int, default=None)
    p.add_argument("--tta", action="store_true",
                   help="horizontal-flip test-time augmentation")
    p.add_argument("--int8", action="store_true",
                   help="int8 w8a8 PTQ inference (calibrates on val images)")
    p.add_argument("--int8-percentile", action="store_true",
                   help="calibrate activations at the 99.9th percentile of "
                        "|x| instead of absmax (outlier-robust)")
    p.add_argument("--fast-decode", action="store_true",
                   help="reduced JPEG decode for >=2x oversized images (perf)")
    p.add_argument("--sweep", nargs="?", const="reference", default=None,
                   metavar="C:I,C:I,...",
                   help="conf:iou threshold sweep (one compile + one data "
                        "pass for the whole grid); bare --sweep runs the "
                        "reference's 9-point grid (inference.py:142-179)")
    p.add_argument("--save-json", default="", metavar="PATH",
                   help="write detections as official COCO results JSON "
                        "(pycocotools-scoreable; parity cross-check)")
    p.add_argument("--coco-ids", action="store_true",
                   help="with --save-json: map the 80 contiguous classes "
                        "back to COCO annotation category ids 1..90")
    p = common(sub.add_parser("infer"))
    p.add_argument("--ckpt", default="")
    p.add_argument("--source", required=True)
    p.add_argument("--out", default="./outputs")
    p.add_argument("--fast-decode", action="store_true",
                   help="reduced JPEG decode for >=2x oversized images (perf)")
    p = common(sub.add_parser("serve"))
    p.add_argument("--ckpt", default="")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--batch-window", default="adaptive",
                   help="micro-batch straggler window in ms, or 'adaptive' "
                        "(default: wait only while the batch keeps growing)")
    p.add_argument("--int8", action="store_true",
                   help="int8 w8a8 PTQ inference (calibrates on val images)")
    p.add_argument("--calib-dir", default="",
                   help="directory of calibration images for --int8 (use when "
                        "the training dataset is not on the serving host)")
    p.add_argument("--fast-decode", action="store_true",
                   help="reduced JPEG decode for >=2x oversized images (perf)")
    sub.add_parser("doctor", help="environment triage: devices, link "
                   "bandwidth, decode budget, native kernels")
    p = sub.add_parser("convert")
    p.add_argument("--kind", choices=["coco", "voc"], required=True)
    p.add_argument("--ann", default="")
    p.add_argument("--images", default="")
    p.add_argument("--voc-root", default="")
    p.add_argument("--out", required=True)
    p.add_argument("--split", default="train")
    p = common(sub.add_parser("anchors"))
    p.add_argument("-k", type=int, default=9)
    p.add_argument("--cache-dir", default="./cache")
    p.add_argument("--init", choices=["random", "++"], default="random")
    p.add_argument("--plot", default="",
                   help="write the (w,h) cluster scatter plot to this path "
                        "(ref ANCHOR.py:111)")
    p = common(sub.add_parser("export"))
    p.add_argument("--ckpt", default="")
    p.add_argument("--out", required=True)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--task", choices=["detect", "cls", "video"],
                   default="detect",
                   help="which program to export: the detector chain "
                        "(fwd+decode+NMS), a classification zoo model, or "
                        "a video-recognition model (normalize+fwd+softmax)")
    p.add_argument("--int8", action="store_true",
                   help="bake int8 w8a8 PTQ into the exported graph "
                        "(calibrates on val images)")
    p.add_argument("--tflite", action="store_true",
                   help="write a single-file .tflite flatbuffer instead of "
                        "a SavedModel (also inferred from an --out ending "
                        "in .tflite)")
    p.add_argument("--stablehlo", action="store_true",
                   help="write a jax.export StableHLO artifact (weights "
                        "baked in; load with infer.load_stablehlo — no "
                        "model code needed at the destination; also "
                        "inferred from an --out ending in .stablehlo)")
    p = sub.add_parser("generate",
                       help="scaffold a new project dir (cfg.yaml + "
                            "train.py + README)")
    p.add_argument("--out", required=True)
    p.add_argument("--model", default="yolov3",
                   choices=["yolov3", "faster_rcnn"])
    p.add_argument("--force", action="store_true")
    return parser


def main(argv=None):
    parser = make_parser()
    args, overrides = parser.parse_known_args(argv)
    overrides = [o for o in overrides if "=" in o]
    {
        "train": cmd_train,
        "train-cls": cmd_train_cls,
        "train-video": cmd_train_video,
        "eval": cmd_eval,
        "infer": cmd_infer,
        "serve": cmd_serve,
        "convert": cmd_convert,
        "anchors": cmd_anchors,
        "export": cmd_export,
        "generate": cmd_generate,
        "doctor": cmd_doctor,
    }[args.cmd](args, overrides)


if __name__ == "__main__":
    main()
