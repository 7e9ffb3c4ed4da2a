"""Hierarchical config: dataclass tree <- YAML file <- CLI dotted overrides.

Replaces the reference's two-level flag system (per-run argparse in every
run.py, e.g. demos/faster_rcnn/run.py:12-54, plus YAML dataset descriptors
datasets/data/*.yaml loaded at demos/yolov3_u/train.py:20) with one
composable scheme. Unlike the reference, configs serialize into checkpoints
(`to_dict`) so runs are reproducible.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field, fields, is_dataclass
from typing import Any, Sequence

import yaml


def _coerce(value: str, target_type: Any) -> Any:
    """Parse a CLI string into the annotated type."""
    if target_type in (int, "int"):
        return int(value)
    if target_type in (float, "float"):
        return float(value)
    if target_type in (bool, "bool"):
        return value.lower() in ("1", "true", "yes", "on")
    if isinstance(value, str) and value.startswith(("[", "{", "(")):
        return yaml.safe_load(value)
    return value


def update_dataclass(obj: Any, updates: dict) -> Any:
    """Return a copy of a (nested) dataclass with dict updates applied."""
    kwargs = {}
    names = {f.name: f for f in fields(obj)}
    for key, val in updates.items():
        if key not in names:
            raise KeyError(f"{type(obj).__name__} has no field {key!r}")
        cur = getattr(obj, key)
        if is_dataclass(cur) and isinstance(val, dict):
            kwargs[key] = update_dataclass(cur, val)
        else:
            kwargs[key] = val
    return dataclasses.replace(obj, **kwargs)


def apply_overrides(obj: Any, overrides: Sequence[str]) -> Any:
    """Apply 'a.b.c=value' dotted CLI overrides to a dataclass tree."""
    for item in overrides:
        if "=" not in item:
            raise ValueError(f"override {item!r} must be key=value")
        path, raw = item.split("=", 1)
        keys = path.lstrip("-").split(".")
        # build a nested dict {a: {b: {c: coerced}}}
        node: Any = obj
        for k in keys[:-1]:
            node = getattr(node, k)
        f = {f.name: f for f in fields(node)}[keys[-1]]
        nested: dict = {keys[-1]: _coerce(raw, f.type)}
        for k in reversed(keys[:-1]):
            nested = {k: nested}
        obj = update_dataclass(obj, nested)
    return obj


def to_dict(obj: Any) -> Any:
    if is_dataclass(obj):
        return {f.name: to_dict(getattr(obj, f.name)) for f in fields(obj)}
    if isinstance(obj, (list, tuple)):
        return [to_dict(x) for x in obj]
    return obj


def from_yaml(cls, path: str, overrides: Sequence[str] = ()) -> Any:
    """Load a dataclass config from YAML, then apply CLI overrides.

    Drop-in compatible with the reference's FLAT dataset descriptors
    (datasets/data/*.yaml: data_root/train_dir/val_dir/test_dir/
    num_classes/categories at top level, loaded at demos/yolov3_u/
    train.py:20): top-level keys that aren't fields of `cls` but are
    fields of DataConfig are nested under `data`, and a flat
    `num_classes` also seeds `model.num_classes` unless the file sets it
    explicitly. An explicit nested `data:` section wins over flat keys.
    """
    with open(path) as f:
        data = yaml.safe_load(f) or {}
    cls_fields = {f.name for f in fields(cls)} if is_dataclass(cls) else set()
    stray = {k: v for k, v in data.items() if k not in cls_fields}
    if stray and "data" in cls_fields:
        data_fields = {f.name for f in fields(DataConfig)}
        if set(stray) <= data_fields:
            data = {k: v for k, v in data.items() if k in cls_fields}
            data["data"] = {**stray, **data.get("data", {})}
            if "num_classes" in data["data"] and "model" in cls_fields:
                # seed from the MERGED data section (an explicit nested
                # data.num_classes beats the flat key) so the model head
                # can't silently disagree with the pipeline's class count
                model = dict(data.get("model", {}))
                model.setdefault("num_classes", data["data"]["num_classes"])
                data["model"] = model
    obj = update_dataclass(cls(), data)
    return apply_overrides(obj, overrides)


# ----------------------------------------------------------------------------
# Dataset descriptor: superset of the reference's datasets/data/*.yaml schema
# (data_root, train/val/test dirs, num_classes, categories).
# ----------------------------------------------------------------------------
@dataclass
class DataConfig:
    data_root: str = ""
    train_dir: str = "train"
    val_dir: str = "val"
    test_dir: str = "test"
    num_classes: int = 80
    categories: list = field(default_factory=list)
    input_size: int = 416
    batch_size: int = 32
    max_boxes: int = 120  # fixed label padding (replaces dynamic collate)
    num_workers: int = 4
    # 'process' = DecodePool fork workers + shared-memory ring (scales
    # decode/augment with cores); 'thread' = GIL-bound cv2 pool
    worker_backend: str = "process"
    # train-time augmentation pipeline (data/augment.py::build_augmentation):
    # list of 'name'/'name:p' strings or {op: name, **kwargs} dicts, e.g.
    # [hflip:0.5, {op: hsv, p: 0.5}, {op: jitter, ratio: 0.3}]. Empty list
    # keeps the command's default recipe.
    augment: list = field(default_factory=list)
    cache: bool = False
    # ship train/val batches as packed YUV 4:2:0 (half the host->device
    # bytes; decoded on device inside the jitted step). Wins on hosts where
    # the device link is the bottleneck (docs/PERF.md).
    i420: bool = False
    # video recognition (train-video): frames per clip and the sampler
    # strategy (data/video_sampler.py: consecutive|random|average|clip_random)
    num_frames: int = 16
    frame_strategy: str = "average"
    # corrupt-file policy for TRAIN loaders: 'skip' substitutes the next
    # index with a warning (one bad file must not kill a long run);
    # 'raise' fails fast. Val/eval loaders always raise — silently
    # dropping images would corrupt metrics.
    on_corrupt: str = "skip"
    # video eval protocol: >1 = Kinetics-style N evenly spaced temporal
    # clips per video, logits averaged (train/fit.py::
    # video_multiclip_evaluator); 1 = single sampled clip
    eval_clips: int = 1
    # multi-host input sharding for TRAIN loaders: '' = off, 'auto' =
    # shard by (jax.process_index(), jax.process_count()) — each host
    # decodes a disjoint 1/P of every epoch and batch_size becomes
    # PER-HOST (global batch = batch_size x P). 'i/n' = explicit (tests /
    # manual clusters). Val loaders stay unsharded (evaluators gather
    # predictions host-side). data/pipeline.py::resolve_host_shard.
    host_shard: str = ""


@dataclass
class TrainConfig:
    epochs: int = 100
    lr: float = 1e-4
    final_lr: float = 1e-6
    optimizer: str = "sgd"  # 'sgd' | 'adam'
    momentum: float = 0.937
    weight_decay: float = 5e-4
    nesterov: bool = True
    scheduler: str = "warmup_cosine"  # see train/schedulers.py
    warmup_epochs: int = 3
    grad_clip_norm: float = 0.0  # 0 disables
    accum_steps: int = 1  # optax MultiSteps: update every Nth batch
    microbatch: int = 1  # in-step accumulation: scan N microbatches/batch
    remat: bool = False  # jax.checkpoint the forward (activation memory)
    # per-epoch multi-scale train sizes (multiples of 32, e.g.
    # [320, 352, 416, 480, 608]); empty = fixed data.input_size. One XLA
    # compile per size (cached); val/no-aug stay at data.input_size
    multiscale: list = field(default_factory=list)
    ema_decay: float = 0.0  # >0 enables EMA weights for eval/checkpoint
    # classification regularizers (train/mix.py, in-jit device-side):
    label_smoothing: float = 0.0
    mixup_alpha: float = 0.0  # e.g. 0.2; both alphas > 0 = switch per step
    cutmix_alpha: float = 0.0  # e.g. 1.0
    neighbor_cells: bool = False  # v5-style expanded YOLO target assignment
    no_aug_epochs: int = 0  # huaweiShip-style final clean-data epochs
    seed: int = 0
    bf16: bool = True
    start_epoch: int = 0
    ckpt_dir: str = "./checkpoints"
    save_every_epoch: bool = True
    eval_every: int = 1  # epochs between val mAP runs
    # checkpoint-and-exit on SIGTERM (preemptible TPU pods); resume=True
    # then redoes the interrupted epoch from the saved mid-epoch state
    preempt_save: bool = True


@dataclass
class ModelConfig:
    name: str = "yolov3"
    backbone: str = "darknet53"
    num_classes: int = 80
    pretrained: str = ""  # checkpoint path (ours or torch)
    freeze: list = field(default_factory=list)  # param-name substrings
    # True (default): COCO anchors scale with data.input_size/416 —
    # right for training recipes where the same anchors should cover the
    # chosen resolution. Set false for ultralytics-checkpoint parity eval
    # at non-416 sizes: the reference keeps the canonical pixel anchors
    # FIXED at any input size (demos/yolov3_u/inference.py:131-137), and
    # the imported weights' wh logits assume exactly those anchors.
    scale_anchors_with_input: bool = True
    # faster_rcnn: RPN anchor scales (x stride pixels); [] = model default
    anchor_scales: list = field(default_factory=list)
    # faster_rcnn: reference-checkpoint decode/clip/anchor semantics
    # (models/detection/faster_rcnn.py::FasterRCNN.reference_compat).
    # Set true when model.pretrained is a reference Faster_Rcnn .pth —
    # its weights assume integer-grid anchors and h-from-dw decoding.
    reference_compat: bool = False


@dataclass
class NMSConfig:
    conf_thres: float = 0.25
    iou_thres: float = 0.45
    max_det: int = 300
    pre_nms_top_k: int = 1024
    multi_label: bool = False


@dataclass
class Config:
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    nms: NMSConfig = field(default_factory=NMSConfig)
    # mesh axes (core/mesh.py): data x model x time must multiply to the
    # device count. mesh_data=0 = every device not claimed by model/time.
    # mesh_model>1: train commands channel-shard params (tensor parallel,
    # parallel/tensor_shard.py); mesh_time>1: train-video shards SlowFast's
    # fast-pathway clip time (parallel/time_shard.py halo exchange).
    mesh_data: int = 0
    mesh_model: int = 1
    mesh_time: int = 1
    # fsdp=true: train commands shard params + optimizer state 1/N over
    # the 'data' axis (ZeRO-3, parallel/fsdp.py) instead of replicating —
    # fits models whose replicated train state exceeds one chip's HBM
    fsdp: bool = False
    # multihost=true: jax.distributed.initialize() before the mesh is
    # built (Cloud TPU pods auto-detect the cluster; manual clusters
    # should use the library API — examples/train_multihost.py). The mesh
    # then spans every host's chips; combine with data.host_shard=auto.
    multihost: bool = False
    # persistent XLA compilation cache directory ('' = off). Kills the
    # 20-40s first-jit cost on restarts: serving cold-start, resumed
    # training, and every multiscale size after the first run all load
    # their executables from disk instead of recompiling
    compile_cache: str = ""
