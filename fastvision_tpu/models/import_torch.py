"""Torch-checkpoint importers: exact name/layout mapping into our flax trees.

Covers the reference's cross-ecosystem checkpoint loading (SURVEY.md §5):
  - `yolov3_from_torch`: the reference demo's YoloV3 state_dict naming
    (demos/yolov3_u/models/{darknet,yolov3}.py: backbone.conv0/convN/resN,
    neck.neck_{small,medium,large}/neck_out_*/up_sampling_*,
    head.head_out_*) — the format its ultralytics-converted COCO weights
    ship in (demos/yolov3_huaweiShip/train.py:93-101 loads these);
  - `vgg_from_torchvision` / `resnet_from_torchvision`: torchvision
    pretrained backbones (the reference initializes Faster R-CNN from
    torchvision VGG16).

Layout conversions: conv OIHW -> HWIO, linear (out,in) -> (in,out); BN
weight/bias -> scale/bias params, running_mean/var -> batch_stats.
All importers return flat {path: array} dicts for `core.checkpoint.
partial_load` — missing/mismatched entries fall back to init (the
reference's shape-filtered non-strict load, utils/checkpoints.py:40-53),
and head-dropping (train.py:93-101) is just partial_load onto a model with
a different class count.
"""
from __future__ import annotations

import numpy as np

from ..core.checkpoint import conv_oihw_to_hwio, linear_oi_to_io

# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------


def _convbn(out: dict, src: dict, torch_prefix: str, our_prefix: str):
    """Map one torch {conv, bn} block into our ConvBN paths."""
    w = src.get(f"{torch_prefix}.conv.weight")
    if w is not None:
        out["params"][f"{our_prefix}/conv/kernel"] = conv_oihw_to_hwio(w)
    _bn(out, src, f"{torch_prefix}.bn", f"{our_prefix}/bn/bn")


def _bn(out: dict, src: dict, torch_prefix: str, our_prefix: str):
    pairs = [
        ("weight", "params", "scale"),
        ("bias", "params", "bias"),
        ("running_mean", "batch_stats", "mean"),
        ("running_var", "batch_stats", "var"),
    ]
    for tname, coll, oname in pairs:
        v = src.get(f"{torch_prefix}.{tname}")
        if v is not None:
            out[coll][f"{our_prefix}/{oname}"] = v


def _conv_bias(out: dict, src: dict, torch_prefix: str, our_prefix: str):
    w = src.get(f"{torch_prefix}.weight")
    if w is not None:
        out["params"][f"{our_prefix}/kernel"] = conv_oihw_to_hwio(w)
    b = src.get(f"{torch_prefix}.bias")
    if b is not None:
        out["params"][f"{our_prefix}/bias"] = b


def _linear(out: dict, src: dict, torch_prefix: str, our_prefix: str):
    w = src.get(f"{torch_prefix}.weight")
    if w is not None:
        out["params"][f"{our_prefix}/kernel"] = linear_oi_to_io(w)
    b = src.get(f"{torch_prefix}.bias")
    if b is not None:
        out["params"][f"{our_prefix}/bias"] = b


# ---------------------------------------------------------------------------
# YOLOv3 (reference demo naming)
# ---------------------------------------------------------------------------
_LEVELS = ("small", "medium", "large")  # stride 32, 16, 8 == our levels 0, 1, 2
_DARKNET_BLOCKS = (1, 2, 8, 8, 4)


def yolov3_from_torch(torch_state: dict[str, np.ndarray]) -> dict[str, dict]:
    """-> {'params': flat, 'batch_stats': flat} in OUR YOLOv3 naming."""
    out = {"params": {}, "batch_stats": {}}
    s = torch_state

    # backbone (darknet.py naming)
    _convbn(out, s, "backbone.conv0", "backbone/stem")
    for i in range(1, 6):
        _convbn(out, s, f"backbone.conv{i}", f"backbone/down{i}")
        for j in range(_DARKNET_BLOCKS[i - 1]):
            _convbn(out, s, f"backbone.res{i}.{j}.conv1",
                    f"backbone/stage{i}_block{j}/ConvBN_0")
            _convbn(out, s, f"backbone.res{i}.{j}.conv2",
                    f"backbone/stage{i}_block{j}/ConvBN_1")
    _linear(out, s, "backbone.fc", "backbone/fc")  # classification top, if any

    # neck (yolov3.py NeckV3 naming)
    for li, lvl in enumerate(_LEVELS):
        for k in range(5):
            _convbn(out, s, f"neck.neck_{lvl}.{k}", f"neck/block{li}/ConvBN_{k}")
        _convbn(out, s, f"neck.neck_out_{lvl}", f"neck/out{li}")
        if li < 2:
            _convbn(out, s, f"neck.up_sampling_{lvl}.0", f"neck/lateral{li + 1}")

    # head (HeadV3 naming; biased 1x1 convs)
    for li, lvl in enumerate(_LEVELS):
        _conv_bias(out, s, f"head.head_out_{lvl}", f"head/pred{li}")
    return out


# ---------------------------------------------------------------------------
# torchvision VGG
# ---------------------------------------------------------------------------
def vgg_from_torchvision(
    torch_state: dict[str, np.ndarray], batch_norm: bool = False
) -> dict[str, dict]:
    """torchvision vgg11/13/16/19(+bn) `features.N` -> our conv{i} naming."""
    out = {"params": {}, "batch_stats": {}}
    s = torch_state
    # walk features.* in order; conv layers appear as weight tensors of rank 4
    conv_idx = 0
    n = 0
    while True:
        key = f"features.{n}.weight"
        if key not in s:
            # skip non-parametric layers (relu/pool); stop past the end
            if n > 60:
                break
            n += 1
            continue
        if s[key].ndim == 4:  # conv
            _conv_bias(out, s, f"features.{n}", f"conv{conv_idx}/conv")
            if batch_norm:
                _bn(out, s, f"features.{n + 1}", f"conv{conv_idx}/bn/bn")
                n += 1
            conv_idx += 1
        n += 1
    _linear(out, s, "classifier.0", "fc1")
    _linear(out, s, "classifier.3", "fc2")
    _linear(out, s, "classifier.6", "fc3")
    return out


# ---------------------------------------------------------------------------
# torchvision ResNet / ResNeXt
# ---------------------------------------------------------------------------
def resnet_from_torchvision(torch_state: dict[str, np.ndarray]) -> dict[str, dict]:
    """torchvision resnet/resnext naming -> our ResNet naming."""
    out = {"params": {}, "batch_stats": {}}
    s = torch_state
    if "conv1.weight" in s:
        out["params"]["stem/conv/kernel"] = conv_oihw_to_hwio(s["conv1.weight"])
    _bn(out, s, "bn1", "stem/bn/bn")
    for i in range(1, 5):
        j = 0
        while f"layer{i}.{j}.conv1.weight" in s:
            prefix = f"layer{i}.{j}"
            ours = f"stage{i}_block{j}"
            k = 1
            while f"{prefix}.conv{k}.weight" in s:
                out["params"][f"{ours}/ConvBN_{k - 1}/conv/kernel"] = conv_oihw_to_hwio(
                    s[f"{prefix}.conv{k}.weight"]
                )
                _bn(out, s, f"{prefix}.bn{k}", f"{ours}/ConvBN_{k - 1}/bn/bn")
                k += 1
            if f"{prefix}.downsample.0.weight" in s:
                out["params"][f"{ours}/downsample/conv/kernel"] = conv_oihw_to_hwio(
                    s[f"{prefix}.downsample.0.weight"]
                )
                _bn(out, s, f"{prefix}.downsample.1", f"{ours}/downsample/bn/bn")
            j += 1
    _linear(out, s, "fc", "fc")
    return out


# ---------------------------------------------------------------------------
# application
# ---------------------------------------------------------------------------
def apply_import(variables: dict, imported: dict[str, dict], verbose: bool = True) -> dict:
    """Merge imported flat dicts into a flax variables tree via partial_load."""
    from ..core.checkpoint import partial_load

    new_vars = dict(variables)
    new_vars["params"] = partial_load(variables["params"], imported["params"], verbose)
    if "batch_stats" in variables and imported.get("batch_stats"):
        new_vars["batch_stats"] = partial_load(
            variables["batch_stats"], imported["batch_stats"], verbose
        )
    return new_vars


# ---------------------------------------------------------------------------
# the reference's OWN classification naming (classfication/models/*.py)
# ---------------------------------------------------------------------------
def resnet_from_reference(torch_state: dict[str, np.ndarray]) -> dict[str, dict]:
    """Reference resnet naming (classfication/models/resnet.py: stem
    'conv1.0/conv1.1' Sequential, stages 'res2..res5') -> our naming, by
    renaming to the torchvision scheme and reusing that mapper."""
    renamed = {}
    for k, v in torch_state.items():
        if k.startswith("conv1.0."):
            renamed["conv1." + k[len("conv1.0."):]] = v
        elif k.startswith("conv1.1."):
            renamed["bn1." + k[len("conv1.1."):]] = v
        elif k.startswith("res"):
            stage = int(k[3])  # res2 -> layer1
            renamed[f"layer{stage - 1}." + k.split(".", 1)[1]] = v
        else:
            renamed[k] = v
    return resnet_from_torchvision(renamed)


def vgg_from_reference(
    torch_state: dict[str, np.ndarray], batch_norm: bool = False
) -> dict[str, dict]:
    """Reference VGG naming (classfication/models/vgg.py: per-stage
    'vgg1..vgg5' Sequentials + torchvision-style 'classifier.{0,3,6}') ->
    our conv{i}/fc{1..3} naming. Convs are matched in order by rank-4
    weights within each stage."""
    out = {"params": {}, "batch_stats": {}}
    conv_idx = 0
    for stage in range(1, 6):
        n = 0
        while True:
            key = f"vgg{stage}.{n}.weight"
            if key not in torch_state:
                if n > 40:
                    break
                n += 1
                continue
            if torch_state[key].ndim == 4:
                _conv_bias(out, torch_state, f"vgg{stage}.{n}", f"conv{conv_idx}/conv")
                if batch_norm:
                    _bn(out, torch_state, f"vgg{stage}.{n + 1}",
                        f"conv{conv_idx}/bn/bn")
                    n += 1
                conv_idx += 1
            n += 1
    _linear(out, torch_state, "classifier.0", "fc1")
    _linear(out, torch_state, "classifier.3", "fc2")
    _linear(out, torch_state, "classifier.6", "fc3")
    return out
