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

from ..core.checkpoint import (
    conv3d_oidhw_to_dhwio,
    conv_oihw_to_hwio,
    linear_oi_to_io,
    linear_spatial_to_io,
)

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


def _linear(out: dict, src: dict, torch_prefix: str, our_prefix: str,
            spatial: tuple[int, ...] | None = None, channels: int = 0):
    """Import one torch Linear. When the torch layer consumed a flattened
    (C, *spatial) feature map, pass `spatial`+`channels` so the kernel is
    re-interleaved for our (*spatial, C) flatten order."""
    w = src.get(f"{torch_prefix}.weight")
    if w is not None:
        if spatial is not None:
            out["params"][f"{our_prefix}/kernel"] = linear_spatial_to_io(
                w, channels, spatial)
        else:
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
    # classifier.0 consumed a CHW flatten of the 7x7x512 pooled map
    _linear(out, s, "classifier.0", "fc1", spatial=(7, 7), channels=512)
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
# Faster R-CNN (demos/faster_rcnn/models/{faster,rpn,fast,vgg}.py)
# ---------------------------------------------------------------------------
def frcnn_from_reference(torch_state: dict[str, np.ndarray]) -> dict[str, dict]:
    """Reference Faster_Rcnn state_dict -> our FasterRCNN naming. Use with
    `FasterRCNN(reference_compat=True)` (see its field docs for the decode/
    clip/anchor semantics imported checkpoints assume).

    Mappings:
      - backbone.vgg{1..5}.{n} biased convs (models/vgg.py:43) -> our
        backbone/conv{i} in order (13 convs for vgg16, last pool dropped on
        both sides — vgg.py:65 comments it out, ours drop_last_pool);
      - rpn.conv3x3 -> rpn/conv; rpn.regressor -> rpn/reg;
      - rpn.classifier (2 softmax logits per anchor, rpn.py:102) -> our
        single sigmoid objectness logit rpn/cls as (fg - bg): channel
        2a+1 minus 2a — sigmoid(fg-bg) == softmax(fg), same scores and
        the same top-k / NMS ordering;
      - fast.module_after_roi.{0,3} (the shared VGG classifier MLP,
        faster.py:80) -> head/fc{1,2}; fc1 is re-interleaved from the
        reference's (C,7,7) RoI flatten to our (7,7,C) (fast.py:233);
      - fast.classifier -> head/cls (class 0 = background, both sides);
      - fast.regressor ((C+1)*4 with a background box head, fast.py:50)
        -> head/reg (C*4): the 4 background rows are dropped.
    """
    out = {"params": {}, "batch_stats": {}}
    s = torch_state
    # backbone convs, in order (bare Conv2d at Sequential even slots)
    conv_idx = 0
    for stage in range(1, 6):
        n = 0
        while n <= 40:
            key = f"backbone.vgg{stage}.{n}.weight"
            if key in s and s[key].ndim == 4:
                _conv_bias(out, s, f"backbone.vgg{stage}.{n}",
                           f"backbone/conv{conv_idx}/conv")
                conv_idx += 1
            n += 1
    # RPN
    _conv_bias(out, s, "rpn.conv3x3", "rpn/conv")
    _conv_bias(out, s, "rpn.regressor", "rpn/reg")
    w2 = s["rpn.classifier.weight"]  # (2A, 512, 1, 1): [2a]=bg, [2a+1]=fg
    b2 = s["rpn.classifier.bias"]
    out["params"]["rpn/cls/kernel"] = conv_oihw_to_hwio(w2[1::2] - w2[0::2])
    out["params"]["rpn/cls/bias"] = b2[1::2] - b2[0::2]
    # Fast head (module_after_roi is the same module as backbone.classifier;
    # both key prefixes appear in the state dict — prefer fast.*)
    pre = ("fast.module_after_roi"
           if "fast.module_after_roi.0.weight" in s else "backbone.classifier")
    _linear(out, s, f"{pre}.0", "head/fc1", spatial=(7, 7), channels=512)
    _linear(out, s, f"{pre}.3", "head/fc2")
    _linear(out, s, "fast.classifier", "head/cls")
    wr = s["fast.regressor.weight"]  # ((C+1)*4, 4096), class 0 = background
    br = s["fast.regressor.bias"]
    out["params"]["head/reg/kernel"] = linear_oi_to_io(wr[4:])
    out["params"]["head/reg/bias"] = br[4:]
    return out


# ---------------------------------------------------------------------------
# video zoo (videoRecognition/models/{c3d,scholor,slowfast}.py)
# ---------------------------------------------------------------------------
def _conv3d(out: dict, src: dict, torch_key: str, our_prefix: str):
    """Plain nn.Conv3d (scholor.py's conv functions / Conv* module `.conv`)."""
    w = src.get(f"{torch_key}.weight")
    if w is not None:
        out["params"][f"{our_prefix}/kernel"] = conv3d_oidhw_to_dhwio(w)
    b = src.get(f"{torch_key}.bias")
    if b is not None:
        out["params"][f"{our_prefix}/bias"] = b


def c3d_from_reference(torch_state: dict[str, np.ndarray]) -> dict[str, dict]:
    """videoRecognition/models/c3d.py naming (layer{1..5}.{seq}.conv + optional
    BatchNorm3d at seq+1) -> our conv{1a..5b} naming. Handles both `c3d`
    (biased convs, no norm) and `c3d_bn` (bias folded into the imported BN
    running mean: BN(x + b) == BN'(x) with mean' = mean - b — our Conv3DBlock
    drops the redundant conv bias under BN). Classifier flatten order is
    re-interleaved for our (T,H,W,C) layout (c3d.py:95-97 flattens CTHW)."""
    out = {"params": {}, "batch_stats": {}}
    s = torch_state
    ours = [["conv1a"], ["conv2a"], ["conv3a", "conv3b"],
            ["conv4a", "conv4b"], ["conv5a", "conv5b"]]
    for li, names in enumerate(ours, start=1):
        n = 0  # walk the Sequential: Conv3x3x3 [BN] ReLU per block
        for name in names:
            while f"layer{li}.{n}.conv.weight" not in s:
                n += 1
                assert n < 12, f"layer{li}: conv for {name} not found"
            w = s[f"layer{li}.{n}.conv.weight"]
            b = s.get(f"layer{li}.{n}.conv.bias")
            out["params"][f"{name}/conv/kernel"] = conv3d_oidhw_to_dhwio(w)
            if f"layer{li}.{n + 1}.running_mean" in s:  # c3d_bn
                _bn(out, s, f"layer{li}.{n + 1}", f"{name}/bn")
                if b is not None:  # fold conv bias into BN running mean
                    out["batch_stats"][f"{name}/bn/mean"] = (
                        out["batch_stats"][f"{name}/bn/mean"] - b)
            elif b is not None:
                out["params"][f"{name}/conv/bias"] = b
            n += 1
    # classifier: Linear(512*4*4, 4096) after gap to (1,4,4) (c3d.py:46-55)
    _linear(out, s, "classifier.0", "fc6", spatial=(1, 4, 4), channels=512)
    _linear(out, s, "classifier.3", "fc7")
    _linear(out, s, "classifier.6", "fc8")
    return out


def _convbn3d_pair(out: dict, src: dict, conv_key: str, bn_key: str,
                   our_prefix: str):
    """One of our ConvBN3D blocks from a bare torch (conv, bn) pair."""
    _conv3d(out, src, conv_key, f"{our_prefix}/conv")
    _bn(out, src, bn_key, f"{our_prefix}/bn")


def resnet3d_from_reference(torch_state: dict[str, np.ndarray]) -> dict[str, dict]:
    """videoRecognition/models/scholor.py naming (stem 'conv1.0/conv1.1',
    stages res2..res5 of Bottleneck{conv1,conv2_spatial,conv2_temporal,conv3}
    or BasicBlock{conv1,conv2}, both with Sequential 'downsample') -> our
    ResNet3D naming. scholor's conv helpers return bare nn.Conv3d (no `.conv`
    nesting, scholor.py:5-9)."""
    out = {"params": {}, "batch_stats": {}}
    s = torch_state
    _convbn3d_pair(out, s, "conv1.0", "conv1.1", "stem")
    for stage in range(2, 6):
        j = 0
        while f"res{stage}.{j}.bn1.weight" in s:
            t = f"res{stage}.{j}"
            o = f"stage{stage - 1}_block{j}"
            _convbn3d_pair(out, s, f"{t}.conv1", f"{t}.bn1", f"{o}/conv1")
            if f"{t}.conv2_spatial.weight" in s:  # Bottleneck (scholor.py:41-46)
                _convbn3d_pair(out, s, f"{t}.conv2_spatial", f"{t}.bn2_spatial",
                               f"{o}/conv2_spatial")
                _convbn3d_pair(out, s, f"{t}.conv2_temporal", f"{t}.bn2_temporal",
                               f"{o}/conv2_temporal")
                _convbn3d_pair(out, s, f"{t}.conv3", f"{t}.bn3", f"{o}/conv3")
            else:  # BasicBlock
                _convbn3d_pair(out, s, f"{t}.conv2", f"{t}.bn2", f"{o}/conv2")
            if f"{t}.downsample.0.weight" in s:
                _convbn3d_pair(out, s, f"{t}.downsample.0", f"{t}.downsample.1",
                               f"{o}/downsample")
            j += 1
    _linear(out, s, "fc", "fc")  # global avg pool -> C only, order-free
    return out


def slowfast_from_reference(torch_state: dict[str, np.ndarray]) -> dict[str, dict]:
    """videoRecognition/models/slowfast.py naming ({fast,slow}_pathway.conv1,
    res2..res5 of its own Bottleneck {conv1,conv2,conv3} (module-wrapped
    `.conv`, slowfast.py:12-42), laterals lateral_{pool1,res2,res3,res4}) ->
    our SlowFast naming. The final fc consumes [fast, slow] concat
    (slowfast.py:319) which our model matches, so it imports unpermuted."""
    out = {"params": {}, "batch_stats": {}}
    s = torch_state
    for ref_path, ours in (("fast_pathway", "fast"), ("slow_pathway", "slow")):
        _convbn3d_pair(out, s, f"{ref_path}.conv1.0", f"{ref_path}.conv1.1",
                       f"{ours}_stem")
        for stage in range(2, 6):
            j = 0
            while f"{ref_path}.res{stage}.{j}.bn1.weight" in s:
                t = f"{ref_path}.res{stage}.{j}"
                o = f"{ours}_s{stage - 1}_b{j}"
                for k in (1, 2, 3):
                    _convbn3d_pair(out, s, f"{t}.conv{k}.conv", f"{t}.bn{k}",
                                   f"{o}/conv{k}")
                if f"{t}.downsample.0.conv.weight" in s:
                    _convbn3d_pair(out, s, f"{t}.downsample.0.conv",
                                   f"{t}.downsample.1", f"{o}/downsample")
                j += 1
    for ref_lat, our_lat in (("lateral_pool1", "lateral_stem"),
                             ("lateral_res2", "lateral_s1"),
                             ("lateral_res3", "lateral_s2"),
                             ("lateral_res4", "lateral_s3")):
        _conv3d(out, s, f"fast_pathway.{ref_lat}.conv", f"{our_lat}/conv")
    _linear(out, s, "fc", "fc")
    return out


# ---------------------------------------------------------------------------
# application
# ---------------------------------------------------------------------------
def detect_and_import(torch_state: dict[str, np.ndarray]) -> dict[str, dict]:
    """Route a torch state_dict to the right importer by its key scheme.

    Covers every family the reference ships checkpoints for: demo YOLOv3,
    Faster R-CNN, torchvision/reference VGG + ResNet/ResNeXt, and the video
    zoo (C3D / 3D-ResNet / SlowFast). Raises with the observed keys when no
    scheme matches. Used by the CLI's `model.pretrained` path so any
    reference checkpoint imports without naming its family."""
    s = torch_state
    if "backbone.conv0.conv.weight" in s or "head.head_out_small.weight" in s:
        return yolov3_from_torch(s)
    if "conv0.conv.weight" in s:  # reference Darknet-53 classifier
        return darknet53_from_reference(s)
    if "rpn.conv3x3.weight" in s:
        return frcnn_from_reference(s)
    if "fast_pathway.conv1.0.weight" in s:
        return slowfast_from_reference(s)
    if "layer1.0.conv.weight" in s and s["layer1.0.conv.weight"].ndim == 5:
        return c3d_from_reference(s)
    if "conv1.0.weight" in s and s["conv1.0.weight"].ndim == 5:
        return resnet3d_from_reference(s)
    if "conv1.0.weight" in s:  # reference 2-D resnet (stem Sequential)
        return resnet_from_reference(s)
    if "conv1.weight" in s and "layer1.0.conv1.weight" in s:
        return resnet_from_torchvision(s)
    if "features.0.weight" in s:
        return vgg_from_torchvision(s, batch_norm="features.1.running_mean" in s)
    if "vgg1.0.weight" in s:
        return vgg_from_reference(s, batch_norm="vgg1.1.running_mean" in s)
    raise ValueError(
        "unrecognized torch checkpoint naming scheme; first keys: "
        f"{sorted(s)[:6]}"
    )


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
def darknet53_from_reference(torch_state: dict[str, np.ndarray]) -> dict[str, dict]:
    """Reference Darknet classifier naming (classfication/models/
    darknet53.py:65: conv0..conv5, res{1..5}.{j}.conv{1,2}, fc) -> our
    Darknet53 stem/down{i}/stage{i}_block{j} naming — the backbone scheme of
    `yolov3_from_torch` without the 'backbone.' prefix, plus the GAP+fc top."""
    out = {"params": {}, "batch_stats": {}}
    s = torch_state
    _convbn(out, s, "conv0", "stem")
    for i in range(1, 6):
        _convbn(out, s, f"conv{i}", f"down{i}")
        for j in range(_DARKNET_BLOCKS[i - 1]):
            _convbn(out, s, f"res{i}.{j}.conv1", f"stage{i}_block{j}/ConvBN_0")
            _convbn(out, s, f"res{i}.{j}.conv2", f"stage{i}_block{j}/ConvBN_1")
    _linear(out, s, "fc", "fc")
    return out


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
    _linear(out, torch_state, "classifier.0", "fc1", spatial=(7, 7), channels=512)
    _linear(out, torch_state, "classifier.3", "fc2")
    _linear(out, torch_state, "classifier.6", "fc3")
    return out
