"""Losses: classification (CE/BCE/Focal), IoU family, and YOLOv3 losses.

TPU-native re-design of the reference's loss/ package and demo losses:
  - `loss/classification_loss.py` (CE :8, BCE :36 with `already_sigmoid`,
    Focal :67) -> `cross_entropy`, `binary_cross_entropy`, `focal_loss`;
  - `loss/iou_loss.py` (IOULoss :5 ... CIOULoss :83) -> `iou_loss`;
  - `loss/yolov3_loss.py:8` Yolov3Loss (wh-ratio<4 anchor match, grid-cell
    assign, CIoU box + BCE cls + IoU-as-objectness-target)  -> `YOLOv3Loss`;
  - `demos/yolov3_u/utils/lossv3.py` (best-anchor wh-IoU match, BCE xy +
    MSE log-wh, IoU>thres ignore-mask objectness; the reference's
    per-image python loop at :88-101 flagged "TODO: Can optimize" is fully
    vectorized here) -> `YOLOv3LossPerCell`, with the huaweiShip variant
    (CIoU on decoded boxes, demos/yolov3_huaweiShip/utils/lossv3.py:84-88)
    via `box_loss='ciou'`.

Static-shape design: labels arrive padded [B, M, 5] = (class, cx, cy, w, h)
with NORMALIZED xywh and class == -1 marking padding (replaces the
reference's dynamic [N, 6] batch-idx-stamped collate,
datasets/detection_dataloader.py:98). Target building is dense scatter into
[B, H, W, A] grids — JAX drops out-of-bounds scatter indices, which encodes
"unmatched" for free. Everything jits; no data-dependent shapes.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.grid import grid as make_grid
from ..ops.iou import box_iou, box_iou_matrix, wh_iou_matrix
from ..ops.one_hot import one_hot

_EPS = 1e-8


def _reduce(loss: jnp.ndarray, weights, reduction: str) -> jnp.ndarray:
    if weights is not None:
        loss = loss * weights
    if reduction == "mean":
        if weights is not None:
            return jnp.sum(loss) / (jnp.sum(weights) + _EPS)
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


def cross_entropy(logits, labels, weights=None, reduction: str = "mean"):
    """Softmax CE over integer labels (ref CrossEntropyLoss :8)."""
    num_classes = logits.shape[-1]
    target = one_hot(labels, num_classes, logits.dtype)
    logp = jax.nn.log_softmax(logits, axis=-1)
    loss = -jnp.sum(target * logp, axis=-1)
    return _reduce(loss, weights, reduction)


def soft_cross_entropy(logits, target_probs, weights=None, reduction: str = "mean"):
    """CE against a target DISTRIBUTION (label smoothing / mixup / cutmix
    targets from train.mix; plain one-hot reproduces cross_entropy)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    loss = -jnp.sum(target_probs.astype(logp.dtype) * logp, axis=-1)
    return _reduce(loss, weights, reduction)


def binary_cross_entropy(
    preds, targets, from_logits: bool = True, weights=None, reduction: str = "mean"
):
    """Elementwise BCE; `from_logits=False` == reference's already_sigmoid
    (BiCrossEntropyLoss :36). Logits path is the numerically-stable form."""
    targets = targets.astype(preds.dtype)
    if from_logits:
        # log(1+e^-|x|) formulation
        loss = jnp.maximum(preds, 0) - preds * targets + jnp.log1p(jnp.exp(-jnp.abs(preds)))
    else:
        p = jnp.clip(preds, _EPS, 1 - _EPS)
        loss = -targets * jnp.log(p) - (1 - targets) * jnp.log(1 - p)
    return _reduce(loss, weights, reduction)


def focal_loss(
    logits,
    labels,
    alpha: float = 0.25,
    gamma: float = 2.0,
    weights=None,
    reduction: str = "mean",
):
    """Focal loss over integer labels (ref FocalLoss :67): per-class sigmoid
    focal, summed over classes."""
    num_classes = logits.shape[-1]
    target = one_hot(labels, num_classes, logits.dtype)
    p = jax.nn.sigmoid(logits)
    ce = binary_cross_entropy(logits, target, from_logits=True, reduction="none")
    p_t = p * target + (1 - p) * (1 - target)
    alpha_t = alpha * target + (1 - alpha) * (1 - target)
    loss = jnp.sum(alpha_t * (1 - p_t) ** gamma * ce, axis=-1)
    return _reduce(loss, weights, reduction)


def binary_focal_loss(
    logits,
    targets,
    alpha: float | None = None,
    gamma: float = 2.0,
    weights=None,
    reduction: str = "mean",
):
    """Sigmoid focal loss on a single logit (RetinaNet form).

    `alpha=None` disables the α class-weighting — this matches the
    reference RPN's FocalLoss(class_num=2) with default alpha=ones
    (demos/faster_rcnn/models/rpn.py:109, loss/classification_loss.py:83),
    whose 2-class softmax focal is exactly sigmoid focal on the
    foreground logit with uniform α."""
    targets = targets.astype(logits.dtype)
    ce = binary_cross_entropy(logits, targets, from_logits=True, reduction="none")
    p = jax.nn.sigmoid(logits)
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = (1 - p_t) ** gamma * ce
    if alpha is not None:
        loss = loss * (alpha * targets + (1 - alpha) * (1 - targets))
    return _reduce(loss, weights, reduction)


def iou_loss(
    pred_boxes,
    target_boxes,
    kind: str = "ciou",
    fmt: str = "xyxy",
    weights=None,
    reduction: str = "mean",
):
    """1 - IoU-family loss (ref loss/iou_loss.py IOULoss:5..CIOULoss:83)."""
    loss = 1.0 - box_iou(pred_boxes, target_boxes, kind=kind, fmt=fmt)
    return _reduce(loss, weights, reduction)


def smooth_l1(pred, target, beta: float = 1.0, weights=None, reduction: str = "mean"):
    """Huber / smooth-L1 (Faster R-CNN box loss, demos/faster_rcnn/models/rpn.py:317)."""
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff**2 / beta, diff - 0.5 * beta)
    loss = jnp.sum(loss, axis=-1) if loss.ndim > 1 else loss
    return _reduce(loss, weights, reduction)


# ----------------------------------------------------------------------------
# YOLOv3 losses
# ----------------------------------------------------------------------------
class YoloLossOutput(NamedTuple):
    total: jnp.ndarray
    box: jnp.ndarray
    obj: jnp.ndarray
    cls: jnp.ndarray


def _masked_mean(x, mask):
    return jnp.sum(x * mask) / (jnp.sum(mask) + _EPS)


def _dense_targets(labels, anchors_feat, grid_hw, ratio_thres=None,
                   neighbor_cells=False):
    """Shared target assignment for one level, fully vectorized.

    Args:
      labels: [B, M, 5] (cls, cxn, cyn, wn, hn), cls<0 = pad.
      anchors_feat: [A, 2] anchors in feature units.
      grid_hw: (H, W).
      ratio_thres: if set, match every anchor with wh-ratio < thres
        (lib loss, yolov3_loss.py:98-99); if None, match only the best
        anchor per GT by wh-IoU (demo lossv3 :51-53).
      neighbor_cells: v5-style expanded assignment — each GT also trains
        the two nearest neighbor cells (up to 3x positives; offset targets
        in (-0.5, 1.5), requires the v5 decode). The reference assigns the
        center cell only; this is the beat-the-baseline option.

    Returns dict of dense [B, H, W, A, ...] targets + positive mask.
    """
    h, w = grid_hw
    b, m, _ = labels.shape
    a = anchors_feat.shape[0]
    valid = labels[..., 0] >= 0  # [B, M]
    cls_idx = jnp.maximum(labels[..., 0].astype(jnp.int32), 0)
    txy = labels[..., 1:3] * jnp.asarray([w, h], labels.dtype)  # feature coords
    twh = labels[..., 3:5] * jnp.asarray([w, h], labels.dtype)

    if ratio_thres is not None:
        r = twh[:, :, None, :] / anchors_feat[None, None, :, :]  # [B, M, A, 2]
        match = jnp.max(jnp.maximum(r, 1.0 / r), axis=-1) < ratio_thres  # [B, M, A]
    else:
        sim = wh_iou_matrix(twh.reshape(-1, 2), anchors_feat).reshape(b, m, a)
        match = one_hot(jnp.argmax(sim, axis=-1), a).astype(bool)
    match = match & valid[..., None]

    # candidate cells: center (+ 2 nearest neighbors when enabled)
    fx = txy[..., 0] - jnp.floor(txy[..., 0])  # [B, M]
    fy = txy[..., 1] - jnp.floor(txy[..., 1])
    if neighbor_cells:
        # ultralytics build_targets: west/east by x-fraction, north/south by y
        cand_dx = jnp.stack([jnp.zeros_like(fx), -jnp.ones_like(fx),
                             jnp.ones_like(fx), jnp.zeros_like(fx),
                             jnp.zeros_like(fx)], axis=-1)  # [B, M, 5]
        cand_dy = jnp.stack([jnp.zeros_like(fy), jnp.zeros_like(fy),
                             jnp.zeros_like(fy), -jnp.ones_like(fy),
                             jnp.ones_like(fy)], axis=-1)
        in_x = txy[..., 0]
        in_y = txy[..., 1]
        cand_ok = jnp.stack([
            jnp.ones_like(fx, bool),
            (fx < 0.5) & (in_x > 1.0),            # west
            (fx > 0.5) & (in_x < w - 1.0),        # east
            (fy < 0.5) & (in_y > 1.0),            # north
            (fy > 0.5) & (in_y < h - 1.0),        # south
        ], axis=-1)  # [B, M, 5]
    else:
        cand_dx = jnp.zeros_like(fx)[..., None]
        cand_dy = jnp.zeros_like(fy)[..., None]
        cand_ok = jnp.ones_like(fx, bool)[..., None]
    c = cand_ok.shape[-1]

    gx0 = jnp.floor(txy[..., 0])  # [B, M]
    gy0 = jnp.floor(txy[..., 1])
    gx = jnp.clip(gx0[..., None] + cand_dx, 0, w - 1).astype(jnp.int32)  # [B, M, C]
    gy = jnp.clip(gy0[..., None] + cand_dy, 0, h - 1).astype(jnp.int32)
    # offset target relative to the candidate cell: in (-0.5, 1.5) for neighbors
    off_x = txy[..., 0:1] - gx.astype(labels.dtype)  # [B, M, C]
    off_y = txy[..., 1:2] - gy.astype(labels.dtype)

    # expand (match [B,M,A]) x (cand [B,M,C]) -> [B, M, A, C]
    match_ac = match[..., :, None] & cand_ok[..., None, :]
    aidx = jnp.arange(a, dtype=jnp.int32)[None, None, :, None]
    flat = (gy[:, :, None, :] * w + gx[:, :, None, :]) * a + aidx  # [B,M,A,C]
    size = h * w * a
    flat = jnp.where(match_ac, flat, size)  # OOB sentinel (dropped)

    def scatter(values, depth):
        """values [B, M, A, C, depth] -> dense [B, H*W*A, depth].

        vmapped PER IMAGE (indices are intra-image; collisions can only
        happen within an image) so the batch dim stays elementwise under
        GSPMD — a single global scatter with batch-flattened indices made
        XLA all-gather every shard's updates to every device
        (cross-partition rendezvous per step; found via HLO dump, VERDICT
        r2 weak-5). The per-image form shards cleanly: zero collectives."""

        def one(fl, vals):
            out = jnp.zeros((size, depth), vals.dtype)
            return out.at[fl.reshape(-1)].set(vals.reshape(-1, depth), mode="drop")

        return jax.vmap(one)(flat, values)

    def tile_mc(x):  # [B, M, C, d] -> [B, M, A, C, d]
        return jnp.broadcast_to(x[:, :, None], (b, m, a, c, x.shape[-1]))

    def tile_m(x):  # [B, M, d] -> [B, M, A, C, d]
        return jnp.broadcast_to(x[:, :, None, None], (b, m, a, c, x.shape[-1]))

    off = jnp.stack([off_x, off_y], axis=-1)  # [B, M, C, 2]
    # ONE scatter for box+cls+pos: with duplicate indices (two GTs matching
    # the same cell/anchor) XLA's winner is unspecified PER OP, so separate
    # scatters could mix box from one GT with class from another — a single
    # concatenated scatter makes one GT win the whole slot consistently
    vals = jnp.concatenate(
        [
            tile_mc(off).astype(jnp.float32),
            tile_m(twh).astype(jnp.float32),
            jnp.broadcast_to(
                cls_idx[:, :, None, None, None].astype(jnp.float32), (b, m, a, c, 1)
            ),
            jnp.ones((b, m, a, c, 1), jnp.float32),
        ],
        axis=-1,
    )
    dense = scatter(vals, 6).reshape(b, h, w, a, 6)
    t_box = dense[..., :4]
    t_cls = dense[..., 4].astype(jnp.int32)
    pos = jnp.minimum(dense[..., 5], 1.0)  # collisions: clamp
    t_anchor = jnp.broadcast_to(anchors_feat[None, None, None], (b, h, w, a, 2))
    return {
        "pos": pos,
        "box": t_box,  # (offset_x, offset_y, w_feat, h_feat)
        "cls": t_cls,
        "anchor": t_anchor,
        "gt_xywh_feat": jnp.concatenate([txy, twh], axis=-1),  # [B, M, 4]
        "gt_valid": valid,
    }


class YOLOv3Loss:
    """Library-style loss (ref loss/yolov3_loss.py:8): wh-ratio<4 multi-anchor
    match, CIoU box loss, BCE cls, objectness BCE with detached-IoU target,
    total scaled by batch size (:72).

    decode_style 'v3' reproduces the reference exactly (sigma-xy, exp-wh);
    'v5' (default) is the numerically-stable variant the working demo
    checkpoints use (2*sig-0.5 / (2*sig)^2) — exp(t) explodes early in
    training, which is why ultralytics moved off it.
    """

    def __init__(
        self,
        anchors,  # [L, A, 2] input-image pixels, deepest level first
        strides: Sequence[int] = (32, 16, 8),
        num_classes: int = 80,
        ratio_box: float = 0.05,
        ratio_conf: float = 1.0,
        ratio_cls: float = 0.5,
        ratio_thres: float = 4.0,
        decode_style: str = "v5",
        level_balance: Sequence[float] | None = None,
        neighbor_cells: bool = False,  # v5 expanded assignment (~3x positives)
    ):
        # numpy: jit closures over committed device arrays degrade
        # axon-relay H2D ~30x (docs/PERF.md); a numpy closure is a
        # baked HLO constant
        self.anchors = np.asarray(anchors, np.float32)
        self.strides = tuple(strides)
        self.num_classes = num_classes
        self.ratio_box = ratio_box
        self.ratio_conf = ratio_conf
        self.ratio_cls = ratio_cls
        self.ratio_thres = ratio_thres
        self.decode_style = decode_style
        self.level_balance = tuple(level_balance) if level_balance else (1.0,) * len(strides)
        self.neighbor_cells = neighbor_cells

    def _decode_cell(self, head, anchors_feat):
        """Raw head [..., 4] -> (xy in cell frame, wh in feature units)."""
        if self.decode_style == "v3":
            pxy = jax.nn.sigmoid(head[..., 0:2])
            pwh = jnp.exp(jnp.clip(head[..., 2:4], -9.0, 9.0)) * anchors_feat
        else:
            sig = jax.nn.sigmoid(head[..., 0:4])
            pxy = sig[..., 0:2] * 2.0 - 0.5
            pwh = (sig[..., 2:4] * 2.0) ** 2 * anchors_feat
        return pxy, pwh

    def __call__(self, heads: Sequence[jnp.ndarray], labels: jnp.ndarray) -> YoloLossOutput:
        """heads: per-level [B, H, W, A, 5+C]; labels: [B, M, 5] padded."""
        batch = heads[0].shape[0]
        loss_box = loss_obj = loss_cls = 0.0
        for li, head in enumerate(heads):
            _, h, w, a, _ = head.shape
            anchors_feat = self.anchors[li] / self.strides[li]
            t = _dense_targets(labels, anchors_feat, (h, w),
                               ratio_thres=self.ratio_thres,
                               neighbor_cells=self.neighbor_cells)
            pos = t["pos"]

            pxy, pwh = self._decode_cell(head, t["anchor"])
            pred_xywh = jnp.concatenate([pxy, pwh], axis=-1)
            ciou = box_iou(pred_xywh, t["box"], kind="ciou", fmt="xywh")  # [B,H,W,A]
            loss_box += _masked_mean(1.0 - ciou, pos)

            # objectness target = detached IoU at positives (yolov3_loss.py:63-66)
            iou_t = jax.lax.stop_gradient(
                jnp.clip(box_iou(pred_xywh, t["box"], kind="iou", fmt="xywh"), 0.0, 1.0)
            )
            t_obj = iou_t * pos
            obj_bce = binary_cross_entropy(head[..., 4], t_obj, reduction="none")
            loss_obj += jnp.mean(obj_bce) * self.level_balance[li]

            cls_target = one_hot(t["cls"], self.num_classes)
            cls_bce = binary_cross_entropy(head[..., 5:], cls_target, reduction="none")
            # per-ELEMENT mean over positives (reference BiCrossEntropyLoss
            # flattens to [-1, 1] before the mean, classification_loss.py:36;
            # ultralytics BCEWithLogitsLoss default does the same)
            loss_cls += _masked_mean(jnp.mean(cls_bce, axis=-1), pos)

        total = (
            self.ratio_box * loss_box
            + self.ratio_conf * loss_obj
            + self.ratio_cls * loss_cls
        ) * batch
        return YoloLossOutput(
            total,
            self.ratio_box * loss_box * batch,
            self.ratio_conf * loss_obj * batch,
            self.ratio_cls * loss_cls * batch,
        )


class YOLOv3LossPerCell:
    """Demo-style loss (ref demos/yolov3_u/utils/lossv3.py): best-anchor
    wh-IoU match; box term is BCE(sig-xy) + MSE(log-wh) ('bce_mse', lossv3
    v1 :86-106, lambda_xy=2.0 :111) or CIoU on decoded boxes ('ciou',
    huaweiShip lossv3 :84-88); objectness BCE with an ignore mask where any
    decoded prediction overlaps a GT above `ignore_iou_thres` (the
    reference's per-image loop :88-101, vectorized)."""

    def __init__(
        self,
        anchors,
        strides: Sequence[int] = (32, 16, 8),
        num_classes: int = 80,
        box_loss: str = "bce_mse",  # 'bce_mse' (v1) | 'ciou' (huaweiShip)
        ignore_iou_thres: float = 0.5,
        lambda_xy: float = 2.0,  # lossv3.py:111 weights only the xy term
        lambda_wh: float = 1.0,
        lambda_conf: float = 1.0,
        lambda_cls: float = 1.0,
    ):
        # numpy: jit closures over committed device arrays degrade
        # axon-relay H2D ~30x (docs/PERF.md); a numpy closure is a
        # baked HLO constant
        self.anchors = np.asarray(anchors, np.float32)
        self.strides = tuple(strides)
        self.num_classes = num_classes
        self.box_loss = box_loss
        self.ignore_iou_thres = ignore_iou_thres
        self.lams = (lambda_xy, lambda_wh, lambda_conf, lambda_cls)

    def __call__(self, heads, labels) -> YoloLossOutput:
        lam_xy, lam_wh, lam_conf, lam_cls = self.lams
        loss_box = loss_obj = loss_cls = 0.0
        for li, head in enumerate(heads):
            b, h, w, a, _ = head.shape
            anchors_feat = self.anchors[li] / self.strides[li]
            t = _dense_targets(labels, anchors_feat, (h, w), ratio_thres=None)
            pos = t["pos"]

            # decoded predictions in feature units (v3 decode, lossv3 :80-84)
            offsets = make_grid(h, w, "xy", head.dtype)[None, :, :, None, :]
            pxy_cell = jax.nn.sigmoid(head[..., 0:2])
            pwh = jnp.exp(jnp.clip(head[..., 2:4], -9.0, 9.0)) * t["anchor"]
            pred_xywh = jnp.concatenate([pxy_cell + offsets, pwh], axis=-1)

            if self.box_loss == "bce_mse":
                # per-ELEMENT means over positives (F.binary_cross_entropy_
                # with_logits / F.mse_loss defaults, lossv3.py:74-79)
                xy_bce = binary_cross_entropy(
                    head[..., 0:2],
                    t["box"][..., 0:2],
                    reduction="none",
                )
                loss_box += lam_xy * _masked_mean(jnp.mean(xy_bce, axis=-1), pos)
                t_wh_raw = jnp.log(
                    jnp.clip(t["box"][..., 2:4], _EPS, None) / t["anchor"]
                ) * pos[..., None]
                wh_mse = (head[..., 2:4] - t_wh_raw) ** 2
                loss_box += lam_wh * _masked_mean(jnp.mean(wh_mse, axis=-1), pos)
            else:  # 'ciou'
                t_xywh_abs = jnp.concatenate(
                    [t["box"][..., 0:2] + offsets * pos[..., None], t["box"][..., 2:4]],
                    axis=-1,
                )
                ciou = box_iou(pred_xywh, t_xywh_abs, kind="ciou", fmt="xywh")
                loss_box += _masked_mean(1.0 - ciou, pos)

            # ignore mask: decoded preds overlapping any GT above thres are
            # neither positive nor negative (lossv3 :88-101, vectorized)
            pred_flat = pred_xywh.reshape(b, h * w * a, 4)
            iou_pg = jax.vmap(
                lambda p, g: box_iou_matrix(p, g, kind="iou", fmt="xywh")
            )(pred_flat, t["gt_xywh_feat"])  # [B, HWA, M]
            iou_pg = jnp.where(t["gt_valid"][:, None, :], iou_pg, 0.0)
            ignore = (jnp.max(iou_pg, axis=-1) > self.ignore_iou_thres).reshape(
                b, h, w, a
            )
            obj_weight = jnp.where((pos == 0) & ignore, 0.0, 1.0)
            obj_bce = binary_cross_entropy(head[..., 4], pos, reduction="none")
            loss_obj += lam_conf * _masked_mean(obj_bce, obj_weight)

            cls_bce = binary_cross_entropy(
                head[..., 5:], one_hot(t["cls"], self.num_classes), reduction="none"
            )
            loss_cls += lam_cls * _masked_mean(jnp.mean(cls_bce, axis=-1), pos)

        total = loss_box + loss_obj + loss_cls
        return YoloLossOutput(total, loss_box, loss_obj, loss_cls)
