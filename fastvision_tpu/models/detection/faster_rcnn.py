"""Faster R-CNN: VGG16 backbone + RPN + RoI-align Fast head, static shapes.

Capability parity with demos/faster_rcnn/models/{faster.py:9, rpn.py:66,
fast.py:8}, redesigned for XLA (SURVEY.md §7 hard parts):

  - proposal filtering (rpn.py:168-208 topk -> NMS -> topk with dynamic
    counts) becomes fixed-size masked tensors: static pre/post-NMS K,
    suppression mask, invalid proposals carried with a validity flag;
  - pos/neg sampling (rpn.py:253-306 randperm, fast.py:103-171 boolean
    gathers) becomes fixed-size stochastic top-k: priority = mask + U(0,1),
    `lax.top_k` picks up-to-k true entries uniformly at random, the gathered
    mask is the sample's weight — identical statistics, static shapes;
  - RoI Align defaults to the MXU matmul formulation (ops.roi_align_mxu:
    interpolation factorized into two dense contractions — regular systolic
    -array compute instead of the reference's torchvision C++ gather kernel,
    fast.py:227-231; `roi_backend='gather'` selects the jnp gather variant,
    both sub-ms at B8/N300/32x32x512 on v5e);
  - RPN objectness is a single sigmoid logit with focal loss (the reference
    uses 2-way softmax + FocalLoss, rpn.py:312 — same decision boundary);
  - Fast-head box targets normalized by std (0.1, 0.1, 0.2, 0.2)
    (fast.py:189-191), per-class regression heads (fast.py:49-52).

Train:  model.apply(vars, images, labels, train=True, rngs={'sampling': k})
        -> dict of losses {rpn_cls, rpn_reg, cls, reg}
Eval:   model.apply(vars, images)
        -> (class_logits [B,P,C+1], boxes [B,P,C,4], proposals, valid);
        decode to Detections with `fastrcnn_postprocess`.

Labels: padded [B, M, 5] = (class, x1, y1, x2, y2) in INPUT-IMAGE PIXELS
(class == -1 padding) — pixel xyxy here, unlike YOLO's normalized xywh,
because anchors live in pixel space.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.box import clip_boxes
from ...ops.box_coder import decode_boxes, encode_boxes
from ...ops.iou import box_iou_matrix
from ...ops.nms import Detections, suppression_mask
from ...ops.roi_align import roi_align, roi_align_mxu
from ...train.losses import (binary_cross_entropy, binary_focal_loss,
                             cross_entropy, smooth_l1)
from ..classification.vgg import CFGS, VGG

BOX_STD = (0.1, 0.1, 0.2, 0.2)


# ---------------------------------------------------------------------------
# anchors
# ---------------------------------------------------------------------------
def make_base_anchors(
    scales: Sequence[float] = (8, 16, 32),
    ratios: Sequence[float] = (0.5, 1.0, 2.0),
    stride: int = 16,
) -> jnp.ndarray:
    """[A, 4] xyxy centered at origin (ref utils/anchor_generator.py:4)."""
    anchors = []
    for r in ratios:
        for s in scales:
            size = s * stride
            w = size / (r**0.5)
            h = size * (r**0.5)
            anchors.append([-w / 2, -h / 2, w / 2, h / 2])
    return jnp.asarray(anchors, jnp.float32)


def anchor_grid(feat_h: int, feat_w: int, stride: int, base: jnp.ndarray,
                offset: float = 0.5) -> jnp.ndarray:
    """[feat_h * feat_w * A, 4] anchors in image pixels (rpn.py:160-166).

    `offset=0.5` centers anchors on cell centers (standard); the reference
    centers them on integer grid corners (rpn.py:162 uses bare arange) —
    pass offset=0.0 for reference-checkpoint compatibility."""
    ys = (jnp.arange(feat_h, dtype=jnp.float32) + offset) * stride
    xs = (jnp.arange(feat_w, dtype=jnp.float32) + offset) * stride
    cy, cx = jnp.meshgrid(ys, xs, indexing="ij")
    centers = jnp.stack([cx, cy, cx, cy], axis=-1)  # [H, W, 4]
    all_anchors = centers[:, :, None, :] + base[None, None, :, :]
    return all_anchors.reshape(-1, 4)


# ---------------------------------------------------------------------------
# fixed-size stochastic sampling
# ---------------------------------------------------------------------------
def random_sample_mask(rng: jax.Array, mask: jnp.ndarray, k: int):
    """Pick up to k True entries of `mask` uniformly at random, static shape.

    Returns (indices [k], weights [k] in {0,1}) — weights zero where fewer
    than k candidates existed. Replaces torch randperm sampling
    (rpn.py:265-290, fast.py:103)."""
    priority = mask.astype(jnp.float32) + jax.random.uniform(rng, mask.shape)
    _, idx = jax.lax.top_k(priority, k)
    return idx, mask[idx].astype(jnp.float32)


# ---------------------------------------------------------------------------
# RPN
# ---------------------------------------------------------------------------
class RPNHead(nn.Module):
    num_anchors: int = 9
    mid_channels: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat):
        x = nn.relu(
            nn.Conv(self.mid_channels, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv")(feat)
        )
        obj = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype, name="cls")(x)
        reg = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype, name="reg")(x)
        b, h, w, _ = obj.shape
        return obj.reshape(b, -1), reg.reshape(b, h * w * self.num_anchors, 4)


def filter_proposals(
    anchors: jnp.ndarray,  # [K, 4]
    obj_logits: jnp.ndarray,  # [B, K]
    deltas: jnp.ndarray,  # [B, K, 4]
    image_size: int,
    pre_nms_top_n: int = 2000,
    post_nms_top_n: int = 300,
    nms_thresh: float = 0.7,
    min_size: float = 1.0,
    clip_max: tuple[float, float] | None = None,
    wh_from_dw: bool = False,
):
    """Fixed-size proposal selection (rpn.py:168-208 redesigned).

    `clip_max`/`wh_from_dw`/`min_size<0` support reference-checkpoint
    compatibility: the reference clips proposals to (W-1, H-1) feature
    units (= image_size - stride pixels, rpn.py:182-185), decodes h from
    the dw channel (rpn.py:117), and has no min-size filter.

    -> (proposals [B, post, 4], scores [B, post], valid [B, post])."""
    boxes = decode_boxes(anchors[None], deltas, wh_from_dw=wh_from_dw)
    cw, ch = clip_max if clip_max is not None else (image_size, image_size)
    boxes = clip_boxes(boxes, ch, cw)
    if min_size >= 0:
        wh_ok = (boxes[..., 2] - boxes[..., 0] >= min_size) & (
            boxes[..., 3] - boxes[..., 1] >= min_size
        )
        scores = jnp.where(wh_ok, obj_logits, -jnp.inf)
    else:
        scores = obj_logits

    def per_image(s, b):
        k = min(pre_nms_top_n, s.shape[0])
        top_s, top_i = jax.lax.top_k(s, k)
        top_b = b[top_i]
        keep = suppression_mask(top_b, top_s, nms_thresh)
        kept_s = jnp.where(keep, top_s, -jnp.inf)
        out_s, out_i = jax.lax.top_k(kept_s, min(post_nms_top_n, k))
        valid = out_s > -jnp.inf
        return top_b[out_i], jax.nn.sigmoid(out_s), valid

    return jax.vmap(per_image)(scores, boxes)


def rpn_loss(
    rng: jax.Array,
    anchors: jnp.ndarray,  # [K, 4]
    obj_logits: jnp.ndarray,  # [B, K]
    deltas: jnp.ndarray,  # [B, K, 4]
    labels: jnp.ndarray,  # [B, M, 5] pixel xyxy, cls<0 pad
    pos_iou: float = 0.7,
    neg_iou: float = 0.3,
    num_pos: int = 128,
    num_neg: int = 128,
    focal_gamma: float = 2.0,
    focal_alpha: float | None = None,
):
    """Anchor classification + regression loss (rpn.py:227-320)."""

    def per_image(rng, obj, dlt, lab):
        gt = lab[:, 1:5]
        gt_valid = lab[:, 0] >= 0
        iou = box_iou_matrix(anchors, gt)  # [K, M]
        iou = jnp.where(gt_valid[None, :], iou, -1.0)
        best_iou = jnp.max(iou, axis=1)
        best_gt = jnp.argmax(iou, axis=1)

        pos = best_iou >= pos_iou
        # every valid gt's best anchor is positive (standard, rpn.py matching)
        best_anchor_per_gt = jnp.argmax(iou, axis=0)  # [M]
        pos = pos.at[best_anchor_per_gt].set(
            jnp.where(gt_valid, True, pos[best_anchor_per_gt]), mode="drop"
        )
        neg = (best_iou < neg_iou) & (best_iou >= 0) & ~pos

        rng_p, rng_n = jax.random.split(rng)
        pos_idx, pos_w = random_sample_mask(rng_p, pos, num_pos)
        neg_idx, neg_w = random_sample_mask(rng_n, neg, num_neg)

        # classification: sigmoid FOCAL loss (gamma=2, uniform alpha) on
        # sampled anchors — the reference RPN trains with FocalLoss, not
        # plain CE (rpn.py:312, FocalLoss(class_num=2) at :109)
        logit_s = jnp.concatenate([obj[pos_idx], obj[neg_idx]])
        target_s = jnp.concatenate([jnp.ones(num_pos), jnp.zeros(num_neg)])
        weight_s = jnp.concatenate([pos_w, neg_w])
        cls = binary_focal_loss(logit_s, target_s, gamma=focal_gamma,
                                alpha=focal_alpha, weights=weight_s)

        # regression on sampled positives
        tgt = encode_boxes(anchors[pos_idx], gt[best_gt[pos_idx]])
        reg = smooth_l1(dlt[pos_idx], tgt, beta=1.0 / 9, weights=pos_w)
        return cls, reg

    rngs = jax.random.split(rng, obj_logits.shape[0])
    cls, reg = jax.vmap(per_image)(rngs, obj_logits, deltas, labels)
    return jnp.mean(cls), jnp.mean(reg)


# ---------------------------------------------------------------------------
# Fast head
# ---------------------------------------------------------------------------
class FastHead(nn.Module):
    """RoI features -> MLP -> (C+1 logits, per-class deltas) (fast.py:8)."""

    num_classes: int  # foreground classes
    hidden: int = 4096
    dropout: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, roi_feats, train: bool = False):
        b, n = roi_feats.shape[:2]
        x = roi_feats.reshape(b, n, -1)
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, name="fc2")(x))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        cls = nn.Dense(self.num_classes + 1, dtype=self.dtype, name="cls")(x)
        reg = nn.Dense(self.num_classes * 4, dtype=self.dtype, name="reg")(x)
        return cls, reg.reshape(b, n, self.num_classes, 4)


def sample_rois(
    rng: jax.Array,
    proposals: jnp.ndarray,  # [B, P, 4]
    prop_valid: jnp.ndarray,  # [B, P]
    labels: jnp.ndarray,  # [B, M, 5]
    pos_iou: float = 0.5,
    num_pos: int = 16,
    num_neg: int = 48,
):
    """Per-image pos/neg RoI sampling (fast.py:103-171).

    -> rois [B, S, 4], cls_target [B, S] (0 = background),
       reg_target [B, S, 4] (normalized), pos_w/all_w [B, S]."""

    def per_image(rng, props, pvalid, lab):
        gt = lab[:, 1:5]
        gt_cls = lab[:, 0]
        gt_valid = gt_cls >= 0
        iou = box_iou_matrix(props, gt)
        iou = jnp.where(gt_valid[None, :] & pvalid[:, None], iou, -1.0)
        best_iou = jnp.max(iou, axis=1)
        best_gt = jnp.argmax(iou, axis=1)
        pos = best_iou >= pos_iou
        neg = (best_iou < pos_iou) & (best_iou >= 0)

        rng_p, rng_n = jax.random.split(rng)
        pos_idx, pos_w = random_sample_mask(rng_p, pos, num_pos)
        neg_idx, neg_w = random_sample_mask(rng_n, neg, num_neg)
        idx = jnp.concatenate([pos_idx, neg_idx])
        w = jnp.concatenate([pos_w, neg_w])
        pw = jnp.concatenate([pos_w, jnp.zeros(num_neg)])

        rois = props[idx]
        matched = best_gt[idx]
        cls_t = jnp.where(pw > 0, gt_cls[matched] + 1, 0.0).astype(jnp.int32)
        reg_t = encode_boxes(rois, gt[matched], BOX_STD)
        return rois, cls_t, reg_t, pw, w

    rngs = jax.random.split(rng, proposals.shape[0])
    return jax.vmap(per_image)(rngs, proposals, prop_valid, labels)


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------
class FasterRCNN(nn.Module):
    """VGG16-stride-16 backbone + RPN + Fast (ref faster.py:9).

    The VGG conv trunk is the backbone and its 4096-MLP the RoI head
    (faster.py:80), both built here from models.classification.vgg."""

    num_classes: int = 20
    image_size: int = 512
    anchor_scales: Sequence[float] = (8, 16, 32)
    anchor_ratios: Sequence[float] = (0.5, 1.0, 2.0)
    stride: int = 16
    rpn_pre_nms_train: int = 2000
    rpn_post_nms_train: int = 512
    rpn_pre_nms_eval: int = 1000
    rpn_post_nms_eval: int = 300
    rpn_nms_thresh: float = 0.7
    roi_pos: int = 16
    roi_neg: int = 48
    roi_size: int = 7
    roi_backend: str = "mxu"  # 'mxu' (matmul formulation) | 'gather'
    # Reference-checkpoint compatibility (for weights imported via
    # models.import_torch.frcnn_from_reference): integer-grid anchor
    # centers (rpn.py:162), proposal clip to image_size - stride
    # (rpn.py:182-185 clips to feature W-1), no min-size filter, h decoded
    # from the dw channel (rpn.py:117 / fast.py:99), and no final box
    # clip. Our own training uses the fixed semantics (default False).
    reference_compat: bool = False
    dtype: Any = jnp.float32

    @property
    def _roi_align(self):
        return roi_align_mxu if self.roi_backend == "mxu" else roi_align

    def setup(self):
        self.backbone = VGG(
            CFGS["vgg16"], batch_norm=False, including_top=False,
            drop_last_pool=True, dtype=self.dtype, name="backbone",
        )
        self.base_anchors = make_base_anchors(
            self.anchor_scales, self.anchor_ratios, self.stride
        )
        self.rpn = RPNHead(len(self.anchor_scales) * len(self.anchor_ratios),
                           dtype=self.dtype, name="rpn")
        self.head = FastHead(self.num_classes, dtype=self.dtype, name="head")

    def __call__(self, images, labels=None, train: bool = False):
        feat = self.backbone(images, train)
        b, fh, fw, _ = feat.shape
        compat = self.reference_compat
        anchors = anchor_grid(fh, fw, self.stride, self.base_anchors,
                              offset=0.0 if compat else 0.5)
        obj, deltas = self.rpn(feat)

        pre = self.rpn_pre_nms_train if train else self.rpn_pre_nms_eval
        post = self.rpn_post_nms_train if train else self.rpn_post_nms_eval
        proposals, prop_scores, prop_valid = filter_proposals(
            anchors, jax.lax.stop_gradient(obj), jax.lax.stop_gradient(deltas),
            self.image_size, pre, post, self.rpn_nms_thresh,
            min_size=-1.0 if compat else 1.0,
            clip_max=((fw - 1) * self.stride, (fh - 1) * self.stride)
            if compat else None,
            wh_from_dw=compat,
        )

        if train:
            assert labels is not None, "training forward needs labels"
            rng = self.make_rng("sampling")
            rng_rpn, rng_roi = jax.random.split(rng)
            rpn_cls, rpn_reg = rpn_loss(rng_rpn, anchors, obj, deltas, labels)
            rois, cls_t, reg_t, pos_w, all_w = sample_rois(
                rng_roi, proposals, prop_valid, labels,
                num_pos=self.roi_pos, num_neg=self.roi_neg,
            )
            roi_feats = self._roi_align(feat, rois, self.roi_size, 1.0 / self.stride)
            cls_logits, reg_pred = self.head(roi_feats, train=True)
            # per-class reg: select the target class's head (fast.py:201)
            fg = jnp.clip(cls_t - 1, 0, self.num_classes - 1)
            reg_sel = jnp.take_along_axis(
                reg_pred, fg[..., None, None].repeat(4, -1), axis=2
            ).squeeze(2)
            cls_loss = cross_entropy(
                cls_logits.reshape(-1, self.num_classes + 1), cls_t.reshape(-1),
                weights=all_w.reshape(-1),
            )
            reg_loss = smooth_l1(
                reg_sel.reshape(-1, 4), reg_t.reshape(-1, 4),
                weights=pos_w.reshape(-1),
            )
            return {
                "rpn_cls": rpn_cls, "rpn_reg": rpn_reg,
                "cls": cls_loss, "reg": reg_loss,
            }

        # eval: classify + regress ALL proposals
        roi_feats = self._roi_align(feat, proposals, self.roi_size, 1.0 / self.stride)
        cls_logits, reg_pred = self.head(roi_feats, train=False)
        boxes = decode_boxes(proposals[:, :, None, :], reg_pred, BOX_STD,
                             wh_from_dw=compat)
        if not compat:  # the reference never clips final boxes (fast.py:274)
            boxes = clip_boxes(boxes, self.image_size, self.image_size)
        return cls_logits, boxes, proposals, prop_valid


def fastrcnn_postprocess(
    cls_logits: jnp.ndarray,  # [B, P, C+1]
    boxes: jnp.ndarray,  # [B, P, C, 4]
    prop_valid: jnp.ndarray,  # [B, P]
    score_thresh: float = 0.05,
    nms_thresh: float = 0.3,
    max_det: int = 100,
) -> Detections:
    """Per-class decode + NMS -> fixed-size Detections (fast.py:265-283 +
    inference.py NMS). Class-aware via coordinate offsets."""
    from ...ops.nms import CLASS_OFFSET

    b, p, c1 = cls_logits.shape
    c = c1 - 1
    scores_all = jax.nn.softmax(cls_logits, axis=-1)[..., 1:]  # [B, P, C] fg

    def per_image(scores, bxs, pvalid):
        flat_scores = jnp.where(pvalid[:, None], scores, 0.0).reshape(-1)  # P*C
        flat_boxes = bxs.reshape(-1, 4)
        flat_cls = jnp.broadcast_to(jnp.arange(c)[None, :], (p, c)).reshape(-1)
        masked = jnp.where(flat_scores > score_thresh, flat_scores, -jnp.inf)
        k = min(4 * max_det, masked.shape[0])
        top_s, top_i = jax.lax.top_k(masked, k)
        top_b = flat_boxes[top_i]
        top_c = flat_cls[top_i]
        off_boxes = top_b + (top_c.astype(top_b.dtype) * CLASS_OFFSET)[:, None]
        keep = suppression_mask(off_boxes, top_s, nms_thresh)
        final_s = jnp.where(keep, top_s, -jnp.inf)
        out_s, out_i = jax.lax.top_k(final_s, min(max_det, k))
        valid = out_s > -jnp.inf
        return Detections(
            boxes=jnp.where(valid[:, None], top_b[out_i], 0.0),
            scores=jnp.where(valid, out_s, 0.0),
            classes=jnp.where(valid, top_c[out_i], -1),
            valid=valid,
        )

    return jax.vmap(per_image)(scores_all, boxes, prop_valid)


def faster_rcnn(num_classes: int = 20, **kw) -> FasterRCNN:
    """Factory (ref demos/faster_rcnn/models/faster.py:9)."""
    return FasterRCNN(num_classes=num_classes, **kw)
