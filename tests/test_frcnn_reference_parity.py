"""Chain C: Faster R-CNN eval-path box parity vs the EXECUTED reference.

Instantiates the reference's own Faster_Rcnn (demos/faster_rcnn/models/
faster.py:93, eval branch: RPN filter rpn.py:168-208 -> RoI align
fast.py:258 -> per-argmax-class decode fast.py:265-286) with random
weights, imports them via models.import_torch.frcnn_from_reference into
FasterRCNN(reference_compat=True), and asserts:

  1. backbone features match;
  2. RPN raw outputs match (our single sigmoid objectness logit == the
     reference's softmax fg-bg logit difference);
  3. post-NMS proposals match (count, order, coordinates, scores);
  4. final per-proposal (boxes, classes, scores) match.

torchvision is not installed in this image: ops.nms is replaced by the
exact-greedy oracle (same as tests/test_e2e_box_parity.py) and
ops.roi_align by a bilinear oracle with sampling_ratio pinned to 2 — the
reference calls roi_align with the default ADAPTIVE sampling ratio, which
is data-dependent (ceil(roi/7) samples per bin) and has no static-shape
TPU analogue; our redesign fixes ratio=2 (ops/roi_align.py), so the chain
is compared under that pinned ratio. Everything else is bit-faithful,
including the reference's decode quirks (see FasterRCNN.reference_compat).
"""
import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

STRIDE = 16


# ---------------------------------------------------------------------------
# torchvision oracles
# ---------------------------------------------------------------------------
def _tv_nms(boxes, scores, iou_thresh):
    """torchvision.ops.nms semantics: greedy by descending score, kept
    indices in that order."""
    b = boxes.detach().numpy()
    s = scores.detach().numpy()
    order = np.argsort(-s, kind="stable")
    keep = []
    while order.size:
        i = order[0]
        keep.append(int(i))
        if order.size == 1:
            break
        rest = order[1:]
        xx1 = np.maximum(b[i, 0], b[rest, 0])
        yy1 = np.maximum(b[i, 1], b[rest, 1])
        xx2 = np.minimum(b[i, 2], b[rest, 2])
        yy2 = np.minimum(b[i, 3], b[rest, 3])
        inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
        area_i = (b[i, 2] - b[i, 0]) * (b[i, 3] - b[i, 1])
        area_r = (b[rest, 2] - b[rest, 0]) * (b[rest, 3] - b[rest, 1])
        iou = inter / (area_i + area_r - inter + 1e-12)
        order = rest[iou <= iou_thresh]
    return torch.as_tensor(keep, dtype=torch.int64)


def _tv_roi_align(feat, rois, output_size, spatial_scale=1.0,
                  sampling_ratio=-1):
    """Bilinear RoI align, torchvision aligned=False semantics, with the
    sampling ratio PINNED to 2 (see module docstring)."""
    ratio = 2
    out = output_size[0] if isinstance(output_size, (tuple, list)) else output_size
    f = feat.detach().numpy()  # [B, C, H, W]
    r = rois.detach().numpy()  # [N, 5]
    _, c, h, w = f.shape
    res = np.zeros((len(r), c, out, out), np.float32)

    def bilinear(img, y, x):  # img [C, H, W]
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        wy, wx = y - y0, x - x0
        y0c, x0c = min(max(y0, 0), h - 1), min(max(x0, 0), w - 1)
        y1c, x1c = min(y0c + 1, h - 1), min(x0c + 1, w - 1)
        return (img[:, y0c, x0c] * (1 - wy) * (1 - wx)
                + img[:, y0c, x1c] * (1 - wy) * wx
                + img[:, y1c, x0c] * wy * (1 - wx)
                + img[:, y1c, x1c] * wy * wx)

    for n, (bi, x1, y1, x2, y2) in enumerate(r):
        img = f[int(bi)]
        x1, y1, x2, y2 = (v * spatial_scale for v in (x1, y1, x2, y2))
        bw, bh = max(x2 - x1, 1.0), max(y2 - y1, 1.0)
        for i in range(out):
            for j in range(out):
                acc = np.zeros(c, np.float32)
                for ki in range(ratio):
                    for kj in range(ratio):
                        y = y1 + (i + (ki + 0.5) / ratio) * bh / out
                        x = x1 + (j + (kj + 0.5) / ratio) * bw / out
                        acc += bilinear(img, y, x)
                res[n, :, i, j] = acc / ratio**2
    return torch.from_numpy(res)


@pytest.fixture(scope="module")
def ref_frcnn():
    if "torchvision" in sys.modules:
        sys.modules["torchvision"].ops.nms = _tv_nms
        sys.modules["torchvision"].ops.roi_align = _tv_roi_align
    else:
        tv = types.ModuleType("torchvision")
        tv.ops = types.SimpleNamespace(nms=_tv_nms, roi_align=_tv_roi_align)
        sys.modules["torchvision"] = tv
    # the demo is a proper package with relative imports — load it by path
    if "reffrcnn" not in sys.modules:
        pkg = "/root/reference/demos/faster_rcnn/models"
        spec = importlib.util.spec_from_file_location(
            "reffrcnn", pkg + "/__init__.py", submodule_search_locations=[pkg])
        mod = importlib.util.module_from_spec(spec)
        sys.modules["reffrcnn"] = mod
        spec.loader.exec_module(mod)
    import importlib as _il

    return _il.import_module("reffrcnn.faster")


def _base_anchors_wh(scales, ratios):
    """Reference get_base_anchor (utils/anchor_generator.py:4): [A, 2] wh."""
    out = []
    for r in ratios:
        for s in scales:
            w = (s**2 / r) ** 0.5
            out.append((w, s**2 / w))
    return np.asarray(out, np.float32)


NUM_CLASSES = 5
IMG = 224
SCALES = (32, 64, 128)
RATIOS = (1.0, 0.5, 2.0)
# PRE covers all 14*14*9 = 1764 anchors: a cutoff INSIDE the score
# distribution makes the comparison sensitive to fp top-k ties (the
# reference ranks by fp32 softmax scores, which collapse logits that
# differ by ~1e-7; torch.topk breaks such ties arbitrarily)
PRE, POST = 2000, 50


def build_pair(ref_frcnn, seed=0):
    import jax
    import jax.numpy as jnp

    from fastvision_tpu.core.checkpoint import flatten_params, partial_load
    from fastvision_tpu.models.detection.faster_rcnn import FasterRCNN
    from fastvision_tpu.models.import_torch import frcnn_from_reference

    torch.manual_seed(seed)
    tm = ref_frcnn.Faster_Rcnn(
        training=False, in_channels=3, num_classes=NUM_CLASSES,
        base_anchors=torch.from_numpy(_base_anchors_wh(SCALES, RATIOS)),
        backbone_stride=STRIDE, rpn_pre_nms_top_n=PRE, rpn_post_nms_top_n=POST,
        rpn_nms_thresh=0.7, fast_multi_reg_head=True, fast_roi_pool=7,
    )
    tm.eval()
    # the reference zero-inits RPN biases and std-0.01 weights (rpn.py:105);
    # bump the heads so proposals/scores/boxes spread out
    with torch.no_grad():
        g = torch.Generator().manual_seed(seed + 1)
        tm.rpn.classifier.weight.normal_(0, 0.05, generator=g)
        tm.rpn.classifier.bias.normal_(0, 0.2, generator=g)
        tm.rpn.regressor.weight.normal_(0, 0.02, generator=g)
        tm.fast.regressor.weight.normal_(0, 0.01, generator=g)
        tm.fast.classifier.weight.normal_(0, 0.05, generator=g)

    state = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    imported = frcnn_from_reference(state)

    om = FasterRCNN(
        num_classes=NUM_CLASSES, image_size=IMG,
        anchor_scales=tuple(s / STRIDE for s in SCALES), anchor_ratios=RATIOS,
        stride=STRIDE, rpn_pre_nms_eval=PRE, rpn_post_nms_eval=POST,
        rpn_nms_thresh=0.7, roi_backend="gather", reference_compat=True,
    )
    x = np.random.default_rng(seed).normal(0, 1, (2, IMG, IMG, 3)).astype(np.float32)
    variables = om.init(
        {"params": jax.random.key(0), "sampling": jax.random.key(1),
         "dropout": jax.random.key(2)},
        jnp.asarray(x), jnp.zeros((2, 4, 5), jnp.float32), train=True,
    )
    missing = [k for k in flatten_params(variables["params"])
               if k not in imported["params"]]
    assert not missing, missing[:8]
    v2 = {"params": partial_load(variables["params"], imported["params"],
                                 verbose=False)}
    return tm, om, v2, x


def test_frcnn_eval_chain_parity(ref_frcnn):
    import jax
    import jax.numpy as jnp

    tm, om, v2, x = build_pair(ref_frcnn)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))

    # --- stage 1+2: backbone features and RPN raw outputs --------------------
    with torch.no_grad():
        feat_t = tm.backbone(xt)  # [B, 512, 14, 14]
        feat_rpn = torch.relu(tm.rpn.conv3x3(feat_t))
        cls_t = tm.rpn.classifier(feat_rpn).permute(0, 2, 3, 1)
        cls_t = cls_t.reshape(2, 14, 14, -1, 2).numpy()
        reg_t = tm.rpn.regressor(feat_rpn).permute(0, 2, 3, 1)
        reg_t = reg_t.reshape(2, -1, 4).numpy()

    bb = om.bind(v2)
    feat_o = np.asarray(bb.backbone(jnp.asarray(x), False))
    np.testing.assert_allclose(
        feat_o, feat_t.numpy().transpose(0, 2, 3, 1), rtol=2e-3, atol=2e-4)
    obj_o, reg_o = jax.tree.map(np.asarray, bb.rpn(jnp.asarray(feat_o)))
    want_obj = (cls_t[..., 1] - cls_t[..., 0]).reshape(2, -1)
    np.testing.assert_allclose(obj_o, want_obj, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(reg_o, reg_t, rtol=2e-3, atol=2e-4)

    # --- full eval forwards ---------------------------------------------------
    with torch.no_grad():
        predicts = tm(xt)  # list per image: [N, 6] xywh(feature), cat, score
        proposals_t = tm.rpn(feat_t)  # list per image: [N, 4] xywh feature

    cls_logits, boxes, proposals, valid = jax.jit(
        lambda v, x: om.apply(v, x, train=False)
    )(v2, jnp.asarray(x))
    cls_logits, boxes, proposals, valid = map(
        np.asarray, (cls_logits, boxes, proposals, valid))

    for b in range(2):
        # --- stage 3: post-NMS proposals -------------------------------------
        pt = proposals_t[b].numpy()  # feature-scale xywh
        n = pt.shape[0]
        assert int(valid[b].sum()) == n
        pt_xyxy = np.concatenate(
            [pt[:, :2] - pt[:, 2:] / 2, pt[:, :2] + pt[:, 2:] / 2], -1) * STRIDE
        # Align by box matching: the KEEP-SETS are identical, but adjacent
        # near-tie rows can swap order — the reference ranks by fp32 softmax
        # scores, which collapse logit gaps of ~1e-7 that our logit ranking
        # still resolves. Build the (bijective) ref->ours permutation.
        d = np.abs(proposals[b, :n, None, :] - pt_xyxy[None, :, :]).max(-1)
        perm = d.argmin(0)  # ref row i lives at ours row perm[i]
        assert d[perm, np.arange(n)].max() < 0.05, d.min(0).max()
        assert len(set(perm.tolist())) == n  # bijection
        np.testing.assert_allclose(proposals[b, perm], pt_xyxy, rtol=1e-3,
                                   atol=0.05)

        # --- stage 4: final detections ----------------------------------------
        want = predicts[b].numpy()  # [M, 6] (argmax-fg rows, proposal order)
        scores_o = jax.nn.softmax(jnp.asarray(cls_logits[b, perm]), axis=-1)
        scores_o = np.asarray(scores_o)
        cat_all = scores_o.argmax(-1)  # includes background=0
        keep = cat_all > 0
        assert keep.sum() == want.shape[0]
        got_scores = scores_o[keep, cat_all[keep]]
        got_cats = cat_all[keep] - 1
        got_boxes = boxes[b, perm][keep][np.arange(int(keep.sum())), got_cats]
        want_xyxy = np.concatenate(
            [want[:, :2] - want[:, 2:4] / 2, want[:, :2] + want[:, 2:4] / 2],
            -1) * STRIDE
        np.testing.assert_allclose(got_cats, want[:, 4].astype(np.int64))
        np.testing.assert_allclose(got_scores, want[:, 5], rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(got_boxes, want_xyxy, rtol=2e-3, atol=0.1)
