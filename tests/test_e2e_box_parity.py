"""Box-level END-TO-END inference parity vs the EXECUTED reference.

VERDICT r2 missing-4: run one synthetic image through the reference's own
inference chain (executed from /root/reference, never copied) and through
ours with the SAME random weights, and assert the SAME final boxes.

Chain A — yolov3_u demo (inference.py:28-137):
    preProcess -> torch YoloV3 -> postProcess (v5 decode, unscale to
    original px, clamp, >5px filter, obj-ranked class-offset NMS)
  vs Detector(postprocess_mode='reference_demo', pad_value=0).

Chain B — huaweiShip serving (customize_service.py:425-488 'v3 path'):
    PTVisionService.postprocess (v3 decode) -> ultralytics multi-label NMS
    (min/max-wh constraint, obj*cls ranking) -> scale_coords
  vs decode_predictions('v3') -> non_max_suppression_multilabel ->
     infer.postprocess.scale_coords.

Unavailable third-party deps are stubbed at import time and documented
inline: albumentations (the four transforms the executed paths actually
construct are faithfully implemented; everything else raises if touched)
and torchvision.ops.nms (not installed in this image — replaced by a
plain-python greedy NMS with exact torchvision semantics, the same oracle
contract as tests/test_nms.py)."""
import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

DEMO_DIR = "/root/reference/demos/yolov3_u"
SERVE_PATH = "/root/reference/demos/yolov3_huaweiShip/customize_service.py"
if DEMO_DIR not in sys.path:
    sys.path.insert(0, DEMO_DIR)

NUM_CLASSES = 4
S = 416
STRIDES = (32, 16, 8)
ANCHORS_PX = np.asarray(
    [[[116, 90], [156, 198], [373, 326]],
     [[30, 61], [62, 45], [59, 119]],
     [[10, 13], [16, 30], [33, 23]]], np.float32)


def _tv_nms(boxes, scores, iou_threshold):
    """torchvision.ops.nms semantics: greedy by descending score, returns
    kept indices in that order (torchvision is not installed here)."""
    b = boxes.detach().cpu().numpy().astype(np.float64)
    s = scores.detach().cpu().numpy()
    order = np.argsort(-s, kind="stable")
    keep, suppressed = [], np.zeros(len(s), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(int(i))
        tl = np.maximum(b[i, :2], b[:, :2])
        br = np.minimum(b[i, 2:], b[:, 2:])
        inter = np.clip(br - tl, 0, None).prod(1)
        ua = ((b[i, 2] - b[i, 0]) * (b[i, 3] - b[i, 1])
              + (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1]) - inter)
        suppressed |= inter / np.maximum(ua, 1e-12) > iou_threshold
    return torch.as_tensor(keep, dtype=torch.long)


def _install_stubs():
    # torchvision: overwrite any earlier nms=None stub with the real oracle
    if "torchvision" in sys.modules:
        sys.modules["torchvision"].ops.nms = _tv_nms
    else:
        tv = types.ModuleType("torchvision")
        tv.ops = types.SimpleNamespace(nms=_tv_nms, roi_align=None)
        sys.modules["torchvision"] = tv

    if "albumentations" in sys.modules:
        return

    class Compose:
        def __init__(self, transforms, p=1.0):
            self.transforms = transforms

        def __call__(self, image=None, **kw):
            for t in self.transforms:
                image = t(image)
            return {"image": image}

    class PadIfNeeded:  # albumentations pads centered: (min - cur) // 2 on top/left
        def __init__(self, min_height, min_width, value=0, border_mode=None, p=1.0):
            self.mh, self.mw, self.value = min_height, min_width, value

        def __call__(self, img):
            h, w = img.shape[:2]
            top = max(0, (self.mh - h) // 2)
            left = max(0, (self.mw - w) // 2)
            return np.pad(
                img,
                ((top, max(0, self.mh - h - top)),
                 (left, max(0, self.mw - w - left)), (0, 0)),
                constant_values=self.value,
            )

    class Normalize:  # (img / max_pixel_value - mean) / std
        def __init__(self, mean, std, max_pixel_value=255.0, p=1.0):
            self.mean = np.asarray(mean, np.float32)
            self.std = np.asarray(std, np.float32)
            self.maxv = max_pixel_value

        def __call__(self, img):
            return (img.astype(np.float32) / self.maxv - self.mean) / self.std

    class ToTensorV2:
        def __init__(self, p=1.0):
            pass

        def __call__(self, img):
            return torch.from_numpy(np.ascontiguousarray(img.transpose(2, 0, 1)))

    def _unused(name):
        class _Unused:
            def __init__(self, *a, **k):
                raise RuntimeError(f"albumentations stub {name} must not be used")

        return _Unused

    alb = types.ModuleType("albumentations")
    alb.Compose, alb.PadIfNeeded, alb.Normalize = Compose, PadIfNeeded, Normalize
    alb.__getattr__ = _unused
    pyt = types.ModuleType("albumentations.pytorch")
    pyt.ToTensorV2 = ToTensorV2
    alb.pytorch = pyt
    sys.modules["albumentations"] = alb
    sys.modules["albumentations.pytorch"] = pyt

    ms = types.ModuleType("model_service")
    pms = types.ModuleType("model_service.pytorch_model_service")

    class PTServingBaseService:
        def __init__(self, *a, **k):
            pass

    pms.PTServingBaseService = PTServingBaseService
    ms.pytorch_model_service = pms
    sys.modules["model_service"] = ms
    sys.modules["model_service.pytorch_model_service"] = pms


def _exec_reference(path, strip=()):
    """Execute a reference source file in a fresh namespace (never copied
    into this repo); `strip` lines (e.g. the demo's module-level
    `Inference()` call) are removed first."""
    _install_stubs()
    with open(path) as f:
        src = f.read()
    for s in strip:
        src = src.replace(s, "")
    ns = {"__file__": path, "__name__": "_ref_exec"}
    exec(compile(src, path, "exec"), ns)
    return ns


@pytest.fixture(scope="module")
def torch_model():
    _install_stubs()
    from models.yolov3 import YoloV3

    torch.manual_seed(7)
    anchors = tuple(torch.tensor(a / s) for a, s in zip(ANCHORS_PX, STRIDES))
    model = YoloV3(num_classes=NUM_CLASSES, anchors=anchors)
    model.eval()
    with torch.no_grad():  # real eval-BN, not identity
        for mod in model.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 1.5)
    return model


@pytest.fixture(scope="module")
def our_variables(torch_model):
    import jax
    import jax.numpy as jnp

    from fastvision_tpu.models.detection import YOLOv3
    from fastvision_tpu.models.import_torch import apply_import, yolov3_from_torch

    state = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    model = YOLOv3(num_classes=NUM_CLASSES)
    variables = model.init(jax.random.key(0), jnp.zeros((1, S, S, 3)), train=True)
    return model, apply_import(dict(variables), yolov3_from_torch(state), verbose=False)


@pytest.fixture(scope="module")
def image_png(tmp_path_factory):
    import cv2

    rng = np.random.default_rng(3)
    img = np.full((S, S, 3), 110, np.uint8)
    for _ in range(6):  # structured content: rectangles + circles
        x, y = rng.integers(20, 330, 2)
        w, h = rng.integers(30, 80, 2)
        color = tuple(int(c) for c in rng.integers(0, 255, 3))
        cv2.rectangle(img, (int(x), int(y)), (int(x + w), int(y + h)), color, -1)
        cv2.circle(img, (int(x + w), int(y)), int(rng.integers(10, 30)), color, 3)
    # per-pixel noise: flat regions make adjacent cells produce EXACT
    # score ties, where the two chains' tie-breaking legitimately differs
    img = np.clip(
        img.astype(np.int16) + rng.integers(-25, 26, img.shape), 0, 255
    ).astype(np.uint8)
    # identity check: the ref always cv2.resize()s; at scale 1 that must
    # be a no-op or the two chains would see different pixels
    assert np.array_equal(cv2.resize(img, (S, S)), img)
    p = tmp_path_factory.mktemp("e2e") / "img.png"
    cv2.imwrite(str(p), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    return str(p)


def _pick_conf(values, lo=10, hi=40):
    """Threshold with the widest gap in the sorted score tail, so forward
    fp error (~1e-5) cannot flip any candidate across it."""
    v = np.sort(np.asarray(values, np.float64))[::-1]
    gaps = v[lo:hi] - v[lo + 1 : hi + 1]
    k = lo + int(np.argmax(gaps))
    return float((v[k] + v[k + 1]) / 2.0)


def _assert_matching(ref, ours, atol_box=0.1, atol_score=2e-3):
    rb, rs, rc = ref
    ob, os_, oc = ours
    assert len(rb) == len(ob), (len(rb), len(ob))
    used = np.zeros(len(ob), bool)
    for b, s, c in zip(rb, rs, rc):
        d = np.abs(ob - b).max(axis=1) + used * 1e9
        j = int(np.argmin(d))
        assert d[j] < atol_box, (b, ob[j], d[j])
        assert int(oc[j]) == int(c), (oc[j], c)
        assert abs(float(os_[j]) - float(s)) < atol_score, (os_[j], s)
        used[j] = True


def test_demo_chain_box_parity(torch_model, our_variables, image_png):
    """Chain A: reference preProcess/postProcess/NMS vs our full Detector
    in reference_demo mode — one assert on the final boxes."""
    import jax.numpy as jnp

    from fastvision_tpu.infer import Detector, decode_predictions

    ns = _exec_reference(f"{DEMO_DIR}/inference.py", strip=("\nInference()",))

    image_t, _ori, ratio, pl, pt, oh, ow = ns["preProcess"](image_png, S)
    assert ratio == 1.0 and pl == 0 and pt == 0
    with torch.no_grad():
        layers = torch_model(image_t)

    # pick the conf threshold from OUR objectness distribution (identical
    # to the reference's within forward fp error)
    model, variables = our_variables
    from fastvision_tpu.data.dataset import imread_rgb

    x = jnp.asarray(imread_rgb(image_png)[None]).astype(jnp.float32) / 255.0
    heads = model.apply(variables, x, train=False)
    pred = np.asarray(decode_predictions(heads, ANCHORS_PX, STRIDES, "v5"))[0]
    conf = _pick_conf(pred[:, 4])

    anchors_fs = [torch.tensor(a / s) for a, s in zip(ANCHORS_PX, STRIDES)]
    scores_t, cats_t, boxes_t = ns["postProcess"](
        [l.clone() for l in layers], list(STRIDES), anchors_fs,
        conf, 0.45, ratio, pl, pt, ow, oh,
    )
    ref_boxes = boxes_t.numpy()
    ref_scores = scores_t.numpy().ravel()
    ref_cls = cats_t.numpy().ravel().astype(int)
    assert len(ref_boxes) >= 3, "degenerate case: too few reference boxes"

    det = Detector(
        model, variables, ANCHORS_PX, input_size=S, conf_thres=conf,
        iou_thres=0.45, batch_size=1, dtype=jnp.float32, pad_value=0,
        postprocess_mode="reference_demo",
    )
    r = det.predict_image(image_png)
    _assert_matching(
        (ref_boxes, ref_scores, ref_cls),
        (np.asarray(r["boxes"]), np.asarray(r["scores"]), np.asarray(r["classes"])),
    )


def test_serving_chain_box_parity(torch_model, our_variables, image_png):
    """Chain B: reference serving postprocess (v3 decode) + ultralytics
    multi-label NMS + scale_coords vs our v3 decode + multilabel NMS +
    scale_coords."""
    import jax.numpy as jnp

    from fastvision_tpu.data.dataset import imread_rgb
    from fastvision_tpu.infer import decode_predictions
    from fastvision_tpu.infer.postprocess import scale_coords
    from fastvision_tpu.ops.nms import non_max_suppression_multilabel

    ns = _exec_reference(SERVE_PATH)

    img = imread_rgb(image_png)
    x_t = torch.from_numpy(
        (img.astype(np.float32) / 255.0).transpose(2, 0, 1)
    )[None]
    with torch.no_grad():
        layers = torch_model(x_t)

    model, variables = our_variables
    x = jnp.asarray(img[None]).astype(jnp.float32) / 255.0
    heads = model.apply(variables, x, train=False)
    pred = np.asarray(decode_predictions(heads, ANCHORS_PX, STRIDES, "v3"))[0]
    pair_scores = (pred[:, 5:] * pred[:, 4:5]).ravel()
    conf = _pick_conf(pair_scores)

    fake = types.SimpleNamespace(
        anchors=[torch.tensor(a / s) for a, s in zip(ANCHORS_PX, STRIDES)],
        stride=list(STRIDES), conf_thres=conf, iou_thres=0.6,
    )
    out = ns["PTVisionService"].postprocess(fake, [l.clone() for l in layers])
    ref = out[0].numpy()  # [n, 6] xyxy conf cls, input space
    ref_boxes = ref[:, :4].copy()
    ns["scale_coords"]((S, S), torch.from_numpy(ref_boxes), (S, S))
    assert len(ref_boxes) >= 3, "degenerate case: too few reference boxes"

    det = non_max_suppression_multilabel(
        jnp.asarray(pred), conf_thres=conf, iou_thres=0.6,
        max_det=300, pre_nms_top_k=4096,
    )
    valid = np.asarray(det.valid)
    our_boxes = scale_coords(np.asarray(det.boxes)[valid], 1.0, (0, 0), (S, S))
    _assert_matching(
        (ref_boxes, ref[:, 4], ref[:, 5].astype(int)),
        (our_boxes, np.asarray(det.scores)[valid],
         np.asarray(det.classes)[valid]),
    )
