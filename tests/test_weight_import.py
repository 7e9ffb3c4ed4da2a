"""Weight-import parity: load the REFERENCE torch YOLOv3's weights into our
flax model and require numerically-identical forward outputs (the de-facto
architecture+import correctness test, SURVEY.md §4 weight-transfer parity).

The reference model itself is executed (not copied) from /root/reference to
produce ground-truth activations.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference/demos/yolov3_u")

from fastvision_tpu.models.detection import YOLOv3
from fastvision_tpu.models.import_torch import (
    apply_import,
    resnet_from_torchvision,
    vgg_from_torchvision,
    yolov3_from_torch,
)

NUM_CLASSES = 4


@pytest.fixture(scope="module")
def torch_yolo():
    from models.yolov3 import YoloV3

    torch.manual_seed(0)
    anchors = tuple(torch.ones(3, 2) for _ in range(3))
    model = YoloV3(num_classes=NUM_CLASSES, anchors=anchors)
    model.eval()
    # randomize BN running stats so eval BN is a real test, not identity
    with torch.no_grad():
        for mod in model.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 1.5)
    return model


def test_yolov3_forward_parity(torch_yolo):
    state = {k: v.detach().numpy() for k, v in torch_yolo.state_dict().items()}
    imported = yolov3_from_torch(state)

    ours = YOLOv3(num_classes=NUM_CLASSES)
    x = np.random.default_rng(0).normal(0, 1, (1, 64, 64, 3)).astype(np.float32)
    variables = ours.init(jax.random.key(0), jnp.asarray(x), train=True)
    variables = apply_import(dict(variables), imported, verbose=False)

    # every one of our params must have been covered by the import
    from fastvision_tpu.core.checkpoint import flatten_params

    our_flat = flatten_params(variables["params"])
    missing = [k for k in our_flat if k not in imported["params"]]
    assert not missing, f"params not covered by import: {missing[:8]}"

    heads = ours.apply(variables, jnp.asarray(x), train=False)

    with torch.no_grad():
        t_heads = torch_yolo(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    for li, (our_h, t_h) in enumerate(zip(heads, t_heads)):
        b, h, w, a, no = our_h.shape
        # torch [B, A*(5+C), H, W] -> [B, H, W, A, 5+C]
        want = (
            t_h.numpy()
            .reshape(b, a, no, h, w)
            .transpose(0, 3, 4, 1, 2)
        )
        np.testing.assert_allclose(
            np.asarray(our_h), want, rtol=2e-3, atol=2e-3,
            err_msg=f"level {li} mismatch",
        )


def test_import_head_dropping(torch_yolo):
    """Loading COCO-class weights into a different-class-count model keeps
    the backbone/neck and re-inits the heads (train.py:93-101 behavior)."""
    state = {k: v.detach().numpy() for k, v in torch_yolo.state_dict().items()}
    imported = yolov3_from_torch(state)
    ours = YOLOv3(num_classes=7)  # != NUM_CLASSES -> head shape mismatch
    variables = ours.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=True)
    before_head = np.asarray(variables["params"]["head"]["pred0"]["kernel"]).copy()
    before_stem = np.asarray(variables["params"]["backbone"]["stem"]["conv"]["kernel"]).copy()
    out = apply_import(dict(variables), imported, verbose=False)
    after_head = np.asarray(out["params"]["head"]["pred0"]["kernel"])
    after_stem = np.asarray(out["params"]["backbone"]["stem"]["conv"]["kernel"])
    np.testing.assert_array_equal(before_head, after_head)  # kept init
    assert not np.array_equal(before_stem, after_stem)  # imported


def test_vgg16_import_coverage():
    """Synthesize a torchvision-shaped vgg16 state dict and require full
    coverage of our conv trunk + classifier."""
    from fastvision_tpu.models.classification import vgg16

    rng = np.random.default_rng(0)
    # torchvision vgg16 conv layer indices in `features`
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    chans = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
    state = {}
    in_c = 3
    for n, c in zip(conv_idx, chans):
        state[f"features.{n}.weight"] = rng.normal(0, 0.1, (c, in_c, 3, 3)).astype(np.float32)
        state[f"features.{n}.bias"] = rng.normal(0, 0.1, (c,)).astype(np.float32)
        in_c = c
    state["classifier.0.weight"] = rng.normal(0, 0.1, (4096, 512 * 49)).astype(np.float32)
    state["classifier.0.bias"] = np.zeros(4096, np.float32)
    state["classifier.3.weight"] = rng.normal(0, 0.1, (4096, 4096)).astype(np.float32)
    state["classifier.3.bias"] = np.zeros(4096, np.float32)
    state["classifier.6.weight"] = rng.normal(0, 0.1, (1000, 4096)).astype(np.float32)
    state["classifier.6.bias"] = np.zeros(1000, np.float32)

    imported = vgg_from_torchvision(state)
    model = vgg16(num_classes=1000)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)), train=True)
    from fastvision_tpu.core.checkpoint import flatten_params

    our_flat = flatten_params(variables["params"])
    missing = [k for k in our_flat if k not in imported["params"]]
    assert not missing, missing[:8]
    # spot check layout
    np.testing.assert_allclose(
        imported["params"]["conv0/conv/kernel"],
        state["features.0.weight"].transpose(2, 3, 1, 0),
    )


def test_resnet18_import_coverage():
    from fastvision_tpu.models.classification import resnet18

    model = resnet18(num_classes=10)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=True)
    from fastvision_tpu.core.checkpoint import flatten_params

    our_params = flatten_params(variables["params"])
    our_stats = flatten_params(variables["batch_stats"])

    # synthesize a torchvision-shaped resnet18 state dict from OUR shapes
    state = {}

    def put_conv(tname, oname):
        shape = np.shape(our_params[oname])  # HWIO
        state[f"{tname}.weight"] = np.random.default_rng(0).normal(
            0, 0.1, (shape[3], shape[2], shape[0], shape[1])
        ).astype(np.float32)

    def put_bn(tname, oname_prefix):
        c = np.shape(our_params[f"{oname_prefix}/scale"])[0]
        state[f"{tname}.weight"] = np.ones(c, np.float32)
        state[f"{tname}.bias"] = np.zeros(c, np.float32)
        state[f"{tname}.running_mean"] = np.zeros(c, np.float32)
        state[f"{tname}.running_var"] = np.ones(c, np.float32)

    put_conv("conv1", "stem/conv/kernel")
    put_bn("bn1", "stem/bn/bn")
    for i in range(1, 5):
        for j in range(2):
            for k in (1, 2):
                put_conv(f"layer{i}.{j}.conv{k}",
                         f"stage{i}_block{j}/ConvBN_{k - 1}/conv/kernel")
                put_bn(f"layer{i}.{j}.bn{k}", f"stage{i}_block{j}/ConvBN_{k - 1}/bn/bn")
            if f"stage{i}_block{j}/downsample/conv/kernel" in our_params:
                put_conv(f"layer{i}.{j}.downsample.0",
                         f"stage{i}_block{j}/downsample/conv/kernel")
                put_bn(f"layer{i}.{j}.downsample.1", f"stage{i}_block{j}/downsample/bn/bn")
    state["fc.weight"] = np.zeros((10, 512), np.float32)
    state["fc.bias"] = np.zeros(10, np.float32)

    imported = resnet_from_torchvision(state)
    missing_p = [k for k in our_params if k not in imported["params"]]
    missing_s = [k for k in our_stats if k not in imported["batch_stats"]]
    assert not missing_p, missing_p[:8]
    assert not missing_s, missing_s[:8]


def test_detect_and_import_routing():
    """detect_and_import routes every reference naming scheme to the right
    importer (keys + ranks only — numerics are covered by the per-family
    parity tests)."""
    from fastvision_tpu.models.import_torch import detect_and_import

    import pytest as _pytest

    def w(*shape):
        return np.zeros(shape, np.float32)

    cases = [
        # (marker keys, a param path the right importer must produce)
        ({"backbone.conv0.conv.weight": w(32, 3, 3, 3)},
         "backbone/stem/conv/kernel"),
        ({"rpn.conv3x3.weight": w(512, 512, 3, 3),
          "rpn.conv3x3.bias": w(512),
          "rpn.classifier.weight": w(18, 512, 1, 1),
          "rpn.classifier.bias": w(18),
          "fast.regressor.weight": w(24, 4096),
          "fast.regressor.bias": w(24)},
         "rpn/cls/kernel"),
        ({"fast_pathway.conv1.0.weight": w(8, 3, 5, 7, 7),
          "fast_pathway.conv1.1.weight": w(8)},
         "fast_stem/conv/kernel"),
        ({"layer1.0.conv.weight": w(64, 3, 3, 3, 3),
          "layer2.0.conv.weight": w(128, 64, 3, 3, 3),
          "layer3.0.conv.weight": w(256, 128, 3, 3, 3),
          "layer3.2.conv.weight": w(256, 256, 3, 3, 3),
          "layer4.0.conv.weight": w(512, 256, 3, 3, 3),
          "layer4.2.conv.weight": w(512, 512, 3, 3, 3),
          "layer5.0.conv.weight": w(512, 512, 3, 3, 3),
          "layer5.2.conv.weight": w(512, 512, 3, 3, 3)},
         "conv1a/conv/kernel"),
        ({"conv1.0.weight": w(64, 3, 1, 7, 7), "conv1.1.weight": w(64)},
         "stem/conv/kernel"),  # 5-D stem -> resnet3d
        ({"conv1.0.weight": w(64, 3, 7, 7), "conv1.1.weight": w(64)},
         "stem/conv/kernel"),  # 4-D stem -> reference 2-D resnet
        ({"conv1.weight": w(64, 3, 7, 7),
          "layer1.0.conv1.weight": w(64, 64, 1, 1)},
         "stem/conv/kernel"),  # torchvision resnet
        ({"features.0.weight": w(64, 3, 3, 3), "features.0.bias": w(64)},
         "conv0/conv/kernel"),  # torchvision vgg
        ({"vgg1.0.weight": w(64, 3, 3, 3), "vgg1.0.bias": w(64)},
         "conv0/conv/kernel"),  # reference vgg
    ]
    for state, must_have in cases:
        imported = detect_and_import(state)
        assert must_have in imported["params"], (sorted(state)[:3], must_have)

    with _pytest.raises(ValueError, match="unrecognized"):
        detect_and_import({"mystery.weight": w(3, 3)})
