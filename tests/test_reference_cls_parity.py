"""Forward parity vs the reference's OWN classification models (executed,
not copied): import their randomly-initialized weights and require matching
logits — validates both architecture equivalence and the import mapping."""
import importlib.util
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref():
    tv = types.ModuleType("torchvision")
    tv.ops = types.SimpleNamespace(nms=None, roi_align=None)
    sys.modules.setdefault("torchvision", tv)
    if "fastvision" not in sys.modules:
        spec = importlib.util.spec_from_file_location(
            "fastvision", "/root/reference/__init__.py",
            submodule_search_locations=["/root/reference"],
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules["fastvision"] = mod
        spec.loader.exec_module(mod)
    return sys.modules["fastvision"]


def randomize_bn(model):
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.3, 0.3)
                m.running_var.uniform_(0.7, 1.3)


def test_resnet50_parity_vs_reference(ref):
    from fastvision.classfication.models.resnet import resnet50 as t_resnet50

    from fastvision_tpu.core.checkpoint import partial_load
    from fastvision_tpu.models.classification import resnet50
    from fastvision_tpu.models.import_torch import resnet_from_reference

    torch.manual_seed(0)
    tm = t_resnet50(num_classes=7)
    tm.eval()
    randomize_bn(tm)
    state = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    imported = resnet_from_reference(state)

    om = resnet50(num_classes=7)
    x = np.random.default_rng(0).normal(0, 1, (1, 64, 64, 3)).astype(np.float32)
    variables = om.init(jax.random.key(0), jnp.asarray(x), train=True)
    v2 = {
        "params": partial_load(variables["params"], imported["params"], verbose=False),
        "batch_stats": partial_load(variables["batch_stats"],
                                    imported["batch_stats"], verbose=False),
    }
    # full coverage
    from fastvision_tpu.core.checkpoint import flatten_params

    missing = [k for k in flatten_params(variables["params"])
               if k not in imported["params"]]
    assert not missing, missing[:6]

    ours = np.asarray(om.apply(v2, jnp.asarray(x), train=False))
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours, want, rtol=2e-3, atol=2e-3)


def test_resnext50_parity_vs_reference(ref):
    """Grouped-conv family vs the executed reference (classfication/models/
    resnext.py:191 — same conv1.0/res{2..5} key scheme as its resnet, so
    `resnet_from_reference` routes it; grouped OIHW kernels map to flax
    feature_group_count layout unchanged)."""
    from fastvision.classfication.models.resnext import resnext50_32x4d as t_rx50

    from fastvision_tpu.core.checkpoint import flatten_params, partial_load
    from fastvision_tpu.models.classification import resnext50_32x4d
    from fastvision_tpu.models.import_torch import resnet_from_reference

    torch.manual_seed(0)
    tm = t_rx50(num_classes=5)
    tm.eval()
    randomize_bn(tm)
    state = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    imported = resnet_from_reference(state)

    om = resnext50_32x4d(num_classes=5)
    x = np.random.default_rng(3).normal(0, 1, (1, 64, 64, 3)).astype(np.float32)
    variables = om.init(jax.random.key(0), jnp.asarray(x), train=True)
    missing = [k for k in flatten_params(variables["params"])
               if k not in imported["params"]]
    assert not missing, missing[:6]
    v2 = {
        "params": partial_load(variables["params"], imported["params"], verbose=False),
        "batch_stats": partial_load(variables["batch_stats"],
                                    imported["batch_stats"], verbose=False),
    }
    ours = np.asarray(om.apply(v2, jnp.asarray(x), train=False))
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours, want, rtol=2e-3, atol=2e-3)


def test_darknet53_parity_vs_reference(ref):
    """Classifier-top Darknet-53 vs the executed reference module
    (classfication/models/darknet53.py:140 — SiLU activations, GAP+fc)."""
    from fastvision.classfication.models.darknet53 import darknet53 as t_darknet53

    from fastvision_tpu.core.checkpoint import flatten_params, partial_load
    from fastvision_tpu.models.classification.darknet53 import darknet53
    from fastvision_tpu.models.import_torch import darknet53_from_reference

    torch.manual_seed(0)
    tm = t_darknet53(num_classes=6)
    tm.eval()
    randomize_bn(tm)
    state = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    imported = darknet53_from_reference(state)

    om = darknet53(num_classes=6)
    x = np.random.default_rng(2).normal(0, 1, (1, 64, 64, 3)).astype(np.float32)
    variables = om.init(jax.random.key(0), jnp.asarray(x), train=True)
    missing = [k for k in flatten_params(variables["params"])
               if k not in imported["params"]]
    assert not missing, missing[:6]
    v2 = {
        "params": partial_load(variables["params"], imported["params"], verbose=False),
        "batch_stats": partial_load(variables["batch_stats"],
                                    imported["batch_stats"], verbose=False),
    }
    ours = np.asarray(om.apply(v2, jnp.asarray(x), train=False))
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours, want, rtol=2e-3, atol=2e-3)


def test_vgg16_parity_vs_reference(ref):
    from fastvision.classfication.models.vgg import vgg16 as t_vgg16

    from fastvision_tpu.core.checkpoint import flatten_params, partial_load
    from fastvision_tpu.models.classification import vgg16
    from fastvision_tpu.models.import_torch import vgg_from_reference

    torch.manual_seed(0)
    tm = t_vgg16(num_classes=5)
    tm.eval()
    state = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    imported = vgg_from_reference(state)

    om = vgg16(num_classes=5)
    x = np.random.default_rng(1).normal(0, 1, (1, 224, 224, 3)).astype(np.float32)
    variables = om.init(jax.random.key(0), jnp.asarray(x), train=True)
    missing = [k for k in flatten_params(variables["params"])
               if k not in imported["params"]]
    assert not missing, missing[:6]
    v2 = dict(variables)
    v2["params"] = partial_load(variables["params"], imported["params"], verbose=False)

    ours = np.asarray(om.apply(v2, jnp.asarray(x), train=False,
                               rngs={"dropout": jax.random.key(1)}))
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours, want, rtol=2e-3, atol=2e-3)
