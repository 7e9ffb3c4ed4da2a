"""Forward parity vs the reference's OWN video models (executed, not
copied): instantiate videoRecognition/models/{c3d,scholor,slowfast}.py with
random weights, import them through models/import_torch.py, and require
matching logits — validates architecture equivalence (lateral wiring,
2+1D factorization order, pool asymmetries) AND the import mapping.

Tolerance is scaled to the output's own std: random-init logits sit near
zero, so a bare atol can mask a scrambled-but-correlated import (that is
exactly how the VGG classifier flatten-order bug slipped through round 4's
parity test)."""
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


def randomize_bn3d(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm3d):
                m.running_mean.uniform_(-0.3, 0.3, generator=g)
                m.running_var.uniform_(0.7, 1.3, generator=g)
                m.weight.uniform_(0.8, 1.2, generator=g)
                m.bias.uniform_(-0.1, 0.1, generator=g)


def assert_close(ours, want):
    scale = max(float(np.std(want)), 1e-6)
    np.testing.assert_allclose(ours / scale, want / scale, rtol=2e-3, atol=2e-3)


def import_and_apply(our_model, imported, x_ndhwc, init_kw=None):
    from fastvision_tpu.core.checkpoint import flatten_params, partial_load

    variables = our_model.init(jax.random.key(0), jnp.asarray(x_ndhwc), train=True)
    missing = [k for k in flatten_params(variables["params"])
               if k not in imported["params"]]
    assert not missing, missing[:8]
    v2 = dict(variables)
    v2["params"] = partial_load(variables["params"], imported["params"],
                                verbose=False)
    if "batch_stats" in variables:
        extra = [k for k in flatten_params(variables["batch_stats"])
                 if k not in imported["batch_stats"]]
        assert not extra, extra[:8]
        v2["batch_stats"] = partial_load(variables["batch_stats"],
                                         imported["batch_stats"], verbose=False)
    return np.asarray(our_model.apply(
        v2, jnp.asarray(x_ndhwc), train=False,
        rngs={"dropout": jax.random.key(1)}))


@pytest.mark.parametrize("bn", [False, True], ids=["c3d", "c3d_bn"])
def test_c3d_parity_vs_reference(ref, bn):
    from fastvision.videoRecognition.models.c3d import c3d as t_c3d
    from fastvision.videoRecognition.models.c3d import c3d_bn as t_c3d_bn

    from fastvision_tpu.models.import_torch import c3d_from_reference
    from fastvision_tpu.models.video import c3d, c3d_bn

    torch.manual_seed(0)
    tm = (t_c3d_bn if bn else t_c3d)(num_classes=6)
    tm.eval()
    randomize_bn3d(tm)
    state = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    imported = c3d_from_reference(state)

    om = (c3d_bn if bn else c3d)(num_classes=6)
    # canonical 16-frame 112^2 clip (c3d.py:73-98 shape walk)
    x = np.random.default_rng(0).normal(0, 1, (1, 16, 112, 112, 3)).astype(np.float32)
    ours = import_and_apply(om, imported, x)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 4, 1, 2, 3))).numpy()
    assert_close(ours, want)


@pytest.mark.parametrize("name", ["resnet18_3d", "resnet50_3d"])
def test_resnet3d_parity_vs_reference(ref, name):
    from fastvision.videoRecognition.models import scholor

    import fastvision_tpu.models.video as ours_zoo
    from fastvision_tpu.models.import_torch import resnet3d_from_reference

    if name == "resnet18_3d":
        # Reference bug (scholor.py:88): BasicBlock's default
        # downsample_stride=(1, 1) is a 2-tuple — torch conv3d rejects it,
        # so the reference's OWN resnet18/34_3d crash on first call. Patch
        # the default to the clearly-intended no-op 3-tuple to execute it.
        defaults = scholor.BasicBlock.__init__.__defaults__
        assert defaults == (False, (1, 1)), defaults
        scholor.BasicBlock.__init__.__defaults__ = (False, (1, 1, 1))

    torch.manual_seed(1)
    tm = getattr(scholor, name)(num_classes=5)
    tm.eval()
    randomize_bn3d(tm, seed=1)
    state = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    imported = resnet3d_from_reference(state)

    om = getattr(ours_zoo, name)(num_classes=5)
    x = np.random.default_rng(1).normal(0, 1, (1, 8, 112, 112, 3)).astype(np.float32)
    ours = import_and_apply(om, imported, x)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 4, 1, 2, 3))).numpy()
    assert_close(ours, want)


def test_slowfast_parity_vs_reference(ref):
    from fastvision.videoRecognition.models.slowfast import (
        slowfast_resnet50 as t_slowfast,
    )

    from fastvision_tpu.models.import_torch import slowfast_from_reference
    from fastvision_tpu.models.video import slowfast_resnet50

    torch.manual_seed(2)
    tm = t_slowfast(num_classes=4)
    tm.eval()
    randomize_bn3d(tm, seed=2)
    state = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    imported = slowfast_from_reference(state)

    om = slowfast_resnet50(num_classes=4)
    # 32 frames, alpha=8 -> slow sees frames 0,8,16,24 (slowfast.py:309-317)
    x = np.random.default_rng(2).normal(0, 1, (1, 32, 64, 64, 3)).astype(np.float32)
    ours = import_and_apply(om, imported, x)
    xt = torch.from_numpy(x.transpose(0, 4, 1, 2, 3))
    with torch.no_grad():
        want = tm(xt[:, :, ::8], xt).numpy()
    assert_close(ours, want)
