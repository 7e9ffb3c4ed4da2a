"""Model-zoo throughput + MFU on the live chip: cls + video families.

MFU = measured rate x compiler FLOP estimate (AOT cost_analysis) / peak.
v5e peaks: 197 TFLOP/s bf16, 394 TOP/s int8 (int8 MFU uses the bf16
program's FLOP count against the int8 peak — same arithmetic graph)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from fastvision_tpu.core.telemetry import (  # noqa: E402
    V5E_PEAK_BF16 as PEAK_BF16,
    V5E_PEAK_INT8 as PEAK_INT8,
    flops_of,
)

rng = np.random.default_rng(0)


def timed(fn, *args, n, iters=10):
    out = fn(*args)
    np.asarray(out).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out).ravel()[:1]
    return n * iters / (time.perf_counter() - t0)


def report(name, rate, unit, jitted, args, n, peak=PEAK_BF16):
    flops = flops_of(jitted, *args)
    mfu = f", MFU {100 * rate * flops / (n * peak):.0f}%" if flops else ""
    gf = f" ({flops / n / 1e9:.1f} GF/item)" if flops else ""
    print(f"{name}: {rate:.1f} {unit}{mfu}{gf}", flush=True)


# ---- ResNet-50 @224 bs256 (the canonical cls benchmark) ----
from fastvision_tpu.models.classification import resnet50

model = resnet50(num_classes=1000, dtype=jnp.bfloat16)
B = 256
x0 = jnp.zeros((8, 224, 224, 3), jnp.bfloat16)
v = model.init(jax.random.key(0), x0, train=True)
x = jnp.asarray(rng.uniform(0, 1, (B, 224, 224, 3)), jnp.bfloat16)


@jax.jit
def cls_fwd(v, x):
    return model.apply(v, x, train=False).astype(jnp.float32).sum()


report(f"resnet50 bf16 fwd bs{B}@224", timed(cls_fwd, v, x, n=B), "img/s",
       cls_fwd, (v, x), B)

from fastvision_tpu.infer import quantize_model

calib = jnp.asarray(rng.uniform(0, 1, (8, 224, 224, 3)), jnp.bfloat16)
try:
    qv = quantize_model(model, v, [calib])
    report(f"resnet50 int8 fwd bs{B}@224", timed(cls_fwd, qv, x, n=B), "img/s",
           cls_fwd, (v, x), B, peak=PEAK_INT8)
except Exception as e:
    print(f"resnet50 int8 failed: {type(e).__name__}: {str(e)[:150]}", flush=True)

# ---- SlowFast-R50 16x224 bs16 (paper config is 64x224; T=16 fits dev) ----
from fastvision_tpu.models.video import c3d, slowfast_resnet50

sf = slowfast_resnet50(num_classes=400, alpha=4, dtype=jnp.bfloat16)
# bs64: the fast pathway's beta/8 channel counts leave MXU lanes idle, so
# SlowFast keeps scaling with batch long after ResNet plateaus (bs16 449 ->
# bs64 929 clip/s, 9% -> 20% MFU; docs/PERF.md zoo table). Batch video
# clips aggressively in deployment.
Bv, T, Sv = 64, 16, 224
clip0 = jnp.zeros((2, T, Sv, Sv, 3), jnp.bfloat16)
vv = sf.init(jax.random.key(0), clip0, train=True)
clips = jnp.asarray(rng.uniform(0, 1, (Bv, T, Sv, Sv, 3)), jnp.bfloat16)


@jax.jit
def sf_fwd(v, x):
    return sf.apply(v, x, train=False).astype(jnp.float32).sum()


report(f"slowfast50 bf16 fwd bs{Bv} {T}x{Sv}", timed(sf_fwd, vv, clips, n=Bv),
       "clip/s", sf_fwd, (vv, clips), Bv)

# ---- C3D 16x112 bs32 (its canonical config) ----
cm = c3d(num_classes=101, dtype=jnp.bfloat16)
Bc = 128  # plateau: bs32 41% MFU -> bs128 62% (video batch-scaling rule)
c0 = jnp.zeros((2, 16, 112, 112, 3), jnp.bfloat16)
vc = cm.init(jax.random.key(0), c0, train=True)
cc = jnp.asarray(rng.uniform(0, 1, (Bc, 16, 112, 112, 3)), jnp.bfloat16)


@jax.jit
def c3d_fwd(v, x):
    return cm.apply(v, x, train=False).astype(jnp.float32).sum()


report(f"c3d bf16 fwd bs{Bc} 16x112", timed(c3d_fwd, vc, cc, n=Bc),
       "clip/s", c3d_fwd, (vc, cc), Bc)
