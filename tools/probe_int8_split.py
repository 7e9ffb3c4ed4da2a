"""YOLOv3-416 int8 vs bf16 split timings (see tools/README.md)."""
import time
import jax, jax.numpy as jnp
import numpy as np
from fastvision_tpu.infer import decode_predictions, quantize_model
from fastvision_tpu.models.detection import YOLOv3
from fastvision_tpu.ops import COCO_ANCHORS

S, C, B = 416, 80, 256
anchors = COCO_ANCHORS.reshape(3, 3, 2)[::-1].astype(np.float32)
model = YOLOv3(num_classes=C, dtype=jnp.bfloat16)
variables = model.init(jax.random.key(0), jnp.zeros((8, S, S, 3), jnp.bfloat16), train=True)
rng = np.random.default_rng(0)
calib = jnp.asarray(rng.uniform(0, 1, (8, S, S, 3)), jnp.bfloat16)
qv = quantize_model(model, variables, [calib])
images = jnp.asarray(rng.uniform(0, 1, (B, S, S, 3)), jnp.bfloat16)

def timed(fn, v, iters=10):
    out = fn(v, images); np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(v, images)
    np.asarray(out)
    return B / ((time.perf_counter() - t0) / iters)

@jax.jit
def fwd_only(v, im):
    heads = model.apply(v, im, train=False)
    # tiny scalar sync output: no D2H pollution
    return sum(h.astype(jnp.float32).sum() for h in heads)

@jax.jit
def fwd_decode(v, im):
    heads = model.apply(v, im, train=False)
    pred = decode_predictions(heads, anchors, (32, 16, 8), "v5")
    return pred.astype(jnp.float32).sum()

print(f"int8 fwd-only   B={B}: {timed(fwd_only, qv):.1f} img/s", flush=True)
print(f"int8 fwd+decode B={B}: {timed(fwd_decode, qv):.1f} img/s", flush=True)
print(f"bf16 fwd-only   B={B}: {timed(fwd_only, variables):.1f} img/s", flush=True)
