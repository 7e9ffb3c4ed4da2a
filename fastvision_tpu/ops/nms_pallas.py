"""Pallas TPU kernel for greedy NMS suppression.

The XLA-composition NMS (ops.nms.suppression_mask) materializes a K x K IoU
matrix in HBM and runs a fori_loop over it. This kernel fuses the whole
greedy pass on-chip: boxes live in VMEM as coordinate rows [1, K] (lane
dimension = boxes, VPU-friendly), the sequential scan keeps the suppression
state in registers/VMEM, and each step computes IoU(box_i, all boxes) as one
K-wide vector op — no K x K intermediate, one HBM read of the boxes, one
HBM write of the mask.

Inputs must be score-sorted descending (same contract as suppression_mask).
Grid: single program (K <= a few thousand fits VMEM easily: 6 rows x K f32).
Falls back to interpreter mode off-TPU so tests run on CPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(iou_thres: float, coords_ref, valid_ref, keep_ref):
    """coords_ref: [8, K] f32 rows = (x1, y1, x2, y2, pad...); valid_ref:
    [1, K] f32 (1 = candidate); keep_ref out [1, K] f32."""
    x1 = coords_ref[0, :]
    y1 = coords_ref[1, :]
    x2 = coords_ref[2, :]
    y2 = coords_ref[3, :]
    area = (x2 - x1) * (y2 - y1)
    k = x1.shape[0]

    def body(i, suppressed):
        # scalar coords of box i
        xi1 = x1[i]
        yi1 = y1[i]
        xi2 = x2[i]
        yi2 = y2[i]
        area_i = (xi2 - xi1) * (yi2 - yi1)
        iw = jnp.maximum(jnp.minimum(x2, xi2) - jnp.maximum(x1, xi1), 0.0)
        ih = jnp.maximum(jnp.minimum(y2, yi2) - jnp.maximum(y1, yi1), 0.0)
        inter = iw * ih
        iou = inter / (area + area_i - inter + 1e-7)
        keep_i = (suppressed[i] == 0.0) & (valid_ref[0, i] > 0.0)
        later = jax.lax.broadcasted_iota(jnp.int32, (k,), 0) > i
        newly = jnp.where(keep_i & later & (iou > iou_thres), 1.0, 0.0)
        return jnp.maximum(suppressed, newly)

    suppressed = jax.lax.fori_loop(0, k, body, jnp.zeros((k,), jnp.float32))
    keep_ref[0, :] = jnp.where(
        (suppressed == 0.0) & (valid_ref[0, :] > 0.0), 1.0, 0.0
    )


@functools.partial(jax.jit, static_argnames=("iou_thres", "interpret"))
def suppression_mask_pallas(
    boxes: jnp.ndarray,  # [K, 4] xyxy, score-sorted descending
    scores: jnp.ndarray,  # [K] (-inf = invalid)
    iou_thres: float = 0.45,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Greedy NMS keep mask [K] bool — Pallas kernel version of
    ops.nms.suppression_mask (identical keep set)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    k = boxes.shape[0]
    coords = jnp.zeros((8, k), jnp.float32)  # 8 sublanes (f32 min tile)
    coords = coords.at[0:4, :].set(boxes.astype(jnp.float32).T)
    valid = (scores > -jnp.inf).astype(jnp.float32).reshape(1, k)

    keep = pl.pallas_call(
        functools.partial(_nms_kernel, float(iou_thres)),
        out_shape=jax.ShapeDtypeStruct((1, k), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(coords, valid)
    return keep[0].astype(bool)
