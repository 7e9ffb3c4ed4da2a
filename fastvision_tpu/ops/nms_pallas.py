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

Measured (v5e, K=1024, single image): bit-identical keep set to the XLA
version; 5.8 ms vs 3.3 ms for XLA — greedy NMS is latency-bound on its
K-long sequential dependency chain, which neither form shortens, and XLA's
precomputed overlap matrix amortizes better per step. The XLA composition
therefore stays the default (ops.nms); this kernel is kept as the
lower-HBM-traffic alternative and the base for future blockwise variants.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(iou_thres: float, coords_ref, valid_ref, keep_ref):
    """coords_ref: [8, K] f32 rows = (x1, y1, x2, y2, pad...); valid_ref:
    [1, K] f32 (1 = candidate); keep_ref out [1, K] f32.

    No dynamic scalar extraction (unsupported in Mosaic lowering): box i's
    coordinates are pulled out with one-hot masked reductions — K-wide VPU
    ops throughout, state carried as a [1, K] vector."""
    x1 = coords_ref[0:1, :]  # [1, K]
    y1 = coords_ref[1:2, :]
    x2 = coords_ref[2:3, :]
    y2 = coords_ref[3:4, :]
    area = (x2 - x1) * (y2 - y1)
    k = x1.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    def body(i, suppressed):
        onehot = (lane == i).astype(jnp.float32)  # [1, K]
        xi1 = jnp.sum(x1 * onehot)
        yi1 = jnp.sum(y1 * onehot)
        xi2 = jnp.sum(x2 * onehot)
        yi2 = jnp.sum(y2 * onehot)
        area_i = (xi2 - xi1) * (yi2 - yi1)
        iw = jnp.maximum(jnp.minimum(x2, xi2) - jnp.maximum(x1, xi1), 0.0)
        ih = jnp.maximum(jnp.minimum(y2, yi2) - jnp.maximum(y1, yi1), 0.0)
        inter = iw * ih
        iou = inter / (area + area_i - inter + 1e-7)
        sup_i = jnp.sum(suppressed * onehot)
        val_i = jnp.sum(valid_ref[0:1, :] * onehot)
        keep_i = (sup_i == 0.0) & (val_i > 0.0)
        newly = jnp.where(keep_i & (lane > i) & (iou > iou_thres), 1.0, 0.0)
        return jnp.maximum(suppressed, newly)

    suppressed = jax.lax.fori_loop(0, k, body, jnp.zeros((1, k), jnp.float32))
    keep_ref[0:1, :] = jnp.where(
        (suppressed == 0.0) & (valid_ref[0:1, :] > 0.0), 1.0, 0.0
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
