"""Post-training int8 quantization (w8a8) for ConvBN-based models.

TPU-native inference speed path: the v5e MXU runs int8 x int8 -> int32 at
2x its bf16 rate (measured ~104-108 vs ~71-81 TOP/s under load on this
chip). Every `nn/layers.py::ConvBN` block whose variables carry a 'quant'
collection executes its conv in int8 and dequantizes into the activation;
everything else (heads, residual adds, upsample/concat, decode, NMS) stays
in the float path untouched.

Scheme (standard PTQ):
  - BatchNorm folded into the conv: W' = W * gamma/sqrt(var+eps),
    b' = beta - mean * gamma/sqrt(var+eps)  (+ conv bias if present)
  - weights: symmetric per-output-channel int8, s_w[c] = amax_c / 127
  - activations: symmetric per-tensor int8, s_a = calibrated absmax / 127
    (calibration = forward passes with mutable=['quant_calib']; ConvBN
    sows its input absmax)

Usage::

    amax = calibrate(model, variables, calib_batches)
    qvars = quantize_variables(variables, amax)
    det = Detector(model, qvars, anchors, ...)   # int8 convs, same API

The reference has no quantized path (its "mixed precision" was a dead
half().float() round-trip, generate/template-yolov3/train.py:98); this is
a new capability for the serving story.
"""
from __future__ import annotations

from typing import Callable, Iterable, Sequence

import jax
import numpy as np

BN_EPS = 1e-5  # nn/layers.py::BatchNorm default


def calibrate(model, variables: dict, batches: Iterable, apply_fn: Callable | None = None) -> dict:
    """Run forward passes recording each ConvBN's input absmax.

    batches: iterable of model inputs (e.g. normalized image batches —
    whatever `model.apply(variables, x, train=False)` accepts).
    Returns the absmax tree ('quant_calib' collection, maxed over batches).
    """
    apply_fn = apply_fn or model.apply
    tree = None
    for x in batches:
        _, mut = apply_fn(variables, x, train=False, mutable=["quant_calib"])
        t = jax.tree.map(np.asarray, mut["quant_calib"])
        tree = t if tree is None else jax.tree.map(np.maximum, tree, t)
    if tree is None:
        raise ValueError("calibrate() needs at least one batch")
    return tree


def _is_convbn(p) -> bool:
    """ConvBN param subtree: a 'conv' child with a 4-D kernel (2-D conv),
    with or without a folded-in BatchNorm sibling."""
    return (
        isinstance(p, dict)
        and isinstance(p.get("conv"), dict)
        and "kernel" in p["conv"]
        and np.ndim(p["conv"]["kernel"]) == 4
    )


def _has_bn(p) -> bool:
    return (
        isinstance(p.get("bn"), dict)
        and isinstance(p["bn"].get("bn"), dict)
        and "scale" in p["bn"]["bn"]
    )


def quantize_variables(
    variables: dict,
    calib: dict,
    skip: Sequence[str] = (),
    eps: float = BN_EPS,
    percentile: bool = False,
) -> dict:
    """variables + calibration absmax tree -> variables with a 'quant'
    collection (int8 kernels, scales, folded biases) for every ConvBN+BN
    whose path is not matched by a `skip` substring.

    percentile=True clips the activation range at the calibrated 99.9th
    percentile of |x| instead of the absolute max — robust to rare
    outliers widening the int8 grid (use when absmax calibration costs
    accuracy on real data; both values are recorded by `calibrate`).

    The float params are kept untouched alongside — the same variables
    still run the float path under train=True or if 'quant' is dropped.
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    n_quantized = 0

    def walk(p, s, c, path):
        nonlocal n_quantized
        if _is_convbn(p):
            dotted = "/".join(path)
            if any(k in dotted for k in skip):
                return None
            has_amax = isinstance(c, dict) and "amax" in c
            if not has_amax and _has_bn(p):
                raise ValueError(
                    f"no calibration absmax for ConvBN at {dotted!r} — was "
                    "calibrate() run with the same model structure?"
                )
            if not has_amax:
                # a plain nn.Conv named 'conv' inside a non-ConvBN module
                # (e.g. the Faster R-CNN RPN head) — only ConvBN sows
                # calibration data, so no amax here means "not a ConvBN".
                # Fall through to the dict recursion so nested ConvBN
                # SIBLINGS of the raw conv still get quantized.
                return _walk_children(p, s, c, path)
            kernel = np.asarray(p["conv"]["kernel"], np.float32)  # [K,K,Cin/g,Cout]
            if _has_bn(p):
                gamma = np.asarray(p["bn"]["bn"]["scale"], np.float32)
                beta = np.asarray(p["bn"]["bn"]["bias"], np.float32)
                mean = np.asarray(s["bn"]["bn"]["mean"], np.float32)
                var = np.asarray(s["bn"]["bn"]["var"], np.float32)
                inv = gamma / np.sqrt(var + eps)
                w = kernel * inv  # fold BN scale into the kernel, per out-channel
                bias = beta - mean * inv
                if "bias" in p["conv"]:
                    bias = bias + np.asarray(p["conv"]["bias"], np.float32) * inv
            else:  # plain conv (e.g. VGG without BN): nothing to fold
                w = kernel
                bias = (np.asarray(p["conv"]["bias"], np.float32)
                        if "bias" in p["conv"]
                        else np.zeros(kernel.shape[-1], np.float32))
            w_amax = np.abs(w).reshape(-1, w.shape[-1]).max(axis=0)
            w_scale = np.maximum(w_amax / 127.0, 1e-12).astype(np.float32)
            w_q = np.clip(np.round(w / w_scale), -127, 127).astype(np.int8)
            a_key = "q999" if percentile and "q999" in c else "amax"
            in_scale = np.float32(max(float(np.asarray(c[a_key])) / 127.0, 1e-12))
            n_quantized += 1
            return {"w_q": w_q, "w_scale": w_scale, "in_scale": in_scale,
                    "bias": bias.astype(np.float32)}
        if not isinstance(p, dict):
            return None
        return _walk_children(p, s, c, path)

    def _walk_children(p, s, c, path):
        out = {}
        for k, v in p.items():
            sub = walk(v, s.get(k, {}) if isinstance(s, dict) else {},
                       c.get(k, {}) if isinstance(c, dict) else {}, path + (k,))
            if sub is not None:
                out[k] = sub
        return out or None

    quant = walk(params, stats, calib, ())
    if not n_quantized:
        raise ValueError("no ConvBN+BN blocks found to quantize")
    out = dict(variables)
    # device arrays, NOT numpy: numpy leaves in jit args are re-uploaded
    # on EVERY call (no host-buffer caching) — with ~62 MB of int8 weights
    # that silently costs more than the whole forward pass (docs/PERF.md)
    out["quant"] = jax.device_put(quant or {})
    return out


def quantize_model(model, variables: dict, batches: Iterable,
                   skip: Sequence[str] = (), percentile: bool = False) -> dict:
    """calibrate + quantize in one call. `batches` are model inputs."""
    return quantize_variables(variables, calibrate(model, variables, batches),
                              skip=skip, percentile=percentile)
