"""NN building blocks: conv/norm/activation stacks, TPU-first.

Design choices (vs the reference's torch modules):
  - NHWC layout everywhere (TPU conv layout; torch is NCHW);
  - bf16 compute via the `dtype` arg, fp32 params and BN statistics
    (reference's "mixed precision" was a dead half().float() round-trip,
    generate/template-yolov3/train.py:98 — here it's a real policy);
  - BatchNorm can reduce batch statistics over the mesh 'data' axis
    (`bn_axis_name`) = SyncBatchNorm (ref gates nn.SyncBatchNorm on a never
    -true DDP flag, generate/template-yolov3/train.py:85-87; SURVEY.md §2.5);
  - kaiming-normal conv init, BN scale=1 shift=0 (ref utils/initial_weights.py:4).

SiLU fallback (ref layers/activations.py:5) is irrelevant — jax.nn.silu.
"""
from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp

# kaiming-normal (he) init, matching utils/initial_weights.py:4 semantics
conv_kernel_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")

ACTIVATIONS: dict[str, Callable] = {
    "silu": nn.silu,
    "relu": nn.relu,
    "leaky_relu": lambda x: nn.leaky_relu(x, negative_slope=0.1),
    "none": lambda x: x,
}


class ConvBN(nn.Module):
    """Conv2D + BatchNorm + activation — the detector's basic block.

    Equivalent role to the reference's CBL/CBS blocks
    (demos/yolov3_u/models/yolov3.py conv+bn+leaky stacks,
    detection/neck/yolov3neck.py:23-40).

    Quantized inference: when the variables carry a 'quant' collection for
    this module (built by infer/quantize.py: BN-folded int8 kernel +
    per-channel weight scales + calibrated input scale), the eval forward
    runs the conv as int8 x int8 -> int32 on the MXU (v5e int8 peak is 2x
    bf16) and dequantizes into the activation. Training and modules
    without quant variables are unaffected. Calibration: running apply
    with mutable=['quant_calib'] records each ConvBN's input absmax via
    sow (no-op otherwise).
    """

    features: int
    kernel_size: int = 3
    strides: int = 1
    groups: int = 1
    use_bn: bool = True
    use_bias: bool | None = None  # default: bias only when no BN
    act: str = "silu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if not train and self.has_variable("quant", "w_q"):
            return self._quantized_forward(x)
        # input absmax for post-training quantization calibration; recorded
        # only when the caller made 'quant_calib' mutable (sow no-ops and
        # costs nothing otherwise)
        ax = jnp.abs(x.astype(jnp.float32))
        self.sow("quant_calib", "amax", jnp.max(ax),
                 reduce_fn=jnp.maximum, init_fn=lambda: jnp.float32(0))
        if self.is_mutable_collection("quant_calib") and not self.is_initializing():
            # 99.9th-percentile |x| for outlier-clipped calibration
            # (quantize_variables(percentile=True)) — recorded ONLY during
            # calibrate()'s mutable=['quant_calib'] passes. Never at init:
            # there every collection is mutable and the flatten+sort of a
            # bs256 activation OOMs HBM (observed: 22.6 GB allocation at
            # 416px init). Subsampled to <= 64k elements to bound the sort.
            f = ax.reshape(-1)
            f = f[:: max(1, f.size // 65536)]
            self.sow("quant_calib", "q999", jnp.quantile(f, 0.999),
                     reduce_fn=jnp.maximum, init_fn=lambda: jnp.float32(0))
        bias = self.use_bias if self.use_bias is not None else not self.use_bn
        # explicit symmetric padding (k//2): identical to SAME at stride 1,
        # but at stride 2 XLA's SAME pads right-biased while torch's pad=1 is
        # left-biased — explicit padding keeps imported torch weights exact.
        p = self.kernel_size // 2
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding=((p, p), (p, p)),
            feature_group_count=self.groups,
            use_bias=bias,
            kernel_init=conv_kernel_init,
            dtype=self.dtype,
            name="conv",
        )(x)
        if self.use_bn:
            x = BatchNorm(dtype=self.dtype, name="bn")(x, train=train)
        return ACTIVATIONS[self.act](x)

    def _quantized_forward(self, x):
        import jax.lax as lax

        w_q = self.get_variable("quant", "w_q")          # int8 [K,K,Cin/g,Cout]
        w_scale = self.get_variable("quant", "w_scale")  # fp32 [Cout]
        in_scale = self.get_variable("quant", "in_scale")  # fp32 scalar
        bias = self.get_variable("quant", "bias")        # fp32 [Cout], BN folded
        # symmetric per-tensor activation quant; round/clip in fp32 (ints up
        # to 127 are exact in bf16 too, but the divide wants fp32)
        xq = jnp.clip(
            jnp.round(x.astype(jnp.float32) / in_scale), -127, 127
        ).astype(jnp.int8)
        p = self.kernel_size // 2
        y = lax.conv_general_dilated(
            xq, w_q,
            window_strides=(self.strides, self.strides),
            padding=((p, p), (p, p)),
            feature_group_count=self.groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        scale = (in_scale * w_scale).astype(jnp.float32)
        y = (y.astype(jnp.float32) * scale + bias).astype(self.dtype)
        return ACTIVATIONS[self.act](y)


class BatchNorm(nn.Module):
    """BatchNorm with optional cross-replica (Sync) statistics.

    When `axis_name` is set and the module runs inside pjit/shard_map over
    that mesh axis, batch statistics are averaged across replicas via pmean
    — the TPU-native SyncBatchNorm (SURVEY.md §2.5). Stats stay fp32.
    """

    momentum: float = 0.9  # torch default 0.1 "new-fraction" == flax 0.9
    epsilon: float = 1e-5
    axis_name: str | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.epsilon,
            axis_name=self.axis_name if train else None,
            dtype=self.dtype,
            name="bn",
        )(x)


class Dense(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            self.features,
            kernel_init=nn.initializers.variance_scaling(2.0, "fan_in", "normal"),
            dtype=self.dtype,
            name="dense",
        )(x)


def max_pool(x, window: int = 2, stride: int = 2, padding: str = "VALID"):
    return nn.max_pool(x, (window, window), (stride, stride), padding)


def global_avg_pool(x):
    """NHWC -> NC."""
    return jnp.mean(x, axis=(1, 2))


def adaptive_avg_pool(x, out_hw: Sequence[int]):
    """NHWC adaptive average pool to (out_h, out_w) — VGG head needs 7x7
    (classfication/models/vgg.py:27). Requires H, W divisible or uses
    resize-style mean pooling via reshape when divisible, else window pool."""
    n, h, w, c = x.shape
    oh, ow = out_hw
    if h % oh == 0 and w % ow == 0:
        x = x.reshape(n, oh, h // oh, ow, w // ow, c)
        return x.mean(axis=(2, 4))
    # fallback: strided window pooling (approximate adaptive pool)
    kh, kw = -(-h // oh), -(-w // ow)
    sh, sw = max(h // oh, 1), max(w // ow, 1)
    return nn.avg_pool(x, (kh, kw), (sh, sw), "VALID")[:, :oh, :ow, :]
