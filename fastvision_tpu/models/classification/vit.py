"""Vision Transformer (ViT) — beyond-reference classification family.

The reference zoo (classfication/models/) is conv-only; ViT is included
because it is the natural TPU citizen: the whole network is batched
matmuls (patch embed + attention + MLP), which map straight onto the MXU
with none of a conv net's spatial-tiling tax, and the token count is
static so the full forward is one fused XLA program. Pre-LN encoder,
learned position embeddings, CLS-token head (ViT paper arXiv:2010.11929
/ DeiT variants); parameter layout matches timm's vit_*_patch16_224
exactly (param-count parity asserted in tests/test_models_classification.py).

No dropout: these configs are used for from-scratch/fine-tune training in
this framework where stochastic depth/dropout are off anyway; keeping the
module rng-free lets it run under the same jitted train/eval steps as the
conv zoo (no 'dropout' rng plumbing).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class EncoderBlock(nn.Module):
    dim: int
    heads: int
    mlp_ratio: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype, name="attn")(y, y)
        x = x + y
        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(self.dim * self.mlp_ratio, dtype=self.dtype, name="fc1")(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(y)
        return x + y


class ViT(nn.Module):
    """NHWC images -> logits (or token sequence with including_top=False)."""

    num_classes: int = 1000
    patch: int = 16
    dim: int = 384
    depth: int = 12
    heads: int = 6
    mlp_ratio: int = 4
    dtype: Any = jnp.float32
    including_top: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, _ = x.shape
        if h % self.patch or w % self.patch:
            raise ValueError(
                f"input {h}x{w} not divisible by patch size {self.patch}")
        x = nn.Conv(self.dim, (self.patch, self.patch),
                    strides=(self.patch, self.patch), padding="VALID",
                    dtype=self.dtype, name="patch_embed")(x)
        x = x.reshape(b, -1, self.dim)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.dim), jnp.float32)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, x.shape[1] + 1, self.dim), jnp.float32)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, self.dim)).astype(x.dtype), x], axis=1)
        x = x + pos.astype(x.dtype)
        for i in range(self.depth):
            x = EncoderBlock(self.dim, self.heads, self.mlp_ratio,
                             dtype=self.dtype, name=f"block{i}")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        if not self.including_top:
            return x  # [B, 1 + H*W/p^2, dim] tokens (CLS first)
        # head in fp32 for a stable softmax under bf16 compute
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="head")(
            x[:, 0].astype(jnp.float32))


def vit_tiny_patch16(num_classes: int = 1000, **kw) -> ViT:
    return ViT(num_classes=num_classes, dim=192, depth=12, heads=3, **kw)


def vit_small_patch16(num_classes: int = 1000, **kw) -> ViT:
    return ViT(num_classes=num_classes, dim=384, depth=12, heads=6, **kw)


def vit_base_patch16(num_classes: int = 1000, **kw) -> ViT:
    return ViT(num_classes=num_classes, dim=768, depth=12, heads=12, **kw)
