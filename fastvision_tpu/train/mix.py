"""Device-side classification batch mixing: label smoothing, mixup, cutmix.

Beyond the reference (its classification demos train plain CE —
utils/fit.py:29 + metrics/accuracy.py); these are the standard modern
classification regularizers, built XLA-first:

  - the mix runs INSIDE the jitted train step (make_train_step's
    `batch_transform` hook), so host batches stay uint8 and the blend
    fuses with the /255 normalize;
  - the mixing partner is the batch REVERSED along axis 0 (`x[::-1]`)
    instead of a random permutation — under a data-parallel mesh a
    permutation gather would shuffle across devices arbitrarily, while a
    reverse lowers to one cheap ppermute (and is equally random given
    shuffled batches);
  - randomness is folded from the step counter, so runs are reproducible
    and resume continues the exact stream — no per-step host RNG plumbing;
  - everything is static-shape: the cutmix window is an iota mask, not a
    dynamic slice.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def smooth_labels(labels, num_classes: int, smoothing: float = 0.0,
                  dtype=jnp.float32):
    """Integer labels -> (optionally smoothed) one-hot distribution.

    Uniform smoothing: on = 1 - s + s/K, off = s/K (sums to 1)."""
    one = jax.nn.one_hot(labels, num_classes, dtype=dtype)
    if smoothing <= 0.0:
        return one
    off = smoothing / num_classes
    return one * (1.0 - smoothing) + off


def mixup(key, images, targets, alpha: float):
    """lam ~ Beta(alpha, alpha); blend images and targets with the
    reversed batch. Returns (mixed_images_f32, mixed_targets, lam)."""
    lam = jax.random.beta(key, alpha, alpha).astype(jnp.float32)
    imgs = images.astype(jnp.float32)
    mixed = lam * imgs + (1.0 - lam) * imgs[::-1]
    tmix = lam * targets + (1.0 - lam) * targets[::-1]
    return mixed, tmix, lam


def cutmix(key, images, targets, alpha: float):
    """Paste a random window of the reversed batch; targets blend by the
    REALIZED area fraction (the window clips at borders, so the drawn lam
    is adjusted). Returns (mixed_images_f32, mixed_targets, lam_adj)."""
    k_lam, k_cy, k_cx = jax.random.split(key, 3)
    h, w = images.shape[1], images.shape[2]
    lam = jax.random.beta(k_lam, alpha, alpha).astype(jnp.float32)
    ratio = jnp.sqrt(1.0 - lam)
    cut_h, cut_w = h * ratio, w * ratio
    cy = jax.random.uniform(k_cy) * h
    cx = jax.random.uniform(k_cx) * w
    rows = jnp.arange(h, dtype=jnp.float32)
    cols = jnp.arange(w, dtype=jnp.float32)
    row_in = (rows >= cy - cut_h / 2) & (rows < cy + cut_h / 2)
    col_in = (cols >= cx - cut_w / 2) & (cols < cx + cut_w / 2)
    mask = row_in[:, None] & col_in[None, :]  # [H, W] True = paste partner
    imgs = images.astype(jnp.float32)
    mixed = jnp.where(mask[None, :, :, None], imgs[::-1], imgs)
    lam_adj = 1.0 - jnp.mean(mask.astype(jnp.float32))
    tmix = lam_adj * targets + (1.0 - lam_adj) * targets[::-1]
    return mixed, tmix, lam_adj


def make_classification_mix(
    num_classes: int,
    mixup_alpha: float = 0.0,
    cutmix_alpha: float = 0.0,
    smoothing: float = 0.0,
    switch_prob: float = 0.5,
):
    """Build a `batch_transform(batch, key) -> batch` for make_train_step.

    The output batch keeps the integer 'labels' (for accuracy metrics) and
    adds 'soft' — the (smoothed, mixed) target distribution consumed by
    soft_cross_entropy. With both alphas > 0, each step picks mixup or
    cutmix with `switch_prob`. With both 0, this is pure label smoothing.
    """
    if not (mixup_alpha > 0 or cutmix_alpha > 0 or smoothing > 0):
        raise ValueError("enable at least one of mixup/cutmix/smoothing")

    def transform(batch: dict, key):
        soft = smooth_labels(batch["labels"], num_classes, smoothing)
        images = batch["images"]
        k_switch, k_mix = jax.random.split(key)
        if mixup_alpha > 0 and cutmix_alpha > 0:
            images, soft = jax.lax.cond(
                jax.random.bernoulli(k_switch, switch_prob),
                lambda: mixup(k_mix, images, soft, mixup_alpha)[:2],
                lambda: cutmix(k_mix, images, soft, cutmix_alpha)[:2],
            )
        elif mixup_alpha > 0:
            images, soft, _ = mixup(k_mix, images, soft, mixup_alpha)
        elif cutmix_alpha > 0:
            images, soft, _ = cutmix(k_mix, images, soft, cutmix_alpha)
        return dict(batch, images=images, soft=soft)

    return transform
