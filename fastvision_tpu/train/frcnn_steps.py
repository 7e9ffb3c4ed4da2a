"""Jitted train/eval steps for Faster R-CNN.

The two-stage model computes its losses inside the training forward (it
must sample proposals against GT — demos/faster_rcnn/models/faster.py
returns losses from forward), so it gets its own step builders instead of
the generic apply/loss split. Per-step sampling randomness is derived from
`state.step` (deterministic, resumable).

Labels arrive from DetectionLoader as normalized xywh [B, M, 5]; the step
converts to the pixel-xyxy contract FasterRCNN expects.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..data.pipeline import normalize_images
from .optim import set_lr
from .steps import TrainState, device_batch


def labels_to_pixel_xyxy(labels_norm: jnp.ndarray, size: int) -> jnp.ndarray:
    """[B, M, 5] (cls, cxn, cyn, wn, hn) -> (cls, x1, y1, x2, y2) pixels."""
    cls = labels_norm[..., 0:1]
    cx = labels_norm[..., 1] * size
    cy = labels_norm[..., 2] * size
    w = labels_norm[..., 3] * size
    h = labels_norm[..., 4] * size
    return jnp.concatenate(
        [cls, (cx - w / 2)[..., None], (cy - h / 2)[..., None],
         (cx + w / 2)[..., None], (cy + h / 2)[..., None]], axis=-1,
    )


def make_frcnn_train_step(model, tx, seed: int = 0) -> Callable:
    """-> train_step(state, batch, lr) with Fit-compatible signature."""

    def compute_loss(params, batch_stats, images, labels, rng):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        losses = model.apply(
            variables,
            normalize_images(images, model.dtype, imagenet=True),
            labels, train=True,
            rngs={"sampling": rng, "dropout": jax.random.fold_in(rng, 1)},
        )
        total = sum(losses.values()).astype(jnp.float32)
        return total, losses

    grad_fn = jax.value_and_grad(compute_loss, has_aux=True)

    def train_step(state: TrainState, batch: dict, lr, rng=None):
        labels = labels_to_pixel_xyxy(batch["labels"], model.image_size)
        step_rng = jax.random.fold_in(jax.random.key(seed), state.step)
        (total, losses), grads = grad_fn(
            state.params, state.batch_stats, batch["images"], labels, step_rng
        )
        opt_state = set_lr(state.opt_state, lr)
        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = TrainState(params, state.batch_stats, opt_state, state.step + 1)
        metrics = {k: v for k, v in losses.items()}
        metrics["loss"] = total
        return new_state, metrics

    jitted = jax.jit(train_step, donate_argnums=(0,))
    return lambda state, batch, lr, rng=None: jitted(state, device_batch(batch), lr)


def make_frcnn_eval_step(model, score_thresh=0.05, nms_thresh=0.3, max_det=100) -> Callable:
    """-> eval_step(state, batch) returning ops.nms.Detections in input-size
    coordinates (compatible with train.fit.detection_evaluator)."""
    from ..models.detection.faster_rcnn import fastrcnn_postprocess

    def eval_step(state: TrainState, batch: dict):
        cls_logits, boxes, _, valid = model.apply(
            state.variables(),
            normalize_images(batch["images"], model.dtype, imagenet=True),
            train=False,
        )
        return fastrcnn_postprocess(cls_logits, boxes, valid, score_thresh,
                                    nms_thresh, max_det)

    jitted = jax.jit(eval_step)
    return lambda state, batch: jitted(state, device_batch(batch))
