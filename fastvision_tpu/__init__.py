"""fastvision_tpu — a TPU-native (JAX / XLA / Pallas / pjit) computer-vision framework.

Capabilities mirror the reference `ielym/fastvision` (image classification,
object detection with YOLOv3 + Faster R-CNN, video recognition with
C3D / 3D-ResNet / SlowFast, datasets & augmentation, losses, mAP/accuracy
metrics, a training harness, anchor k-means, NMS, checkpointing, LR
schedulers, and a serving adapter) — re-designed TPU-first:

- compute path: jnp / lax on the MXU, NHWC layouts, bf16 policy,
  static shapes everywhere (padded `max_det` labels, fixed-size NMS);
- parallelism: `jax.sharding.Mesh` + NamedSharding over axes
  ``('data', 'model', 'time')``, XLA collectives over ICI (no hand comm);
- train loop: pure-functional jitted train/eval steps;
- data: host-side decode/augment, device-side normalize, double-buffered
  prefetch.

Package layout (maps onto the reference's layers, SURVEY.md §1):
  core/    mesh & sharding, config, RNG, checkpointing, telemetry
  ops/     box / grid / IoU family / NMS / anchors / mAP / one-hot
  nn/      conv blocks, norm (incl. cross-replica BN), activations, init
  models/  classification, detection, video zoos
  data/    fastvision on-disk format, augmentations, converters, pipeline
  train/   losses, optimizers, schedulers, jitted steps, Fit harness
  infer/   decode, pre/postprocess, predictor, serving, VOC submit
  viz/     box drawing
"""

__version__ = "0.1.0"
