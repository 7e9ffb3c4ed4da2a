"""Training: losses, optimizers, schedulers, jitted steps, Fit harness."""
from .losses import (
    YOLOv3Loss,
    YOLOv3LossPerCell,
    YoloLossOutput,
    binary_cross_entropy,
    binary_focal_loss,
    cross_entropy,
    focal_loss,
    iou_loss,
    smooth_l1,
    soft_cross_entropy,
)
from .mix import cutmix, make_classification_mix, mixup, smooth_labels
from .optim import build_optimizer, decay_mask, get_lr, set_lr
from .schedulers import (
    SCHEDULES,
    PlateauScheduler,
    constant_lr,
    cosine_lr,
    exponential_lr,
    linear_lr,
    step_decay_lr,
    warmup_cosine_lr,
)
from .steps import TrainState, device_batch, make_eval_step, make_train_step
from .ema import ema_update, make_ema_update
from .fit import (
    Fit,
    classification_evaluator,
    detection_evaluator,
    replicate_eval_outputs,
    video_multiclip_evaluator,
)
from .frcnn_steps import (
    labels_to_pixel_xyxy,
    make_frcnn_eval_step,
    make_frcnn_train_step,
)
