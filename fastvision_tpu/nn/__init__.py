"""NN building blocks (TPU-first counterpart of reference `layers/` + torch.nn usage)."""
from .layers import (
    ACTIVATIONS,
    BatchNorm,
    ConvBN,
    Dense,
    adaptive_avg_pool,
    conv_kernel_init,
    global_avg_pool,
    max_pool,
)
