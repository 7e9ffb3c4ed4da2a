"""Core foundations: mesh/sharding, config, RNG, checkpointing, telemetry."""
from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    TIME_AXIS,
    MeshConfig,
    batch_sharding,
    create_mesh,
    enable_compile_cache,
    local_batch_size,
    replicate,
    replicated,
    shard_batch,
)
from .config import (
    Config,
    DataConfig,
    ModelConfig,
    NMSConfig,
    TrainConfig,
    apply_overrides,
    from_yaml,
    to_dict,
    update_dataclass,
)
from .distributed import initialize_multihost, process_info, set_visible_devices
from .plots import plot_anchors, plot_metrics, plot_pr_curves
from .rng import set_random_seeds, step_key
from .telemetry import MetricLogger, StepTimer, trace
from .checkpoint import (
    CheckpointManager,
    conv3d_oidhw_to_dhwio,
    conv_oihw_to_hwio,
    flatten_params,
    linear_oi_to_io,
    load_torch_state,
    partial_load,
    trainable_mask,
)
