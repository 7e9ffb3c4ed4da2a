"""Parallelism utilities beyond plain data-parallel sharding."""
from .pipeline import (
    pipeline_apply,
    pipeline_hetero_apply,
    pipeline_vit_apply,
    resnet_stage_split,
    stack_stage_params,
    vit_stage_split,
)
from .fsdp import fsdp_shard_variables, fsdp_spec
from .tensor_shard import shard_variables, tp_spec
from .time_shard import halo_exchange_time, time_sharded_conv
