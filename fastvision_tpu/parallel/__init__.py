"""Parallelism utilities beyond plain data-parallel sharding."""
from .tensor_shard import shard_variables, tp_spec
from .time_shard import halo_exchange_time, time_sharded_conv
