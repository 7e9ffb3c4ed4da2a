"""Parallelism utilities beyond plain data-parallel sharding."""
from .time_shard import halo_exchange_time, time_sharded_conv
