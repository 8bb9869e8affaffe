"""Parallelism: device meshes, batch sharding, sharded entry points."""

from .sharding import (
    data_parallel,
    data_parallel_per_shard,
    make_mesh,
    pad_to_multiple,
    replicate,
    shard_batch,
)

__all__ = [
    "data_parallel",
    "data_parallel_per_shard",
    "make_mesh",
    "pad_to_multiple",
    "replicate",
    "shard_batch",
]
