"""Parallelism: device meshes, batch sharding, sharded entry points."""

from .sharding import data_parallel, make_mesh, pad_to_multiple, replicate, shard_batch

__all__ = ["data_parallel", "make_mesh", "pad_to_multiple", "replicate", "shard_batch"]
