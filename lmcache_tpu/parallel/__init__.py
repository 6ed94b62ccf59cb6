"""Device-mesh and sharding utilities for the TPU serving path."""

from lmcache_tpu.parallel.mesh import (MeshConfig, kv_blob_sharding,
                                       kv_cache_sharding, make_mesh,
                                       shard_blob_slice, shard_params)

__all__ = [
    "MeshConfig",
    "make_mesh",
    "shard_params",
    "kv_cache_sharding",
    "kv_blob_sharding",
    "shard_blob_slice",
]
