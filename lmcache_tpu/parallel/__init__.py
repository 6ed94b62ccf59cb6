"""Device-mesh and sharding utilities for the TPU serving path."""

from lmcache_tpu.parallel.mesh import (MeshConfig, make_mesh, shard_params,
                                       kv_cache_sharding)

__all__ = [
    "MeshConfig",
    "make_mesh",
    "shard_params",
    "kv_cache_sharding",
]
