"""lmcache-tpu: a TPU-native KV-cache compression and reuse engine.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of LMCache
(reference: /root/reference, v0.1.2):

- chunked token hashing with prefix (and non-prefix) KV reuse,
- a tiered cache spanning TPU HBM, host DRAM, local disk and a shared remote
  cache server,
- CacheGen-style quantized KV encoding (per-token symmetric quantization with
  layer-graduated bin counts + entropy coding) built as Pallas TPU kernels for
  quant/dequant/CDF and a host-side C++ rANS codec with independent
  per-(layer, channel) streams,
- CacheBlend-style partial-recompute blending for non-prefix reuse,
- a native continuous-batching serving loop over a `jax.sharding.Mesh`.

Unlike the reference (CUDA/torch), all device compute is expressed as jitted
JAX / Pallas programs with static shapes, and cross-chip movement is XLA
collectives over the mesh instead of NCCL.
"""

__version__ = "0.1.0"

from lmcache_tpu.cache_engine import LMCacheEngine, LMCacheEngineBuilder
from lmcache_tpu.config import (GlobalConfig, LMCacheEngineConfig,
                                LMCacheEngineMetadata)

__all__ = [
    "LMCacheEngine",
    "LMCacheEngineBuilder",
    "LMCacheEngineConfig",
    "LMCacheEngineMetadata",
    "GlobalConfig",
    "__version__",
]
