"""Native serving loop: continuous batching with KV-cache reuse.

The reference delegates serving to vLLM and ships only hook functions
(documented contract: reference
docs/source/developer_tutorial/LLM_Engine.rst:25-117). Here the serving
engine is in-repo and TPU-native: one resident sharded KV pool, batched
decode as a single jitted step, per-request prefill with cached-prefix
skip, and asynchronous chunk store-back into the cache tiers.
"""

from lmcache_tpu.serving.request import Request, RequestState, SamplingParams
from lmcache_tpu.serving.engine import ServingEngine
from lmcache_tpu.serving.mla_engine import MLAServingEngine
from lmcache_tpu.serving.mla_paged_engine import MLAPagedServingEngine
from lmcache_tpu.serving.paged_engine import PagedServingEngine

__all__ = [
    "Request", "RequestState", "SamplingParams", "ServingEngine",
    "MLAServingEngine", "MLAPagedServingEngine", "PagedServingEngine"
]
