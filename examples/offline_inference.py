"""Offline inference with KV reuse (reference: examples/offline_inference).

Generates twice with the same long prompt; the second request retrieves
the prefix KV from the cache and skips its prefill. Runs on CPU (tiny
random-weight model) or TPU.

    python examples/offline_inference.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))


import time

import numpy as np

import jax

# the axon TPU plugin overrides the JAX_PLATFORMS env var; honor an
# explicit cpu request by pinning the platform before backend init
import os as _os
if _os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")

from lmcache_tpu import (LMCacheEngine, LMCacheEngineConfig,
                         LMCacheEngineMetadata)
from lmcache_tpu.models import llama
from lmcache_tpu.serving import SamplingParams, ServingEngine


def main():
    on_tpu = jax.default_backend() == "tpu"
    cfg = (llama.LlamaConfig.tinyllama_1_1b()
           if on_tpu else llama.LlamaConfig.tiny())
    params = llama.init_params(jax.random.PRNGKey(0), cfg)

    cache = LMCacheEngine(
        LMCacheEngineConfig.from_defaults(
            local_device="tpu" if on_tpu else "cpu"),
        LMCacheEngineMetadata(model_name="tinyllama-1.1b", world_size=1,
                              worker_id=0, fmt="vllm", dtype=cfg.dtype))
    engine = ServingEngine(cfg, params, max_batch=4, max_seq=1024,
                           cache_engine=cache)

    prompt = np.random.default_rng(0).integers(0, cfg.vocab_size, 700,
                                               dtype=np.int32)
    sampling = SamplingParams(max_new_tokens=32)

    t0 = time.perf_counter()
    [first] = engine.generate([prompt], sampling)
    print(f"1st request: ttft={first.ttft_s*1e3:.1f}ms "
          f"cached_prefix={first.cached_prefix_len} "
          f"wall={time.perf_counter()-t0:.2f}s")
    cache.engine_.flush()  # store-back is async; wait so request 2 hits

    t0 = time.perf_counter()
    [second] = engine.generate([prompt], sampling)
    print(f"2nd request: ttft={second.ttft_s*1e3:.1f}ms "
          f"cached_prefix={second.cached_prefix_len} "
          f"wall={time.perf_counter()-t0:.2f}s")
    assert first.output_tokens == second.output_tokens
    print("outputs identical; speedup "
          f"{first.ttft_s/second.ttft_s:.2f}x TTFT")
    cache.close()


if __name__ == "__main__":
    main()
