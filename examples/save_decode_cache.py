"""save_decode_cache semantics (reference: examples/save_decode_cache).

With ``save_decode_cache: true`` the engine also stores KV produced
*during decode*, so a follow-up request whose prompt includes the
previous answer (multi-round chat) hits the cache for the generated
tokens too.

    python examples/save_decode_cache.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))


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


def run(save_decode: bool) -> int:
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    cache = LMCacheEngine(
        LMCacheEngineConfig.from_defaults(local_device="cpu", chunk_size=16,
                                          save_decode_cache=save_decode),
        LMCacheEngineMetadata(model_name=f"tiny-{save_decode}",
                              world_size=1, worker_id=0, fmt="vllm",
                              dtype=cfg.dtype))
    engine = ServingEngine(cfg, params, max_batch=2, max_seq=512,
                           cache_engine=cache,
                           save_decode_cache=save_decode)

    prompt = np.random.default_rng(0).integers(0, cfg.vocab_size, 64,
                                               dtype=np.int32)
    [first] = engine.generate([prompt],
                              SamplingParams(max_new_tokens=32))
    cache.engine_.flush()

    # round 2: prompt = round-1 prompt + round-1 answer + new question
    follow_up = np.concatenate([
        prompt,
        np.asarray(first.output_tokens, np.int32),
        np.random.default_rng(1).integers(0, cfg.vocab_size, 16,
                                          dtype=np.int32),
    ])
    [second] = engine.generate([follow_up],
                               SamplingParams(max_new_tokens=8))
    cache.close()
    return second.cached_prefix_len


def main():
    without = run(False)
    with_ = run(True)
    print(f"round-2 cached prefix: {without} tokens without "
          f"save_decode_cache, {with_} with it")
    assert with_ > without


if __name__ == "__main__":
    main()
