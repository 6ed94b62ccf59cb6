"""CacheBlend for RAG (reference capability: README.md:8,77 — non-prefix
KV reuse; implemented here in lmcache_tpu/blend.py).

Three "documents" are cached once, then composed in a *different order*
inside a new prompt; the blender re-rotates positions and selectively
recomputes ~15% of tokens instead of prefilling everything.

    python examples/rag_blend.py
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
import jax.numpy as jnp

from lmcache_tpu import (LMCacheEngine, LMCacheEngineConfig,
                         LMCacheEngineMetadata)
from lmcache_tpu.blend import CacheBlender
from lmcache_tpu.models import llama


def main():
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    cache = LMCacheEngine(
        LMCacheEngineConfig.from_defaults(local_device="cpu"),
        LMCacheEngineMetadata(model_name="tiny", world_size=1, worker_id=0,
                              fmt="vllm", dtype=cfg.dtype))
    blender = CacheBlender(cfg, params, cache, recompute_ratio=0.15)

    rng = np.random.default_rng(0)
    docs = [rng.integers(0, cfg.vocab_size, 48, dtype=np.int32)
            for _ in range(3)]
    for d in docs:
        blender.store_chunk(d)

    # RAG prompt: retrieved docs in relevance order + the question
    question = rng.integers(0, cfg.vocab_size, 16, dtype=np.int32)
    logits, kv, info = blender.blend([docs[2], docs[0], question])
    print(f"blended {info['total_tokens']} tokens from "
          f"{info['num_chunks']} chunks ({info['misses']} misses), "
          f"recomputed only {info['recomputed_tokens']} "
          f"({100*info['recomputed_tokens']/info['total_tokens']:.0f}%)")

    # compare with the true full prefill
    full = np.concatenate([docs[2], docs[0], question])
    c = llama.new_kv_cache(cfg, 1, len(full))
    gl, _ = llama.forward(params, cfg, jnp.asarray(full)[None, :],
                          jnp.zeros(1, jnp.int32), c, use_pallas=False)
    g = np.asarray(gl[0, -1])
    b = np.asarray(logits)
    cos = float((g / np.linalg.norm(g)) @ (b / np.linalg.norm(b)))
    print(f"cosine(blended logits, full-prefill logits) = {cos:.4f}")
    cache.close()


if __name__ == "__main__":
    main()
