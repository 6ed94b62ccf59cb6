"""Multi-head Latent Attention serving: the 57x-smaller KV cache.

DeepSeek-family (MLA) models cache one shared latent per token instead
of per-head K/V (docs/mla.md). This example serves a DeepSeek-V2-Lite-
shaped model (random weights; no downloads in this environment — swap in
``mla.load_hf("deepseek-ai/DeepSeek-V2-Lite")`` where you have the
checkpoint), generates twice, and shows the second request reusing the
latent prefix through the cache engine. It also prints the bytes/token
the cache tiers actually move for MLA vs an equal-scale GQA model.

    python examples/mla_latent_cache.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))


import time

import numpy as np

import jax

import os as _os
if _os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")

from lmcache_tpu import (LMCacheEngine, LMCacheEngineConfig,
                         LMCacheEngineMetadata)
from lmcache_tpu.models import mla
from lmcache_tpu.serving import MLAServingEngine, SamplingParams


def main():
    on_tpu = jax.default_backend() != "cpu"
    if on_tpu:
        # V2-Lite-shaped but shallow enough to init quickly over the
        # tunnel; the latent geometry (r=512, p=64) is the real one
        cfg = mla.MLAConfig(
            vocab_size=32000, dim=2048, n_layers=4, n_heads=16,
            hidden_dim=5632, max_seq_len=4096, q_lora_rank=None,
            kv_lora_rank=512, qk_nope_head_dim=128, qk_rope_head_dim=64,
            v_head_dim=128)
    else:
        cfg = mla.MLAConfig.tiny(n_layers=3, n_routed_experts=4,
                                 n_shared_experts=1, n_experts_per_tok=2,
                                 moe_hidden_dim=64,
                                 first_k_dense_replace=1)
    params = mla.init_params(jax.random.PRNGKey(0), cfg)

    cache = LMCacheEngine(
        LMCacheEngineConfig.from_defaults(
            local_device="tpu" if on_tpu else "cpu"),
        LMCacheEngineMetadata(model_name="mla-demo", world_size=1,
                              worker_id=0, fmt="vllm", dtype=cfg.dtype))
    engine = MLAServingEngine(cfg, params, max_batch=4, max_seq=1024,
                              cache_engine=cache)

    rng = np.random.default_rng(0)
    prompt = rng.integers(0, cfg.vocab_size, 512, dtype=np.int32)
    sampling = SamplingParams(max_new_tokens=16)

    t0 = time.perf_counter()
    [first] = engine.generate([prompt], sampling)
    t_cold = time.perf_counter() - t0
    cache.engine_.flush()

    t0 = time.perf_counter()
    [again] = engine.generate([prompt], sampling)
    t_warm = time.perf_counter() - t0

    assert again.output_tokens == first.output_tokens
    itemsize = np.dtype(cfg.dtype).itemsize
    latent_bpt = cfg.n_layers * cfg.latent_dim * itemsize
    # equal-geometry GQA comparison: 2 (K,V) * n_kv_heads * head_dim
    gqa_bpt = cfg.n_layers * 2 * 8 * 128 * itemsize
    print(f"cold TTFT {t_cold*1e3:.0f} ms -> warm {t_warm*1e3:.0f} ms "
          f"(cached prefix: {again.cached_prefix_len} tokens)")
    print(f"cached bytes/token: MLA latent {latent_bpt} vs "
          f"equal-scale GQA {gqa_bpt} ({gqa_bpt/latent_bpt:.0f}x smaller "
          f"-> {gqa_bpt/latent_bpt:.0f}x more contexts per tier)")
    cache.close()


if __name__ == "__main__":
    main()
