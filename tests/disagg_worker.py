"""Worker for the disaggregated prefill/decode test
(tests/test_distributed_dcn.py). Role "prefill": run the long context
through a serving instance once and store its KV to the shared cache
server. Role "decode": a separate OS process with no local KV retrieves
that context KV and generates; it must report a cached prefix and emit
exactly the greedy continuation a monolithic instance would.

Usage: python disagg_worker.py <server_url> <role>
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    server_url, role = sys.argv[1:3]

    import jax

    jax.config.update("jax_platforms", "cpu")

    from lmcache_tpu.cache_engine import LMCacheEngine
    from lmcache_tpu.config import (LMCacheEngineConfig,
                                    LMCacheEngineMetadata)
    from lmcache_tpu.models import llama
    from lmcache_tpu.serving import SamplingParams, ServingEngine

    cfg = llama.LlamaConfig.tiny(n_layers=2)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    context = np.random.default_rng(0).integers(
        0, cfg.vocab_size, 150).astype(np.int32)

    ce = LMCacheEngine(
        LMCacheEngineConfig.from_defaults(local_device="cpu",
                                          remote_url=server_url,
                                          chunk_size=32),
        LMCacheEngineMetadata(model_name="disagg-tiny", world_size=1,
                              worker_id=0, fmt="vllm", dtype=cfg.dtype))
    eng = ServingEngine(cfg, params, max_batch=2, max_seq=256,
                        cache_engine=ce)

    if role == "prefill":
        [r] = eng.generate([list(context)],
                           SamplingParams(max_new_tokens=1))
        assert r.cached_prefix_len == 0  # cold store
        ce.engine_.flush()  # push store-back to the server before exit
        print("PREFILL OK first_token", r.output_tokens[0])
    else:
        [r] = eng.generate([list(context)],
                           SamplingParams(max_new_tokens=8))
        # the context KV must have come from the prefill process
        assert r.cached_prefix_len >= 128, r.cached_prefix_len
        print("DECODE OK cached", r.cached_prefix_len,
              "tokens", ",".join(map(str, r.output_tokens)))
    ce.close()


if __name__ == "__main__":
    main()
