"""Capture an XProf/Perfetto trace of the serving loop.

TPU-native replacement for the reference's NVTX annotations
(reference lmcache/utils.py:54-60): the cache-engine hot paths carry
`jax.profiler.TraceAnnotation` ranges (lmcache_tpu/utils.py), and this
tool wraps a few serving steps in `jax.profiler.trace` so kernels,
transfers, and the cache-engine host work land in one timeline.

    python tools/profile_serving.py --out /tmp/lmcache-trace
    # then: xprof / tensorboard --logdir /tmp/lmcache-trace
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/lmcache-trace")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--ctx", type=int, default=256)
    ap.add_argument("--new", type=int, default=16)
    args = ap.parse_args()

    import jax

    from lmcache_tpu import (LMCacheEngine, LMCacheEngineConfig,
                             LMCacheEngineMetadata)
    from lmcache_tpu.models import llama
    from lmcache_tpu.serving import SamplingParams, ServingEngine

    on_tpu = jax.default_backend() == "tpu"
    cfg = (llama.LlamaConfig.tinyllama_1_1b()
           if on_tpu else llama.LlamaConfig.tiny())
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    cache = LMCacheEngine(
        LMCacheEngineConfig.from_defaults(
            local_device="tpu" if on_tpu else "cpu"),
        LMCacheEngineMetadata(model_name="profile", world_size=1,
                              worker_id=0, fmt="vllm", dtype=cfg.dtype))
    eng = ServingEngine(cfg, params, max_batch=args.batch,
                        max_seq=args.ctx + args.new + 16,
                        cache_engine=cache)

    rng = np.random.default_rng(0)
    prompts = [
        rng.integers(0, cfg.vocab_size, args.ctx, dtype=np.int32)
        for _ in range(args.batch)
    ]
    # warmup compiles outside the trace
    eng.generate([prompts[0]], SamplingParams(max_new_tokens=2))
    cache.engine_.flush()

    with jax.profiler.trace(args.out):
        eng.generate(prompts, SamplingParams(max_new_tokens=args.new))

    print(f"trace written to {args.out}")
    cache.close()


if __name__ == "__main__":
    main()
