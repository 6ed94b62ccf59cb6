"""Decode throughput (tokens/sec) of the serving engine.

The reference's external harness measures TTFT + tokens/sec
(measuring_improvements.rst:79-87); this is the in-repo equivalent,
driving the real continuous-batching engine.

    python tools/bench_throughput.py [--batch 8] [--ctx 512] [--new 64]
                                     [--engine dense|paged|int8]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--ctx", type=int, default=512)
    ap.add_argument("--new", type=int, default=64)
    ap.add_argument("--engine", default="dense",
                    choices=["dense", "paged", "int8"])
    ap.add_argument("--decode-block", type=int, default=1)
    ap.add_argument("--model", default="auto")
    args = ap.parse_args()

    import jax

    from lmcache_tpu.models import llama
    from lmcache_tpu.serving import SamplingParams, ServingEngine
    from lmcache_tpu.serving.paged_engine import PagedServingEngine

    on_tpu = jax.default_backend() == "tpu"
    if args.model == "auto":
        args.model = "tinyllama" if on_tpu else "tiny"
    cfg = (llama.LlamaConfig.tinyllama_1_1b()
           if args.model == "tinyllama" else llama.LlamaConfig.tiny())
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    max_seq = args.ctx + args.new + 16

    if args.engine == "paged":
        eng = PagedServingEngine(
            cfg, params, max_batch=args.batch, max_seq=max_seq,
            num_pages=args.batch * (max_seq // 64 + 2), page_size=64)
    else:
        eng = ServingEngine(
            cfg, params, max_batch=args.batch, max_seq=max_seq,
            kv_dtype="int8" if args.engine == "int8" else "native",
            decode_block=args.decode_block)

    rng = np.random.default_rng(0)
    prompts = [
        rng.integers(0, cfg.vocab_size, args.ctx, dtype=np.int32)
        for _ in range(args.batch)
    ]
    sampling = SamplingParams(max_new_tokens=args.new)

    # warmup (compiles prefill + decode)
    eng.generate([prompts[0][:args.ctx]], SamplingParams(max_new_tokens=4))

    t0 = time.perf_counter()
    reqs = eng.generate(prompts, sampling)
    wall = time.perf_counter() - t0

    total_new = sum(len(r.output_tokens) for r in reqs)
    ttfts = [r.ttft_s for r in reqs]
    print(f"engine={args.engine} model={args.model} B={args.batch} "
          f"ctx={args.ctx} new={args.new}")
    print(f"throughput : {total_new/wall:9.1f} tok/s "
          f"({total_new} tokens in {wall:.2f}s)")
    print(f"ttft       : median {np.median(ttfts)*1e3:.1f} ms, "
          f"max {max(ttfts)*1e3:.1f} ms")


if __name__ == "__main__":
    main()
