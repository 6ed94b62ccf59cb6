"""KV load bandwidth per tier (BASELINE metric: "KV load GB/s/chip").

Measures end-to-end chunk retrieval into a device KV buffer — the real
serving path (retrieve -> concat -> inject) — for each local tier.

    python tools/bench_kv_load.py [--tokens 3840] [--geometry tinyllama]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", type=int, default=3840)
    ap.add_argument("--chunk", type=int, default=256)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lmcache_tpu.cache_engine import LMCacheEngine
    from lmcache_tpu.config import (LMCacheEngineConfig,
                                    LMCacheEngineMetadata)

    L, H, D = 22, 4, 64  # tinyllama KV geometry
    T = args.tokens
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 32000, T, dtype=np.int32)
    blob = jnp.asarray(rng.standard_normal((L, 2, T, H, D)),
                       jnp.bfloat16)
    nbytes = blob.size * 2

    @jax.jit
    def inject(cache, b):
        return jax.lax.dynamic_update_slice(cache, b.astype(cache.dtype),
                                            (0, 0, 0, 0, 0))

    import tempfile
    tiers = [("hbm", "tpu"), ("dram", "cpu"),
             ("disk", tempfile.mkdtemp(prefix="kvload-"))]
    for name, device in tiers:
        if device == "tpu" and jax.default_backend() == "cpu":
            continue
        eng = LMCacheEngine(
            LMCacheEngineConfig.from_defaults(local_device=device,
                                              chunk_size=args.chunk),
            LMCacheEngineMetadata(model_name=f"bench-{name}", world_size=1,
                                  worker_id=0, fmt="vllm",
                                  dtype="bfloat16"))
        eng.store(tokens, blob)
        cache = jnp.zeros((L, 2, T, H, D), jnp.bfloat16)

        def load():
            out, mask = eng.retrieve(tokens, return_tuple=False)
            assert int(np.asarray(mask).sum()) == T
            c = inject(cache, jnp.asarray(out))
            np.asarray(c[0, 0, 0, 0, :1])  # device sync

        load()  # warmup
        best = float("inf")
        for _ in range(args.iters):
            t0 = time.perf_counter()
            load()
            best = min(best, time.perf_counter() - t0)
        print(f"{name:5s}: {best*1e3:8.2f} ms  "
              f"{nbytes/best/1e9:7.2f} GB/s  ({nbytes/1e6:.0f} MB)")
        eng.close()


if __name__ == "__main__":
    main()
