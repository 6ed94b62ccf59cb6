"""CacheGen codec microbenchmark (reference:
tests/benchmarks/test_benchmark.py — decode at chunk 64/256/768 on the
reference KV geometry 32 layers x 8 heads x 128 head_size).

Standalone script (pytest-benchmark is unavailable in this image):

    python tests/benchmarks/codec_bench.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def main():
    from lmcache_tpu.codec import codec_available
    from lmcache_tpu.config import (LMCacheEngineConfig,
                                    LMCacheEngineMetadata)
    from lmcache_tpu.storage.serde.cachegen_serde import (
        CacheGenDeserializer, CacheGenSerializer)

    assert codec_available(), "C++ range coder missing"
    cfg = LMCacheEngineConfig.from_defaults(remote_serde="cachegen")
    meta = LMCacheEngineMetadata(model_name="lmsys/longchat-7b-16k",
                                 world_size=1, worker_id=0, fmt="vllm",
                                 dtype="float16")
    ser, de = CacheGenSerializer(cfg, meta), CacheGenDeserializer(cfg, meta)

    L, H, D = 32, 8, 128  # reference benchmark geometry
    rng = np.random.default_rng(0)
    for chunk in (64, 256, 768):
        blob = rng.standard_normal((L, 2, chunk, H, D)).astype(np.float16)
        raw_bytes = blob.nbytes

        bs = ser.to_bytes(blob)  # warmup (jit compile)
        de.from_bytes(bs)

        n = 5
        t0 = time.perf_counter()
        for _ in range(n):
            bs = ser.to_bytes(blob)
        t_enc = (time.perf_counter() - t0) / n

        t0 = time.perf_counter()
        for _ in range(n):
            out = de.from_bytes(bs)
        try:
            import jax
            jax.block_until_ready(out)
        except Exception:
            pass
        t_dec = (time.perf_counter() - t0) / n

        # batched host-phase decode (the serving retrieval path):
        # 8 chunks -> ONE device program (finish_host_chunks)
        from lmcache_tpu.storage.serde.cachegen_serde import (
            finish_host_chunks)
        NB = 8
        hcs = [de.from_bytes_host(bs) for _ in range(NB)]
        outb = finish_host_chunks(hcs)  # warm
        t0 = time.perf_counter()
        for _ in range(n):
            hcs = [de.from_bytes_host(bs) for _ in range(NB)]
            outb = finish_host_chunks(hcs)
        try:
            jax.block_until_ready(outb)
        except Exception:
            pass
        t_bdec = (time.perf_counter() - t0) / n / NB

        print(f"chunk={chunk:4d}: encode {t_enc*1e3:7.1f} ms "
              f"({raw_bytes/t_enc/1e9:5.2f} GB/s)  "
              f"decode {t_dec*1e3:7.1f} ms ({raw_bytes/t_dec/1e9:5.2f} "
              f"GB/s)  batched-decode {t_bdec*1e3:7.1f} ms "
              f"({raw_bytes/t_bdec/1e9:5.2f} GB/s)  "
              f"ratio {raw_bytes/len(bs):4.2f}x "
              f"({len(bs)/(L*2*chunk*H*D)*8:.2f} bits/value)")


if __name__ == "__main__":
    main()
