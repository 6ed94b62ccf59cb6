"""Compression ratio vs chunk size for the CacheGen codec.

The round-2 adaptive CDF grouping (storage/serde/cachegen_serde.py)
shrinks the fixed per-chunk header for short chunks; this tool prints
the ratio curve the VERDICT asked for (r1 next #5). KV comes from a
real model forward (random-token prompts), not noise.

Usage: python tools/bench_codec_chunks.py [--layers N] [--json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lmcache_tpu.config import (LMCacheEngineConfig,
                                    LMCacheEngineMetadata)
    from lmcache_tpu.models import llama
    from lmcache_tpu.storage.serde import cachegen_serde as cs

    cfg_m = llama.LlamaConfig.tiny(n_layers=args.layers)
    params = llama.init_params(jax.random.PRNGKey(0), cfg_m)
    S = 512
    toks = np.random.default_rng(1).integers(0, cfg_m.vocab_size, S,
                                             dtype=np.int32)
    cache = llama.new_kv_cache(cfg_m, 1, S)
    _, cache = llama.forward(params, cfg_m, jnp.asarray(toks)[None],
                             jnp.zeros(1, jnp.int32), cache,
                             use_pallas=False)
    full = np.asarray(llama.cache_to_blob(cache)).astype(np.float32)

    cfg = LMCacheEngineConfig.from_defaults(remote_serde="cachegen")
    meta = LMCacheEngineMetadata(model_name="tiny", world_size=1,
                                 worker_id=0, fmt="vllm", dtype="float32")
    ser = cs.CacheGenSerializer(cfg, meta)
    de = cs.CacheGenDeserializer(cfg, meta)

    rows = []
    for T in (32, 64, 128, 256, 512):
        blob = full[:, :, :T]
        t0 = time.perf_counter()
        bs = ser.to_bytes(blob)
        enc_ms = (time.perf_counter() - t0) * 1e3
        t0 = time.perf_counter()
        back = np.asarray(de.from_bytes(bs))
        dec_ms = (time.perf_counter() - t0) * 1e3
        corr = float(np.corrcoef(back.ravel(), blob.ravel())[0, 1])
        ratio = blob.size * 2 / len(bs)  # vs bf16 wire bytes
        g = cs._group_for(T, blob.shape[3] * blob.shape[4])
        rows.append(dict(chunk_tokens=T, group=g,
                         ratio_vs_bf16=round(ratio, 2),
                         corr=round(corr, 5),
                         encode_ms=round(enc_ms, 1),
                         decode_ms=round(dec_ms, 1)))

    if args.json:
        print(json.dumps(rows))
    else:
        print(f"{'T':>5} {'g':>3} {'ratio':>7} {'corr':>8} "
              f"{'enc ms':>8} {'dec ms':>8}")
        for r in rows:
            print(f"{r['chunk_tokens']:>5} {r['group']:>3} "
                  f"{r['ratio_vs_bf16']:>7} {r['corr']:>8} "
                  f"{r['encode_ms']:>8} {r['decode_ms']:>8}")


if __name__ == "__main__":
    main()
