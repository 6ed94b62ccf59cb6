"""Cross-instance KV sharing over the remote cache server, on real
hardware (BASELINE config 4 shape: instances sharing KV via the lm
server with CacheGen bitstreams).

Instance A prefills a long context and stores it through the chosen
serde to a local cache server; a *fresh* instance B (cold local tiers)
retrieves, injects, and prefills only the suffix. Reports B's TTFT vs
its own full prefill, plus wire size.

    python tools/bench_remote_sharing.py [--serde cachegen|raw] [--ctx 3840]

NOTE on tunneled-TPU environments: this path crosses device<->host twice
(store and retrieve); when the chip is reached over a network tunnel
(~tens of MB/s) that hop dominates and the remote tier loses to full
prefill. On a co-located host (PCIe/DMA ~10 GB/s) the same path is
tens of ms. CacheGen shrinks the wire bytes ~4x either way.
"""

import argparse
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--serde", default="cachegen",
                    choices=["cachegen", "raw", "safetensors"])
    ap.add_argument("--ctx", type=int, default=3840)
    ap.add_argument("--suffix", type=int, default=256)
    args = ap.parse_args()

    import socket

    import jax
    import jax.numpy as jnp

    from lmcache_tpu import (LMCacheEngine, LMCacheEngineConfig,
                             LMCacheEngineMetadata)
    from lmcache_tpu.models import llama

    def pick_free_port():
        with socket.socket() as s:
            s.bind(("", 0))
            return s.getsockname()[1]

    def _wait_for_port(host, port, timeout=20.0):
        deadline = time.time() + timeout
        while time.time() < deadline:
            try:
                socket.create_connection((host, port), timeout=0.5).close()
                return True
            except OSError:
                time.sleep(0.05)
        return False

    on_tpu = jax.default_backend() == "tpu"
    cfg = (llama.LlamaConfig.tinyllama_1_1b()
           if on_tpu else llama.LlamaConfig.tiny())
    S = args.ctx + args.suffix
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    tokens_np = rng.integers(0, cfg.vocab_size, S, dtype=np.int32)
    tokens = jnp.asarray(tokens_np)[None, :]

    port = pick_free_port()
    env = dict(os.environ, PYTHONPATH=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    srv = subprocess.Popen(
        [sys.executable, "-m", "lmcache_tpu.server", "localhost",
         str(port), "cpu"], env=env)
    assert _wait_for_port("localhost", port)

    def make_engine():
        return LMCacheEngine(
            LMCacheEngineConfig.from_defaults(
                local_device=None, remote_url=f"lm://localhost:{port}",
                remote_serde=args.serde),
            LMCacheEngineMetadata(model_name="share-bench", world_size=1,
                                  worker_id=0, fmt="vllm",
                                  dtype=str(cfg.dtype)))

    @jax.jit
    def prefill_full(params, tokens):
        cache = llama.new_kv_cache(cfg, 1, S)
        return llama.forward(params, cfg, tokens, jnp.zeros(1, jnp.int32),
                             cache, last_logit_only=True)

    @jax.jit
    def prefill_suffix(params, tokens, blob):
        cache = llama.blob_into_cache(llama.new_kv_cache(cfg, 1, S),
                                      blob)
        return llama.forward(params, cfg, tokens,
                             jnp.full((1,), args.ctx, jnp.int32), cache,
                             last_logit_only=True)

    try:
        # ---- instance A: prefill + store over the wire ------------------
        logits, cache = prefill_full(params, tokens)
        np.asarray(logits)
        blob = llama.cache_to_blob(cache, 0, args.ctx)
        t0 = time.perf_counter()
        inst_a = make_engine()
        inst_a.store(tokens_np[:args.ctx], blob)
        t_store = time.perf_counter() - t0
        inst_a.close()

        # ---- instance B: cold start, retrieve + partial prefill ---------
        def b_reuse():
            inst_b = make_engine()
            t0 = time.perf_counter()
            got, mask = inst_b.retrieve(tokens_np, return_tuple=False)
            hit = int(np.asarray(mask).sum())
            out = prefill_suffix(params, tokens[:, args.ctx:],
                                 jnp.asarray(got))
            np.asarray(out[0])
            dt = time.perf_counter() - t0
            inst_b.close()
            return dt, hit

        b_reuse()  # warmup compile
        t_reuse, hit = b_reuse()

        def b_full():
            t0 = time.perf_counter()
            out = prefill_full(params, tokens)
            np.asarray(out[0])
            return time.perf_counter() - t0

        b_full()
        t_full = b_full()

        raw_bytes = blob.size * blob.dtype.itemsize
        print(f"serde={args.serde} ctx={args.ctx} model="
              f"{'tinyllama' if on_tpu else 'tiny'} "
              f"backend={jax.default_backend()}")
        print(f"A store (encode+send): {t_store*1e3:9.1f} ms "
              f"({raw_bytes/1e6:.0f} MB KV)")
        print(f"B TTFT full prefill  : {t_full*1e3:9.1f} ms")
        print(f"B TTFT via remote    : {t_reuse*1e3:9.1f} ms "
              f"(hit {hit}/{S} tokens)  speedup {t_full/t_reuse:.2f}x")
    finally:
        srv.terminate()
        srv.wait(timeout=10)


if __name__ == "__main__":
    main()
