"""Disaggregated prefill/decode: a PREFILL instance computes and stores
long-context KV; a separate DECODE instance retrieves it and generates
without ever running the long prefill.

This is the PD-separation serving pattern on top of the cache tiers:
the prefill fleet is provisioned for MXU-bound long prefills, the
decode fleet for HBM-bound batched decode, and the KV handoff is the
cache engine's store/retrieve over the shared cache server (the same
transport that powers cross-instance sharing —
examples/share_across_instances/). No bespoke KV-transfer protocol: a
chunk stored by the prefill instance IS the wire format.

Run (CPU works; set JAX_PLATFORMS=cpu):

    python -m lmcache_tpu.server localhost 65433 cpu &
    python examples/disaggregated_prefill.py
"""

import os as _os
import sys
import time

sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import numpy as np

import jax

if _os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")

from lmcache_tpu import (LMCacheEngine, LMCacheEngineConfig,  # noqa: E402
                         LMCacheEngineMetadata)
from lmcache_tpu.models import llama  # noqa: E402
from lmcache_tpu.serving import SamplingParams, ServingEngine  # noqa: E402

URL = "lm://localhost:65433"


def make_instance(cfg, params, role):
    cache = LMCacheEngine(
        LMCacheEngineConfig.from_defaults(local_device="cpu",
                                          remote_url=URL, chunk_size=64),
        LMCacheEngineMetadata(model_name="tiny", world_size=1,
                              worker_id=0, fmt="vllm", dtype=cfg.dtype))
    print(f"[{role}] instance up")
    # the prefill fleet publishes prompt KV at TTFT time (eager_store),
    # not at request completion — decode instances can start retrieving
    # while the prefill instance is still decoding its own request
    return ServingEngine(cfg, params, max_batch=2, max_seq=512,
                         cache_engine=cache,
                         eager_store=(role == "prefill")), cache


def main():
    import socket
    import subprocess
    import sys
    server = None
    try:
        socket.create_connection(("localhost", 65433), timeout=0.3).close()
    except OSError:
        server = subprocess.Popen(
            [sys.executable, "-m", "lmcache_tpu.server", "localhost",
             "65433", "cpu"],
            env={**_os.environ,
                 "PYTHONPATH": _os.path.dirname(_os.path.dirname(
                     _os.path.abspath(__file__)))})
        time.sleep(2)

    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    context = np.random.default_rng(0).integers(
        0, cfg.vocab_size, 300).astype(np.int32)

    # --- prefill instance: compute the context KV once, store it ------
    pre_eng, pre_cache = make_instance(cfg, params, "prefill")
    t0 = time.perf_counter()
    [warm] = pre_eng.generate([list(context)],
                              SamplingParams(max_new_tokens=1))
    pre_cache.engine_.flush()  # push the store-back to the server
    print(f"[prefill] context prefilled + stored in "
          f"{time.perf_counter() - t0:.2f}s")

    # --- decode instance: fresh process-equivalent, no local KV -------
    dec_eng, dec_cache = make_instance(cfg, params, "decode")
    t0 = time.perf_counter()
    [out] = dec_eng.generate([list(context)],
                             SamplingParams(max_new_tokens=16))
    dt = time.perf_counter() - t0
    print(f"[decode] reused {out.cached_prefix_len}/{len(context)} "
          f"context tokens from the prefill instance; generated "
          f"{len(out.output_tokens)} tokens in {dt:.2f}s "
          f"(TTFT {out.ttft_s * 1e3:.0f} ms)")
    assert out.cached_prefix_len > 0

    pre_cache.close()
    dec_cache.close()
    if server is not None:
        server.terminate()


if __name__ == "__main__":
    main()
