"""Two serving instances sharing one cache server (see README.md)."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))


import subprocess
import sys
import time

import numpy as np

import jax

# the axon TPU plugin overrides the JAX_PLATFORMS env var; honor an
# explicit cpu request by pinning the platform before backend init
import os as _os
if _os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")

from lmcache_tpu import (LMCacheEngine, LMCacheEngineConfig,
                         LMCacheEngineMetadata)
from lmcache_tpu.models import llama
from lmcache_tpu.serving import SamplingParams, ServingEngine

URL = "lm://localhost:65432"


def make_instance(cfg, params):
    cache = LMCacheEngine(
        LMCacheEngineConfig.from_defaults(local_device="cpu",
                                          remote_url=URL),
        LMCacheEngineMetadata(model_name="tiny", world_size=1, worker_id=0,
                              fmt="vllm", dtype=cfg.dtype))
    return ServingEngine(cfg, params, max_batch=2, max_seq=512,
                         cache_engine=cache), cache


def main():
    # spawn the shared server if it is not already running
    server = None
    import socket
    try:
        socket.create_connection(("localhost", 65432), timeout=0.3).close()
    except OSError:
        server = subprocess.Popen(
            [sys.executable, "-m", "lmcache_tpu.server", "localhost",
             "65432", "cpu"])
        time.sleep(1.5)

    try:
        _run(cfg_seed=0)
    finally:
        if server is not None:
            server.terminate()  # never leak the spawned cache server
            server.wait(timeout=10)


def _run(cfg_seed):
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(jax.random.PRNGKey(cfg_seed), cfg)
    prompt = np.random.default_rng(0).integers(0, cfg.vocab_size, 300,
                                               dtype=np.int32)
    sampling = SamplingParams(max_new_tokens=16)

    inst_a, cache_a = make_instance(cfg, params)
    [ra] = inst_a.generate([prompt], sampling)
    cache_a.engine_.flush()
    print(f"instance A: ttft={ra.ttft_s*1e3:.1f}ms "
          f"cached={ra.cached_prefix_len}")
    cache_a.close()

    inst_b, cache_b = make_instance(cfg, params)  # fresh process-alike
    [rb] = inst_b.generate([prompt], sampling)
    print(f"instance B: ttft={rb.ttft_s*1e3:.1f}ms "
          f"cached={rb.cached_prefix_len}  (prefilled by A)")
    assert ra.output_tokens == rb.output_tokens
    print("identical outputs across instances")
    cache_b.close()


if __name__ == "__main__":
    main()
