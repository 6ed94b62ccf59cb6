"""Online serving session (reference: examples/online_session).

Starts the OpenAI-compatible API server and drives a short multi-round
session against it — every round resends the growing conversation, so
each request after the first hits the KV cache.

    python examples/online_session.py          # serves + drives itself
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))


import threading

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
from lmcache_tpu.serving import ServingEngine
from lmcache_tpu.serving.api import APIServer

PORT = 8377


def main():
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    cache = LMCacheEngine(
        # chunk_size 16: multi-round chat prompts grow by ~tens of
        # tokens, so small chunks make each round's prefix hit
        LMCacheEngineConfig.from_defaults(local_device="cpu",
                                          chunk_size=16),
        LMCacheEngineMetadata(model_name="tiny", world_size=1, worker_id=0,
                              fmt="vllm", dtype=cfg.dtype))
    engine = ServingEngine(cfg, params, max_batch=4, max_seq=512,
                           cache_engine=cache, save_decode_cache=True)
    # a REAL tokenizer (byte-level BPE trained offline; see
    # demo_tokenizer.py) so clients can speak text and the OpenAI
    # prompt_tokens_details.cached_tokens field describes actual words
    from demo_tokenizer import get_tokenizer
    tok = get_tokenizer(cfg.vocab_size)
    server = APIServer(engine, model_name="tiny-session",
                       tokenizer=tok.encode, detokenizer=tok.decode)

    t = threading.Thread(target=server.run,
                         kwargs=dict(host="localhost", port=PORT),
                         daemon=True)
    t.start()

    import time

    import httpx
    for _ in range(100):
        try:
            if httpx.get(f"http://localhost:{PORT}/health").status_code == 200:
                break
        except httpx.TransportError:
            time.sleep(0.1)

    _ = np  # token-id prompts also work; this session speaks text
    history = ("the quick brown fox jumps over the lazy dog and the "
               "cache holds the keys and values of every token")
    for round_ in range(3):
        r = httpx.post(f"http://localhost:{PORT}/v1/completions",
                       json={"prompt": history, "max_tokens": 16},
                       timeout=120).json()
        usage = r["usage"]
        cached = usage["prompt_tokens_details"]["cached_tokens"]
        print(f"round {round_}: ttft={usage['ttft_ms']}ms "
              f"cached_tokens={cached}/{usage['prompt_tokens']}")
        # grow the conversation with the decoded completion text
        history += r["choices"][0]["text"]

    # the API server runs on a daemon thread with no external stop;
    # skip interpreter teardown so its event loop isn't killed mid-await
    import os
    os._exit(0)


if __name__ == "__main__":
    main()
