"""Prompt-lookup speculative decoding demo.

A 'document + question' prompt makes greedy decode copy from its own
context; `spec_lookahead` verifies several proposed tokens per forward
instead of one step each — output is bit-identical to plain greedy
(docs/serving.md "Speculative decoding").

    JAX_PLATFORMS=cpu python examples/speculative_decode.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        jax.config.update("jax_platforms", "cpu")  # axon ignores the env

    from lmcache_tpu.models import llama
    from lmcache_tpu.serving import SamplingParams, ServingEngine

    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(jax.random.PRNGKey(0), cfg)

    rng = np.random.default_rng(0)
    # a repetitive "document" so the n-gram proposer finds matches
    phrase = rng.integers(0, cfg.vocab_size, 24, dtype=np.int32)
    prompt = np.concatenate([phrase, phrase, phrase[:10]])
    sp = SamplingParams(max_new_tokens=48)

    plain = ServingEngine(cfg, params, max_batch=1, max_seq=512,
                          use_pallas=jax.default_backend() == "tpu")
    t0 = time.perf_counter()
    [a] = plain.generate([prompt], sp)
    t_plain = time.perf_counter() - t0

    spec = ServingEngine(cfg, params, max_batch=1, max_seq=512,
                         use_pallas=jax.default_backend() == "tpu",
                         spec_lookahead=4)
    t0 = time.perf_counter()
    [b] = spec.generate([prompt], sp)
    t_spec = time.perf_counter() - t0

    assert a.output_tokens == b.output_tokens, "speculation must be exact"
    print(f"tokens generated : {len(b.output_tokens)} (identical outputs)")
    print(f"proposed/accepted: {b.spec_proposed}/{b.spec_accepted}")
    print(f"plain   : {t_plain*1e3:7.1f} ms")
    print(f"spec    : {t_spec*1e3:7.1f} ms (incl. compile; steady-state "
          f"saves one forward per accepted token)")


if __name__ == "__main__":
    main()
