"""Serving engine int8 KV-pool mode: generation quality, cache reuse
round-trip through quantize/dequantize."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from lmcache_tpu.cache_engine import LMCacheEngine  # noqa: E402
from lmcache_tpu.config import (LMCacheEngineConfig,  # noqa: E402
                                LMCacheEngineMetadata)
from lmcache_tpu.models import llama  # noqa: E402
from lmcache_tpu.serving import SamplingParams, ServingEngine  # noqa: E402


@pytest.fixture(scope="module")
def setup():
    cfg = llama.LlamaConfig.tiny(n_layers=2)
    params = llama.init_params(jax.random.PRNGKey(7), cfg)
    return cfg, params


def test_int8_matches_native_greedy(setup):
    """int8 KV generation should equal native greedy on this model."""
    cfg, params = setup
    prompt = np.random.default_rng(0).integers(0, cfg.vocab_size, 25,
                                               dtype=np.int32)
    native = ServingEngine(cfg, params, max_batch=2, max_seq=128,
                          use_pallas=False)
    [rn] = native.generate([prompt], SamplingParams(max_new_tokens=6))
    int8 = ServingEngine(cfg, params, max_batch=2, max_seq=128,
                         use_pallas=False, kv_dtype="int8")
    [ri] = int8.generate([prompt], SamplingParams(max_new_tokens=6))
    assert ri.output_tokens == rn.output_tokens


def test_int8_cache_reuse(setup):
    cfg, params = setup
    prompt = np.random.default_rng(1).integers(0, cfg.vocab_size, 70,
                                               dtype=np.int32)
    ce = LMCacheEngine(
        LMCacheEngineConfig.from_defaults(local_device="cpu",
                                          chunk_size=16),
        LMCacheEngineMetadata(model_name="tiny-i8", world_size=1,
                              worker_id=0, fmt="vllm", dtype=cfg.dtype))
    eng = ServingEngine(cfg, params, max_batch=2, max_seq=128,
                        cache_engine=ce, use_pallas=False,
                        kv_dtype="int8")
    [first] = eng.generate([prompt], SamplingParams(max_new_tokens=5))
    ce.engine_.flush()
    [second] = eng.generate([prompt], SamplingParams(max_new_tokens=5))
    assert second.cached_prefix_len == 69
    assert second.output_tokens == first.output_tokens
    ce.close()
