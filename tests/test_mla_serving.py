"""MLA serving engine: the continuous-batching scheduler over a latent
pool — greedy parity vs naive full recompute, cache-tier reuse, decode
blocks, and speculation."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from lmcache_tpu.cache_engine import LMCacheEngine  # noqa: E402
from lmcache_tpu.config import (LMCacheEngineConfig,  # noqa: E402
                                LMCacheEngineMetadata)
from lmcache_tpu.models import mla  # noqa: E402
from lmcache_tpu.serving import (MLAServingEngine,  # noqa: E402
                                 SamplingParams)


@pytest.fixture(scope="module")
def setup():
    # MoE tail + dense first layer so the serving path crosses the
    # heterogeneous-scan boundary
    cfg = mla.MLAConfig.tiny(n_layers=3, n_routed_experts=4,
                             n_shared_experts=1, n_experts_per_tok=2,
                             moe_hidden_dim=64, first_k_dense_replace=1)
    params = mla.init_params(jax.random.PRNGKey(7), cfg)
    return cfg, params


def naive_greedy(cfg, params, prompt, n_new):
    toks = list(prompt)
    for _ in range(n_new):
        cache = mla.new_latent_cache(cfg, 1, 256)
        logits, _ = mla.forward(
            params, cfg, jnp.asarray(np.asarray(toks, np.int32))[None, :],
            jnp.zeros(1, jnp.int32), cache)
        toks.append(int(jnp.argmax(logits[0, -1])))
    return toks[len(prompt):]


def test_greedy_matches_naive(setup):
    cfg, params = setup
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, cfg.vocab_size, 21, dtype=np.int32)
    golden = naive_greedy(cfg, params, prompt, 8)

    eng = MLAServingEngine(cfg, params, max_batch=2, max_seq=256)
    [req] = eng.generate([prompt], SamplingParams(max_new_tokens=8))
    assert req.output_tokens == golden
    assert req.ttft_s is not None


def test_continuous_batching_more_requests_than_slots(setup):
    cfg, params = setup
    rng = np.random.default_rng(1)
    prompts = [
        rng.integers(0, cfg.vocab_size, n, dtype=np.int32)
        for n in (5, 17, 33, 9)
    ]
    goldens = [naive_greedy(cfg, params, p, 6) for p in prompts]

    eng = MLAServingEngine(cfg, params, max_batch=2, max_seq=256)
    reqs = eng.generate(prompts, SamplingParams(max_new_tokens=6))
    for req, golden in zip(reqs, goldens):
        assert req.output_tokens == golden
    assert len(eng.free_slots) == 2 and not eng.running


def test_cache_reuse_same_output(setup):
    cfg, params = setup
    rng = np.random.default_rng(2)
    prompt = rng.integers(0, cfg.vocab_size, 70, dtype=np.int32)

    ce = LMCacheEngine(
        LMCacheEngineConfig.from_defaults(local_device="cpu",
                                          chunk_size=16),
        LMCacheEngineMetadata(model_name="tiny-mla", world_size=1,
                              worker_id=0, fmt="vllm", dtype=cfg.dtype))
    eng = MLAServingEngine(cfg, params, max_batch=2, max_seq=256,
                           cache_engine=ce)
    [first] = eng.generate([prompt], SamplingParams(max_new_tokens=5))
    assert first.cached_prefix_len == 0
    ce.engine_.flush()  # store-back is async; make it visible

    [again] = eng.generate([prompt], SamplingParams(max_new_tokens=5))
    assert again.cached_prefix_len > 0  # latent chunks were injected
    assert again.output_tokens == first.output_tokens
    ce.close()


def test_decode_block_and_speculation_parity(setup):
    cfg, params = setup
    rng = np.random.default_rng(3)
    # a repetitive prompt so prompt-lookup actually proposes
    base = rng.integers(0, cfg.vocab_size, 12, dtype=np.int32)
    prompt = np.concatenate([base, base, base[:6]])
    golden = naive_greedy(cfg, params, prompt, 10)

    blk = MLAServingEngine(cfg, params, max_batch=2, max_seq=256,
                           decode_block=4)
    [r] = blk.generate([prompt], SamplingParams(max_new_tokens=10))
    assert r.output_tokens == golden

    spec = MLAServingEngine(cfg, params, max_batch=2, max_seq=256,
                            spec_lookahead=4)
    [r] = spec.generate([prompt], SamplingParams(max_new_tokens=10))
    assert r.output_tokens == golden


def test_unsupported_modes_fail_loudly(setup):
    cfg, params = setup
    with pytest.raises(ValueError, match="kv_dtype"):
        MLAServingEngine(cfg, params, max_batch=2, max_seq=256,
                         kv_dtype="int4")


def test_int8_latent_pool_serving(setup):
    """kv_dtype="int8": the latent pool lives as int8 + per-token scales
    (~114x smaller than expanded KV), with quantize-on-write and fused
    dequant in the attention. Greedy decode is deterministic, cache
    reuse reproduces the same output, and the logits stay close to the
    native-dtype engine."""
    cfg, params = setup
    rng = np.random.default_rng(21)
    prompt = rng.integers(0, cfg.vocab_size, 70, dtype=np.int32)

    ce = LMCacheEngine(
        LMCacheEngineConfig.from_defaults(local_device="cpu",
                                          chunk_size=16),
        LMCacheEngineMetadata(model_name="tiny-mla-int8", world_size=1,
                              worker_id=0, fmt="vllm", dtype=cfg.dtype))
    eng = MLAServingEngine(cfg, params, max_batch=2, max_seq=256,
                           cache_engine=ce, kv_dtype="int8")
    assert isinstance(eng.kv_pool, dict)
    assert eng.kv_pool["sym"].dtype == jnp.int8

    [first] = eng.generate([prompt], SamplingParams(max_new_tokens=5))
    assert first.cached_prefix_len == 0
    ce.engine_.flush()
    [again] = eng.generate([prompt], SamplingParams(max_new_tokens=5))
    assert again.cached_prefix_len > 0
    assert again.output_tokens == first.output_tokens

    # int8 tracks the native engine closely (identical greedy tokens on
    # this tiny model)
    native = MLAServingEngine(cfg, params, max_batch=2, max_seq=256)
    [g] = native.generate([prompt], SamplingParams(max_new_tokens=5))
    assert g.output_tokens == first.output_tokens
    ce.close()
