"""Paged serving engine: greedy parity with the dense engine, page-
aligned cache reuse, and arena backpressure."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from lmcache_tpu.cache_engine import LMCacheEngine  # noqa: E402
from lmcache_tpu.config import (LMCacheEngineConfig,  # noqa: E402
                                LMCacheEngineMetadata)
from lmcache_tpu.models import llama  # noqa: E402
from lmcache_tpu.serving import SamplingParams, ServingEngine  # noqa: E402
from lmcache_tpu.serving.paged_engine import PagedServingEngine  # noqa: E402


@pytest.fixture(scope="module")
def setup():
    cfg = llama.LlamaConfig.tiny(n_layers=2)
    params = llama.init_params(jax.random.PRNGKey(7), cfg)
    return cfg, params


def test_paged_matches_dense(setup):
    cfg, params = setup
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, cfg.vocab_size, n, dtype=np.int32)
               for n in (21, 45, 9)]
    dense = ServingEngine(cfg, params, max_batch=2, max_seq=256,
                          use_pallas=False)
    golden = dense.generate(prompts, SamplingParams(max_new_tokens=6))

    paged = PagedServingEngine(cfg, params, max_batch=2, max_seq=256,
                               num_pages=32, page_size=16,
                               use_pallas=False)
    out = paged.generate(prompts, SamplingParams(max_new_tokens=6))
    for g, o in zip(golden, out):
        assert o.output_tokens == g.output_tokens
    # all pages returned to the arena
    assert paged.allocator.num_free == 31


def test_paged_cache_reuse(setup):
    cfg, params = setup
    rng = np.random.default_rng(1)
    prompt = rng.integers(0, cfg.vocab_size, 70, dtype=np.int32)
    ce = LMCacheEngine(
        LMCacheEngineConfig.from_defaults(local_device="cpu",
                                          chunk_size=16),
        LMCacheEngineMetadata(model_name="tiny-paged", world_size=1,
                              worker_id=0, fmt="vllm", dtype=cfg.dtype))
    eng = PagedServingEngine(cfg, params, max_batch=2, max_seq=256,
                             num_pages=64, page_size=16, cache_engine=ce,
                             use_pallas=False)
    [first] = eng.generate([prompt], SamplingParams(max_new_tokens=5))
    ce.engine_.flush()
    [second] = eng.generate([prompt], SamplingParams(max_new_tokens=5))
    # 70 tokens cached; capped to 69 then page-aligned down to 64
    assert second.cached_prefix_len == 64
    assert second.output_tokens == first.output_tokens
    ce.close()


def test_arena_backpressure(setup):
    """More work than pages: requests run (partly) sequentially but all
    finish, and the arena never double-allocates."""
    cfg, params = setup
    rng = np.random.default_rng(2)
    prompts = [rng.integers(0, cfg.vocab_size, 40, dtype=np.int32)
               for _ in range(4)]
    # each request needs ceil((40+8)/16) = 3 pages; arena has 7 usable
    eng = PagedServingEngine(cfg, params, max_batch=4, max_seq=128,
                             num_pages=8, page_size=16, use_pallas=False)
    golden = ServingEngine(cfg, params, max_batch=4, max_seq=128,
                           use_pallas=False)
    g = golden.generate(prompts, SamplingParams(max_new_tokens=8))
    out = eng.generate(prompts, SamplingParams(max_new_tokens=8))
    for a, b in zip(g, out):
        assert a.output_tokens == b.output_tokens
    assert eng.allocator.num_free == 7


def test_arena_too_small_raises(setup):
    cfg, params = setup
    eng = PagedServingEngine(cfg, params, max_batch=1, max_seq=128,
                             num_pages=2, page_size=16, use_pallas=False)
    prompt = np.arange(40, dtype=np.int32)
    eng.add_request(__import__("lmcache_tpu.serving",
                               fromlist=["Request"]).Request(
                                   prompt,
                                   SamplingParams(max_new_tokens=8)))
    with pytest.raises(MemoryError):
        eng.run()


def test_paged_blend_request(setup):
    """CacheBlend admission on the paged engine (ratio=1.0 = exact)."""
    from lmcache_tpu.serving import Request

    cfg, params = setup
    rng = np.random.default_rng(5)
    ce = LMCacheEngine(
        LMCacheEngineConfig.from_defaults(local_device="cpu",
                                          chunk_size=16),
        LMCacheEngineMetadata(model_name="tiny-pb", world_size=1,
                              worker_id=0, fmt="vllm", dtype=cfg.dtype))
    eng = PagedServingEngine(cfg, params, max_batch=2, max_seq=256,
                             num_pages=32, page_size=16, cache_engine=ce,
                             use_pallas=False)
    eng._blend_ratio = 1.0  # exact blend for the parity check

    docs = [rng.integers(0, cfg.vocab_size, 24, dtype=np.int32)
            for _ in range(3)]  # 72 tokens -> 4.5 -> 5 pages w/ decode
    req = Request(np.empty(0, np.int32), SamplingParams(max_new_tokens=5),
                  context_chunks=docs)
    eng.add_request(req)
    eng.run()

    dense = ServingEngine(cfg, params, max_batch=1, max_seq=256,
                          use_pallas=False)
    [golden] = dense.generate([np.concatenate(docs)],
                              SamplingParams(max_new_tokens=5))
    assert req.output_tokens == golden.output_tokens
    assert eng.allocator.num_free == 31  # all pages returned
    ce.close()


def test_paged_decode_block_and_chunked_prefill(setup):
    """decode_block>1 + small prefill_chunk on the paged engine must
    reproduce the plain engine's greedy output."""
    cfg, params = setup
    rng = np.random.default_rng(6)
    prompts = [rng.integers(0, cfg.vocab_size, n, dtype=np.int32)
               for n in (37, 70)]
    golden = ServingEngine(cfg, params, max_batch=2, max_seq=256,
                           use_pallas=False).generate(
                               prompts, SamplingParams(max_new_tokens=9))
    eng = PagedServingEngine(cfg, params, max_batch=2, max_seq=256,
                             num_pages=64, page_size=16, use_pallas=False,
                             decode_block=4, prefill_chunk=32)
    out = eng.generate(prompts, SamplingParams(max_new_tokens=9))
    for g, o in zip(golden, out):
        assert o.output_tokens == g.output_tokens


def test_paged_int8_matches_dense_int8(setup):
    """int8 page arena: greedy parity with the dense int8 engine (same
    quantized representation), plus cache reuse through
    quantize-on-inject."""
    cfg, params = setup
    rng = np.random.default_rng(7)
    prompt = rng.integers(0, cfg.vocab_size, 70, dtype=np.int32)

    dense_i8 = ServingEngine(cfg, params, max_batch=2, max_seq=256,
                             use_pallas=False, kv_dtype="int8")
    [gn] = dense_i8.generate([prompt], SamplingParams(max_new_tokens=6))

    ce = LMCacheEngine(
        LMCacheEngineConfig.from_defaults(local_device="cpu",
                                          chunk_size=16),
        LMCacheEngineMetadata(model_name="tiny-pq", world_size=1,
                              worker_id=0, fmt="vllm", dtype=cfg.dtype))
    eng = PagedServingEngine(cfg, params, max_batch=2, max_seq=256,
                             num_pages=32, page_size=16, cache_engine=ce,
                             use_pallas=False, kv_dtype="int8")
    assert eng.kv_pool["sym"].dtype.name == "int8"
    [r1] = eng.generate([prompt], SamplingParams(max_new_tokens=6))
    assert r1.output_tokens == gn.output_tokens
    ce.engine_.flush()
    [r2] = eng.generate([prompt], SamplingParams(max_new_tokens=6))
    assert r2.cached_prefix_len == 64
    assert r2.output_tokens == r1.output_tokens
    assert eng.allocator.num_free == 31
    ce.close()


def test_paged_remote_cachegen_grouped_inject(setup, lmserver_process):
    """Paged _stream_inject with still-entropy-coded host chunks from a
    real cache server: groups decode in one device program and scatter
    onto page-aligned positions; the injected pages must match the
    plain retrieve() blob exactly (same bar as the dense engine's
    grouped-inject test)."""
    import dataclasses

    import jax.numpy as jnp

    cfg, params = setup
    rng = np.random.default_rng(21)
    prompt = rng.integers(0, cfg.vocab_size, 80, dtype=np.int32)

    def make_ce(pipelined):
        c = LMCacheEngineConfig.from_defaults(
            local_device=None, remote_url=lmserver_process.url,
            remote_serde="cachegen", chunk_size=32,
            pipelined_backend=pipelined)
        c = dataclasses.replace(c, cachegen_device_decode="on")
        return LMCacheEngine(
            c, LMCacheEngineMetadata(model_name="tiny-paged-grouped",
                                     world_size=1, worker_id=0,
                                     fmt="vllm", dtype=cfg.dtype))

    seed = make_ce(False)
    cache = llama.new_kv_cache(cfg, 1, 128)
    _, cache = llama.forward(params, cfg, jnp.asarray(prompt)[None],
                             jnp.zeros(1, jnp.int32), cache,
                             use_pallas=False)
    seed.store(prompt, llama.cache_to_blob(cache, 0, len(prompt)),
               blocking=True)
    seed.close()

    ce = make_ce(True)
    try:
        eng = PagedServingEngine(cfg, params, max_batch=2, max_seq=256,
                                 num_pages=32, page_size=16,
                                 cache_engine=ce, use_pallas=False)
        eng.inject_group_chunks = 2  # force group-flush boundaries
        [r] = eng.generate([prompt], SamplingParams(max_new_tokens=2))
        # 80 prompt tokens: pages cover 80 (page 16 | chunk 32); the
        # engine recomputes >= 1 token, so 64 land from cache
        # (the last aligned page boundary below 79)
        assert r.cached_prefix_len == 64, r.cached_prefix_len
        assert len(r.output_tokens) == 2
    finally:
        ce.close()
