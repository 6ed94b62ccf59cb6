"""MLA paged serving: the page arena + scheduler over the latent cache
— kernel parity, forward parity vs the dense latent pool, engine greedy
parity, cache reuse, prefix sharing, preemption, and mesh shard_map."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from lmcache_tpu.cache_engine import LMCacheEngine  # noqa: E402
from lmcache_tpu.config import (LMCacheEngineConfig,  # noqa: E402
                                LMCacheEngineMetadata)
from lmcache_tpu.models import mla  # noqa: E402
from lmcache_tpu.serving import (MLAPagedServingEngine,  # noqa: E402
                                 MLAServingEngine, Request, SamplingParams)


@pytest.fixture(scope="module")
def setup():
    # MoE tail + dense first layer so the paged path crosses the
    # heterogeneous-scan boundary (as tests/test_mla_serving.py)
    cfg = mla.MLAConfig.tiny(n_layers=3, n_routed_experts=4,
                             n_shared_experts=1, n_experts_per_tok=2,
                             moe_hidden_dim=64, first_k_dense_replace=1)
    params = mla.init_params(jax.random.PRNGKey(7), cfg)
    return cfg, params


def _prompt(cfg, n, seed):
    return np.random.default_rng(seed).integers(0, cfg.vocab_size, n,
                                                dtype=np.int32)


def test_paged_latent_kernel_matches_reference():
    """Gather-by-DMA paged latent kernel vs dense-gather reference:
    prefill block, decode row, ragged lengths, dead table slots."""
    from lmcache_tpu.ops.paged_latent_attention import (
        paged_latent_attention, paged_latent_attention_reference)

    rng = np.random.default_rng(0)
    B, T, H, C, rank = 2, 4, 8, 96, 64
    P, page, NP = 12, 16, 5
    q = jnp.asarray(rng.standard_normal((B, T, H, C)), jnp.float32)
    pool = jnp.asarray(rng.standard_normal((P, page, C)), jnp.float32)
    table = jnp.asarray([[1, 3, 5, 0, 0], [2, 4, 6, 7, 9]], jnp.int32)
    q_off = jnp.asarray([17, 43], jnp.int32)  # ragged; row 1 spans 3 pages
    kv_len = q_off + T

    for t in (T, 1):
        ref = paged_latent_attention_reference(
            q[:, :t], pool, table, q_off, kv_len, rank=rank, scale=0.13)
        out = paged_latent_attention(
            q[:, :t], pool, table, q_off, kv_len, rank=rank, scale=0.13)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)


def test_forward_paged_matches_dense(setup):
    """mla.forward_paged (reference AND pallas paths) == mla.forward on
    the dense latent pool, for prefill then decode."""
    cfg, params = setup
    B, T, page, P, NP = 2, 12, 8, 16, 6
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T),
                                      dtype=np.int32))
    start = jnp.zeros((B,), jnp.int32)

    cache = mla.new_latent_cache(cfg, B, 64)
    gl, gc = mla.forward(params, cfg, tokens, start, cache,
                         use_pallas=False)

    pool = mla.new_paged_latent_pool(cfg, P, page)
    table = np.zeros((B, NP), np.int32)
    table[0, :2] = [1, 2]
    table[1, :2] = [3, 4]
    for pallas in (False, True):
        pl_, pp = mla.forward_paged(params, cfg, tokens, start, pool,
                                    jnp.asarray(table), use_pallas=pallas)
        np.testing.assert_allclose(np.asarray(pl_), np.asarray(gl),
                                   atol=2e-3, rtol=2e-3)

    # decode against the updated arena
    t1 = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, 1),
                                  dtype=np.int32))
    s1 = jnp.full((B,), T, jnp.int32)
    gl1, _ = mla.forward(params, cfg, t1, s1, gc, use_pallas=False)
    pl1, _ = mla.forward_paged(params, cfg, t1, s1, pp,
                               jnp.asarray(table), use_pallas=False)
    np.testing.assert_allclose(np.asarray(pl1), np.asarray(gl1),
                               atol=2e-4, rtol=2e-4)


def test_paged_matches_dense_engine(setup):
    """Greedy parity with the dense-latent MLA engine across mixed
    prompt lengths and more requests than slots."""
    cfg, params = setup
    prompts = [_prompt(cfg, n, s) for s, n in enumerate((21, 33, 9, 17))]

    golden = MLAServingEngine(cfg, params, max_batch=2, max_seq=128,
                              use_pallas=False)
    gold = [r.output_tokens for r in
            golden.generate(prompts, SamplingParams(max_new_tokens=6))]

    eng = MLAPagedServingEngine(cfg, params, max_batch=2, max_seq=128,
                                num_pages=32, page_size=16,
                                use_pallas=False)
    outs = [r.output_tokens for r in
            eng.generate(prompts, SamplingParams(max_new_tokens=6))]
    assert outs == gold
    assert eng.allocator.num_free == 31  # all pages returned


def test_paged_cache_reuse(setup):
    """Second identical prompt hits the cache tiers; output unchanged
    and the prefix is injected as whole pages."""
    cfg, params = setup
    ce = LMCacheEngine(
        LMCacheEngineConfig.from_defaults(local_device="cpu",
                                          chunk_size=16),
        LMCacheEngineMetadata(model_name="mla-paged-reuse", world_size=1,
                              worker_id=0, fmt="vllm", dtype=cfg.dtype))
    try:
        eng = MLAPagedServingEngine(cfg, params, max_batch=2, max_seq=128,
                                    num_pages=32, page_size=16,
                                    cache_engine=ce, use_pallas=False)
        prompt = _prompt(cfg, 40, 11)
        [r1] = eng.generate([prompt], SamplingParams(max_new_tokens=6))
        ce.engine_.flush()
        # forget resident pages so the hit must come from the tiers
        eng._resident.clear()
        eng._page_hash.clear()
        [r2] = eng.generate([prompt], SamplingParams(max_new_tokens=6))
        assert r2.cached_prefix_len >= 32  # two whole 16-token pages
        assert r2.output_tokens == r1.output_tokens
    finally:
        ce.close()


def test_prefix_sharing_latent_pages(setup):
    """Two requests with a shared prefix occupy shared latent pages
    until divergence (copy-on-write via refcounts)."""
    cfg, params = setup
    eng = MLAPagedServingEngine(cfg, params, max_batch=2, max_seq=128,
                                num_pages=32, page_size=16,
                                use_pallas=False)
    shared = _prompt(cfg, 32, 21)  # 2 whole pages
    pa = np.concatenate([shared, _prompt(cfg, 8, 22)])
    pb = np.concatenate([shared, _prompt(cfg, 8, 23)])

    a = Request(pa, SamplingParams(max_new_tokens=4))
    eng.add_request(a)
    while a.state.name != "RUNNING":
        eng.step()
    pages_a = list(eng._req_pages[a.request_id])

    b = Request(pb, SamplingParams(max_new_tokens=4))
    eng.add_request(b)
    eng.step()
    pages_b = list(eng._req_pages[b.request_id])
    assert pages_b[:2] == pages_a[:2]  # the 2 prefix pages are shared
    assert pages_b[2] != pages_a[2]  # divergence gets its own page
    assert eng._req_shared[b.request_id] == 32
    eng.run()

    solo = MLAServingEngine(cfg, params, max_batch=1, max_seq=128,
                            use_pallas=False)
    [ga] = solo.generate([pa], SamplingParams(max_new_tokens=4))
    [gb] = solo.generate([pb], SamplingParams(max_new_tokens=4))
    assert a.output_tokens == ga.output_tokens
    assert b.output_tokens == gb.output_tokens


def test_preemption_exact_resume(setup):
    """Arena exhaustion preempts the newest request into the cache
    tiers; it resumes with identical greedy output."""
    cfg, params = setup
    ce = LMCacheEngine(
        LMCacheEngineConfig.from_defaults(local_device="cpu",
                                          chunk_size=16),
        LMCacheEngineMetadata(model_name="mla-paged-preempt",
                              world_size=1, worker_id=0, fmt="vllm",
                              dtype=cfg.dtype))
    try:
        eng = MLAPagedServingEngine(cfg, params, max_batch=2, max_seq=128,
                                    num_pages=8, page_size=16,
                                    cache_engine=ce, use_pallas=False)
        pa, pb = _prompt(cfg, 40, 31), _prompt(cfg, 40, 32)
        a = Request(pa, SamplingParams(max_new_tokens=40))
        b = Request(pb, SamplingParams(max_new_tokens=40))
        eng.add_request(a)
        eng.add_request(b)
        eng.run()

        assert b.num_preemptions >= 1
        assert len(a.output_tokens) == 40 and len(b.output_tokens) == 40
        assert eng.allocator.num_free == 7

        solo = MLAServingEngine(cfg, params, max_batch=1, max_seq=128,
                                use_pallas=False)
        [ga] = solo.generate([pa], SamplingParams(max_new_tokens=40))
        [gb] = solo.generate([pb], SamplingParams(max_new_tokens=40))
        assert a.output_tokens == ga.output_tokens
        assert b.output_tokens == gb.output_tokens
    finally:
        ce.close()


def test_unsupported_modes_fail_loudly(setup):
    cfg, params = setup
    with pytest.raises(ValueError, match="kv_dtype"):
        MLAPagedServingEngine(cfg, params, max_batch=2, max_seq=64,
                              num_pages=8, page_size=16, kv_dtype="int4")


def test_quantized_paged_latent_kernel_matches_reference():
    """Int8 paged latent kernel (fused dequant, scale page riding the
    same page-table DMA) vs the dequantize-then-dense reference."""
    from lmcache_tpu.ops.latent_attention import quantize_latents
    from lmcache_tpu.ops.paged_latent_attention import (
        quantized_paged_latent_attention,
        quantized_paged_latent_attention_reference)

    rng = np.random.default_rng(3)
    B, T, H, C, rank = 2, 4, 8, 96, 64
    P, page, NP = 12, 16, 5
    q = jnp.asarray(rng.standard_normal((B, T, H, C)), jnp.float32)
    pool = jnp.asarray(rng.standard_normal((P, page, C)), jnp.float32)
    sym, scl = quantize_latents(pool)
    table = jnp.asarray([[1, 3, 5, 0, 0], [2, 4, 6, 7, 9]], jnp.int32)
    q_off = jnp.asarray([17, 43], jnp.int32)
    kv_len = q_off + T

    for t in (T, 1):
        ref = quantized_paged_latent_attention_reference(
            q[:, :t], sym, scl, table, q_off, kv_len, rank=rank,
            scale=0.13)
        out = quantized_paged_latent_attention(
            q[:, :t], sym, scl, table, q_off, kv_len, rank=rank,
            scale=0.13)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)


def test_int8_paged_latent_serving(setup):
    """kv_dtype="int8" on the page arena: int8 pages + per-token scale
    pages (~114x smaller than an expanded-KV arena), quantize-on-write
    (both the forward scatter and cache injection), lossless native
    wire blobs. Greedy reuse reproduces the same output and the tokens
    agree with the native-dtype paged engine on this tiny model."""
    cfg, params = setup
    rng = np.random.default_rng(77)
    prompt = rng.integers(0, cfg.vocab_size, 40, dtype=np.int32)

    ce = LMCacheEngine(
        LMCacheEngineConfig.from_defaults(local_device="cpu",
                                          chunk_size=16),
        LMCacheEngineMetadata(model_name="mla-paged-int8", world_size=1,
                              worker_id=0, fmt="vllm", dtype=cfg.dtype))
    try:
        eng = MLAPagedServingEngine(cfg, params, max_batch=2, max_seq=128,
                                    num_pages=32, page_size=16,
                                    cache_engine=ce, kv_dtype="int8",
                                    use_pallas=False)
        assert isinstance(eng.kv_pool, dict)
        assert eng.kv_pool["sym"].dtype == jnp.int8

        [first] = eng.generate([prompt], SamplingParams(max_new_tokens=6))
        assert first.cached_prefix_len == 0
        ce.engine_.flush()
        # forget resident pages so the hit must come from the tiers
        eng._resident.clear()
        eng._page_hash.clear()
        [again] = eng.generate([prompt], SamplingParams(max_new_tokens=6))
        assert again.cached_prefix_len >= 32
        assert again.output_tokens == first.output_tokens
        assert eng.allocator.num_free == 31  # all pages returned

        native = MLAPagedServingEngine(cfg, params, max_batch=2,
                                       max_seq=128, num_pages=32,
                                       page_size=16, use_pallas=False)
        [g] = native.generate([prompt], SamplingParams(max_new_tokens=6))
        assert g.output_tokens == first.output_tokens
    finally:
        ce.close()


def test_int8_paged_forward_matches_quantized_dense(setup):
    """mla.forward_paged on the int8 arena (reference AND pallas paths)
    == mla.forward on the dense int8 latent pool."""
    cfg, params = setup
    B, T, page, P, NP = 2, 12, 8, 16, 6
    rng = np.random.default_rng(5)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T),
                                      dtype=np.int32))
    start = jnp.zeros((B,), jnp.int32)

    cache = mla.new_quantized_latent_cache(cfg, B, 64)
    gl, _ = mla.forward(params, cfg, tokens, start, cache,
                        use_pallas=False)

    pool = mla.new_quantized_paged_latent_pool(cfg, P, page)
    table = np.zeros((B, NP), np.int32)
    table[0, :2] = [1, 2]
    table[1, :2] = [3, 4]
    for pallas in (False, True):
        pl_, pp = mla.forward_paged(params, cfg, tokens, start, pool,
                                    jnp.asarray(table), use_pallas=pallas)
        np.testing.assert_allclose(np.asarray(pl_), np.asarray(gl),
                                   atol=2e-3, rtol=2e-3)
        assert pp["sym"].dtype == jnp.int8


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 devices")
def test_paged_latent_shard_map_parity(setup):
    """The paged latent kernel runs under shard_map with q heads on
    "model" and the arena replicated (mla._shard_paged_latent_attend);
    logits match the unsharded reference path."""
    from lmcache_tpu.parallel import MeshConfig, make_mesh, shard_params

    cfg, params = setup
    mesh = make_mesh(MeshConfig(data=1, model=4))
    sparams = shard_params(params, mesh)

    B, T, page, P, NP = 2, 12, 8, 16, 6
    rng = np.random.default_rng(41)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T),
                                      dtype=np.int32))
    start = jnp.zeros((B,), jnp.int32)
    pool = mla.new_paged_latent_pool(cfg, P, page)
    table = np.zeros((B, NP), np.int32)
    table[0, :2] = [1, 2]
    table[1, :2] = [3, 4]

    ref_logits, _ = mla.forward_paged(
        params, cfg, tokens, start, pool, jnp.asarray(table),
        use_pallas=False)
    sh_logits, _ = mla.forward_paged(
        sparams, cfg, tokens, start, pool, jnp.asarray(table),
        use_pallas=True, mesh=mesh)
    np.testing.assert_allclose(np.asarray(sh_logits),
                               np.asarray(ref_logits), atol=2e-2,
                               rtol=2e-2)
