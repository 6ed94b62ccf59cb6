"""CacheBlend-for-MLA tests (lmcache_tpu/blend_mla.py).

Anchors, mirroring tests/test_blend.py on the latent stream:
- Latent shift identity: only the rope slice [r:r+p] rotates; layer-0
  latents (which depend only on embeddings) shifted by delta must equal
  the latents of the same tokens prefilled AT delta.
- recompute_ratio=1.0 must reproduce the exact full-prefill logits and
  latent cache (blend degenerates to full prefill).
- partial recompute must be strictly closer to full prefill than naive
  non-prefix reuse.
- serving end-to-end: dense-latent and paged MLA engines admit
  context_chunks requests and (at ratio=1.0) match plain greedy decode.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from lmcache_tpu import blend_mla  # noqa: E402
from lmcache_tpu.cache_engine import LMCacheEngine  # noqa: E402
from lmcache_tpu.config import (LMCacheEngineConfig,  # noqa: E402
                                LMCacheEngineMetadata)
from lmcache_tpu.models import mla  # noqa: E402


@pytest.fixture(scope="module")
def setup():
    # MoE tail + dense first layer: pass 2 crosses the heterogeneous
    # dense/moe scan boundary
    cfg = mla.MLAConfig.tiny(n_layers=3, n_routed_experts=4,
                             n_shared_experts=1, n_experts_per_tok=2,
                             moe_hidden_dim=64, first_k_dense_replace=1)
    params = mla.init_params(jax.random.PRNGKey(7), cfg)
    return cfg, params


def _prefill(cfg, params, tokens, start=0):
    cache = mla.new_latent_cache(cfg, 1, start + len(tokens))
    logits, cache = mla.forward(params, cfg,
                                jnp.asarray(tokens)[None, :],
                                jnp.asarray([start], jnp.int32), cache,
                                use_pallas=False)
    return logits, cache


def _standalone_blob(cfg, params, tokens):
    _, cache = _prefill(cfg, params, tokens)
    return mla.cache_to_blob(cache, 0, len(tokens))


def test_latent_shift_matches_shifted_prefill(setup):
    """Layer-0 latents depend only on embeddings, so chunk latents
    cached at positions 0..t and shifted by delta must equal the
    latents of the same tokens prefilled with start_pos=delta — and the
    compressed slice [0:r] must be untouched by the shift."""
    cfg, params = setup
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, cfg.vocab_size, 12, dtype=np.int32)
    delta = 17

    _, at0 = _prefill(cfg, params, tokens)
    _, atd = _prefill(cfg, params, tokens, start=delta)
    lat0 = at0[0, 0, :12]  # layer 0 latents [T, C]
    latd = atd[0, 0, delta:delta + 12]

    shifted = blend_mla.shift_latent_positions(
        lat0, jnp.full((12,), float(delta)), cfg)
    np.testing.assert_allclose(np.asarray(shifted), np.asarray(latd),
                               atol=1e-5)
    # the compressed latent slice carries no positional encoding
    r = cfg.kv_lora_rank
    np.testing.assert_array_equal(np.asarray(shifted[..., :r]),
                                  np.asarray(lat0[..., :r]))


@pytest.fixture(scope="module")
def blend_case(setup):
    cfg, params = setup
    rng = np.random.default_rng(1)
    chunks = [rng.integers(0, cfg.vocab_size, n, dtype=np.int32)
              for n in (24, 32, 24)]
    full = np.concatenate(chunks)
    logits, cache = _prefill(cfg, params, full)
    golden_logits = np.asarray(logits[0, -1])
    golden_lat = np.asarray(cache[:, 0])  # [L, T, C]
    blobs = [_standalone_blob(cfg, params, c) for c in chunks]
    blended = blend_mla.assemble_latent_chunks(blobs, cfg)
    return cfg, params, chunks, full, golden_logits, golden_lat, blended


def test_full_recompute_is_exact(blend_case):
    cfg, params, _, full, golden_logits, golden_lat, blended = blend_case
    logits, lat = blend_mla.mla_blend_prefill(
        params, cfg, jnp.asarray(full), blended, len(full))
    np.testing.assert_allclose(np.asarray(logits), golden_logits,
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(lat), golden_lat, atol=2e-3)


def test_partial_recompute_beats_naive(blend_case):
    cfg, params, _, full, golden_logits, _, blended = blend_case
    T = len(full)

    def err(n_rec):
        logits, _ = blend_mla.mla_blend_prefill(
            params, cfg, jnp.asarray(full), blended, n_rec)
        g = golden_logits / np.linalg.norm(golden_logits)
        l = np.asarray(logits) / np.linalg.norm(np.asarray(logits))
        return np.linalg.norm(g - l)

    naive = err(1)  # only the last token recomputed
    partial = err(max(2, int(0.2 * T)))
    exact = err(T)
    assert exact < 1e-3
    assert partial < naive


def _cache_engine(cfg, name):
    return LMCacheEngine(
        LMCacheEngineConfig.from_defaults(local_device="cpu"),
        LMCacheEngineMetadata(model_name=name, world_size=1,
                              worker_id=0, fmt="vllm", dtype=cfg.dtype))


def test_blender_reuses_cached_chunks(setup):
    """Second blend of the same chunks fetches every blob from the
    cache (misses == 0) and produces identical logits."""
    cfg, params = setup
    rng = np.random.default_rng(2)
    ce = _cache_engine(cfg, "mla-blend")
    try:
        blender = blend_mla.MLACacheBlender(cfg, params, ce,
                                            recompute_ratio=0.25)
        docs = [rng.integers(0, cfg.vocab_size, 16, dtype=np.int32)
                for _ in range(3)]
        logits1, blob1, info1 = blender.blend(docs)
        assert info1["misses"] == 3
        logits2, blob2, info2 = blender.blend(docs)
        assert info2["misses"] == 0
        np.testing.assert_array_equal(np.asarray(logits1),
                                      np.asarray(logits2))
        assert blob1.shape == (cfg.n_layers, 1, 48, 1, cfg.latent_dim)
    finally:
        ce.close()


def _naive_greedy(cfg, params, prompt, n_new):
    toks = list(prompt)
    for _ in range(n_new):
        logits, _ = _prefill(cfg, params, np.asarray(toks, np.int32))
        toks.append(int(jnp.argmax(logits[0, -1])))
    return toks[len(prompt):]


def test_blend_request_dense_engine(setup):
    """context_chunks requests admit via MLA CacheBlend on the dense
    latent engine; ratio=1.0 matches plain greedy decode."""
    from lmcache_tpu.serving import (MLAServingEngine, Request,
                                     SamplingParams)
    cfg, params = setup
    rng = np.random.default_rng(9)
    ce = _cache_engine(cfg, "mla-blend-dense")
    try:
        eng = MLAServingEngine(cfg, params, max_batch=2, max_seq=256,
                               cache_engine=ce, use_pallas=False,
                               blend_recompute_ratio=1.0)
        docs = [rng.integers(0, cfg.vocab_size, 24, dtype=np.int32)
                for _ in range(3)]
        req = Request(np.empty(0, np.int32),
                      SamplingParams(max_new_tokens=5),
                      context_chunks=docs)
        eng.add_request(req)
        eng.run()
        golden = _naive_greedy(cfg, params, np.concatenate(docs), 5)
        assert req.output_tokens == golden
        assert req.blended_tokens_recomputed == 72
    finally:
        ce.close()


@pytest.mark.parametrize("kv_dtype", ["native", "int8"])
def test_blend_request_paged_engine(setup, kv_dtype):
    """context_chunks requests admit via MLA CacheBlend onto the paged
    latent arena (native and int8); ratio=1.0 matches plain greedy."""
    from lmcache_tpu.serving import Request, SamplingParams
    from lmcache_tpu.serving.mla_paged_engine import MLAPagedServingEngine
    cfg, params = setup
    rng = np.random.default_rng(11)
    ce = _cache_engine(cfg, f"mla-blend-paged-{kv_dtype}")
    try:
        eng = MLAPagedServingEngine(cfg, params, max_batch=2, max_seq=256,
                                    num_pages=24, page_size=16,
                                    cache_engine=ce, use_pallas=False,
                                    kv_dtype=kv_dtype,
                                    blend_recompute_ratio=1.0)
        docs = [rng.integers(0, cfg.vocab_size, 24, dtype=np.int32)
                for _ in range(3)]
        req = Request(np.empty(0, np.int32),
                      SamplingParams(max_new_tokens=5),
                      context_chunks=docs)
        eng.add_request(req)
        eng.run()
        golden = _naive_greedy(cfg, params, np.concatenate(docs), 5)
        assert req.output_tokens == golden
    finally:
        ce.close()
