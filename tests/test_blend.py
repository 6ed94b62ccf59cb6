"""CacheBlend tests.

Anchors:
- RoPE shift identity: rotating cached keys by delta == computing them at
  the shifted position.
- recompute_ratio=1.0 must reproduce the exact full-prefill logits (blend
  degenerates to full prefill).
- partial recompute (the actual CacheBlend operating point) must be
  strictly closer to full prefill than naive non-prefix reuse.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from lmcache_tpu import blend  # noqa: E402
from lmcache_tpu.cache_engine import LMCacheEngine  # noqa: E402
from lmcache_tpu.config import (LMCacheEngineConfig,  # noqa: E402
                                LMCacheEngineMetadata)
from lmcache_tpu.models import llama  # noqa: E402


@pytest.fixture(scope="module")
def setup():
    cfg = llama.LlamaConfig.tiny(n_layers=3)
    params = llama.init_params(jax.random.PRNGKey(11), cfg)
    return cfg, params


def test_rope_shift_identity(setup):
    cfg, _ = setup
    rng = np.random.default_rng(0)
    T, H, D = 8, 2, 64
    x = jnp.asarray(rng.standard_normal((1, T, H, D)), jnp.float32)
    at_pos5 = llama._rope(x, jnp.arange(5, 5 + T)[None], cfg.rope_theta)
    at_pos0 = llama._rope(x, jnp.arange(T)[None], cfg.rope_theta)
    shifted = blend.rope_shift_keys(at_pos0[0],
                                    jnp.full((T,), 5.0), cfg.rope_theta)
    np.testing.assert_allclose(np.asarray(shifted), np.asarray(at_pos5[0]),
                               atol=1e-5)


def _standalone_blob(cfg, params, tokens):
    cache = llama.new_kv_cache(cfg, 1, len(tokens))
    _, cache = llama.forward(params, cfg,
                             jnp.asarray(tokens)[None, :],
                             jnp.zeros(1, jnp.int32), cache,
                             use_pallas=False)
    return llama.cache_to_blob(cache)


def _golden_logits(cfg, params, tokens):
    cache = llama.new_kv_cache(cfg, 1, len(tokens))
    logits, cache = llama.forward(params, cfg,
                                  jnp.asarray(tokens)[None, :],
                                  jnp.zeros(1, jnp.int32), cache,
                                  use_pallas=False)
    return np.asarray(logits[0, -1]), np.asarray(llama.cache_to_blob(cache))


@pytest.fixture(scope="module")
def blend_case(setup):
    cfg, params = setup
    rng = np.random.default_rng(1)
    chunks = [
        rng.integers(0, cfg.vocab_size, n, dtype=np.int32)
        for n in (24, 32, 24)
    ]
    full = np.concatenate(chunks)
    golden_logits, golden_kv = _golden_logits(cfg, params, full)
    blobs = [_standalone_blob(cfg, params, c) for c in chunks]
    blended = blend.assemble_chunks(blobs, cfg.rope_theta)
    return cfg, params, chunks, full, golden_logits, golden_kv, blended


def test_full_recompute_is_exact(blend_case):
    cfg, params, _, full, golden_logits, golden_kv, blended = blend_case
    logits, kv = blend.blend_prefill(params, cfg, jnp.asarray(full),
                                     blended, len(full))
    np.testing.assert_allclose(np.asarray(logits), golden_logits, atol=2e-3,
                               rtol=2e-3)
    np.testing.assert_allclose(np.asarray(kv), golden_kv, atol=2e-3)


def test_partial_recompute_beats_naive(blend_case):
    cfg, params, _, full, golden_logits, _, blended = blend_case
    T = len(full)

    def err(n_rec):
        logits, _ = blend.blend_prefill(params, cfg, jnp.asarray(full),
                                        blended, n_rec)
        g = golden_logits / np.linalg.norm(golden_logits)
        l = np.asarray(logits) / np.linalg.norm(np.asarray(logits))
        return np.linalg.norm(g - l)

    naive = err(1)  # only the last token recomputed
    partial = err(max(2, int(0.2 * T)))
    exact = err(T)
    assert exact < 1e-3
    assert partial < naive


def test_cache_blender_end_to_end(setup):
    cfg, params = setup
    rng = np.random.default_rng(2)
    ce = LMCacheEngine(
        LMCacheEngineConfig.from_defaults(local_device="cpu"),
        LMCacheEngineMetadata(model_name="tiny", world_size=1, worker_id=0,
                              fmt="vllm", dtype=cfg.dtype))
    blender = blend.CacheBlender(cfg, params, ce, recompute_ratio=0.2)

    docs = [
        rng.integers(0, cfg.vocab_size, 16, dtype=np.int32)
        for _ in range(3)
    ]
    # first call: all misses (stored on the fly)
    logits1, kv1, info1 = blender.blend([docs[0], docs[1], docs[2]])
    assert info1["misses"] == 3
    # re-ordered reuse: every chunk now hits, in a different position
    logits2, kv2, info2 = blender.blend([docs[2], docs[0], docs[1]])
    assert info2["misses"] == 0
    assert kv2.shape == (cfg.n_layers, 2, 48, cfg.n_kv_heads, cfg.head_dim)

    # the blended result must track the true full prefill of the reordered
    # prompt reasonably well (random weights are the worst case for
    # blending: attention is diffuse, so cross-chunk terms are large)
    full = np.concatenate([docs[2], docs[0], docs[1]])
    golden, _ = _golden_logits(cfg, params, full)
    g = golden / np.linalg.norm(golden)
    l = np.asarray(logits2) / np.linalg.norm(np.asarray(logits2))
    assert float(g @ l) > 0.9
    ce.close()


@pytest.mark.parametrize("family_kw", [
    dict(attention_bias=True),                       # Qwen-style
    dict(attention_bias=True, rotary_dim=32,
         rope_interleaved=True),                     # GLM-style
    dict(attention_bias=True, rotary_dim=32,
         rope_interleaved=True, post_norms=True),    # Glm4-0414-style
    dict(qk_norm=True),                              # Qwen3-style
    dict(n_experts=4, n_experts_per_tok=2,
         moe_hidden_dim=64),                         # MoE (Mixtral-style)
    dict(qk_norm=True, norm_one_offset=True, post_norms=True,
         mlp_act="gelu_tanh", embed_scale=True,
         query_pre_attn_scalar=24.0, sliding_window=16,
         global_layer_map=(False, True), rope_theta=1000000.0,
         rope_local_theta=10000.0),                  # Gemma-3-style
    dict(rope_interleaved=True, sliding_window=16,
         global_layer_map=(False, True), local_attention_kind="chunked",
         nope_on_global_layers=True, qk_l2_norm=True,
         attn_temperature_tuning=True,
         attn_floor_scale=16.0),                     # Llama-4-style iRoPE
    dict(pre_norms=False, post_norms=True,
         qk_norm_flat=True),                         # OLMo-2-style
])
def test_blend_exact_anchor_other_families(family_kw):
    """ratio=1.0 blending must equal a full prefill for bias and
    partial-interleaved-rotary families too (round 2: blend previously
    dropped the qkv bias and assumed llama rotary)."""
    cfg = llama.LlamaConfig.tiny(n_layers=2, **family_kw)
    params = llama.init_params(jax.random.PRNGKey(5), cfg)
    rng = np.random.default_rng(8)
    docs = [rng.integers(0, cfg.vocab_size, 24, dtype=np.int32)
            for _ in range(3)]
    full = np.concatenate(docs)

    per_layer = (cfg.rope_local_theta is not None
                 or cfg.nope_on_global_layers)
    blobs = [_standalone_blob(cfg, params, d) for d in docs]
    blended = blend.assemble_chunks(
        blobs, cfg.rope_theta, cfg.rotary_dim, cfg.rope_interleaved,
        local_theta=cfg.rope_local_theta,
        global_layers=(tuple(cfg.layer_windows()) if per_layer else None),
        nope_global=cfg.nope_on_global_layers)
    logits, kv = blend.blend_prefill(params, cfg, jnp.asarray(full),
                                     blended, len(full))
    gold_logits, gold_kv = _golden_logits(cfg, params, full)
    np.testing.assert_allclose(np.asarray(logits), gold_logits, atol=2e-3,
                               rtol=2e-3)
    np.testing.assert_allclose(np.asarray(kv), gold_kv, atol=2e-3,
                               rtol=2e-3)

@pytest.mark.parametrize("family_kw", [
    dict(),                                            # uniform rope
    dict(sliding_window=16, global_layer_map=(False, True),
         rope_theta=1e6, rope_local_theta=1e4),        # Gemma-3 dual theta
    dict(rope_interleaved=True, sliding_window=16,
         global_layer_map=(False, True), local_attention_kind="chunked",
         nope_on_global_layers=True),                  # Llama-4 iRoPE
])
def test_assemble_shift_selects_per_layer_freqs(family_kw):
    """assemble_chunks must re-rotate each layer's cached keys at THAT
    layer's frequencies — global layers at the scaled rope_theta set,
    Gemma-3 sliding layers at rope_local_theta, Llama-4 NoPE layers not
    at all. The golden applies the delta rotation per layer through
    llama._rope with the layer's _layer_rope_freqs. (The ratio=1.0
    anchor can't see a wrong shift: it recomputes every token's KV
    before attending — this pins the assemble path itself.)"""
    cfg = llama.LlamaConfig.tiny(n_layers=2, **family_kw)
    params = llama.init_params(jax.random.PRNGKey(9), cfg)
    rng = np.random.default_rng(10)
    tA, tB = 24, 24
    A = rng.integers(0, cfg.vocab_size, tA, dtype=np.int32)
    B = rng.integers(0, cfg.vocab_size, tB, dtype=np.int32)

    per_layer = (cfg.rope_local_theta is not None
                 or cfg.nope_on_global_layers)
    wins = cfg.layer_windows()
    blobA = _standalone_blob(cfg, params, A)
    blobB = _standalone_blob(cfg, params, B)
    blended = blend.assemble_chunks(
        [blobA, blobB], cfg.rope_theta, cfg.rotary_dim,
        cfg.rope_interleaved, cfg.rope_scaling_spec,
        local_theta=cfg.rope_local_theta,
        global_layers=(tuple(wins) if per_layer else None),
        nope_global=cfg.nope_on_global_layers)

    # chunk A is unshifted; chunk B's keys rotate by tA at each layer's
    # own frequencies; values never rotate
    np.testing.assert_allclose(np.asarray(blended[:, :, :tA]),
                               np.asarray(blobA), atol=1e-6)
    np.testing.assert_allclose(np.asarray(blended[:, 1, tA:]),
                               np.asarray(blobB[:, 1]), atol=1e-6)
    delta = jnp.full((1, tB), float(tA))
    for layer in range(cfg.n_layers):
        if per_layer:
            fl = llama._layer_rope_freqs(cfg, bool(wins[layer]))
            freqs = (fl[0], 1.0)  # the shift is a pure rotation
        else:
            freqs = None
        gk = llama._rope(blobB[layer, 0][None], delta, cfg.rope_theta,
                         cfg.rotary_dim, cfg.rope_interleaved,
                         cfg.rope_scaling_spec, freqs=freqs)[0]
        np.testing.assert_allclose(np.asarray(blended[layer, 0, tA:]),
                                   np.asarray(gk), atol=2e-5, rtol=2e-5,
                                   err_msg=f"layer {layer}")
    if cfg.nope_on_global_layers:
        # the NoPE layer's keys must be bit-identical (no rotation)
        glb = int(np.argmax(wins))
        np.testing.assert_allclose(np.asarray(blended[glb, 0, tA:]),
                                   np.asarray(blobB[glb, 0]), atol=1e-6)
