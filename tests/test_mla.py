"""Multi-head Latent Attention (DeepSeek-V2/V3) tests.

The absorbed-latent forward must match HuggingFace's expanded-KV
implementations bit-for-bit within float32 tolerance, and latent blobs
must flow through the cache engine with exact-reuse semantics.
"""

import numpy as np
import pytest

import jax  # noqa: E402  (conftest pins cpu)
import jax.numpy as jnp  # noqa: E402

from lmcache_tpu.models import mla  # noqa: E402


def _tiny_cfg(**over):
    return mla.MLAConfig.tiny(**over)


@pytest.fixture
def tiny_cfg():
    return _tiny_cfg()


@pytest.fixture
def tiny_params(tiny_cfg):
    return mla.init_params(jax.random.PRNGKey(0), tiny_cfg)


def test_forward_shapes(tiny_cfg, tiny_params):
    B, T, S = 2, 8, 32
    cache = mla.new_latent_cache(tiny_cfg, B, S)
    assert cache.shape == (tiny_cfg.n_layers, B, S, tiny_cfg.latent_dim)
    ids = jnp.zeros((B, T), jnp.int32)
    logits, new_cache = mla.forward(tiny_params, tiny_cfg, ids,
                                    jnp.zeros(B, jnp.int32), cache)
    assert logits.shape == (B, T, tiny_cfg.vocab_size)
    assert new_cache.shape == cache.shape
    last, _ = mla.forward(tiny_params, tiny_cfg, ids,
                          jnp.zeros(B, jnp.int32), cache,
                          last_logit_only=True)
    np.testing.assert_allclose(np.asarray(last[:, 0]),
                               np.asarray(logits[:, -1]), rtol=1e-5)


def test_prefill_decode_consistency(tiny_cfg, tiny_params):
    """Prefilling T tokens at once == prefill prefix then decode one at
    a time (the latent cache carries exactly the needed state)."""
    B, T, S = 2, 10, 32
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, tiny_cfg.vocab_size, (B, T)),
                      jnp.int32)
    cache = mla.new_latent_cache(tiny_cfg, B, S)
    full_logits, _ = mla.forward(tiny_params, tiny_cfg, ids,
                                 jnp.zeros(B, jnp.int32), cache)

    cache2 = mla.new_latent_cache(tiny_cfg, B, S)
    _, cache2 = mla.forward(tiny_params, tiny_cfg, ids[:, :4],
                            jnp.zeros(B, jnp.int32), cache2)
    outs = []
    for t in range(4, T):
        logits, cache2 = mla.forward(tiny_params, tiny_cfg, ids[:, t:t + 1],
                                     jnp.full(B, t, jnp.int32), cache2)
        outs.append(np.asarray(logits[:, 0]))
    np.testing.assert_allclose(np.stack(outs, 1),
                               np.asarray(full_logits[:, 4:]), atol=2e-4,
                               rtol=2e-4)


def _stack_t(sd, idxs, fmt):
    import numpy as np
    return jnp.asarray(
        np.stack([np.asarray(sd[fmt.format(i)].numpy().T) for i in idxs]))


def _stack_v(sd, idxs, fmt):
    import numpy as np
    return jnp.asarray(
        np.stack([np.asarray(sd[fmt.format(i)].numpy()) for i in idxs]))


def _hf_parity(hf_model, cfg, atol=2e-3):
    """Save-free parity: convert the state dict in-memory via the same
    mapping load_hf uses, compare logits on random ids."""
    import torch

    import tempfile
    with tempfile.TemporaryDirectory() as d:
        hf_model.save_pretrained(d)
        got_cfg, params = mla.load_hf(d, cfg)

    B, T = 2, 13
    ids = np.random.default_rng(3).integers(0, cfg.vocab_size, (B, T))
    with torch.no_grad():
        hf_logits = hf_model(torch.from_numpy(ids)).logits.numpy()
    cache = mla.new_latent_cache(cfg, B, 32)
    logits, _ = mla.forward(params, cfg, jnp.asarray(ids, jnp.int32),
                            jnp.zeros(B, jnp.int32), cache)
    np.testing.assert_allclose(np.asarray(logits), hf_logits, atol=atol,
                               rtol=atol)
    return params


def test_matches_huggingface_v2_lite_style():
    """V2-Lite shape: direct q_proj, greedy softmax gate, shared experts,
    dense first layer. HF caches expanded K/V; we cache latents — the
    logits must still agree (absorption identity)."""
    torch = pytest.importorskip("torch")
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM

    hf_cfg = DeepseekV2Config(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        moe_intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=256, rms_norm_eps=1e-6,
        q_lora_rank=None, kv_lora_rank=64, qk_nope_head_dim=32,
        qk_rope_head_dim=16, v_head_dim=32, first_k_dense_replace=1,
        n_routed_experts=8, n_shared_experts=2, num_experts_per_tok=2,
        topk_method="greedy", norm_topk_prob=False,
        routed_scaling_factor=1.0, tie_word_embeddings=False,
        attention_bias=False, attention_dropout=0.0, pad_token_id=0)
    torch.manual_seed(0)
    hf = DeepseekV2ForCausalLM(hf_cfg).eval().float()

    cfg = mla.MLAConfig(
        vocab_size=256, dim=128, n_layers=3, n_heads=4, hidden_dim=256,
        max_seq_len=256, dtype="float32", q_lora_rank=None,
        kv_lora_rank=64, qk_nope_head_dim=32, qk_rope_head_dim=16,
        v_head_dim=32, n_routed_experts=8, n_shared_experts=2,
        n_experts_per_tok=2, moe_hidden_dim=64, first_k_dense_replace=1,
        topk_method="greedy", norm_topk_prob=False)
    _hf_parity(hf, cfg)


def test_matches_huggingface_v2_grouped_yarn():
    """Full-V2 shape: q_lora path, group_limited_greedy routing,
    routed_scaling_factor, DeepSeek-yarn rope (mscale == mscale_all_dim
    => attention factor 1, frequencies still NTK-scaled)."""
    torch = pytest.importorskip("torch")
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM

    rs = dict(rope_type="yarn", factor=4.0, beta_fast=32.0, beta_slow=1.0,
              mscale=0.707, mscale_all_dim=0.707,
              original_max_position_embeddings=64)
    hf_cfg = DeepseekV2Config(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        moe_intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=256, rms_norm_eps=1e-6,
        q_lora_rank=48, kv_lora_rank=64, qk_nope_head_dim=32,
        qk_rope_head_dim=16, v_head_dim=32, first_k_dense_replace=1,
        n_routed_experts=8, n_shared_experts=1, num_experts_per_tok=2,
        topk_method="group_limited_greedy", n_group=4, topk_group=2,
        norm_topk_prob=False, routed_scaling_factor=2.0,
        rope_scaling=rs, tie_word_embeddings=False,
        attention_bias=False, attention_dropout=0.0, pad_token_id=0)
    torch.manual_seed(1)
    hf = DeepseekV2ForCausalLM(hf_cfg).eval().float()

    cfg = mla.MLAConfig(
        vocab_size=256, dim=128, n_layers=3, n_heads=4, hidden_dim=256,
        max_seq_len=256, dtype="float32", q_lora_rank=48,
        kv_lora_rank=64, qk_nope_head_dim=32, qk_rope_head_dim=16,
        v_head_dim=32, n_routed_experts=8, n_shared_experts=1,
        n_experts_per_tok=2, moe_hidden_dim=64, first_k_dense_replace=1,
        topk_method="group_limited_greedy", n_group=4, topk_group=2,
        norm_topk_prob=False, routed_scaling_factor=2.0,
        rope_scaling_type="yarn", rope_scaling_factor=4.0,
        rope_beta_fast=32.0, rope_beta_slow=1.0, rope_mscale=0.707,
        rope_mscale_all_dim=0.707, rope_original_max_seq=64)
    _hf_parity(hf, cfg)


def test_matches_huggingface_v3():
    """V3: sigmoid noaux_tc router with a NONZERO e_score_correction_bias
    (selection is biased, weights are not), norm_topk_prob, mscale² in
    the score scale."""
    torch = pytest.importorskip("torch")
    from transformers import DeepseekV3Config, DeepseekV3ForCausalLM

    rs = dict(rope_type="yarn", factor=4.0, beta_fast=32.0, beta_slow=1.0,
              mscale=1.0, mscale_all_dim=1.0,
              original_max_position_embeddings=64)
    hf_cfg = DeepseekV3Config(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        moe_intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=256, rms_norm_eps=1e-6,
        q_lora_rank=48, kv_lora_rank=64, qk_nope_head_dim=32,
        qk_rope_head_dim=16, v_head_dim=32, first_k_dense_replace=1,
        n_routed_experts=8, n_shared_experts=1, num_experts_per_tok=2,
        n_group=4, topk_group=2, norm_topk_prob=True,
        routed_scaling_factor=2.5, rope_scaling=rs, rope_interleave=True,
        tie_word_embeddings=False, attention_bias=False,
        attention_dropout=0.0, pad_token_id=0)
    torch.manual_seed(2)
    hf = DeepseekV3ForCausalLM(hf_cfg).eval().float()
    # exercise the bias path: selection must use scores + bias while the
    # combine weights use the raw sigmoid scores
    for i in (1, 2):
        hf.model.layers[i].mlp.gate.e_score_correction_bias.copy_(
            torch.randn(8) * 0.5)

    cfg = mla.MLAConfig(
        vocab_size=256, dim=128, n_layers=3, n_heads=4, hidden_dim=256,
        max_seq_len=256, dtype="float32", arch="v3", q_lora_rank=48,
        kv_lora_rank=64, qk_nope_head_dim=32, qk_rope_head_dim=16,
        v_head_dim=32, n_routed_experts=8, n_shared_experts=1,
        n_experts_per_tok=2, moe_hidden_dim=64, first_k_dense_replace=1,
        topk_method="noaux_tc", n_group=4, topk_group=2,
        norm_topk_prob=True, routed_scaling_factor=2.5,
        rope_scaling_type="yarn", rope_scaling_factor=4.0,
        rope_beta_fast=32.0, rope_beta_slow=1.0, rope_mscale=1.0,
        rope_mscale_all_dim=1.0, rope_original_max_seq=64)
    params = _hf_parity(hf, cfg)
    bias = np.asarray(params["moe_layers"]["router_bias"])
    assert np.abs(bias).max() > 0  # the bias actually made it through


def test_from_hf_config_roundtrip(tmp_path):
    pytest.importorskip("torch")
    from transformers import DeepseekV2Config
    hf_cfg = DeepseekV2Config(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        moe_intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, q_lora_rank=None, kv_lora_rank=64,
        qk_nope_head_dim=32, qk_rope_head_dim=16, v_head_dim=32,
        first_k_dense_replace=1, n_routed_experts=8, n_shared_experts=2,
        num_experts_per_tok=2, topk_method="greedy",
        rope_scaling=dict(rope_type="yarn", factor=40.0, beta_fast=32.0,
                          beta_slow=1.0, mscale=0.707,
                          mscale_all_dim=0.707,
                          original_max_position_embeddings=64),
        max_position_embeddings=256)
    hf_cfg.save_pretrained(tmp_path)
    cfg = mla.MLAConfig.from_hf(str(tmp_path))
    assert cfg.arch == "v2" and cfg.q_lora_rank is None
    assert cfg.latent_dim == 80 and cfg.n_dense_layers == 1
    assert cfg.rope_scaling_type == "yarn"
    assert cfg.rope_scaling_spec[-1] == pytest.approx(1.0)  # mscale ratio
    assert cfg.sm_scale == pytest.approx(48.0**-0.5)  # v2: no mscale²


def test_latent_cache_engine_reuse(tmp_path):
    """TTFT-reuse semantics with latent blobs: store the latent cache of
    a prefix through the real cache engine (disk tier), retrieve into a
    fresh pool, forward only the suffix — logits match full recompute.

    The blob is [L, 1, T, 1, r+p]; nothing in chunking/serde/storage
    needs to know it is not a K/V blob."""
    from lmcache_tpu.cache_engine import LMCacheEngine
    from lmcache_tpu.config import (LMCacheEngineConfig,
                                    LMCacheEngineMetadata)

    cfg = _tiny_cfg(n_layers=2)
    params = mla.init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(5)
    prefix = rng.integers(0, cfg.vocab_size, 96)
    suffix = rng.integers(0, cfg.vocab_size, 8)
    full = np.concatenate([prefix, suffix])
    ids = jnp.asarray(full, jnp.int32)[None]

    S = 128
    cache = mla.new_latent_cache(cfg, 1, S)
    golden, golden_cache = mla.forward(params, cfg, ids,
                                       jnp.zeros(1, jnp.int32), cache)

    # store the prefix latents
    ecfg = LMCacheEngineConfig.from_defaults(
        chunk_size=32, local_device=str(tmp_path), remote_url=None)
    meta = LMCacheEngineMetadata(model_name="tiny-mla", world_size=1,
                                 worker_id=0, fmt="vllm", dtype="float32")
    eng = LMCacheEngine(ecfg, meta)
    blob = np.asarray(mla.cache_to_blob(golden_cache, 0, len(prefix)))
    assert blob.shape == (2, 1, 96, 1, cfg.latent_dim)
    eng.store(prefix.astype(np.int32), blob)

    # fresh engine instance retrieves; forward the suffix only
    got, mask = eng.retrieve(full.astype(np.int32), return_tuple=False)
    n = int(np.sum(mask))
    assert n == len(prefix)  # suffix tokens are a partial, unseen chunk
    cache2 = mla.new_latent_cache(cfg, 1, S)
    cache2 = mla.blob_into_cache(cache2, jnp.asarray(got), 0, 0)
    logits, _ = mla.forward(params, cfg, jnp.asarray(suffix,
                                                     jnp.int32)[None],
                            jnp.full(1, n, jnp.int32), cache2)
    np.testing.assert_allclose(np.asarray(logits[0]),
                               np.asarray(golden[0, len(prefix):]),
                               atol=2e-4, rtol=2e-4)
    eng.close()
