"""Model correctness: our JAX llama vs a randomly-initialized
transformers.LlamaForCausalLM built locally (no network), plus
KV-cache semantics (prefill+decode == one-shot prefill).

Runs on the CPU backend (conftest forces JAX_PLATFORMS=cpu with an
8-device virtual mesh); the Pallas kernel runs in interpret mode there.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from lmcache_tpu.models import llama  # noqa: E402


@pytest.fixture(scope="module")
def tiny_cfg():
    return llama.LlamaConfig.tiny()


@pytest.fixture(scope="module")
def tiny_params(tiny_cfg):
    return llama.init_params(jax.random.PRNGKey(0), tiny_cfg)


def test_forward_shapes(tiny_cfg, tiny_params):
    B, T, S = 2, 32, 128
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, tiny_cfg.vocab_size, (B, T)),
        jnp.int32)
    cache = llama.new_kv_cache(tiny_cfg, B, S)
    logits, cache = llama.forward(tiny_params, tiny_cfg, tokens,
                                  jnp.zeros(B, jnp.int32), cache,
                                  use_pallas=False)
    assert logits.shape == (B, T, tiny_cfg.vocab_size)
    # head-major pool (see llama.new_kv_cache)
    assert cache.shape == (tiny_cfg.n_layers, 2, B, tiny_cfg.n_kv_heads,
                           S, tiny_cfg.head_dim)


def test_prefill_decode_consistency(tiny_cfg, tiny_params):
    """prefill(T) then decode(1) must equal prefill(T+1)."""
    B, S = 2, 128
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, tiny_cfg.vocab_size, (B, 33)),
                         jnp.int32)
    zero = jnp.zeros(B, jnp.int32)

    cache = llama.new_kv_cache(tiny_cfg, B, S)
    full_logits, _ = llama.forward(tiny_params, tiny_cfg, tokens, zero,
                                   cache, use_pallas=False)

    cache = llama.new_kv_cache(tiny_cfg, B, S)
    _, cache = llama.forward(tiny_params, tiny_cfg, tokens[:, :32], zero,
                             cache, use_pallas=False)
    step_logits, _ = llama.forward(tiny_params, tiny_cfg, tokens[:, 32:],
                                   jnp.full((B, ), 32, jnp.int32), cache,
                                   use_pallas=False)
    np.testing.assert_allclose(np.asarray(step_logits[:, 0]),
                               np.asarray(full_logits[:, -1]),
                               atol=2e-3, rtol=2e-3)


def test_pallas_matches_reference_attention(tiny_cfg, tiny_params):
    B, T, S = 2, 17, 64
    tokens = jnp.asarray(
        np.random.default_rng(2).integers(0, tiny_cfg.vocab_size, (B, T)),
        jnp.int32)
    cache = llama.new_kv_cache(tiny_cfg, B, S)
    zero = jnp.zeros(B, jnp.int32)
    ref, _ = llama.forward(tiny_params, tiny_cfg, tokens, zero, cache,
                           use_pallas=False)
    out, _ = llama.forward(tiny_params, tiny_cfg, tokens, zero, cache,
                           use_pallas=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2,
                               rtol=2e-2)


def test_matches_huggingface():
    """Bit-parity (to fp32 tolerance) with transformers' LlamaForCausalLM."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig as HFConfig
    from transformers import LlamaForCausalLM

    hf_cfg = HFConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=256,
                      rms_norm_eps=1e-5, rope_theta=10000.0,
                      tie_word_embeddings=False)
    torch.manual_seed(0)
    hf_model = LlamaForCausalLM(hf_cfg).eval().float()

    cfg = llama.LlamaConfig(vocab_size=128, dim=64, n_layers=2, n_heads=4,
                            n_kv_heads=2, hidden_dim=128, max_seq_len=256,
                            dtype="float32")
    sd = hf_model.state_dict()

    def t(name):
        return np.asarray(sd[name].numpy().T)

    def stack(fmt):
        return jnp.asarray(np.stack([t(fmt.format(i)) for i in range(2)]))

    def stack_vec(fmt):
        return jnp.asarray(
            np.stack([np.asarray(sd[fmt.format(i)].numpy())
                      for i in range(2)]))

    params = {
        "embed": jnp.asarray(sd["model.embed_tokens.weight"].numpy()),
        "layers": {
            "attn_norm": stack_vec("model.layers.{}.input_layernorm.weight"),
            "wq": stack("model.layers.{}.self_attn.q_proj.weight"),
            "wk": stack("model.layers.{}.self_attn.k_proj.weight"),
            "wv": stack("model.layers.{}.self_attn.v_proj.weight"),
            "wo": stack("model.layers.{}.self_attn.o_proj.weight"),
            "mlp_norm":
            stack_vec("model.layers.{}.post_attention_layernorm.weight"),
            "w_gate": stack("model.layers.{}.mlp.gate_proj.weight"),
            "w_up": stack("model.layers.{}.mlp.up_proj.weight"),
            "w_down": stack("model.layers.{}.mlp.down_proj.weight"),
        },
        "final_norm": jnp.asarray(sd["model.norm.weight"].numpy()),
        "lm_head": jnp.asarray(sd["lm_head.weight"].numpy().T),
    }

    B, T = 2, 19
    ids = np.random.default_rng(3).integers(0, 128, (B, T))
    with torch.no_grad():
        hf_logits = hf_model(torch.from_numpy(ids)).logits.numpy()

    cache = llama.new_kv_cache(cfg, B, 32)
    logits, _ = llama.forward(params, cfg, jnp.asarray(ids, jnp.int32),
                              jnp.zeros(B, jnp.int32), cache,
                              use_pallas=False)
    np.testing.assert_allclose(np.asarray(logits), hf_logits, atol=2e-3,
                               rtol=2e-3)


def test_matches_huggingface_qwen2():
    """Qwen family (QKV bias) parity with transformers' Qwen2ForCausalLM."""
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config, Qwen2ForCausalLM

    hf_cfg = Qwen2Config(vocab_size=128, hidden_size=64,
                         intermediate_size=128, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         max_position_embeddings=256, rms_norm_eps=1e-5,
                         rope_theta=10000.0, tie_word_embeddings=False,
                         attention_dropout=0.0)
    torch.manual_seed(1)
    hf_model = Qwen2ForCausalLM(hf_cfg).eval().float()
    sd = hf_model.state_dict()
    assert "model.layers.0.self_attn.q_proj.bias" in sd  # family trait

    cfg = llama.LlamaConfig(vocab_size=128, dim=64, n_layers=2, n_heads=4,
                            n_kv_heads=2, hidden_dim=128, max_seq_len=256,
                            dtype="float32", attention_bias=True)

    def t(name):
        return np.asarray(sd[name].numpy().T)

    def stack(fmt):
        return jnp.asarray(np.stack([t(fmt.format(i)) for i in range(2)]))

    def stack_vec(fmt):
        return jnp.asarray(
            np.stack([np.asarray(sd[fmt.format(i)].numpy())
                      for i in range(2)]))

    params = {
        "embed": jnp.asarray(sd["model.embed_tokens.weight"].numpy()),
        "layers": {
            "attn_norm": stack_vec("model.layers.{}.input_layernorm.weight"),
            "wq": stack("model.layers.{}.self_attn.q_proj.weight"),
            "wk": stack("model.layers.{}.self_attn.k_proj.weight"),
            "wv": stack("model.layers.{}.self_attn.v_proj.weight"),
            "bq": stack_vec("model.layers.{}.self_attn.q_proj.bias"),
            "bk": stack_vec("model.layers.{}.self_attn.k_proj.bias"),
            "bv": stack_vec("model.layers.{}.self_attn.v_proj.bias"),
            "wo": stack("model.layers.{}.self_attn.o_proj.weight"),
            "mlp_norm":
            stack_vec("model.layers.{}.post_attention_layernorm.weight"),
            "w_gate": stack("model.layers.{}.mlp.gate_proj.weight"),
            "w_up": stack("model.layers.{}.mlp.up_proj.weight"),
            "w_down": stack("model.layers.{}.mlp.down_proj.weight"),
        },
        "final_norm": jnp.asarray(sd["model.norm.weight"].numpy()),
        "lm_head": jnp.asarray(sd["lm_head.weight"].numpy().T),
    }

    B, T = 2, 13
    ids = np.random.default_rng(5).integers(0, 128, (B, T))
    with torch.no_grad():
        hf_logits = hf_model(torch.from_numpy(ids)).logits.numpy()
    cache = llama.new_kv_cache(cfg, B, 32)
    logits, _ = llama.forward(params, cfg, jnp.asarray(ids, jnp.int32),
                              jnp.zeros(B, jnp.int32), cache,
                              use_pallas=False)
    np.testing.assert_allclose(np.asarray(logits), hf_logits, atol=2e-3,
                               rtol=2e-3)


def test_sliding_window_attention():
    """Sliding-window masking: kernel vs reference vs manual dense mask,
    and a full forward on a windowed config."""
    from lmcache_tpu.ops.attention import flash_attention, mha_reference
    rng = np.random.default_rng(11)
    B, T, H, D, Hkv, S, W = 1, 48, 4, 64, 2, 64, 16
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.float32)
    zero = jnp.zeros(B, jnp.int32)
    kvl = jnp.full((B,), T, jnp.int32)

    ref_w = mha_reference(q, k, v, zero, kvl, sliding_window=W)
    out_w = flash_attention(q, k, v, zero, kvl, sliding_window=W)
    np.testing.assert_allclose(np.asarray(out_w), np.asarray(ref_w),
                               atol=2e-5, rtol=2e-5)
    # windowed != full attention once T > W
    ref_full = mha_reference(q, k, v, zero, kvl)
    assert np.abs(np.asarray(ref_w) - np.asarray(ref_full)).max() > 1e-3
    # token positions < W see no difference
    np.testing.assert_allclose(np.asarray(ref_w[:, :W]),
                               np.asarray(ref_full[:, :W]), atol=1e-6)

    cfg = llama.LlamaConfig.tiny(n_layers=2, sliding_window=16)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 40)),
                         jnp.int32)
    cache = llama.new_kv_cache(cfg, 1, 64)
    logits, _ = llama.forward(params, cfg, tokens,
                              jnp.zeros(1, jnp.int32), cache,
                              use_pallas=False)
    assert logits.shape == (1, 40, cfg.vocab_size)


def test_matches_huggingface_glm():
    """GLM family (interleaved partial rotary, qkv bias, fused gate_up
    MLP) parity with transformers' GlmForCausalLM."""
    torch = pytest.importorskip("torch")
    from transformers import GlmConfig, GlmForCausalLM

    hf_cfg = GlmConfig(vocab_size=128, hidden_size=256,
                       intermediate_size=128, num_hidden_layers=2,
                       num_attention_heads=4, num_key_value_heads=2,
                       head_dim=64, partial_rotary_factor=0.5,
                       max_position_embeddings=256, rms_norm_eps=1e-5,
                       rope_theta=10000.0, tie_word_embeddings=False,
                       attention_bias=True, attention_dropout=0.0,
                       pad_token_id=0)
    torch.manual_seed(2)
    hf_model = GlmForCausalLM(hf_cfg).eval().float()
    sd = hf_model.state_dict()
    assert "model.layers.0.mlp.gate_up_proj.weight" in sd  # family trait

    cfg = llama.LlamaConfig(vocab_size=128, dim=256, n_layers=2, n_heads=4,
                            n_kv_heads=2, hidden_dim=128, max_seq_len=256,
                            dtype="float32", attention_bias=True,
                            rotary_dim=32, rope_interleaved=True)

    def t(name):
        return np.asarray(sd[name].numpy().T)

    def stack(fmt):
        return jnp.asarray(np.stack([t(fmt.format(i)) for i in range(2)]))

    def stack_vec(fmt):
        return jnp.asarray(
            np.stack([np.asarray(sd[fmt.format(i)].numpy())
                      for i in range(2)]))

    fused = [t(f"model.layers.{i}.mlp.gate_up_proj.weight")
             for i in range(2)]  # [dim, 2*hidden]
    params = {
        "embed": jnp.asarray(sd["model.embed_tokens.weight"].numpy()),
        "layers": {
            "attn_norm": stack_vec("model.layers.{}.input_layernorm.weight"),
            "wq": stack("model.layers.{}.self_attn.q_proj.weight"),
            "wk": stack("model.layers.{}.self_attn.k_proj.weight"),
            "wv": stack("model.layers.{}.self_attn.v_proj.weight"),
            "bq": stack_vec("model.layers.{}.self_attn.q_proj.bias"),
            "bk": stack_vec("model.layers.{}.self_attn.k_proj.bias"),
            "bv": stack_vec("model.layers.{}.self_attn.v_proj.bias"),
            "wo": stack("model.layers.{}.self_attn.o_proj.weight"),
            "mlp_norm":
            stack_vec("model.layers.{}.post_attention_layernorm.weight"),
            "w_gate": jnp.asarray(
                np.stack([f[:, :cfg.hidden_dim] for f in fused])),
            "w_up": jnp.asarray(
                np.stack([f[:, cfg.hidden_dim:] for f in fused])),
            "w_down": stack("model.layers.{}.mlp.down_proj.weight"),
        },
        "final_norm": jnp.asarray(sd["model.norm.weight"].numpy()),
        "lm_head": jnp.asarray(sd["lm_head.weight"].numpy().T),
    }

    B, T = 2, 19
    ids = np.random.default_rng(5).integers(0, 128, (B, T))
    with torch.no_grad():
        hf_logits = hf_model(torch.from_numpy(ids)).logits.numpy()

    cache = llama.new_kv_cache(cfg, B, 32)
    logits, cache = llama.forward(params, cfg, jnp.asarray(ids, jnp.int32),
                                  jnp.zeros(B, jnp.int32), cache,
                                  use_pallas=False)
    np.testing.assert_allclose(np.asarray(logits), hf_logits, atol=2e-3,
                               rtol=2e-3)

    # decode continuation stays in-parity too (positions > 0 exercise the
    # interleaved partial rotary at non-trivial angles)
    ids2 = np.random.default_rng(6).integers(0, 128, (B, 1))
    with torch.no_grad():
        full = hf_model(
            torch.from_numpy(np.concatenate([ids, ids2], 1))).logits.numpy()
    step, _ = llama.forward(params, cfg, jnp.asarray(ids2, jnp.int32),
                            jnp.full((B,), T, jnp.int32), cache,
                            use_pallas=False)
    np.testing.assert_allclose(np.asarray(step[:, 0]), full[:, -1],
                               atol=2e-3, rtol=2e-3)


def test_matches_huggingface_glm4():
    """Glm4-0414 family: GLM traits plus sandwich norms
    (post_self_attn_layernorm / post_mlp_layernorm on the block outputs
    before the residual add — modeling_glm4.py)."""
    torch = pytest.importorskip("torch")
    from transformers import Glm4Config, Glm4ForCausalLM

    hf_cfg = Glm4Config(vocab_size=128, hidden_size=256,
                        intermediate_size=128, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=2,
                        head_dim=64, partial_rotary_factor=0.5,
                        max_position_embeddings=256, rms_norm_eps=1e-5,
                        rope_theta=10000.0, tie_word_embeddings=False,
                        attention_bias=True, attention_dropout=0.0,
                        pad_token_id=0)
    torch.manual_seed(4)
    hf_model = Glm4ForCausalLM(hf_cfg).eval().float()
    sd = hf_model.state_dict()
    assert "model.layers.0.post_self_attn_layernorm.weight" in sd
    # break the norms away from identity so the test can't pass without
    # applying them
    with torch.no_grad():
        for i in range(2):
            sd[f"model.layers.{i}.post_self_attn_layernorm.weight"].mul_(
                1.0 + 0.1 * (i + 1))
            sd[f"model.layers.{i}.post_mlp_layernorm.weight"].mul_(
                1.0 - 0.05 * (i + 1))

    cfg = llama.LlamaConfig(vocab_size=128, dim=256, n_layers=2, n_heads=4,
                            n_kv_heads=2, hidden_dim=128, max_seq_len=256,
                            dtype="float32", attention_bias=True,
                            rotary_dim=32, rope_interleaved=True,
                            post_norms=True)

    def t(name):
        return np.asarray(sd[name].numpy().T)

    def stack(fmt):
        return jnp.asarray(np.stack([t(fmt.format(i)) for i in range(2)]))

    def stack_vec(fmt):
        return jnp.asarray(
            np.stack([np.asarray(sd[fmt.format(i)].numpy())
                      for i in range(2)]))

    fused = [t(f"model.layers.{i}.mlp.gate_up_proj.weight")
             for i in range(2)]
    params = {
        "embed": jnp.asarray(sd["model.embed_tokens.weight"].numpy()),
        "layers": {
            "attn_norm": stack_vec("model.layers.{}.input_layernorm.weight"),
            "wq": stack("model.layers.{}.self_attn.q_proj.weight"),
            "wk": stack("model.layers.{}.self_attn.k_proj.weight"),
            "wv": stack("model.layers.{}.self_attn.v_proj.weight"),
            "bq": stack_vec("model.layers.{}.self_attn.q_proj.bias"),
            "bk": stack_vec("model.layers.{}.self_attn.k_proj.bias"),
            "bv": stack_vec("model.layers.{}.self_attn.v_proj.bias"),
            "wo": stack("model.layers.{}.self_attn.o_proj.weight"),
            "mlp_norm":
            stack_vec("model.layers.{}.post_attention_layernorm.weight"),
            "post_attn_norm": stack_vec(
                "model.layers.{}.post_self_attn_layernorm.weight"),
            "post_mlp_norm": stack_vec(
                "model.layers.{}.post_mlp_layernorm.weight"),
            "w_gate": jnp.asarray(
                np.stack([f[:, :cfg.hidden_dim] for f in fused])),
            "w_up": jnp.asarray(
                np.stack([f[:, cfg.hidden_dim:] for f in fused])),
            "w_down": stack("model.layers.{}.mlp.down_proj.weight"),
        },
        "final_norm": jnp.asarray(sd["model.norm.weight"].numpy()),
        "lm_head": jnp.asarray(sd["lm_head.weight"].numpy().T),
    }

    B, T = 2, 17
    ids = np.random.default_rng(9).integers(0, 128, (B, T))
    with torch.no_grad():
        hf_logits = hf_model(torch.from_numpy(ids)).logits.numpy()
    cache = llama.new_kv_cache(cfg, B, 32)
    logits, _ = llama.forward(params, cfg, jnp.asarray(ids, jnp.int32),
                              jnp.zeros(B, jnp.int32), cache,
                              use_pallas=False)
    np.testing.assert_allclose(np.asarray(logits), hf_logits, atol=2e-3,
                               rtol=2e-3)

    # paged path applies the same sandwich norms
    from lmcache_tpu.models.paged import forward_paged, new_paged_kv_pool
    pool = new_paged_kv_pool(cfg, 16, 16)
    table = np.zeros((B, 4), np.int32)
    for b in range(B):
        for j in range(2):
            table[b, j] = 1 + b * 2 + j
    plogits, _ = forward_paged(params, cfg, jnp.asarray(ids, jnp.int32),
                               jnp.zeros(B, jnp.int32), pool,
                               jnp.asarray(table), use_pallas=False)
    np.testing.assert_allclose(np.asarray(plogits), hf_logits, atol=2e-3,
                               rtol=2e-3)


def test_matches_huggingface_qwen3():
    """Qwen3 family: per-head q/k RMSNorm before RoPE and a head_dim
    decoupled from dim // n_heads (modeling_qwen3.py)."""
    torch = pytest.importorskip("torch")
    from transformers import Qwen3Config, Qwen3ForCausalLM

    # hidden 128 with 4 heads but head_dim 64: exercises the override
    hf_cfg = Qwen3Config(vocab_size=128, hidden_size=128,
                         intermediate_size=256, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         head_dim=64, max_position_embeddings=256,
                         rms_norm_eps=1e-5, rope_theta=10000.0,
                         tie_word_embeddings=False, attention_bias=False,
                         attention_dropout=0.0, pad_token_id=0)
    torch.manual_seed(6)
    hf_model = Qwen3ForCausalLM(hf_cfg).eval().float()
    sd = hf_model.state_dict()
    assert "model.layers.0.self_attn.q_norm.weight" in sd
    with torch.no_grad():  # break the norms away from identity
        for i in range(2):
            sd[f"model.layers.{i}.self_attn.q_norm.weight"].mul_(1.1 + i / 10)
            sd[f"model.layers.{i}.self_attn.k_norm.weight"].mul_(0.9 - i / 10)

    cfg = llama.LlamaConfig(vocab_size=128, dim=128, n_layers=2, n_heads=4,
                            n_kv_heads=2, hidden_dim=256, max_seq_len=256,
                            dtype="float32", qk_norm=True,
                            head_dim_override=64)
    assert cfg.head_dim == 64 != cfg.dim // cfg.n_heads

    def t(name):
        return np.asarray(sd[name].numpy().T)

    def stack(fmt):
        return jnp.asarray(np.stack([t(fmt.format(i)) for i in range(2)]))

    def stack_vec(fmt):
        return jnp.asarray(
            np.stack([np.asarray(sd[fmt.format(i)].numpy())
                      for i in range(2)]))

    params = {
        "embed": jnp.asarray(sd["model.embed_tokens.weight"].numpy()),
        "layers": {
            "attn_norm": stack_vec("model.layers.{}.input_layernorm.weight"),
            "wq": stack("model.layers.{}.self_attn.q_proj.weight"),
            "wk": stack("model.layers.{}.self_attn.k_proj.weight"),
            "wv": stack("model.layers.{}.self_attn.v_proj.weight"),
            "wo": stack("model.layers.{}.self_attn.o_proj.weight"),
            "q_norm": stack_vec("model.layers.{}.self_attn.q_norm.weight"),
            "k_norm": stack_vec("model.layers.{}.self_attn.k_norm.weight"),
            "mlp_norm":
            stack_vec("model.layers.{}.post_attention_layernorm.weight"),
            "w_gate": stack("model.layers.{}.mlp.gate_proj.weight"),
            "w_up": stack("model.layers.{}.mlp.up_proj.weight"),
            "w_down": stack("model.layers.{}.mlp.down_proj.weight"),
        },
        "final_norm": jnp.asarray(sd["model.norm.weight"].numpy()),
        "lm_head": jnp.asarray(sd["lm_head.weight"].numpy().T),
    }

    B, T = 2, 15
    ids = np.random.default_rng(12).integers(0, 128, (B, T))
    with torch.no_grad():
        hf_logits = hf_model(torch.from_numpy(ids)).logits.numpy()
    cache = llama.new_kv_cache(cfg, B, 32)
    logits, _ = llama.forward(params, cfg, jnp.asarray(ids, jnp.int32),
                              jnp.zeros(B, jnp.int32), cache,
                              use_pallas=False)
    np.testing.assert_allclose(np.asarray(logits), hf_logits, atol=2e-3,
                               rtol=2e-3)

    # paged + quantized paths share _qkv_heads; check paged end-to-end
    from lmcache_tpu.models.paged import forward_paged, new_paged_kv_pool
    pool = new_paged_kv_pool(cfg, 16, 16)
    table = np.zeros((B, 4), np.int32)
    for b in range(B):
        table[b, 0] = 1 + b
    plogits, _ = forward_paged(params, cfg, jnp.asarray(ids, jnp.int32),
                               jnp.zeros(B, jnp.int32), pool,
                               jnp.asarray(table), use_pallas=False)
    np.testing.assert_allclose(np.asarray(plogits), hf_logits, atol=2e-3,
                               rtol=2e-3)


def _stack_layers(sd, n_layers, fmt):
    return jnp.asarray(
        np.stack([np.asarray(sd[fmt.format(i)].numpy().T)
                  for i in range(n_layers)]))


def _stack_vecs(sd, n_layers, fmt):
    return jnp.asarray(
        np.stack([np.asarray(sd[fmt.format(i)].numpy())
                  for i in range(n_layers)]))


def _stack_experts(sd, n_layers, n_experts, fmt):
    return jnp.asarray(
        np.stack([
            np.stack([np.asarray(sd[fmt.format(i, e)].numpy().T)
                      for e in range(n_experts)])
            for i in range(n_layers)
        ]))


def test_matches_huggingface_qwen3_moe():
    """Qwen3-MoE: softmax router, top-k experts, renormalized probs,
    plus the family's qk-norm (modeling_qwen3_moe.py)."""
    torch = pytest.importorskip("torch")
    from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM

    L, E = 2, 4
    hf_cfg = Qwen3MoeConfig(vocab_size=128, hidden_size=128,
                            intermediate_size=256, num_hidden_layers=L,
                            num_attention_heads=4, num_key_value_heads=2,
                            head_dim=32, max_position_embeddings=256,
                            rms_norm_eps=1e-5, rope_theta=10000.0,
                            tie_word_embeddings=False,
                            attention_bias=False, attention_dropout=0.0,
                            num_experts=E, num_experts_per_tok=2,
                            moe_intermediate_size=64, norm_topk_prob=True,
                            decoder_sparse_step=1, mlp_only_layers=[],
                            pad_token_id=0)
    torch.manual_seed(8)
    hf_model = Qwen3MoeForCausalLM(hf_cfg).eval().float()
    sd = hf_model.state_dict()
    assert "model.layers.0.mlp.gate.weight" in sd  # router

    cfg = llama.LlamaConfig(vocab_size=128, dim=128, n_layers=L, n_heads=4,
                            n_kv_heads=2, hidden_dim=256, max_seq_len=256,
                            dtype="float32", qk_norm=True,
                            head_dim_override=32, n_experts=E,
                            n_experts_per_tok=2, moe_hidden_dim=64,
                            norm_topk_prob=True)

    params = {
        "embed": jnp.asarray(sd["model.embed_tokens.weight"].numpy()),
        "layers": {
            "attn_norm": _stack_vecs(
                sd, L, "model.layers.{}.input_layernorm.weight"),
            "wq": _stack_layers(
                sd, L, "model.layers.{}.self_attn.q_proj.weight"),
            "wk": _stack_layers(
                sd, L, "model.layers.{}.self_attn.k_proj.weight"),
            "wv": _stack_layers(
                sd, L, "model.layers.{}.self_attn.v_proj.weight"),
            "wo": _stack_layers(
                sd, L, "model.layers.{}.self_attn.o_proj.weight"),
            "q_norm": _stack_vecs(
                sd, L, "model.layers.{}.self_attn.q_norm.weight"),
            "k_norm": _stack_vecs(
                sd, L, "model.layers.{}.self_attn.k_norm.weight"),
            "mlp_norm": _stack_vecs(
                sd, L, "model.layers.{}.post_attention_layernorm.weight"),
            "router": _stack_layers(
                sd, L, "model.layers.{}.mlp.gate.weight"),
            "e_gate": _stack_experts(
                sd, L, E, "model.layers.{}.mlp.experts.{}.gate_proj.weight"),
            "e_up": _stack_experts(
                sd, L, E, "model.layers.{}.mlp.experts.{}.up_proj.weight"),
            "e_down": _stack_experts(
                sd, L, E, "model.layers.{}.mlp.experts.{}.down_proj.weight"),
        },
        "final_norm": jnp.asarray(sd["model.norm.weight"].numpy()),
        "lm_head": jnp.asarray(sd["lm_head.weight"].numpy().T),
    }

    B, T = 2, 15
    ids = np.random.default_rng(13).integers(0, 128, (B, T))
    with torch.no_grad():
        hf_logits = hf_model(torch.from_numpy(ids)).logits.numpy()
    cache = llama.new_kv_cache(cfg, B, 32)
    logits, _ = llama.forward(params, cfg, jnp.asarray(ids, jnp.int32),
                              jnp.zeros(B, jnp.int32), cache,
                              use_pallas=False)
    np.testing.assert_allclose(np.asarray(logits), hf_logits, atol=2e-3,
                               rtol=2e-3)


def test_matches_huggingface_mixtral():
    """Mixtral: softmax over top-k logits == renormalized top-k of the
    full softmax (one implementation covers both MoE conventions)."""
    torch = pytest.importorskip("torch")
    from transformers import MixtralConfig, MixtralForCausalLM

    L, E = 2, 4
    hf_cfg = MixtralConfig(vocab_size=128, hidden_size=128,
                           intermediate_size=64, num_hidden_layers=L,
                           num_attention_heads=4, num_key_value_heads=2,
                           max_position_embeddings=256, rms_norm_eps=1e-5,
                           rope_theta=10000.0, tie_word_embeddings=False,
                           attention_dropout=0.0, num_local_experts=E,
                           num_experts_per_tok=2, sliding_window=None,
                           output_router_logits=False, pad_token_id=0)
    torch.manual_seed(10)
    hf_model = MixtralForCausalLM(hf_cfg).eval().float()
    sd = hf_model.state_dict()
    assert "model.layers.0.block_sparse_moe.gate.weight" in sd

    cfg = llama.LlamaConfig(vocab_size=128, dim=128, n_layers=L, n_heads=4,
                            n_kv_heads=2, hidden_dim=64, max_seq_len=256,
                            dtype="float32", n_experts=E,
                            n_experts_per_tok=2, norm_topk_prob=True)

    base = "model.layers.{}.block_sparse_moe."
    params = {
        "embed": jnp.asarray(sd["model.embed_tokens.weight"].numpy()),
        "layers": {
            "attn_norm": _stack_vecs(
                sd, L, "model.layers.{}.input_layernorm.weight"),
            "wq": _stack_layers(
                sd, L, "model.layers.{}.self_attn.q_proj.weight"),
            "wk": _stack_layers(
                sd, L, "model.layers.{}.self_attn.k_proj.weight"),
            "wv": _stack_layers(
                sd, L, "model.layers.{}.self_attn.v_proj.weight"),
            "wo": _stack_layers(
                sd, L, "model.layers.{}.self_attn.o_proj.weight"),
            "mlp_norm": _stack_vecs(
                sd, L, "model.layers.{}.post_attention_layernorm.weight"),
            "router": _stack_layers(sd, L, base + "gate.weight"),
            "e_gate": _stack_experts(
                sd, L, E, base.replace("{}", "{0}") + "experts.{1}.w1.weight"),
            "e_up": _stack_experts(
                sd, L, E, base.replace("{}", "{0}") + "experts.{1}.w3.weight"),
            "e_down": _stack_experts(
                sd, L, E, base.replace("{}", "{0}") + "experts.{1}.w2.weight"),
        },
        "final_norm": jnp.asarray(sd["model.norm.weight"].numpy()),
        "lm_head": jnp.asarray(sd["lm_head.weight"].numpy().T),
    }

    B, T = 2, 14
    ids = np.random.default_rng(14).integers(0, 128, (B, T))
    with torch.no_grad():
        hf_logits = hf_model(torch.from_numpy(ids)).logits.numpy()
    cache = llama.new_kv_cache(cfg, B, 32)
    logits, _ = llama.forward(params, cfg, jnp.asarray(ids, jnp.int32),
                              jnp.zeros(B, jnp.int32), cache,
                              use_pallas=False)
    np.testing.assert_allclose(np.asarray(logits), hf_logits, atol=2e-3,
                               rtol=2e-3)

    # MoE serves end-to-end: dense and paged engines agree greedily
    from lmcache_tpu.serving import SamplingParams, ServingEngine
    from lmcache_tpu.serving.paged_engine import PagedServingEngine
    prompt = np.random.default_rng(15).integers(0, 128, 21, dtype=np.int32)
    [r] = ServingEngine(cfg, params, max_batch=2, max_seq=64,
                        use_pallas=False).generate(
                            [prompt], SamplingParams(max_new_tokens=5))
    [p] = PagedServingEngine(cfg, params, max_batch=2, max_seq=64,
                             num_pages=16, page_size=16,
                             use_pallas=False).generate(
                                 [prompt], SamplingParams(max_new_tokens=5))
    assert r.output_tokens == p.output_tokens and len(r.output_tokens) == 5


@pytest.mark.parametrize("rs_kw,hf_rs", [
    (dict(rope_scaling_type="linear", rope_scaling_factor=4.0,
          rope_original_max_seq=64),
     {"rope_type": "linear", "factor": 4.0}),
    (dict(rope_scaling_type="llama3", rope_scaling_factor=8.0,
          rope_low_freq_factor=1.0, rope_high_freq_factor=4.0,
          rope_original_max_seq=64),
     {"rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
      "high_freq_factor": 4.0, "original_max_position_embeddings": 64}),
    (dict(rope_scaling_type="yarn", rope_scaling_factor=4.0,
          rope_beta_fast=32.0, rope_beta_slow=1.0,
          rope_original_max_seq=64),
     {"rope_type": "yarn", "factor": 4.0, "beta_fast": 32.0,
      "beta_slow": 1.0, "original_max_position_embeddings": 64}),
])
def test_rope_scaling_matches_huggingface(rs_kw, hf_rs):
    """Context-extension rope scaling: linear (longchat-style position
    condensation) and llama3 (llama-3.1's frequency-dependent scheme)
    match transformers' rotary implementation."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig as HFConfig
    from transformers import LlamaForCausalLM

    L = 2
    hf_cfg = HFConfig(vocab_size=128, hidden_size=64,
                      intermediate_size=128, num_hidden_layers=L,
                      num_attention_heads=4, num_key_value_heads=2,
                      max_position_embeddings=256, rms_norm_eps=1e-5,
                      rope_theta=10000.0, tie_word_embeddings=False,
                      rope_scaling=dict(hf_rs))
    torch.manual_seed(20)
    hf_model = LlamaForCausalLM(hf_cfg).eval().float()
    sd = hf_model.state_dict()

    cfg = llama.LlamaConfig(vocab_size=128, dim=64, n_layers=L, n_heads=4,
                            n_kv_heads=2, hidden_dim=128, max_seq_len=256,
                            dtype="float32", **rs_kw)
    params = {
        "embed": jnp.asarray(sd["model.embed_tokens.weight"].numpy()),
        "layers": {
            "attn_norm": _stack_vecs(
                sd, L, "model.layers.{}.input_layernorm.weight"),
            "wq": _stack_layers(
                sd, L, "model.layers.{}.self_attn.q_proj.weight"),
            "wk": _stack_layers(
                sd, L, "model.layers.{}.self_attn.k_proj.weight"),
            "wv": _stack_layers(
                sd, L, "model.layers.{}.self_attn.v_proj.weight"),
            "wo": _stack_layers(
                sd, L, "model.layers.{}.self_attn.o_proj.weight"),
            "mlp_norm": _stack_vecs(
                sd, L, "model.layers.{}.post_attention_layernorm.weight"),
            "w_gate": _stack_layers(
                sd, L, "model.layers.{}.mlp.gate_proj.weight"),
            "w_up": _stack_layers(
                sd, L, "model.layers.{}.mlp.up_proj.weight"),
            "w_down": _stack_layers(
                sd, L, "model.layers.{}.mlp.down_proj.weight"),
        },
        "final_norm": jnp.asarray(sd["model.norm.weight"].numpy()),
        "lm_head": jnp.asarray(sd["lm_head.weight"].numpy().T),
    }

    # long enough that scaled and unscaled rotary diverge hard
    B, T = 2, 96
    ids = np.random.default_rng(21).integers(0, 128, (B, T))
    with torch.no_grad():
        hf_logits = hf_model(torch.from_numpy(ids)).logits.numpy()
    cache = llama.new_kv_cache(cfg, B, 128)
    logits, _ = llama.forward(params, cfg, jnp.asarray(ids, jnp.int32),
                              jnp.zeros(B, jnp.int32), cache,
                              use_pallas=False)
    np.testing.assert_allclose(np.asarray(logits), hf_logits, atol=2e-3,
                               rtol=2e-3)

    # the scaling is load-bearing: scaled and unscaled rotations of the
    # same keys diverge at long positions (random-init logits are too
    # diffuse to witness this, so check at the rope level)
    x = jnp.asarray(np.random.default_rng(22).standard_normal(
        (1, 4, 2, 16)), jnp.float32)
    pos = jnp.arange(60, 64)[None]
    scaled = llama._rope(x, pos, 10000.0, scaling=cfg.rope_scaling_spec)
    unscaled = llama._rope(x, pos, 10000.0)
    assert np.abs(np.asarray(scaled) - np.asarray(unscaled)).max() > 0.1


def test_blend_shift_respects_rope_scaling():
    """rope_shift_keys at scaled frequencies: keys roped at position 0
    then shifted by delta must equal keys roped at delta directly."""
    from lmcache_tpu import blend
    rng = np.random.default_rng(23)
    T, H, D = 8, 2, 32
    x = jnp.asarray(rng.standard_normal((1, T, H, D)), jnp.float32)
    scaling = ("llama3", 8.0, 1.0, 4.0, 64)
    at_pos9 = llama._rope(x, jnp.arange(9, 9 + T)[None], 10000.0,
                          scaling=scaling)
    at_pos0 = llama._rope(x, jnp.arange(T)[None], 10000.0,
                          scaling=scaling)
    shifted = blend.rope_shift_keys(at_pos0[0], jnp.full((T,), 9.0),
                                    10000.0, scaling=scaling)
    np.testing.assert_allclose(np.asarray(shifted), np.asarray(at_pos9[0]),
                               atol=1e-5, rtol=1e-5)
    # and an unscaled shift over scaled keys is wrong
    bad = blend.rope_shift_keys(at_pos0[0], jnp.full((T,), 9.0), 10000.0)
    assert np.abs(np.asarray(bad) - np.asarray(at_pos9[0])).max() > 1e-3

    # yarn: keys already carry the attention-temperature mscale from
    # their original roping; the shift must rotate at yarn frequencies
    # WITHOUT reapplying mscale
    yscaling = ("yarn", 4.0, 1.0, 4.0, 64, 32.0, 1.0, None)
    y_pos9 = llama._rope(x, jnp.arange(9, 9 + T)[None], 10000.0,
                         scaling=yscaling)
    y_pos0 = llama._rope(x, jnp.arange(T)[None], 10000.0, scaling=yscaling)
    yshift = blend.rope_shift_keys(y_pos0[0], jnp.full((T,), 9.0),
                                   10000.0, scaling=yscaling)
    np.testing.assert_allclose(np.asarray(yshift), np.asarray(y_pos9[0]),
                               atol=1e-5, rtol=1e-5)


def test_matches_huggingface_gemma2():
    """Gemma-2: GeGLU, (1+w) RMSNorms, sqrt(dim)-scaled embeddings,
    sandwich norms, alternating sliding/global attention (pattern 2),
    attention + final logit softcapping, and a query_pre_attn_scalar
    score scale (HF modeling_gemma2.py; eager attention for softcap)."""
    torch = pytest.importorskip("torch")
    from transformers import Gemma2Config, Gemma2ForCausalLM

    L = 4  # layers 0/2 sliding, 1/3 global
    hf_cfg = Gemma2Config(vocab_size=128, hidden_size=64,
                          intermediate_size=128, num_hidden_layers=L,
                          num_attention_heads=4, num_key_value_heads=2,
                          head_dim=16, max_position_embeddings=256,
                          rms_norm_eps=1e-6, rope_theta=10000.0,
                          attention_bias=False, attention_dropout=0.0,
                          hidden_activation="gelu_pytorch_tanh",
                          query_pre_attn_scalar=24.0, sliding_window=16,
                          attn_logit_softcapping=50.0,
                          final_logit_softcapping=30.0, pad_token_id=0,
                          attn_implementation="eager")
    torch.manual_seed(33)
    hf_model = Gemma2ForCausalLM(hf_cfg).eval().float()
    sd = hf_model.state_dict()
    assert "model.layers.0.pre_feedforward_layernorm.weight" in sd

    cfg = llama.LlamaConfig(vocab_size=128, dim=64, n_layers=L, n_heads=4,
                            n_kv_heads=2, hidden_dim=128, max_seq_len=256,
                            dtype="float32", norm_eps=1e-6,
                            head_dim_override=16, mlp_act="gelu_tanh",
                            norm_one_offset=True, embed_scale=True,
                            post_norms=True, attn_logit_softcap=50.0,
                            final_logit_softcap=30.0,
                            query_pre_attn_scalar=24.0, sliding_window=16,
                            sliding_window_pattern=2)
    assert list(cfg.layer_windows()) == [False, True, False, True]

    params = {
        "embed": jnp.asarray(sd["model.embed_tokens.weight"].numpy()),
        "layers": {
            "attn_norm": _stack_vecs(
                sd, L, "model.layers.{}.input_layernorm.weight"),
            "wq": _stack_layers(
                sd, L, "model.layers.{}.self_attn.q_proj.weight"),
            "wk": _stack_layers(
                sd, L, "model.layers.{}.self_attn.k_proj.weight"),
            "wv": _stack_layers(
                sd, L, "model.layers.{}.self_attn.v_proj.weight"),
            "wo": _stack_layers(
                sd, L, "model.layers.{}.self_attn.o_proj.weight"),
            "post_attn_norm": _stack_vecs(
                sd, L, "model.layers.{}.post_attention_layernorm.weight"),
            "mlp_norm": _stack_vecs(
                sd, L, "model.layers.{}.pre_feedforward_layernorm.weight"),
            "post_mlp_norm": _stack_vecs(
                sd, L, "model.layers.{}.post_feedforward_layernorm.weight"),
            "w_gate": _stack_layers(
                sd, L, "model.layers.{}.mlp.gate_proj.weight"),
            "w_up": _stack_layers(
                sd, L, "model.layers.{}.mlp.up_proj.weight"),
            "w_down": _stack_layers(
                sd, L, "model.layers.{}.mlp.down_proj.weight"),
        },
        "final_norm": jnp.asarray(sd["model.norm.weight"].numpy()),
        # tied embeddings
        "lm_head": jnp.asarray(sd["model.embed_tokens.weight"].numpy().T),
    }

    B, T = 2, 48  # T > sliding_window so local/global layers diverge
    ids = np.random.default_rng(34).integers(0, 128, (B, T))
    with torch.no_grad():
        hf_logits = hf_model(torch.from_numpy(ids)).logits.numpy()
    cache = llama.new_kv_cache(cfg, B, 64)
    logits, cache = llama.forward(params, cfg, jnp.asarray(ids, jnp.int32),
                                  jnp.zeros(B, jnp.int32), cache,
                                  use_pallas=False)
    np.testing.assert_allclose(np.asarray(logits), hf_logits, atol=2e-3,
                               rtol=2e-3)

    # the alternating pattern is load-bearing: all-sliding diverges
    uni = llama.LlamaConfig(**{**cfg.__dict__,
                               "sliding_window_pattern": None})
    bad, _ = llama.forward(params, uni, jnp.asarray(ids, jnp.int32),
                           jnp.zeros(B, jnp.int32),
                           llama.new_kv_cache(uni, B, 64),
                           use_pallas=False)
    assert np.abs(np.asarray(bad) - hf_logits).max() > 1e-2

    # prefill+decode equals one-shot (cache semantics under the pattern)
    cache2 = llama.new_kv_cache(cfg, B, 64)
    l1, cache2 = llama.forward(params, cfg,
                               jnp.asarray(ids[:, :T - 1], jnp.int32),
                               jnp.zeros(B, jnp.int32), cache2,
                               use_pallas=False)
    l2, _ = llama.forward(params, cfg, jnp.asarray(ids[:, T - 1:],
                                                   jnp.int32),
                          jnp.full((B,), T - 1, jnp.int32), cache2,
                          use_pallas=False)
    np.testing.assert_allclose(np.asarray(l2[:, 0]),
                               np.asarray(logits[:, -1]), atol=1e-4,
                               rtol=1e-4)

    # serving: dense and paged engines agree greedily
    from lmcache_tpu.serving import SamplingParams, ServingEngine
    from lmcache_tpu.serving.paged_engine import PagedServingEngine
    prompt = np.random.default_rng(35).integers(0, 128, 21, dtype=np.int32)
    [r] = ServingEngine(cfg, params, max_batch=2, max_seq=64,
                        use_pallas=False).generate(
                            [prompt], SamplingParams(max_new_tokens=5))
    [p] = PagedServingEngine(cfg, params, max_batch=2, max_seq=64,
                             num_pages=16, page_size=16,
                             use_pallas=False).generate(
                                 [prompt], SamplingParams(max_new_tokens=5))
    assert r.output_tokens == p.output_tokens and len(r.output_tokens) == 5


def test_matches_huggingface_gemma3(tmp_path):
    """Gemma-3 (text stack) end-to-end through load_hf: Gemma-2 traits
    minus softcaps, plus per-head (1+w) qk-norm, explicit layer_types
    (5 sliding : 1 full), and DUAL-THETA rotary — sliding layers rope at
    rope_local_base_freq unscaled, global layers at rope_theta with
    linear scaling (HF modeling_gemma3 position_embeddings_local/
    _global)."""
    torch = pytest.importorskip("torch")
    from transformers import Gemma3ForCausalLM, Gemma3TextConfig

    L = 6  # default layer_types: 5 sliding_attention then full_attention
    hf_cfg = Gemma3TextConfig(vocab_size=128, hidden_size=64,
                              intermediate_size=128, num_hidden_layers=L,
                              num_attention_heads=4, num_key_value_heads=2,
                              head_dim=16, max_position_embeddings=256,
                              rms_norm_eps=1e-6, rope_theta=1000000.0,
                              rope_local_base_freq=10000.0,
                              rope_scaling={"rope_type": "linear",
                                            "factor": 4.0},
                              query_pre_attn_scalar=24.0, sliding_window=8,
                              attention_dropout=0.0, pad_token_id=0,
                              attn_implementation="eager")
    torch.manual_seed(44)
    hf_model = Gemma3ForCausalLM(hf_cfg).eval().float()
    sd = hf_model.state_dict()
    assert "model.layers.0.self_attn.q_norm.weight" in sd  # family trait
    path = tmp_path / "tiny-gemma3"
    hf_model.save_pretrained(path)

    import dataclasses
    cfg = dataclasses.replace(llama.LlamaConfig.from_hf(str(path)),
                              dtype="float32")
    assert cfg.rope_local_theta == 10000.0
    assert cfg.qk_norm and cfg.norm_one_offset and cfg.post_norms
    assert cfg.attn_logit_softcap is None
    assert cfg.global_layer_map == (False,) * 5 + (True,)
    assert list(cfg.layer_windows()) == [False] * 5 + [True]
    cfg, params = llama.load_hf(str(path), cfg)

    B, T = 2, 48  # T > window so local/global layers diverge
    ids = np.random.default_rng(45).integers(0, 128, (B, T))
    with torch.no_grad():
        hf_logits = hf_model(torch.from_numpy(ids)).logits.numpy()
    cache = llama.new_kv_cache(cfg, B, 64)
    logits, _ = llama.forward(params, cfg, jnp.asarray(ids, jnp.int32),
                              jnp.zeros(B, jnp.int32), cache,
                              use_pallas=False)
    np.testing.assert_allclose(np.asarray(logits), hf_logits, atol=2e-3,
                               rtol=2e-3)

    # the dual theta is load-bearing: roping every layer at the global
    # frequencies diverges
    import dataclasses as dc
    uni = dc.replace(cfg, rope_local_theta=None)
    bad, _ = llama.forward(params, uni, jnp.asarray(ids, jnp.int32),
                           jnp.zeros(B, jnp.int32),
                           llama.new_kv_cache(uni, B, 64),
                           use_pallas=False)
    assert np.abs(np.asarray(bad) - hf_logits).max() > 1e-2

    # prefill+decode equals one-shot (cache semantics under dual theta)
    cache2 = llama.new_kv_cache(cfg, B, 64)
    _, cache2 = llama.forward(params, cfg,
                              jnp.asarray(ids[:, :T - 1], jnp.int32),
                              jnp.zeros(B, jnp.int32), cache2,
                              use_pallas=False)
    l2, _ = llama.forward(params, cfg, jnp.asarray(ids[:, T - 1:],
                                                   jnp.int32),
                          jnp.full((B,), T - 1, jnp.int32), cache2,
                          use_pallas=False)
    np.testing.assert_allclose(np.asarray(l2[:, 0]),
                               np.asarray(logits[:, -1]), atol=1e-4,
                               rtol=1e-4)

    # serving: dense and paged engines agree greedily
    from lmcache_tpu.serving import SamplingParams, ServingEngine
    from lmcache_tpu.serving.paged_engine import PagedServingEngine
    prompt = np.random.default_rng(46).integers(0, 128, 21, dtype=np.int32)
    [r] = ServingEngine(cfg, params, max_batch=2, max_seq=64,
                        use_pallas=False).generate(
                            [prompt], SamplingParams(max_new_tokens=5))
    [p] = PagedServingEngine(cfg, params, max_batch=2, max_seq=64,
                             num_pages=16, page_size=16,
                             use_pallas=False).generate(
                                 [prompt], SamplingParams(max_new_tokens=5))
    assert r.output_tokens == p.output_tokens and len(r.output_tokens) == 5


def test_matches_huggingface_llama4(tmp_path):
    """Llama-4 (iRoPE, text stack) end-to-end through load_hf: chunked
    local attention + NoPE full-attention layers (identity rope),
    post-rope weightless L2 qk-norm, NoPE query temperature tuning,
    and the sigmoid top-1 MoE whose gate scales the expert INPUT plus
    an always-on shared expert — vs transformers' Llama4ForCausalLM."""
    torch = pytest.importorskip("torch")
    from transformers import Llama4ForCausalLM, Llama4TextConfig

    L, E = 4, 4  # default no_rope pattern: 3 rope/chunked then 1 NoPE/full
    hf_cfg = Llama4TextConfig(vocab_size=128, hidden_size=64,
                              intermediate_size=32,  # routed expert width
                              intermediate_size_mlp=64,  # shared expert
                              num_hidden_layers=L, num_attention_heads=4,
                              num_key_value_heads=2, head_dim=16,
                              max_position_embeddings=256,
                              rms_norm_eps=1e-5, rope_theta=10000.0,
                              rope_scaling=None, attention_chunk_size=8,
                              num_local_experts=E, num_experts_per_tok=1,
                              use_qk_norm=True,
                              attn_temperature_tuning=True,
                              floor_scale=8.0, attn_scale=0.1,
                              tie_word_embeddings=False,
                              attention_dropout=0.0, attention_bias=False,
                              pad_token_id=0, attn_implementation="eager")
    torch.manual_seed(55)
    hf_model = Llama4ForCausalLM(hf_cfg).eval().float()
    sd = hf_model.state_dict()
    assert "model.layers.0.feed_forward.experts.gate_up_proj" in sd
    assert "model.layers.0.feed_forward.shared_expert.gate_proj.weight" \
        in sd
    path = tmp_path / "tiny-llama4"
    hf_model.save_pretrained(path)

    import dataclasses
    cfg = dataclasses.replace(llama.LlamaConfig.from_hf(str(path)),
                              dtype="float32")
    assert cfg.local_attention_kind == "chunked"
    assert cfg.sliding_window == 8
    assert cfg.nope_on_global_layers and cfg.qk_l2_norm
    assert cfg.attn_temperature_tuning and cfg.attn_floor_scale == 8.0
    assert cfg.moe_style == "llama4" and cfg.n_experts == E
    # routed AND shared experts are intermediate_size wide in HF
    # (intermediate_size_mlp only feeds the dense layers we reject)
    assert cfg.moe_hidden_dim == 32 and cfg.hidden_dim == 32
    assert cfg.rope_interleaved
    assert list(cfg.layer_windows()) == [False, False, False, True]
    cfg, params = llama.load_hf(str(path), cfg)
    assert "w_gate" in params["layers"]  # shared expert
    assert params["layers"]["e_gate"].shape == (L, E, 64, 32)

    B, T = 2, 48  # spans several 8-token chunks and floor-scale steps
    ids = np.random.default_rng(56).integers(0, 128, (B, T))
    with torch.no_grad():
        hf_logits = hf_model(torch.from_numpy(ids)).logits.numpy()
    cache = llama.new_kv_cache(cfg, B, 64)
    logits, _ = llama.forward(params, cfg, jnp.asarray(ids, jnp.int32),
                              jnp.zeros(B, jnp.int32), cache,
                              use_pallas=False)
    np.testing.assert_allclose(np.asarray(logits), hf_logits, atol=3e-3,
                               rtol=3e-3)

    # chunked (not trailing-window) masking is load-bearing
    import dataclasses as dc
    bad_cfg = dc.replace(cfg, local_attention_kind="sliding")
    bad, _ = llama.forward(params, bad_cfg, jnp.asarray(ids, jnp.int32),
                           jnp.zeros(B, jnp.int32),
                           llama.new_kv_cache(bad_cfg, B, 64),
                           use_pallas=False)
    assert np.abs(np.asarray(bad) - hf_logits).max() > 1e-2

    # ...as are the NoPE layers (roping every layer diverges; the
    # parity tolerance above is 10x tighter than this bound)
    bad2, _ = llama.forward(params,
                            dc.replace(cfg, nope_on_global_layers=False),
                            jnp.asarray(ids, jnp.int32),
                            jnp.zeros(B, jnp.int32),
                            llama.new_kv_cache(cfg, B, 64),
                            use_pallas=False)
    assert np.abs(np.asarray(bad2) - hf_logits).max() > 2e-3

    # prefill/decode split agrees (cache semantics under iRoPE)
    cache2 = llama.new_kv_cache(cfg, B, 64)
    _, cache2 = llama.forward(params, cfg,
                              jnp.asarray(ids[:, :T - 1], jnp.int32),
                              jnp.zeros(B, jnp.int32), cache2,
                              use_pallas=False)
    l2, _ = llama.forward(params, cfg,
                          jnp.asarray(ids[:, T - 1:], jnp.int32),
                          jnp.full((B,), T - 1, jnp.int32), cache2,
                          use_pallas=False)
    np.testing.assert_allclose(np.asarray(l2[:, 0]),
                               np.asarray(logits[:, -1]), atol=1e-4,
                               rtol=1e-4)

    # paged path: same traits over the page arena
    from lmcache_tpu.models.paged import forward_paged, new_paged_kv_pool
    pool = new_paged_kv_pool(cfg, 16, 16)
    table = np.zeros((B, 4), np.int32)
    for b in range(B):
        for j in range(3):
            table[b, j] = 1 + b * 3 + j
    plogits, _ = forward_paged(params, cfg, jnp.asarray(ids, jnp.int32),
                               jnp.zeros(B, jnp.int32), pool,
                               jnp.asarray(table), use_pallas=False)
    np.testing.assert_allclose(np.asarray(plogits), hf_logits, atol=3e-3,
                               rtol=3e-3)


def test_matches_huggingface_gpt_oss(tmp_path):
    """GPT-OSS end-to-end through load_hf: per-head attention SINKS
    joined to every softmax normalization, alternating sliding/full
    layers, biased qkv, and the biased clamped-GLU MoE (softmax over
    top-k logits, interleaved fused gate/up with biases) — vs
    transformers' GptOssForCausalLM."""
    torch = pytest.importorskip("torch")
    from transformers import GptOssConfig, GptOssForCausalLM

    L, E = 4, 4
    hf_cfg = GptOssConfig(vocab_size=128, hidden_size=64,
                          intermediate_size=32, num_hidden_layers=L,
                          num_attention_heads=4, num_key_value_heads=2,
                          head_dim=16, max_position_embeddings=256,
                          rms_norm_eps=1e-5, rope_theta=10000.0,
                          rope_scaling=None, sliding_window=8,
                          num_local_experts=E, num_experts_per_tok=2,
                          attention_bias=True, attention_dropout=0.0,
                          tie_word_embeddings=False, pad_token_id=0,
                          attn_implementation="eager")
    torch.manual_seed(66)
    hf_model = GptOssForCausalLM(hf_cfg).eval().float()
    sd = hf_model.state_dict()
    assert "model.layers.0.self_attn.sinks" in sd  # family trait
    assert "model.layers.0.mlp.experts.gate_up_proj_bias" in sd
    # break the sinks away from init so the test can't pass without them
    with torch.no_grad():
        for i in range(L):
            sd[f"model.layers.{i}.self_attn.sinks"].copy_(
                torch.linspace(-1.0, 2.0, 4) * (i + 1))
    path = tmp_path / "tiny-gpt-oss"
    hf_model.save_pretrained(path)

    import dataclasses
    cfg = dataclasses.replace(llama.LlamaConfig.from_hf(str(path)),
                              dtype="float32")
    assert cfg.attn_sinks and cfg.moe_style == "gpt_oss"
    assert cfg.attention_bias and cfg.sliding_window == 8
    assert cfg.n_experts == E and cfg.moe_hidden_dim == 32
    cfg, params = llama.load_hf(str(path), cfg)
    assert params["layers"]["sinks"].shape == (L, 4)
    assert params["layers"]["e_gate"].shape == (L, E, 64, 32)
    assert "e_bd" in params["layers"] and "router_b" in params["layers"]

    B, T = 2, 48
    ids = np.random.default_rng(67).integers(0, 128, (B, T))
    with torch.no_grad():
        hf_logits = hf_model(torch.from_numpy(ids)).logits.numpy()
    cache = llama.new_kv_cache(cfg, B, 64)
    logits, _ = llama.forward(params, cfg, jnp.asarray(ids, jnp.int32),
                              jnp.zeros(B, jnp.int32), cache,
                              use_pallas=False)
    np.testing.assert_allclose(np.asarray(logits), hf_logits, atol=3e-3,
                               rtol=3e-3)

    # the sinks are load-bearing: zeroing them diverges
    params_ns = {**params, "layers": {**params["layers"],
                                      "sinks": jnp.zeros((L, 4))}}
    bad, _ = llama.forward(params_ns, cfg, jnp.asarray(ids, jnp.int32),
                           jnp.zeros(B, jnp.int32),
                           llama.new_kv_cache(cfg, B, 64),
                           use_pallas=False)
    assert np.abs(np.asarray(bad) - hf_logits).max() > 5e-3

    # prefill/decode split agrees (sinks are position-free)
    cache2 = llama.new_kv_cache(cfg, B, 64)
    _, cache2 = llama.forward(params, cfg,
                              jnp.asarray(ids[:, :T - 1], jnp.int32),
                              jnp.zeros(B, jnp.int32), cache2,
                              use_pallas=False)
    l2, _ = llama.forward(params, cfg,
                          jnp.asarray(ids[:, T - 1:], jnp.int32),
                          jnp.full((B,), T - 1, jnp.int32), cache2,
                          use_pallas=False)
    np.testing.assert_allclose(np.asarray(l2[:, 0]),
                               np.asarray(logits[:, -1]), atol=1e-4,
                               rtol=1e-4)

    # paged path applies the same sinks
    from lmcache_tpu.models.paged import forward_paged, new_paged_kv_pool
    pool = new_paged_kv_pool(cfg, 16, 16)
    table = np.zeros((B, 4), np.int32)
    for b in range(B):
        for j in range(3):
            table[b, j] = 1 + b * 3 + j
    plogits, _ = forward_paged(params, cfg, jnp.asarray(ids, jnp.int32),
                               jnp.zeros(B, jnp.int32), pool,
                               jnp.asarray(table), use_pallas=False)
    np.testing.assert_allclose(np.asarray(plogits), hf_logits, atol=3e-3,
                               rtol=3e-3)


def test_gemma2_from_hf_config():
    """from_hf maps every Gemma-2 trait off the HF config."""
    pytest.importorskip("torch")
    from unittest import mock

    from transformers import Gemma2Config
    hc = Gemma2Config(vocab_size=128, hidden_size=64,
                      intermediate_size=128, num_hidden_layers=4,
                      num_attention_heads=4, num_key_value_heads=2,
                      head_dim=16, max_position_embeddings=256,
                      rms_norm_eps=1e-6, query_pre_attn_scalar=24.0,
                      sliding_window=16, attn_logit_softcapping=50.0,
                      final_logit_softcapping=30.0)
    with mock.patch("transformers.AutoConfig.from_pretrained",
                    return_value=hc):
        cfg = llama.LlamaConfig.from_hf("local/gemma2-test")
    assert cfg.mlp_act == "gelu_tanh" and cfg.norm_one_offset
    assert cfg.embed_scale and cfg.post_norms
    assert cfg.attn_logit_softcap == 50.0
    assert cfg.final_logit_softcap == 30.0
    assert cfg.query_pre_attn_scalar == 24.0
    assert cfg.sliding_window == 16 and cfg.sliding_window_pattern == 2
    assert cfg.head_dim == 16


def test_load_hf_moe_checkpoint(tmp_path):
    """load_hf handles MoE state dicts (no dense mlp.down_proj present)
    end-to-end: save a tiny Mixtral, load it through load_hf, and match
    HF logits. Regression: the initial layers dict used to eagerly stack
    mlp.down_proj.weight and KeyError on every MoE checkpoint."""
    torch = pytest.importorskip("torch")
    from transformers import MixtralConfig, MixtralForCausalLM

    L, E = 2, 4
    hf_cfg = MixtralConfig(vocab_size=128, hidden_size=128,
                           intermediate_size=64, num_hidden_layers=L,
                           num_attention_heads=4, num_key_value_heads=2,
                           max_position_embeddings=256, rms_norm_eps=1e-5,
                           rope_theta=10000.0, tie_word_embeddings=False,
                           attention_dropout=0.0, num_local_experts=E,
                           num_experts_per_tok=2, sliding_window=None,
                           output_router_logits=False, pad_token_id=0)
    torch.manual_seed(11)
    hf_model = MixtralForCausalLM(hf_cfg).eval().float()
    path = tmp_path / "tiny-mixtral"
    hf_model.save_pretrained(path)

    import dataclasses
    cfg = dataclasses.replace(llama.LlamaConfig.from_hf(str(path)),
                              dtype="float32")
    cfg, params = llama.load_hf(str(path), cfg)
    assert cfg.n_experts == E and "e_down" in params["layers"]
    assert "w_down" not in params["layers"]

    B, T = 2, 11
    ids = np.random.default_rng(7).integers(0, 128, (B, T))
    with torch.no_grad():
        hf_logits = hf_model(torch.from_numpy(ids)).logits.numpy()
    cache = llama.new_kv_cache(cfg, B, 32)
    logits, _ = llama.forward(params, cfg, jnp.asarray(ids, jnp.int32),
                              jnp.zeros(B, jnp.int32), cache,
                              use_pallas=False)
    np.testing.assert_allclose(np.asarray(logits), hf_logits, atol=3e-3,
                               rtol=3e-3)


def test_matches_huggingface_phi3(tmp_path):
    """Phi-3 family end-to-end through load_hf: fused qkv/gate_up
    checkpoint split + longrope per-dim frequency scaling, vs
    transformers' Phi3ForCausalLM. T runs past
    original_max_position_embeddings so HF's dynamic longrope update
    selects the long factor set — matching our static per-deployment
    choice (max_seq_len > original)."""
    torch = pytest.importorskip("torch")
    from transformers import Phi3Config, Phi3ForCausalLM

    ORIG, EXT = 32, 256
    short = [1.0] * 8
    long = [1.5, 2.0, 2.5, 3.0, 4.0, 5.0, 6.5, 8.0]  # head_dim 16 -> 8
    hf_cfg = Phi3Config(vocab_size=128, hidden_size=64,
                        intermediate_size=128, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=2,
                        max_position_embeddings=EXT,
                        original_max_position_embeddings=ORIG,
                        rope_scaling={"type": "longrope",
                                      "short_factor": short,
                                      "long_factor": long},
                        rms_norm_eps=1e-5, rope_theta=10000.0,
                        tie_word_embeddings=False, sliding_window=None,
                        resid_pdrop=0.0, embd_pdrop=0.0,
                        attention_dropout=0.0, pad_token_id=0)
    torch.manual_seed(13)
    hf_model = Phi3ForCausalLM(hf_cfg).eval().float()
    sd = hf_model.state_dict()
    assert "model.layers.0.self_attn.qkv_proj.weight" in sd  # family trait
    assert "model.layers.0.mlp.gate_up_proj.weight" in sd
    path = tmp_path / "tiny-phi3"
    hf_model.save_pretrained(path)

    import dataclasses
    cfg = dataclasses.replace(llama.LlamaConfig.from_hf(str(path)),
                              dtype="float32")
    assert cfg.rope_scaling_type == "longrope"
    assert cfg.rope_scaling_factor == EXT / ORIG
    assert cfg.rope_freq_factors == tuple(long)  # max_seq > orig -> long
    cfg, params = llama.load_hf(str(path), cfg)

    B, T = 2, 48  # spans past ORIG so HF switches to the long factors
    ids = np.random.default_rng(17).integers(0, 128, (B, T))
    with torch.no_grad():
        hf_logits = hf_model(torch.from_numpy(ids)).logits.numpy()
    cache = llama.new_kv_cache(cfg, B, 64)
    logits, _ = llama.forward(params, cfg, jnp.asarray(ids, jnp.int32),
                              jnp.zeros(B, jnp.int32), cache,
                              use_pallas=False)
    np.testing.assert_allclose(np.asarray(logits), hf_logits, atol=3e-3,
                               rtol=3e-3)

    # paged path ropes with the same longrope frequencies
    from lmcache_tpu.models.paged import forward_paged, new_paged_kv_pool
    pool = new_paged_kv_pool(cfg, 16, 16)
    table = np.zeros((B, 4), np.int32)
    for b in range(B):
        for j in range(3):
            table[b, j] = 1 + b * 3 + j
    plogits, _ = forward_paged(params, cfg, jnp.asarray(ids, jnp.int32),
                               jnp.zeros(B, jnp.int32), pool,
                               jnp.asarray(table), use_pallas=False)
    np.testing.assert_allclose(np.asarray(plogits), hf_logits, atol=3e-3,
                               rtol=3e-3)

    # prefill/decode split agrees with the one-shot forward (cache
    # correctness under longrope positions)
    cache2 = llama.new_kv_cache(cfg, B, 64)
    _, cache2 = llama.forward(params, cfg, jnp.asarray(ids[:, :40],
                                                       jnp.int32),
                              jnp.zeros(B, jnp.int32), cache2,
                              use_pallas=False)
    step_logits = None
    for t in range(40, T):
        step_logits, cache2 = llama.forward(
            params, cfg, jnp.asarray(ids[:, t:t + 1], jnp.int32),
            jnp.full(B, t, jnp.int32), cache2, use_pallas=False)
    np.testing.assert_allclose(np.asarray(step_logits[:, 0]),
                               hf_logits[:, -1], atol=3e-3, rtol=3e-3)


def test_phi3_short_context_uses_short_factors():
    """A deployment at the pretraining context (max == original) selects
    the short factor set and applies no attention temperature."""
    pytest.importorskip("torch")
    from unittest import mock

    from transformers import Phi3Config
    short = [1.0, 1.0, 1.1, 1.2, 1.3, 1.4, 1.5, 1.6]
    hc = Phi3Config(vocab_size=128, hidden_size=64, intermediate_size=128,
                    num_hidden_layers=2, num_attention_heads=4,
                    num_key_value_heads=2, max_position_embeddings=32,
                    original_max_position_embeddings=32,
                    rope_scaling={"type": "longrope",
                                  "short_factor": short,
                                  "long_factor": [9.0] * 8})
    with mock.patch("transformers.AutoConfig.from_pretrained",
                    return_value=hc):
        cfg = llama.LlamaConfig.from_hf("local/tiny-phi3-short")
    assert cfg.rope_freq_factors == tuple(short)
    inv, mscale = llama.rope_inv_freq(cfg.rope_theta, cfg.head_dim,
                                      cfg.rope_scaling_spec)
    assert mscale == 1.0  # factor == 1 -> no temperature
    base, _ = llama.rope_inv_freq(cfg.rope_theta, cfg.head_dim, None)
    np.testing.assert_allclose(np.asarray(inv),
                               np.asarray(base) / np.asarray(short),
                               rtol=1e-6)


def test_from_hf_rejects_mixed_sparse():
    """Mixed dense/sparse MoE layouts fail loudly instead of silently
    computing MoE on dense layers."""
    pytest.importorskip("torch")
    from unittest import mock

    from transformers import Qwen3MoeConfig
    hc = Qwen3MoeConfig(vocab_size=128, hidden_size=64,
                        intermediate_size=128, num_hidden_layers=4,
                        num_attention_heads=4, num_key_value_heads=2,
                        head_dim=16, num_experts=4, num_experts_per_tok=2,
                        moe_intermediate_size=32, mlp_only_layers=[0])
    with mock.patch("transformers.AutoConfig.from_pretrained",
                    return_value=hc):
        with pytest.raises(NotImplementedError, match="mlp_only_layers"):
            llama.LlamaConfig.from_hf("local/qwen3-moe-mixed")


def test_matches_huggingface_olmo2(tmp_path):
    """OLMo-2 end-to-end through load_hf: norms on the block OUTPUTS
    only (x + norm(attn(x)) — no input layernorms exist in the
    checkpoint) and full-width q/k RMSNorms applied before the head
    reshape and rope — vs transformers' Olmo2ForCausalLM."""
    torch = pytest.importorskip("torch")
    from transformers import Olmo2Config, Olmo2ForCausalLM

    L = 2
    hf_cfg = Olmo2Config(vocab_size=128, hidden_size=64,
                         intermediate_size=128, num_hidden_layers=L,
                         num_attention_heads=4, num_key_value_heads=2,
                         max_position_embeddings=256, rms_norm_eps=1e-5,
                         rope_theta=10000.0, tie_word_embeddings=False,
                         attention_dropout=0.0, pad_token_id=0)
    torch.manual_seed(77)
    hf_model = Olmo2ForCausalLM(hf_cfg).eval().float()
    sd = hf_model.state_dict()
    assert "model.layers.0.input_layernorm.weight" not in sd
    assert "model.layers.0.post_feedforward_layernorm.weight" in sd
    # q_norm is FULL width (nh*hd = 64), not per-head (16)
    assert sd["model.layers.0.self_attn.q_norm.weight"].shape == (64,)
    # break the norms away from identity so reordering is load-bearing
    with torch.no_grad():
        for i in range(L):
            sd[f"model.layers.{i}.post_attention_layernorm.weight"].mul_(
                1.0 + 0.1 * (i + 1))
            sd[f"model.layers.{i}.self_attn.q_norm.weight"].mul_(0.9)
    path = tmp_path / "tiny-olmo2"
    hf_model.save_pretrained(path)

    import dataclasses
    cfg = dataclasses.replace(llama.LlamaConfig.from_hf(str(path)),
                              dtype="float32")
    assert not cfg.pre_norms and cfg.post_norms and cfg.qk_norm_flat
    cfg, params = llama.load_hf(str(path), cfg)
    assert "attn_norm" not in params["layers"]
    assert params["layers"]["q_norm"].shape == (L, 64)

    B, T = 2, 33
    ids = np.random.default_rng(78).integers(0, 128, (B, T))
    with torch.no_grad():
        hf_logits = hf_model(torch.from_numpy(ids)).logits.numpy()
    cache = llama.new_kv_cache(cfg, B, 64)
    logits, _ = llama.forward(params, cfg, jnp.asarray(ids, jnp.int32),
                              jnp.zeros(B, jnp.int32), cache,
                              use_pallas=False)
    np.testing.assert_allclose(np.asarray(logits), hf_logits, atol=2e-3,
                               rtol=2e-3)

    # prefill/decode split agrees
    cache2 = llama.new_kv_cache(cfg, B, 64)
    _, cache2 = llama.forward(params, cfg,
                              jnp.asarray(ids[:, :T - 1], jnp.int32),
                              jnp.zeros(B, jnp.int32), cache2,
                              use_pallas=False)
    l2, _ = llama.forward(params, cfg,
                          jnp.asarray(ids[:, T - 1:], jnp.int32),
                          jnp.full((B,), T - 1, jnp.int32), cache2,
                          use_pallas=False)
    np.testing.assert_allclose(np.asarray(l2[:, 0]),
                               np.asarray(logits[:, -1]), atol=1e-4,
                               rtol=1e-4)

    # paged path applies the same norm ordering
    from lmcache_tpu.models.paged import forward_paged, new_paged_kv_pool
    pool = new_paged_kv_pool(cfg, 16, 16)
    table = np.zeros((B, 4), np.int32)
    for b in range(B):
        for j in range(3):
            table[b, j] = 1 + b * 3 + j
    plogits, _ = forward_paged(params, cfg, jnp.asarray(ids, jnp.int32),
                               jnp.zeros(B, jnp.int32), pool,
                               jnp.asarray(table), use_pallas=False)
    np.testing.assert_allclose(np.asarray(plogits), hf_logits, atol=2e-3,
                               rtol=2e-3)
