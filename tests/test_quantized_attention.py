"""Fused int8-KV attention: kernel vs unfused reference, and
quantization round-trip quality."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from lmcache_tpu.ops.attention import mha_reference  # noqa: E402
from lmcache_tpu.ops.quantized_attention import (  # noqa: E402
    dequantize_kv, quantize_kv_for_cache, quantized_attention_reference,
    quantized_flash_attention)


def _case(seed, B, T, H, D, Hkv, S, kv_len=None, q_off=None):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.float32)
    kv_len = jnp.asarray(kv_len if kv_len is not None else [T] * B,
                         jnp.int32)
    q_off = jnp.asarray(q_off if q_off is not None else [0] * B, jnp.int32)
    return q, k, v, q_off, kv_len


def test_quantize_roundtrip():
    _, k, _, _, _ = _case(0, 2, 8, 4, 64, 2, 64)
    k_sym, v_sym, k_scale, v_scale = quantize_kv_for_cache(k, k)
    back = dequantize_kv(k_sym, k_scale)
    err = jnp.abs(back - k)
    bound = jnp.max(jnp.abs(k), axis=(2, 3))[:, :, None, None] / 127.0
    assert bool(jnp.all(err <= bound + 1e-6))


def test_fused_matches_unfused():
    q, k, v, q_off, kv_len = _case(1, 2, 24, 8, 64, 4, 96,
                                   kv_len=[64, 34], q_off=[40, 10])
    sym = quantize_kv_for_cache(k, v)
    ref = quantized_attention_reference(q, *sym, q_off, kv_len)
    out = quantized_flash_attention(q, *sym, q_off, kv_len)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2,
                               rtol=2e-2)


def test_fused_close_to_fp_attention():
    """int8 KV attention must track full-precision attention closely."""
    q, k, v, q_off, kv_len = _case(2, 1, 16, 4, 128, 4, 128)
    fp = mha_reference(q, k, v, q_off, kv_len)
    sym = quantize_kv_for_cache(k, v)
    out = quantized_flash_attention(q, *sym, q_off, kv_len)
    fp, out = np.asarray(fp), np.asarray(out)
    corr = np.corrcoef(fp.ravel(), out.ravel())[0, 1]
    assert corr > 0.999
    assert np.abs(fp - out).max() < 0.1


def test_decode_shape():
    q, k, v, q_off, kv_len = _case(3, 2, 1, 4, 64, 2, 64,
                                   kv_len=[30, 50], q_off=[29, 49])
    sym = quantize_kv_for_cache(k, v)
    ref = quantized_attention_reference(q, *sym, q_off, kv_len)
    out = quantized_flash_attention(q, *sym, q_off, kv_len)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2,
                               rtol=2e-2)


def test_quantized_flash_sliding_window():
    """Int8 dense kernel honors sliding windows (round 2: the int8 path
    previously ignored cfg.sliding_window on Mistral-family models)."""
    from lmcache_tpu.ops.quantized_attention import (
        quantized_attention_reference, quantized_flash_attention,
        quantize_kv_for_cache)
    rng = np.random.default_rng(11)
    B, T, H, D, Hkv, S, W = 2, 1, 4, 64, 2, 512, 100
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.float32)
    sym = quantize_kv_for_cache(k, v)
    kv_len = jnp.asarray([400, 230], jnp.int32)
    q_off = kv_len - T
    ref = quantized_attention_reference(q, *sym, q_off, kv_len,
                                        sliding_window=W)
    out = quantized_flash_attention(q, *sym, q_off, kv_len,
                                    sliding_window=W, block_k=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)
    full = quantized_attention_reference(q, *sym, q_off, kv_len)
    assert not np.allclose(np.asarray(full), np.asarray(ref))


def test_int8_dense_mistral_window_end_to_end():
    """forward_quantized with cfg.sliding_window == dense forward with
    the same window (int8-noise tolerance)."""
    from lmcache_tpu.models import llama
    cfg = llama.LlamaConfig.tiny(n_layers=2, sliding_window=16)
    params = llama.init_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(12)
    B, T, S = 2, 40, 64
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)), jnp.int32)
    zero = jnp.zeros(B, jnp.int32)
    ref, _ = llama.forward(params, cfg, tokens, zero,
                           llama.new_kv_cache(cfg, B, S), use_pallas=False)
    out, _ = llama.forward_quantized(
        params, cfg, tokens, zero,
        llama.new_quantized_kv_cache(cfg, B, S), use_pallas=False)
    # int8 KV noise; windowed outputs must track the windowed reference
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0.5,
                               rtol=0.1)
    # and must DIFFER from the un-windowed int8 forward
    cfg_full = llama.LlamaConfig.tiny(n_layers=2)
    out_full, _ = llama.forward_quantized(
        params, cfg_full, tokens, zero,
        llama.new_quantized_kv_cache(cfg_full, B, S), use_pallas=False)
    assert not np.allclose(np.asarray(out), np.asarray(out_full),
                           atol=0.05)
