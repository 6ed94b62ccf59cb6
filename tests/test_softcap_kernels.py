"""Gemma-family attention statics through every kernel: score
softcapping (cap*tanh(s/cap) before masking) and the
query_pre_attn_scalar score scale must match the dense references in
all four kernel families (flash, quantized flash, paged grid, paged
DMA), windowed and full."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from lmcache_tpu.ops.attention import (flash_attention,  # noqa: E402
                                       mha_reference)
from lmcache_tpu.ops.paged_attention import (  # noqa: E402
    paged_attention, paged_attention_dma, paged_attention_reference,
    quantized_paged_attention, quantized_paged_attention_reference)
from lmcache_tpu.ops.quantized_attention import (  # noqa: E402
    quantized_attention_reference, quantized_flash_attention,
    quantize_kv_for_cache)

CAP, SCALE = 30.0, 0.21


@pytest.mark.parametrize("window", [None, 100])
@pytest.mark.parametrize("T", [1, 48])
def test_flash_softcap_matches_reference(window, T):
    rng = np.random.default_rng(T + (window or 0))
    B, H, D, Hkv, S = 2, 4, 64, 2, 384
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.float32)
    q_off = jnp.asarray([200, 40], jnp.int32)
    kv_len = q_off + T

    ref = mha_reference(q, k, v, q_off, kv_len, sliding_window=window,
                        sm_scale=SCALE, logit_softcap=CAP)
    out = flash_attention(q, k, v, q_off, kv_len, sliding_window=window,
                          sm_scale=SCALE, logit_softcap=CAP, block_k=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    # the cap is load-bearing: uncapped output differs
    plain = flash_attention(q, k, v, q_off, kv_len, sliding_window=window,
                            block_k=128)
    assert np.abs(np.asarray(plain) - np.asarray(ref)).max() > 1e-3


def test_quantized_flash_softcap_matches_reference():
    rng = np.random.default_rng(7)
    B, T, H, D, Hkv, S = 2, 8, 4, 64, 2, 256
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.float32)
    ks, vs, ksc, vsc = quantize_kv_for_cache(k, v)
    q_off = jnp.asarray([100, 9], jnp.int32)
    kv_len = q_off + T

    ref = quantized_attention_reference(q, ks, vs, ksc, vsc, q_off, kv_len,
                                        sm_scale=SCALE, logit_softcap=CAP)
    out = quantized_flash_attention(q, ks, vs, ksc, vsc, q_off, kv_len,
                                    sm_scale=SCALE, logit_softcap=CAP,
                                    block_k=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("impl", [paged_attention, paged_attention_dma])
@pytest.mark.parametrize("window", [None, 40])
def test_paged_softcap_matches_reference(impl, window):
    rng = np.random.default_rng(11 + (window or 0))
    B, T, H, D, Hkv = 2, 1, 4, 128, 2
    P, page, NP = 16, 32, 6
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    k_pool = jnp.asarray(rng.standard_normal((P, Hkv, page, D)),
                         jnp.float32)
    v_pool = jnp.asarray(rng.standard_normal((P, Hkv, page, D)),
                         jnp.float32)
    pt = jnp.asarray(rng.permutation(np.arange(1, P))[:B * NP].reshape(
        B, NP), jnp.int32)
    kv_len = jnp.asarray([150, 70], jnp.int32)
    q_off = kv_len - T

    ref = paged_attention_reference(q, k_pool, v_pool, pt, q_off, kv_len,
                                    sliding_window=window, sm_scale=SCALE,
                                    logit_softcap=CAP)
    out = impl(q, k_pool, v_pool, pt, q_off, kv_len,
               sliding_window=window, sm_scale=SCALE, logit_softcap=CAP)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_quantized_paged_softcap_matches_reference():
    from lmcache_tpu.ops.paged_attention import (
        quantized_paged_attention_dma)
    rng = np.random.default_rng(13)
    B, T, H, D, Hkv = 2, 1, 4, 128, 2
    P, page, NP = 16, 32, 6
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    sym = rng.integers(-127, 128, (2, P, Hkv, page, D)).astype(np.int8)
    scl = rng.uniform(0.005, 0.02, (2, P, page)).astype(np.float32)
    ks_p, vs_p = jnp.asarray(sym[0]), jnp.asarray(sym[1])
    ksc_p, vsc_p = jnp.asarray(scl[0]), jnp.asarray(scl[1])
    pt = jnp.asarray(rng.permutation(np.arange(1, P))[:B * NP].reshape(
        B, NP), jnp.int32)
    kv_len = jnp.asarray([150, 70], jnp.int32)
    q_off = kv_len - T

    ref = quantized_paged_attention_reference(
        q, ks_p, vs_p, ksc_p, vsc_p, pt, q_off, kv_len, sm_scale=SCALE,
        logit_softcap=CAP)
    for impl in (quantized_paged_attention, quantized_paged_attention_dma):
        out = impl(q, ks_p, vs_p, ksc_p, vsc_p, pt, q_off, kv_len,
                   sm_scale=SCALE, logit_softcap=CAP)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)
