"""Latent-MQA flash kernel (MLA decode/prefill attention) vs reference,
and end-to-end pallas forward parity."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from lmcache_tpu.ops.latent_attention import (  # noqa: E402
    latent_attention_reference, latent_flash_attention)


def _case(B, T, S, H, r, p, seed=0, offset=0):
    rng = np.random.default_rng(seed)
    C = r + p
    q = jnp.asarray(rng.standard_normal((B, T, H, C)), jnp.float32)
    lat = jnp.asarray(rng.standard_normal((B, S, C)), jnp.float32)
    q_off = jnp.full(B, offset, jnp.int32)
    kv_len = q_off + T
    return q, lat, q_off, kv_len, C**-0.5


@pytest.mark.parametrize("B,T,S,H,r,p,offset", [
    (2, 1, 64, 4, 64, 16, 20),        # decode
    (2, 16, 64, 4, 64, 16, 0),        # prefill from empty
    (1, 8, 256, 8, 128, 64, 100),     # prefill after cached prefix
    (2, 5, 300, 16, 128, 64, 37),     # ragged T/S, head chunking
])
def test_kernel_matches_reference(B, T, S, H, r, p, offset):
    q, lat, q_off, kv_len, scale = _case(B, T, S, H, r, p,
                                         seed=T, offset=offset)
    ref = latent_attention_reference(q, lat, q_off, kv_len, rank=r,
                                     scale=scale)
    got = latent_flash_attention(q, lat, q_off, kv_len, rank=r,
                                 scale=scale, block_q=8, block_k=128,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_kernel_masks_stale_cache():
    """Positions past kv_len hold garbage (stale preempted data) — the
    kernel must not attend to them."""
    q, lat, q_off, kv_len, scale = _case(1, 1, 128, 4, 64, 16, offset=10)
    # poison everything past the 11 valid tokens
    lat = lat.at[:, 11:].set(1e4)
    ref = latent_attention_reference(q, lat, q_off, kv_len, rank=64,
                                     scale=scale)
    got = latent_flash_attention(q, lat, q_off, kv_len, rank=64,
                                 scale=scale, block_k=128, interpret=True)
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_forward_pallas_matches_einsum():
    from lmcache_tpu.models import mla
    cfg = mla.MLAConfig.tiny(n_layers=2)
    params = mla.init_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray(
        np.random.default_rng(1).integers(0, cfg.vocab_size, (2, 9)),
        jnp.int32)
    cache = mla.new_latent_cache(cfg, 2, 64)
    ref, ref_cache = mla.forward(params, cfg, ids,
                                 jnp.zeros(2, jnp.int32), cache)
    got, got_cache = mla.forward(params, cfg, ids,
                                 jnp.zeros(2, jnp.int32), cache,
                                 use_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)
    # layer > 0 latents inherit the previous layer's kernel rounding
    np.testing.assert_allclose(np.asarray(got_cache),
                               np.asarray(ref_cache), atol=1e-5)


def test_quantized_latent_kernel_matches_reference():
    """Int8 latent kernel == dequantize-then-reference, and within the
    quantization error bound of the exact latent attention."""
    from lmcache_tpu.ops.latent_attention import (
        latent_attention_reference, quantize_latents,
        quantized_latent_attention_reference,
        quantized_latent_flash_attention)

    rng = np.random.default_rng(3)
    B, T, H, C, S, r = 2, 4, 8, 160, 384, 128
    q = jnp.asarray(rng.standard_normal((B, T, H, C)), jnp.float32)
    lat = jnp.asarray(rng.standard_normal((B, S, C)), jnp.float32)
    sym, sc = quantize_latents(lat)
    o = jnp.asarray([100, 250], jnp.int32)
    kvl = o + T

    ref = quantized_latent_attention_reference(q, sym, sc, o, kvl,
                                               rank=r, scale=C**-0.5)
    out = quantized_latent_flash_attention(q, sym, sc, o, kvl, rank=r,
                                           scale=C**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    exact = latent_attention_reference(q, lat, o, kvl, rank=r,
                                       scale=C**-0.5)
    assert float(np.max(np.abs(np.asarray(ref) - np.asarray(exact)))) < 0.05

    # decode shape (T=1, flattened head rows)
    q1 = jnp.asarray(rng.standard_normal((B, 1, H, C)), jnp.float32)
    o1 = jnp.asarray([300, 128], jnp.int32)
    ref = quantized_latent_attention_reference(q1, sym, sc, o1, o1 + 1,
                                               rank=r, scale=C**-0.5)
    out = quantized_latent_flash_attention(q1, sym, sc, o1, o1 + 1,
                                           rank=r, scale=C**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
