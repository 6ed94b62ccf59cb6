"""Coalesced super-page DMA paths of the paged DMA kernels.

The kernels fetch groups of ``_super_pages(page)`` page-table slots per
pipeline step: physically-consecutive runs land as ONE strided copy,
fragmented groups fall back to per-page copies (ops/paged_attention.py
``_group_info``). Both paths, their mix, and ragged tails (dead
sub-pages inside the last group) must agree with the dense reference.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from lmcache_tpu.ops.paged_attention import (  # noqa: E402
    _super_pages, paged_attention_dma, paged_attention_reference,
    quantized_paged_attention_dma, quantized_paged_attention_reference)


def _tables(kind, B, NP, P, rng):
    """Page tables per layout kind; ids in [1, P)."""
    if kind == "sequential":
        starts = rng.integers(1, P - NP, B)
        return np.stack([np.arange(s, s + NP) for s in starts])
    if kind == "shuffled":
        return np.stack([rng.permutation(P - 1)[:NP] + 1
                         for _ in range(B)])
    # mixed: first half of the slots sequential, second half shuffled
    half = NP // 2
    seq = np.arange(1, half + 1)
    rest = rng.permutation(np.arange(half + 1, P))[:NP - half]
    return np.stack([np.concatenate([seq, rest]) for _ in range(B)])


@pytest.mark.parametrize("kind", ["sequential", "shuffled", "mixed"])
@pytest.mark.parametrize("page,D", [(32, 64), (32, 128)])
def test_dma_coalesced_matches_reference(kind, page, D):
    rng = np.random.default_rng(0)
    B, T, H, Hkv = 2, 16, 4, 2
    NP, P = 12, 64
    assert _super_pages(page) > 1  # the coalescing path is active
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    k_pool = jnp.asarray(rng.standard_normal((P, Hkv, page, D)),
                         jnp.float32)
    v_pool = jnp.asarray(rng.standard_normal((P, Hkv, page, D)),
                         jnp.float32)
    pt = jnp.asarray(_tables(kind, B, NP, P, rng), jnp.int32)
    # ragged: row 0 ends mid-group (dead sub-pages in the tail group),
    # row 1 uses every page
    kv_len = jnp.asarray([NP * page - page - 7, NP * page], jnp.int32)
    q_off = kv_len - T

    ref = paged_attention_reference(q, k_pool, v_pool, pt, q_off, kv_len)
    out = paged_attention_dma(q, k_pool, v_pool, pt, q_off, kv_len)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("kind", ["sequential", "shuffled"])
def test_dma_coalesced_int8_matches_reference(kind):
    rng = np.random.default_rng(1)
    B, T, H, Hkv, D = 2, 16, 4, 2, 64
    page, NP, P = 32, 8, 64
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)

    def qpool():
        sym = rng.integers(-127, 128, (P, Hkv, page, D)).astype(np.int8)
        scl = (rng.random((P, page)) * 0.02 + 0.01).astype(np.float32)
        return jnp.asarray(sym), jnp.asarray(scl)

    k_sym, k_scl = qpool()
    v_sym, v_scl = qpool()
    pt = jnp.asarray(_tables(kind, B, NP, P, rng), jnp.int32)
    kv_len = jnp.asarray([NP * page - page - 5, NP * page], jnp.int32)
    q_off = kv_len - T

    ref = quantized_paged_attention_reference(
        q, k_sym, v_sym, k_scl, v_scl, pt, q_off, kv_len)
    out = quantized_paged_attention_dma(
        q, k_sym, v_sym, k_scl, v_scl, pt, q_off, kv_len)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_super_pages_schedule():
    assert _super_pages(64) == 8
    assert _super_pages(128) == 4
    assert _super_pages(256) == 2
    assert _super_pages(512) == 1
    assert _super_pages(16) == 8  # capped


@pytest.mark.parametrize("kind", ["sequential", "shuffled"])
@pytest.mark.parametrize("quantized", [False, True])
def test_latent_dma_coalesced_matches_reference(kind, quantized):
    """Manual-DMA latent kernels (lane-padded arena) vs the dense
    reference, across coalesced and fallback table layouts."""
    from lmcache_tpu.ops.paged_latent_attention import (
        paged_latent_attention_dma, paged_latent_attention_reference,
        quantized_paged_latent_attention_dma,
        quantized_paged_latent_attention_reference)

    rng = np.random.default_rng(2)
    B, T, H, rank, rope = 2, 4, 4, 64, 16
    Cp = 128  # lane-padded latent dim (logical 80)
    page, NP, P = 16, 8, 64
    q = jnp.asarray(rng.standard_normal((B, T, H, Cp)), jnp.float32)
    q = q.at[..., rank + rope:].set(0.0)  # zero pad columns
    pt = jnp.asarray(_tables(kind, B, NP, P, rng), jnp.int32)
    kv_len = jnp.asarray([NP * page - page - 3, NP * page], jnp.int32)
    q_off = kv_len - T

    if quantized:
        sym = jnp.asarray(rng.integers(-127, 128, (P, page, Cp)), jnp.int8)
        scl = jnp.asarray(rng.random((P, page)) * 0.02 + 0.01, jnp.float32)
        ref = quantized_paged_latent_attention_reference(
            q, sym, scl, pt, q_off, kv_len, rank=rank, scale=0.125)
        out = quantized_paged_latent_attention_dma(
            q, sym, scl, pt, q_off, kv_len, rank=rank, scale=0.125)
    else:
        pool = jnp.asarray(rng.standard_normal((P, page, Cp)), jnp.float32)
        ref = paged_latent_attention_reference(
            q, pool, pt, q_off, kv_len, rank=rank, scale=0.125)
        out = paged_latent_attention_dma(
            q, pool, pt, q_off, kv_len, rank=rank, scale=0.125)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
