"""Paged attention kernel + paged forward pass vs dense equivalents."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from lmcache_tpu.models import llama  # noqa: E402
from lmcache_tpu.models.paged import (PageAllocator,  # noqa: E402
                                       forward_paged,
                                      new_paged_kv_pool, pages_needed)
from lmcache_tpu.ops.attention import mha_reference  # noqa: E402
from lmcache_tpu.ops.paged_attention import (  # noqa: E402
    paged_attention, paged_attention_reference)


def test_paged_kernel_matches_dense():
    rng = np.random.default_rng(0)
    B, T, H, D, Hkv = 2, 16, 4, 64, 2
    P, page, NP = 12, 32, 4  # each sequence: up to 128 tokens in 4 pages
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    k_pool = jnp.asarray(rng.standard_normal((P, Hkv, page, D)),
                         jnp.float32)
    v_pool = jnp.asarray(rng.standard_normal((P, Hkv, page, D)),
                         jnp.float32)
    # distinct non-contiguous pages per sequence
    pt = jnp.asarray([[3, 7, 1, 9], [2, 11, 5, 4]], jnp.int32)
    q_off = jnp.asarray([70, 40], jnp.int32)
    kv_len = q_off + T

    ref = paged_attention_reference(q, k_pool, v_pool, pt, q_off, kv_len)
    out = paged_attention(q, k_pool, v_pool, pt, q_off, kv_len)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=2e-5)

    # also check the reference against a manually gathered dense buffer
    # (head-major pages -> token-major)
    k = k_pool[pt].transpose(0, 1, 3, 2, 4).reshape(B, NP * page, Hkv, D)
    v = v_pool[pt].transpose(0, 1, 3, 2, 4).reshape(B, NP * page, Hkv, D)
    dense = mha_reference(q, k, v, q_off, kv_len)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(dense),
                               atol=1e-6)


def test_allocator():
    alloc = PageAllocator(8)
    assert alloc.num_free == 7  # page 0 reserved
    a = alloc.alloc(3)
    assert len(set(a)) == 3 and 0 not in a
    alloc.free(a)
    assert alloc.num_free == 7
    with pytest.raises(MemoryError):
        alloc.alloc(8)
    assert pages_needed(65, 32) == 3


def test_forward_paged_matches_dense():
    cfg = llama.LlamaConfig.tiny(n_layers=2)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    B, T, page, NP = 2, 40, 32, 3
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)), jnp.int32)
    zero = jnp.zeros(B, jnp.int32)

    dense_logits, dense_cache = llama.forward(
        params, cfg, tokens, zero, llama.new_kv_cache(cfg, B, NP * page),
        use_pallas=False)

    pool = new_paged_kv_pool(cfg, num_pages=8, page_size=page)
    alloc = PageAllocator(8)
    pt = jnp.asarray([alloc.alloc(NP) for _ in range(B)], jnp.int32)
    paged_logits, pool = forward_paged(params, cfg, tokens, zero, pool, pt,
                                       use_pallas=False)
    np.testing.assert_allclose(np.asarray(paged_logits),
                               np.asarray(dense_logits), atol=2e-3,
                               rtol=2e-3)

    # prefill + decode continuation through pages
    step_logits, pool = forward_paged(params, cfg, tokens[:, -1:],
                                      jnp.full((B,), T, jnp.int32), pool,
                                      pt, use_pallas=False)
    dense_step, _ = llama.forward(params, cfg, tokens[:, -1:],
                                  jnp.full((B,), T, jnp.int32), dense_cache,
                                  use_pallas=False)
    np.testing.assert_allclose(np.asarray(step_logits),
                               np.asarray(dense_step), atol=2e-3, rtol=2e-3)

    # KV written into the right pages: page contents equal dense slices
    # (both pools head-major: dense [L, B, H, S, D], paged [L, P, H,
    # page, D])
    k_dense = np.asarray(dense_cache)[:, 0]
    k_pool = np.asarray(pool)[:, 0]
    for b in range(B):
        for j in range(NP):
            lo, hi = j * page, min((j + 1) * page, T)
            if hi <= lo:
                continue
            np.testing.assert_allclose(
                k_pool[:, int(pt[b, j]), :, :hi - lo],
                k_dense[:, b, :, lo:hi], atol=1e-5)


def test_quantized_paged_kernel():
    from lmcache_tpu.ops.paged_attention import (
        quantized_paged_attention, quantized_paged_attention_reference)
    rng = np.random.default_rng(4)
    B, T, H, D, Hkv = 2, 1, 4, 64, 2
    P, page, NP = 10, 32, 3
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    k_sym = jnp.asarray(rng.integers(-127, 128, (P, Hkv, page, D)),
                        jnp.int8)
    v_sym = jnp.asarray(rng.integers(-127, 128, (P, Hkv, page, D)),
                        jnp.int8)
    k_sc = jnp.asarray(rng.uniform(0.01, 0.05, (P, page)), jnp.float32)
    v_sc = jnp.asarray(rng.uniform(0.01, 0.05, (P, page)), jnp.float32)
    pt = jnp.asarray([[3, 7, 1], [2, 9, 5]], jnp.int32)
    kv_len = jnp.asarray([80, 50], jnp.int32)
    q_off = kv_len - 1

    ref = quantized_paged_attention_reference(q, k_sym, v_sym, k_sc, v_sc,
                                              pt, q_off, kv_len)
    out = quantized_paged_attention(q, k_sym, v_sym, k_sc, v_sc, pt,
                                    q_off, kv_len)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4,
                               rtol=2e-4)


def test_forward_paged_dma_dispatch_d128():
    """D=128 models dispatch to the manual-DMA kernel in forward_paged;
    parity with the dense forward (interpreter emulates the DMAs)."""
    cfg = llama.LlamaConfig.tiny(n_layers=2, dim=512, n_heads=4,
                                 n_kv_heads=2)  # head_dim 128
    assert cfg.head_dim == 128
    params = llama.init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(3)
    B, T, page, NP = 2, 40, 16, 4
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)), jnp.int32)
    zero = jnp.zeros(B, jnp.int32)

    dense_logits, _ = llama.forward(
        params, cfg, tokens, zero, llama.new_kv_cache(cfg, B, NP * page),
        use_pallas=False)
    pool = new_paged_kv_pool(cfg, num_pages=12, page_size=page)
    alloc = PageAllocator(12)
    pt = jnp.asarray([alloc.alloc(NP) for _ in range(B)], jnp.int32)
    # use_pallas=True on CPU lowers the DMA kernel through the
    # interpreter (paged_attention_dma's interpret default)
    paged_logits, _ = forward_paged(params, cfg, tokens, zero, pool, pt,
                                    use_pallas=True)
    np.testing.assert_allclose(np.asarray(paged_logits),
                               np.asarray(dense_logits), atol=2e-3,
                               rtol=2e-3)


def test_forward_paged_dma_dispatch_d64():
    """D=64 models now ALSO dispatch to the manual-DMA kernel (packed-
    lane scoring); parity with the dense forward through forward_paged."""
    cfg = llama.LlamaConfig.tiny(n_layers=2, dim=256, n_heads=4,
                                 n_kv_heads=2)  # head_dim 64
    assert cfg.head_dim == 64
    params = llama.init_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(5)
    B, T, page, NP = 2, 40, 16, 4
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)), jnp.int32)
    zero = jnp.zeros(B, jnp.int32)

    dense_logits, _ = llama.forward(
        params, cfg, tokens, zero, llama.new_kv_cache(cfg, B, NP * page),
        use_pallas=False)
    pool = new_paged_kv_pool(cfg, num_pages=12, page_size=page)
    alloc = PageAllocator(12)
    pt = jnp.asarray([alloc.alloc(NP) for _ in range(B)], jnp.int32)
    paged_logits, _ = forward_paged(params, cfg, tokens, zero, pool, pt,
                                    use_pallas=True)
    np.testing.assert_allclose(np.asarray(paged_logits),
                               np.asarray(dense_logits), atol=2e-3,
                               rtol=2e-3)
