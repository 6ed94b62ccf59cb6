"""Paged attention over the MLA latent cache (DeepSeek-V2/V3).

The paged engine's arena economics (fixed-size pages allocated on
demand, admission backpressure, prefix sharing, preemption —
serving/paged_engine.py) applied to the latent cache: pages are
``[page_size, r+p]`` latent rows with NO head axis, so at DeepSeek-V2
geometry one latent page holds ~57x the tokens of an expanded-KV page
of equal bytes.

Kernel = ops/latent_attention.py's single-read streaming MQA formulation
(score and value both come from the SAME latent block; the (head, token)
axes flatten into one score-row axis) combined with
ops/paged_attention.py's gather-by-DMA: the page id to fetch next is
computed *in the BlockSpec index_map* from the scalar-prefetched page
table, and dead slots (beyond a sequence's live pages) pin their DMA to
the last live page — the pipeline recognizes consecutive identical
block indices as revisits and fetches nothing, so HBM traffic scales
with live tokens, not table width.

Shapes: ``q_full [B, T, H, C]`` (C = kv_lora_rank + qk_rope_head_dim),
``latent_pool [P, page_size, C]`` (one layer of the arena),
``page_table int32 [B, NP]``, out ``[B, T, H, rank]`` latent-space
context (the model applies ``w_kb_v`` after).
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lmcache_tpu.ops.attention import _round_up
from lmcache_tpu.ops.latent_attention import (_NEG_INF,
                                              latent_attention_reference)


def paged_latent_attention_reference(q_full, latent_pool, page_table,
                                     q_offset, kv_len, *, rank, scale):
    """Gather pages densely, then dense latent attention (tests / CPU
    fallback). q_full [B, T, H, C]; latent_pool [P, page, C];
    page_table int32 [B, NP] -> [B, T, H, rank] in float32."""
    B = q_full.shape[0]
    P, page, C = latent_pool.shape
    NP = page_table.shape[1]
    lat = latent_pool[page_table].reshape(B, NP * page, C)
    return latent_attention_reference(q_full, lat, q_offset, kv_len,
                                      rank=rank, scale=scale)


def _paged_latent_kernel(pages_ref, q_off_ref, kv_len_ref, *refs,
                         block_r, page, n_tok, rank, scale,
                         has_scale=False):
    if has_scale:
        # int8 page stream: per-token scales ride a parallel scale page
        # and correct score/probability COLUMNS (the fused-dequant trick
        # of ops/latent_attention._latent_kernel, on the paged stream)
        q_ref, kv_ref, sc_ref, o_ref, m_scr, l_scr, acc_scr = refs
    else:
        q_ref, kv_ref, o_ref, m_scr, l_scr, acc_scr = refs
        sc_ref = None
    b = pl.program_id(0)
    ir = pl.program_id(1)
    j = pl.program_id(2)  # page slot
    num_j = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # dead slots pinned their DMA to the last live page (see index_map);
    # this guard skips their compute
    live = j * page < kv_len_ref[b]

    @pl.when(live)
    def _():
        # rows = flattened (head, token): row g is head g//T, token g%T
        # (ops/latent_attention.py); matmuls in the pool's native dtype
        # (MXU bf16 x bf16 -> f32 accumulate)
        q = q_ref[0]  # [block_r, C]
        kv = kv_ref[0].astype(q.dtype)  # [page, C] — the ONE stream
        #                                 (int8 dequantizes into q dtype)

        s = jax.lax.dot_general(q, kv, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if has_scale:
            s = s * (sc_ref[0].astype(jnp.float32) * scale)
        else:
            s = s * scale

        g = (ir * block_r + jax.lax.broadcasted_iota(
            jnp.int32, (block_r, page), 0))
        qpos = q_off_ref[b] + g % n_tok
        kpos = (j * page + jax.lax.broadcasted_iota(
            jnp.int32, (block_r, page), 1))
        mask = (kpos <= qpos) & (kpos < kv_len_ref[b])
        s = jnp.where(mask, s, _NEG_INF)

        m_prev = m_scr[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_scr[:] = alpha * l_scr[:] + jnp.sum(p, axis=1, keepdims=True)
        # value = the latent prefix of the SAME page already in VMEM;
        # with scales, the probabilities absorb the per-token scale
        pv = (p * sc_ref[0].astype(jnp.float32)) if has_scale else p
        acc_scr[:] = alpha * acc_scr[:] + jax.lax.dot_general(
            pv.astype(kv.dtype), kv[:, :rank], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_scr[:] = m_new

    @pl.when(j == num_j - 1)
    def _():
        l = l_scr[:]
        safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = jnp.where(l == 0.0, 0.0,
                             acc_scr[:] / safe).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("rank", "scale", "block_q", "interpret"))
def paged_latent_attention(
    q_full: jax.Array,  # [B, T, H, C]
    latent_pool: jax.Array,  # [P, page, C] (one layer of the arena)
    page_table: jax.Array,  # int32 [B, NP]
    q_offset: jax.Array,  # int32 [B]
    kv_len: jax.Array,  # int32 [B]
    *,
    rank: int,
    scale: float,
    block_q: int = 128,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Single-read streaming MLA attention over paged latents; see
    module docstring. Returns [B, T, H, rank] in q_full's dtype."""
    return _paged_latent_call(q_full, latent_pool, None, page_table,
                              q_offset, kv_len, rank=rank, scale=scale,
                              block_q=block_q, interpret=interpret)


def quantized_paged_latent_attention_reference(q_full, sym_pool,
                                               scale_pool, page_table,
                                               q_offset, kv_len, *, rank,
                                               scale):
    """Dequantize the gathered pages, then dense latent attention
    (tests / CPU fallback). sym_pool int8 [P, page, C], scale_pool f32
    [P, page]."""
    lat = (sym_pool.astype(jnp.float32)
           * scale_pool[..., None]).astype(jnp.float32)
    return paged_latent_attention_reference(q_full, lat, page_table,
                                            q_offset, kv_len, rank=rank,
                                            scale=scale)


@functools.partial(
    jax.jit,
    static_argnames=("rank", "scale", "block_q", "interpret"))
def quantized_paged_latent_attention(
    q_full: jax.Array,  # [B, T, H, C]
    sym_pool: jax.Array,  # int8 [P, page, C]
    scale_pool: jax.Array,  # f32 [P, page] (per-token scales)
    page_table: jax.Array,  # int32 [B, NP]
    q_offset: jax.Array,  # int32 [B]
    kv_len: jax.Array,  # int32 [B]
    *,
    rank: int,
    scale: float,
    block_q: int = 128,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """:func:`paged_latent_attention` over an int8 latent arena: the
    per-token scale page rides the same page-table DMA as its latent
    page and corrects score/probability columns in the kernel (fused
    dequant — see _paged_latent_kernel)."""
    return _paged_latent_call(q_full, sym_pool, scale_pool, page_table,
                              q_offset, kv_len, rank=rank, scale=scale,
                              block_q=block_q, interpret=interpret)


def _paged_latent_call(q_full, latent_pool, scale_pool, page_table,
                       q_offset, kv_len, *, rank, scale, block_q,
                       interpret):
    """Shared pallas_call builder for the bf16 and int8 paged latent
    streams (``scale_pool`` present => int8 with fused dequant)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, T, H, C = q_full.shape
    P, page, _ = latent_pool.shape
    NP = page_table.shape[1]

    R = H * T
    bR = min(block_q * 8, _round_up(R, 8), 1024)
    Rp = _round_up(R, bR)

    qh = q_full.transpose(0, 2, 1, 3).reshape(B, R, C)
    qh = jnp.pad(qh, ((0, 0), (0, Rp - R), (0, 0)))

    grid = (B, Rp // bR, NP)

    def page_index(b, ir, j, pt, q_off, kvl):
        # dead slots pin their DMA to the last live page: consecutive
        # identical block indices are revisits => no HBM read, so reads
        # scale with live tokens, not table width
        live = jnp.maximum((kvl[b] + page - 1) // page, 1)
        jm = jnp.minimum(j, live - 1)
        return (pt[b, jm], 0, 0)

    has_scale = scale_pool is not None
    in_specs = [
        pl.BlockSpec((1, bR, C), lambda b, ir, j, *_: (b, ir, 0)),
        pl.BlockSpec((1, page, C), page_index),
    ]
    inputs = [qh, latent_pool]
    if has_scale:
        # the scale page rides the SAME index map as its latent page
        in_specs.append(pl.BlockSpec((1, 1, page), page_index))
        inputs.append(scale_pool[:, None, :])

    kernel = functools.partial(_paged_latent_kernel, block_r=bR,
                               page=page, n_tok=T, rank=rank, scale=scale,
                               has_scale=has_scale)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,  # page_table, q_offset, kv_len
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, bR, rank),
                                   lambda b, ir, j, *_: (b, ir, 0)),
            scratch_shapes=[
                pltpu.VMEM((bR, 1), jnp.float32),
                pltpu.VMEM((bR, 1), jnp.float32),
                pltpu.VMEM((bR, rank), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Rp, rank), q_full.dtype),
        interpret=interpret,
    )(jnp.asarray(page_table, jnp.int32), q_offset.astype(jnp.int32),
      kv_len.astype(jnp.int32), *inputs)
    return out[:, :R].reshape(B, H, T, rank).transpose(0, 2, 1, 3)
