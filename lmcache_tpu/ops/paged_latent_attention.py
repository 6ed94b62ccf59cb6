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
from lmcache_tpu.ops.paged_attention import (N_BUF, _group_info,
                                             _super_pages)


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


# ---------------------------------------------------------------------------
# Manual-DMA paged latent kernels (round 3)
# ---------------------------------------------------------------------------
#
# Same move as ops/paged_attention's DMA family: the arena stays in HBM
# (memory_space=ANY) and the kernel streams exactly the live pages
# through an N_BUF-deep async-copy pipeline, coalescing runs of
# physically-consecutive page ids into ONE strided copy per
# _super_pages(page) slots (_group_info). This removes the grid-step
# fixed cost that dominates the BlockSpec kernel at small latent pages
# — the page sizes MLA's ~57x token density makes attractive.
#
# DMA slices must be 128-lane aligned, so these kernels require the
# arena's latent dim padded to a multiple of 128
# (mla.latent_pad_dim; zero pad columns score 0 against the zero-padded
# query and never affect the softmax). The bf16 kernel scores a whole
# coalesced group as one [bR, SP*page] dot (columns are in natural
# token order — no lane packing here); the int8 kernel computes per
# sub-page so each page's [1, page] scale row applies directly.


def _paged_latent_dma_kernel(pages_ref, q_off_ref, kv_len_ref, *refs,
                             block_r, page, n_tok, rank, scale,
                             super_pages, has_scale=False):
    if has_scale:
        q_ref, kv_hbm, sc_hbm, o_ref = refs
    else:
        q_ref, kv_hbm, o_ref = refs
        sc_hbm = None
    b = pl.program_id(0)
    ir = pl.program_id(1)
    SP = super_pages
    POOL = kv_hbm.shape[0]

    live = (kv_len_ref[b] + page - 1) // page
    num_g = (live + SP - 1) // SP
    q = q_ref[0]  # [block_r, Cp]

    def scoped(kv_scr, sc_scr, sem):
        def group_dmas(slot, g):
            ids, pg0, seq = _group_info(pages_ref, b, jnp.int32(0), live,
                                        g, sp=SP, pool_pages=POOL)
            out = []
            streams = [(kv_hbm, kv_scr, 0)]
            if has_scale:
                streams.append((sc_hbm, sc_scr, 1))
            for hbm, scr, si in streams:
                if SP == 1:
                    out.append((pltpu.make_async_copy(
                        hbm.at[ids[0]], scr.at[slot, 0],
                        sem.at[slot, si]), None))
                    continue
                out.append((pltpu.make_async_copy(
                    hbm.at[pl.ds(pg0, SP)], scr.at[slot],
                    sem.at[slot, si]), seq))
                for i in range(SP):
                    out.append((pltpu.make_async_copy(
                        hbm.at[ids[i]], scr.at[slot, i],
                        sem.at[slot, si]), jnp.logical_not(seq)))
            return out

        def start_group(slot, g):
            for d, pred in group_dmas(slot, g):
                if pred is None:
                    d.start()
                else:
                    @pl.when(pred)
                    def _(d=d):
                        d.start()

        def wait_group(slot, g):
            for d, pred in group_dmas(slot, g):
                if pred is None:
                    d.wait()
                else:
                    @pl.when(pred)
                    def _(d=d):
                        d.wait()

        for w in range(N_BUF - 1):
            @pl.when(w < num_g)
            def _(w=w):
                start_group(w, w)

        spage = SP * page

        def body(g, carry):
            m, l, acc = carry
            slot = jax.lax.rem(g, N_BUF)

            @pl.when(g + N_BUF - 1 < num_g)
            def _():
                start_group(jax.lax.rem(g + N_BUF - 1, N_BUF),
                            g + N_BUF - 1)

            wait_group(slot, g)

            rows_kv = SP * kv_scr.shape[2]
            kv = kv_scr[slot].astype(q.dtype).reshape(rows_kv, -1)

            gidx = (ir * block_r + jax.lax.broadcasted_iota(
                jnp.int32, (block_r, 1), 0))
            qpos = q_off_ref[b] + gidx % n_tok

            if not has_scale:
                # fused group: one dot + one softmax update per SP pages
                s = jax.lax.dot_general(
                    q, kv, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                kpos = g * spage + jax.lax.broadcasted_iota(
                    jnp.int32, (1, spage), 1)
                mask = kpos <= jnp.minimum(qpos, kv_len_ref[b] - 1)
                s = jnp.where(mask, s, _NEG_INF)
                m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
                alpha = jnp.exp(m - m_new)
                p = jnp.exp(s - m_new)
                l = alpha * l + jnp.sum(p, axis=1, keepdims=True)
                acc = alpha * acc + jax.lax.dot_general(
                    p.astype(kv.dtype), kv[:, :rank],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return m_new, l, acc

            # int8, fused across the group (round 4, VERDICT r3 next
            # #5): columns are in NATURAL token order here, so the
            # group scale vector is just the SP landed [1, page] rows
            # concatenated along lanes (static slices — lowers fine);
            # one dot + one softmax update per SP pages, like bf16.
            sc = jnp.concatenate(
                [sc_scr[slot, sp][:, :page] for sp in range(SP)],
                axis=1).astype(jnp.float32) if SP > 1 else (
                    sc_scr[slot, 0][:, :page].astype(jnp.float32))
            s = jax.lax.dot_general(
                q, kv, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * (sc * scale)
            kpos = g * spage + jax.lax.broadcasted_iota(
                jnp.int32, (1, spage), 1)
            mask = kpos <= jnp.minimum(qpos, kv_len_ref[b] - 1)
            s = jnp.where(mask, s, _NEG_INF)
            m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l = alpha * l + jnp.sum(p, axis=1, keepdims=True)
            acc = alpha * acc + jax.lax.dot_general(
                (p * sc).astype(kv.dtype), kv[:, :rank],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return m_new, l, acc

        m0 = jnp.full((block_r, 1), _NEG_INF, jnp.float32)
        l0 = jnp.zeros((block_r, 1), jnp.float32)
        a0 = jnp.zeros((block_r, rank), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, num_g, body, (m0, l0, a0))
        safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = jnp.where(l == 0.0, 0.0, acc / safe).astype(o_ref.dtype)

    scratch = dict(
        kv_scr=pltpu.VMEM((N_BUF, super_pages) + tuple(kv_hbm.shape[1:]),
                          kv_hbm.dtype),
        sc_scr=(pltpu.VMEM(
            (N_BUF, super_pages) + tuple(sc_hbm.shape[1:]), sc_hbm.dtype)
            if has_scale else pltpu.VMEM((1, 1, 8, 128), jnp.float32)),
        sem=pltpu.SemaphoreType.DMA((N_BUF, 2)),
    )
    pl.run_scoped(scoped, **scratch)


def _paged_latent_dma_call(q_full, latent_pool, scale_pool, page_table,
                           q_offset, kv_len, *, rank, scale, block_q,
                           interpret):
    """pallas_call builder for the manual-DMA latent kernels. Requires
    the pool's latent dim to be a multiple of 128 (the paged arenas are
    allocated that way — mla.latent_pad_dim); q_full may be narrower
    and is zero-padded here."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, T, H, Cq = q_full.shape
    P, page, Cp = latent_pool.shape
    if Cp % 128:
        raise ValueError(f"DMA latent kernel needs a 128-aligned pool "
                         f"latent dim, got {Cp}")

    R = H * T
    bR = min(block_q * 8, _round_up(R, 8), 1024)
    Rp = _round_up(R, bR)
    qh = q_full.transpose(0, 2, 1, 3).reshape(B, R, Cq)
    qh = jnp.pad(qh, ((0, 0), (0, Rp - R), (0, Cp - Cq)))

    has_scale = scale_pool is not None
    inputs = [qh, latent_pool]
    in_specs = [
        pl.BlockSpec((1, bR, Cp), lambda b, ir, *_: (b, ir, 0)),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    if has_scale:
        # lane-pad the [P, page] scale rows so their DMA slice aligns
        pad = _round_up(page, 128) - page
        inputs.append(jnp.pad(scale_pool, ((0, 0), (0, pad)))[:, None, :])
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))

    kernel = functools.partial(
        _paged_latent_dma_kernel, block_r=bR, page=page, n_tok=T,
        rank=rank, scale=scale, super_pages=_super_pages(page),
        has_scale=has_scale)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(B, Rp // bR),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, bR, rank),
                                   lambda b, ir, *_: (b, ir, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((B, Rp, rank), q_full.dtype),
        interpret=interpret,
    )(jnp.asarray(page_table, jnp.int32), q_offset.astype(jnp.int32),
      kv_len.astype(jnp.int32), *inputs)
    return out[:, :R].reshape(B, H, T, rank).transpose(0, 2, 1, 3)


@functools.partial(
    jax.jit, static_argnames=("rank", "scale", "block_q", "interpret"))
def paged_latent_attention_dma(
    q_full: jax.Array,  # [B, T, H, C] (C <= pool's padded latent dim)
    latent_pool: jax.Array,  # [P, page, Cp], Cp % 128 == 0
    page_table: jax.Array,
    q_offset: jax.Array,
    kv_len: jax.Array,
    *,
    rank: int,
    scale: float,
    block_q: int = 128,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """:func:`paged_latent_attention` with kernel-driven coalesced page
    DMA (see the section comment above). Preferred on TPU."""
    return _paged_latent_dma_call(q_full, latent_pool, None, page_table,
                                  q_offset, kv_len, rank=rank,
                                  scale=scale, block_q=block_q,
                                  interpret=interpret)


@functools.partial(
    jax.jit, static_argnames=("rank", "scale", "block_q", "interpret"))
def quantized_paged_latent_attention_dma(
    q_full: jax.Array,
    sym_pool: jax.Array,  # int8 [P, page, Cp]
    scale_pool: jax.Array,  # f32 [P, page]
    page_table: jax.Array,
    q_offset: jax.Array,
    kv_len: jax.Array,
    *,
    rank: int,
    scale: float,
    block_q: int = 128,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """:func:`quantized_paged_latent_attention` with kernel-driven
    coalesced page DMA and fused per-token dequant."""
    return _paged_latent_dma_call(q_full, sym_pool, scale_pool,
                                  page_table, q_offset, kv_len,
                                  rank=rank, scale=scale,
                                  block_q=block_q, interpret=interpret)
