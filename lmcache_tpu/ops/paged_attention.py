"""Paged attention: decode/prefill over a page-table-indexed KV pool.

Dense per-slot KV buffers (models/llama.py) waste HBM when sequence
lengths are heterogeneous: every slot reserves S_max tokens. The paged
pool allocates fixed-size pages on demand and addresses them through a
per-sequence page table — vLLM's PagedAttention, built the TPU way:

- the page table rides `PrefetchScalarGridSpec` **scalar prefetch**, so
  the BlockSpec index_map itself computes which page to DMA next
  (`pool_block[j] = pages[b, j]`) — gather-by-DMA, no materialized
  gathered KV;
- pages are head-major `[P, H_kv, page_size, D]` so each block is one
  long sequential HBM read;
- the whole GQA group is processed per program (KV read once per kv
  head), with the same online-softmax scratch carries as
  ops/attention.py.

The page is also the natural unit of cache-tier transfer: page_size is
chosen to divide the cache-engine chunk_size, so a retrieved chunk maps
onto whole pages.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lmcache_tpu.ops.attention import _NEG_INF, _round_up, mha_reference


def paged_attention_reference(q, k_pool, v_pool, page_table, q_offset,
                              kv_len, sliding_window=None, sm_scale=None,
                              logit_softcap=None,
                              window_kind="sliding",
                              sinks=None) -> jax.Array:
    """Gather pages densely, then dense attention (tests / CPU path).

    q: [B, T, H, D]; k/v_pool: [P, H_kv, page, D] (head-major pages);
    page_table: int32 [B, NP]; q_offset/kv_len: int32 [B].
    """
    B = q.shape[0]
    P, Hkv, page, D = k_pool.shape
    NP = page_table.shape[1]
    # [B, NP, H, page, D] -> token-major [B, NP*page, H, D]
    k = k_pool[page_table].transpose(0, 1, 3, 2, 4).reshape(
        B, NP * page, Hkv, D)
    v = v_pool[page_table].transpose(0, 1, 3, 2, 4).reshape(
        B, NP * page, Hkv, D)
    return mha_reference(q, k, v, q_offset, kv_len,
                         sliding_window=sliding_window, sm_scale=sm_scale,
                         logit_softcap=logit_softcap,
                         window_kind=window_kind, sinks=sinks)


def _window_start_page(q_off, iq, *, block_q, page, total_pages, num_j,
                       sliding_window, window_kind="sliding"):
    """First page slot a windowed (b, iq) program needs; shared by the
    index_map and the kernel body (ops/attention._window_start_block).
    ``chunked`` windows start at the q block's chunk boundary
    (Llama-4)."""
    qmin = q_off + iq * block_q
    if window_kind == "chunked":
        start = (qmin // sliding_window * sliding_window) // page
    else:
        start = (qmin - sliding_window + 1) // page
    return jnp.clip(start, 0, total_pages - num_j)


def _paged_body(q_off_ref, kv_len_ref, q_ref, k_ref, v_ref, o_ref, m_scr,
                l_scr, acc_scr, *, block_q, page, group, scale,
                sliding_window=None, total_pages=None, ks_ref=None,
                vs_ref=None, logit_softcap=None, window_kind="sliding",
                sinks_ref=None):
    """Shared online-softmax body; ks/vs present => fused int8 dequant
    (per-token scales correct score/probability columns, as in
    ops/quantized_attention.py)."""
    b = pl.program_id(0)
    iq = pl.program_id(2)
    j = pl.program_id(3)  # page slot within the (windowed) grid
    num_j = pl.num_programs(3)

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # absolute page slot: with a sliding window the grid axis is a
    # window of page slots offset per (batch, q-block) — must match the
    # index_map in paged_attention()
    je = j
    if sliding_window is not None:
        je = j + _window_start_page(
            q_off_ref[b], iq, block_q=block_q, page=page,
            total_pages=total_pages, num_j=num_j,
            sliding_window=sliding_window, window_kind=window_kind)

    # pages beyond the sequence (or, with a window, pages entirely older
    # than the oldest query's window) are skipped: the index_map pinned
    # their DMA to the previous live block (revisit => no HBM read) and
    # this guard skips their compute
    live = je * page < kv_len_ref[b]
    # causal skip: pages fully above this q block's diagonal contribute
    # nothing (multi-block paged prefill)
    live &= je * page <= q_off_ref[b] + (iq + 1) * block_q - 1
    if sliding_window is not None and window_kind != "chunked":
        live &= ((je + 1) * page
                 > q_off_ref[b] + iq * block_q - sliding_window)

    @pl.when(live)
    def _():
        # native-dtype MXU dots with f32 accumulation; int8 pages
        # dequantize into the query dtype in-register (exact in bf16)
        q = q_ref[0].reshape(group * block_q, -1)
        k = k_ref[0, 0].astype(q.dtype)  # [page, D]
        v = v_ref[0, 0].astype(q.dtype)

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if ks_ref is not None:
            s = s * ks_ref[0].astype(jnp.float32)  # [1, page]
        if logit_softcap is not None:
            s = logit_softcap * jnp.tanh(s / logit_softcap)

        # 1-D broadcast positions + folded causal/length compare
        # (see ops/attention.py _flash_kernel)
        qpos = (q_off_ref[b] + iq * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (group * block_q, 1), 0) % block_q)
        kpos = (je * page + jax.lax.broadcasted_iota(
            jnp.int32, (1, page), 1))
        mask = kpos <= jnp.minimum(qpos, kv_len_ref[b] - 1)
        if sliding_window is not None:
            if window_kind == "chunked":
                mask &= kpos // sliding_window == qpos // sliding_window
            else:
                mask &= kpos > qpos - sliding_window
        s = jnp.where(mask, s, _NEG_INF)

        m_prev = m_scr[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_scr[:] = alpha * l_scr[:] + jnp.sum(p, axis=1, keepdims=True)
        if vs_ref is not None:
            p = p * vs_ref[0].astype(jnp.float32)
        acc_scr[:] = alpha * acc_scr[:] + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_scr[:] = m_new

    @pl.when(j == num_j - 1)
    def _():
        l = l_scr[:]
        if sinks_ref is not None:
            # attention sink (GPT-OSS): tail correction of the carries
            # (ops/attention._flash_kernel)
            m = m_scr[:]
            snk = sinks_ref[0]  # [group*bq, 1] f32, wrapper-expanded
            m2 = jnp.maximum(m, snk)
            l2 = l * jnp.exp(m - m2) + jnp.exp(snk - m2)
            out = acc_scr[:] * jnp.exp(m - m2) / l2
        else:
            safe = jnp.where(l == 0.0, 1.0, l)
            out = jnp.where(l == 0.0, 0.0, acc_scr[:] / safe)
        o_ref[0] = out.reshape(group, block_q, -1).astype(o_ref.dtype)


def _paged_kernel(pages_ref, q_off_ref, kv_len_ref, *rest, has_sinks=False,
                  **kw):
    if has_sinks:
        q_ref, k_ref, v_ref, sinks_ref, o_ref, m_scr, l_scr, acc_scr = rest
    else:
        q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr = rest
        sinks_ref = None
    _paged_body(q_off_ref, kv_len_ref, q_ref, k_ref, v_ref, o_ref, m_scr,
                l_scr, acc_scr, sinks_ref=sinks_ref, **kw)


def _paged_kernel_q(pages_ref, q_off_ref, kv_len_ref, *rest,
                    has_sinks=False, **kw):
    if has_sinks:
        (q_ref, k_ref, v_ref, ks_ref, vs_ref, sinks_ref, o_ref, m_scr,
         l_scr, acc_scr) = rest
    else:
        (q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref, m_scr, l_scr,
         acc_scr) = rest
        sinks_ref = None
    _paged_body(q_off_ref, kv_len_ref, q_ref, k_ref, v_ref, o_ref, m_scr,
                l_scr, acc_scr, ks_ref=ks_ref, vs_ref=vs_ref,
                sinks_ref=sinks_ref, **kw)


@functools.partial(
    jax.jit, static_argnames=("block_q", "interpret", "sliding_window",
                              "sm_scale", "logit_softcap", "window_kind"))
def paged_attention(
    q: jax.Array,
    k_pool: jax.Array,
    v_pool: jax.Array,
    page_table: jax.Array,
    q_offset: jax.Array,
    kv_len: jax.Array,
    *,
    block_q: int = 128,
    interpret: Optional[bool] = None,
    sliding_window: Optional[int] = None,
    sm_scale: Optional[float] = None,
    logit_softcap: Optional[float] = None,
    window_kind: str = "sliding",
    sinks: Optional[jax.Array] = None,
) -> jax.Array:
    """Attention over paged KV.

    Args:
        q: [B, T, H, D] queries (decode: T == 1).
        k_pool, v_pool: [P, H_kv, page_size, D] global page pools —
            head-major pages, consumed directly (one sequential DMA per
            page; a token-major arena would cost a whole-arena relayout
            per layer per call).
        page_table: int32 [B, NP] page ids per sequence (entries past the
            sequence's pages may be any valid id — they are masked out).
        q_offset, kv_len: int32 [B] as in ops.attention.flash_attention.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, T, H, D = q.shape
    P, Hkv, page, _ = k_pool.shape
    NP = page_table.shape[1]
    if H % Hkv:
        raise ValueError(f"H ({H}) must divide into H_kv ({Hkv})")
    group = H // Hkv
    scale = sm_scale if sm_scale is not None else 1.0 / (D**0.5)

    bq = min(block_q, _round_up(T, 16))
    Tp = _round_up(T, bq)
    qh = jnp.pad(q.transpose(0, 2, 1, 3),
                 ((0, 0), (0, 0), (0, Tp - T), (0, 0)))
    kp = k_pool
    vp = v_pool

    num_j = NP
    if sliding_window is not None:
        # the grid's page axis shrinks to the window span; the index_map
        # slides it per (batch, q-block)
        num_j = min(NP, (sliding_window + bq - 2) // page + 2)
    grid = (B, Hkv, Tp // bq, num_j)

    def page_index(b, h, iq, j, pt, q_off, kv_len):
        # dead slots (beyond the sequence's live pages) pin their DMA to
        # the last live page: consecutive identical block indices are
        # recognized by the pipeline as revisits and fetch NOTHING, so
        # HBM reads scale with live tokens, not table width (r1 gap:
        # PARITY.md "paged DMA still fetches masked-out pages")
        je = j
        if sliding_window is not None:
            je = j + _window_start_page(
                q_off[b], iq, block_q=bq, page=page, total_pages=NP,
                num_j=num_j, sliding_window=sliding_window,
                window_kind=window_kind)
        live = jnp.maximum((kv_len[b] + page - 1) // page, 1)
        # pages above this q block's causal limit are dead too (paged
        # prefill): pin them with the same revisit trick
        causal = (q_off[b] + (iq + 1) * bq - 1) // page + 1
        jm = jnp.minimum(je, jnp.minimum(live, causal) - 1)
        return (pt[b, jm], h, 0, 0)

    has_sinks = sinks is not None
    kernel = functools.partial(_paged_kernel, block_q=bq, page=page,
                               group=group, scale=scale,
                               sliding_window=sliding_window,
                               total_pages=NP,
                               logit_softcap=logit_softcap,
                               window_kind=window_kind,
                               has_sinks=has_sinks)

    in_specs = [
        pl.BlockSpec((1, group, bq, D),
                     lambda b, h, iq, j, pt, *_: (b, h, iq, 0)),
        pl.BlockSpec((1, 1, page, D), page_index),
        pl.BlockSpec((1, 1, page, D), page_index),
    ]
    inputs = [qh, kp, vp]
    if has_sinks:
        in_specs.append(pl.BlockSpec(
            (1, group * bq, 1), lambda b, h, iq, j, pt, *_: (h, 0, 0)))
        inputs.append(jnp.repeat(
            jnp.asarray(sinks, jnp.float32).reshape(Hkv, group, 1),
            bq, axis=1).reshape(Hkv, group * bq, 1))
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,  # page_table, q_offset, kv_len
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, group, bq, D),
                                   lambda b, h, iq, j, pt, *_: (b, h, iq, 0)),
            scratch_shapes=[
                pltpu.VMEM((group * bq, 1), jnp.float32),
                pltpu.VMEM((group * bq, 1), jnp.float32),
                pltpu.VMEM((group * bq, D), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, Tp, D), q.dtype),
        interpret=interpret,
    )(page_table.astype(jnp.int32), q_offset.astype(jnp.int32),
      kv_len.astype(jnp.int32), *inputs)
    return out[:, :, :T].transpose(0, 2, 1, 3)


def quantized_paged_attention_reference(q, k_sym_pool, v_sym_pool,
                                        k_scale_pool, v_scale_pool,
                                        page_table, q_offset, kv_len,
                                        sliding_window=None, sm_scale=None,
                                        logit_softcap=None,
                                        window_kind="sliding",
                                        sinks=None):
    """Dequantize pages densely, then dense attention (tests/CPU)."""
    B = q.shape[0]
    P, Hkv, page, D = k_sym_pool.shape
    NP = page_table.shape[1]

    def deq(sym_pool, scale_pool):
        x = sym_pool[page_table].astype(jnp.float32)  # [B, NP, H, page, D]
        s = scale_pool[page_table]  # [B, NP, page]
        x = x * s[:, :, None, :, None]
        return x.transpose(0, 1, 3, 2, 4).reshape(B, NP * page, Hkv, D)

    return mha_reference(q, deq(k_sym_pool, k_scale_pool),
                         deq(v_sym_pool, v_scale_pool), q_offset, kv_len,
                         sliding_window=sliding_window, sm_scale=sm_scale,
                         logit_softcap=logit_softcap,
                         window_kind=window_kind, sinks=sinks)


@functools.partial(
    jax.jit, static_argnames=("block_q", "interpret", "sliding_window",
                              "sm_scale", "logit_softcap", "window_kind"))
def quantized_paged_attention(
    q: jax.Array,
    k_sym_pool: jax.Array,  # int8 [P, H_kv, page, D] (head-major pages)
    v_sym_pool: jax.Array,
    k_scale_pool: jax.Array,  # f32 [P, page] per-token scales
    v_scale_pool: jax.Array,
    page_table: jax.Array,
    q_offset: jax.Array,
    kv_len: jax.Array,
    *,
    block_q: int = 128,
    interpret: Optional[bool] = None,
    sliding_window: Optional[int] = None,
    sm_scale: Optional[float] = None,
    logit_softcap: Optional[float] = None,
    window_kind: str = "sliding",
    sinks: Optional[jax.Array] = None,
) -> jax.Array:
    """Paged attention over an int8 page arena — pages stream from HBM at
    half the bytes, dequantized in-register via the column-correction
    trick (ops/quantized_attention.py docstring)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, T, H, D = q.shape
    P, Hkv, page, _ = k_sym_pool.shape
    NP = page_table.shape[1]
    group = H // Hkv
    scale = sm_scale if sm_scale is not None else 1.0 / (D**0.5)

    bq = min(block_q, _round_up(T, 16))
    Tp = _round_up(T, bq)
    qh = jnp.pad(q.transpose(0, 2, 1, 3),
                 ((0, 0), (0, 0), (0, Tp - T), (0, 0)))
    kp = k_sym_pool
    vp = v_sym_pool
    ks = k_scale_pool[:, None, :]  # [P, 1, page]
    vs = v_scale_pool[:, None, :]

    num_j = NP
    if sliding_window is not None:
        num_j = min(NP, (sliding_window + bq - 2) // page + 2)
    grid = (B, Hkv, Tp // bq, num_j)

    def _page_slot(j, iq, pt, q_off, kv_len, b):
        je = j
        if sliding_window is not None:
            je = j + _window_start_page(
                q_off[b], iq, block_q=bq, page=page, total_pages=NP,
                num_j=num_j, sliding_window=sliding_window,
                window_kind=window_kind)
        live = jnp.maximum((kv_len[b] + page - 1) // page, 1)
        # causal-dead pages (above this q block's diagonal) pin too
        causal = (q_off[b] + (iq + 1) * bq - 1) // page + 1
        return pt[b, jnp.minimum(je, jnp.minimum(live, causal) - 1)]

    def kv_index(b, h, iq, j, pt, q_off, kv_len):
        return (_page_slot(j, iq, pt, q_off, kv_len, b), h, 0, 0)

    def scale_index(b, h, iq, j, pt, q_off, kv_len):
        return (_page_slot(j, iq, pt, q_off, kv_len, b), 0, 0)

    has_sinks = sinks is not None
    kernel = functools.partial(_paged_kernel_q, block_q=bq, page=page,
                               group=group, scale=scale,
                               sliding_window=sliding_window,
                               total_pages=NP,
                               logit_softcap=logit_softcap,
                               window_kind=window_kind,
                               has_sinks=has_sinks)
    in_specs = [
        pl.BlockSpec((1, group, bq, D),
                     lambda b, h, iq, j, pt, *_: (b, h, iq, 0)),
        pl.BlockSpec((1, 1, page, D), kv_index),
        pl.BlockSpec((1, 1, page, D), kv_index),
        pl.BlockSpec((1, 1, page), scale_index),
        pl.BlockSpec((1, 1, page), scale_index),
    ]
    inputs = [qh, kp, vp, ks, vs]
    if has_sinks:
        in_specs.append(pl.BlockSpec(
            (1, group * bq, 1), lambda b, h, iq, j, pt, *_: (h, 0, 0)))
        inputs.append(jnp.repeat(
            jnp.asarray(sinks, jnp.float32).reshape(Hkv, group, 1),
            bq, axis=1).reshape(Hkv, group * bq, 1))
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, group, bq, D),
                                   lambda b, h, iq, j, pt, *_: (b, h, iq, 0)),
            scratch_shapes=[
                pltpu.VMEM((group * bq, 1), jnp.float32),
                pltpu.VMEM((group * bq, 1), jnp.float32),
                pltpu.VMEM((group * bq, D), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, Tp, D), q.dtype),
        interpret=interpret,
    )(page_table.astype(jnp.int32), q_offset.astype(jnp.int32),
      kv_len.astype(jnp.int32), *inputs)
    return out[:, :, :T].transpose(0, 2, 1, 3)


# ---------------------------------------------------------------------------
# Manual-DMA paged decode kernel
# ---------------------------------------------------------------------------

N_BUF = 4  # in-flight page-copy depth for the DMA kernels
# target tokens per coalesced DMA: runs of physically-consecutive page
# ids (the PageAllocator hands them out sequentially) are fetched as ONE
# strided copy of up to SUPER_TOKENS/page pages instead of one copy per
# page — at page=64 a 16k-token decode otherwise issues ~256 copies per
# (batch, head) and is DMA-issue-rate bound, not bandwidth bound
# (docs/kernels.md; VERDICT r2 weak #2)
SUPER_TOKENS = 512
_SP_MAX = 8


def _super_pages(page: int) -> int:
    """Pages per coalesced group for a given page size."""
    return max(1, min(SUPER_TOKENS // page, _SP_MAX))


def _pack_factor(page, D):
    """Tokens per 128-lane DMA row. Mosaic requires HBM DMA slices to be
    128-lane aligned, so for D < 128 the wrapper views each page as
    ``[page*D/128, 128]`` and each landed row packs ``128 // D``
    consecutive tokens (D must divide 128; lane-crossing reshapes back
    to [page, D] do not lower in-kernel)."""
    if D >= 128:
        if D % 128:
            raise ValueError(
                f"head_dim {D} >= 128 must be a multiple of 128 "
                "(HBM DMA slices are 128-lane aligned)")
        return 1
    if 128 % D:
        raise ValueError(f"head_dim {D} < 128 must divide 128")
    return 128 // D


def _packed_scores(q, kv_k, *, page, D):
    """q @ K^T over a packed KV page, WITHOUT unpacking the lanes.

    kv_k: [page*D/128, 128] f32. When D < 128 the row r lanes
    [i*D:(i+1)*D] hold token ``pack*r + i``, so each sub-lane-range is
    scored by its own matmul (a static lane slice, which Mosaic lowers;
    a reshape to [page, D] would lane-cross and does not). Returns
    scores [rows, page] in PACKED column order: column ``i*R + r`` is
    token ``pack*r + i`` (R = page // pack)."""
    pack = _pack_factor(page, D)
    if pack == 1:
        return jax.lax.dot_general(
            q, kv_k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    return jnp.concatenate(
        [jax.lax.dot_general(q, kv_k[:, i * D:(i + 1) * D],
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
         for i in range(pack)], axis=1)


def _packed_col_token(cols, *, page, D):
    """Packed score column index -> token index within the page (the
    inverse of the _packed_scores column order)."""
    pack = _pack_factor(page, D)
    if pack == 1:
        return cols
    R = page // pack
    return pack * jax.lax.rem(cols, R) + cols // R


def _packed_pv(p, kv_v, *, page, D):
    """p @ V with p in packed column order and kv_v lane-packed: the
    column block for sub-lane-range i multiplies that range's values;
    the per-range [rows, D] products sum into the full output."""
    pack = _pack_factor(page, D)
    if pack == 1:
        return jax.lax.dot_general(p, kv_v, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    R = page // pack
    return sum(
        jax.lax.dot_general(p[:, i * R:(i + 1) * R],
                            kv_v[:, i * D:(i + 1) * D],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        for i in range(pack))


def _packed_scale_perm(scale_pool, *, page, D):
    """Permute per-token scale rows [P, page] into the packed column
    order so the kernel can apply them to _packed_scores output
    directly (outside-kernel gather; [P, page] f32 is tiny)."""
    pack = _pack_factor(page, D)
    if pack == 1:
        return scale_pool
    R = page // pack
    cols = jnp.arange(page)
    return scale_pool[:, pack * (cols % R) + cols // R]


def _super_scales(rows, *, page, D, sp):
    """Assemble the packed scale vector of a coalesced super-page from
    its landed per-page rows.

    ``rows``: [sp, 1, >=page] VMEM scale rows, each in its own page's
    packed column order (``_packed_scale_perm``). The super-page packed
    order of the fused score matrix is column ``i*R_tot + p*R + rr``
    (R = page/pack, R_tot = sp*R) -> page ``p``, token ``pack*rr + i``
    — i.e. the group vector is the pages' R-lane blocks re-concatenated
    i-major. STATIC slices + a lane concat, which Mosaic lowers (same
    op _packed_scores uses); no lane-crossing reshape involved."""
    pack = _pack_factor(page, D)
    R = page // pack
    parts = []
    for i in range(pack):
        for p in range(sp):
            parts.append(rows[p][:, i * R:(i + 1) * R])
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]


def _group_info(pages_ref, b, start_pg, live, j, *, sp, pool_pages):
    """Page ids of coalesced group ``j`` plus whether its LIVE members
    are physically consecutive (one strided DMA covers them all).

    Dead trailing slots (beyond ``live``) do not break a run — the
    coalesced copy reads their pool rows anyway (bounds-checked against
    the pool) and the mask discards them. Scalar-prefetch reads only."""
    s0 = start_pg + j * sp
    pg0 = pages_ref[b, jnp.minimum(s0, live - 1)]
    ids = [pg0]
    seq = pg0 + sp <= pool_pages
    for i in range(1, sp):
        si = s0 + i
        pgi = pages_ref[b, jnp.minimum(si, live - 1)]
        ids.append(pgi)
        seq = jnp.logical_and(
            seq, jnp.logical_or(pgi == pg0 + i, si >= live))
    return ids, pg0, seq


def _paged_dma_kernel(pages_ref, q_off_ref, kv_len_ref, *refs, block_q,
                      page, group, scale, super_pages=1,
                      sliding_window=None, logit_softcap=None,
                      window_kind="sliding", has_sinks=False):
    """One program per (batch, kv-head, q-block): the KV pool stays in
    HBM (memory_space=ANY) and the kernel itself streams the sequence's
    LIVE pages through a double-buffered async-copy pipeline.

    This removes the two costs of the BlockSpec formulation:

    - per-grid-step fixed overhead (the grid had a step per page-table
      SLOT; at page=64 a 16k-position table is 256 steps per (b, h),
      and grid bookkeeping — not bandwidth — dominated decode);
    - table-width work: the loop runs exactly ``ceil(kv_len/page)``
      iterations (minus pages older than the sliding window), so cost
      tracks live tokens with no revisit tricks.

    **Coalesced super-pages** (round 3): each pipeline step covers
    ``super_pages`` consecutive page-table slots. When their physical
    ids form a run (``_group_info``; the PageAllocator hands out
    sequential ids, so runs are the common case) the whole group lands
    in ONE strided ``make_async_copy`` — the per-copy issue cost is
    paid once per SUPER_TOKENS instead of once per page. Fragmented
    groups fall back to one copy per page into the same buffer. Compute
    fuses too: the lane-packed layout satisfies ``token = pack*row + i``
    uniformly across the stacked group (rows per page = page/pack), so
    the group is scored as ONE packed page of ``super_pages*page``
    tokens — one MXU dot and one online-softmax update per group.

    pallas_guide.md "Patterns: Double Buffering" is the template; the
    online-softmax carries ride the fori_loop as values. HBM DMA slices
    must be 128-lane aligned, so the wrapper views each page as
    ``[page*D/128, 128]`` rows (``dma_shape``); scoring works directly
    on the packed rows (_packed_scores / _packed_col_token / _packed_pv).
    """
    if has_sinks:
        q_ref, k_hbm, v_hbm, sinks_ref, o_ref = refs
    else:
        q_ref, k_hbm, v_hbm, o_ref = refs
        sinks_ref = None
    b = pl.program_id(0)
    h = pl.program_id(1)
    iq = pl.program_id(2)
    SP = super_pages
    POOL = k_hbm.shape[0]

    live = (kv_len_ref[b] + page - 1) // page
    # pages above this q block's causal diagonal are dead (multi-block
    # paged prefill): the loop simply never visits them
    live = jnp.minimum(
        live, (q_off_ref[b] + (iq + 1) * block_q - 1) // page + 1)
    start_pg = jnp.int32(0)
    if sliding_window is not None:
        qmin = q_off_ref[b] + iq * block_q
        if window_kind == "chunked":
            start_pg = (qmin // sliding_window * sliding_window) // page
        else:
            start_pg = jnp.maximum((qmin - sliding_window + 1) // page, 0)
    num_j = live - start_pg
    num_g = (num_j + SP - 1) // SP  # coalesced groups

    # native-dtype MXU dots, f32 accumulation (see ops/attention.py)
    q = q_ref[0].reshape(group * block_q, -1)

    def scoped(k_scr, v_scr, sem):
        # k_scr/v_scr: [N_BUF, SP, rows_per_page, lanes] VMEM buffers
        def start_group(slot, g):
            ids, pg0, seq = _group_info(pages_ref, b, start_pg, live, g,
                                        sp=SP, pool_pages=POOL)
            if SP == 1:
                pltpu.make_async_copy(k_hbm.at[ids[0], h],
                                      k_scr.at[slot, 0],
                                      sem.at[slot, 0]).start()
                pltpu.make_async_copy(v_hbm.at[ids[0], h],
                                      v_scr.at[slot, 0],
                                      sem.at[slot, 1]).start()
                return

            @pl.when(seq)
            def _():
                pltpu.make_async_copy(k_hbm.at[pl.ds(pg0, SP), h],
                                      k_scr.at[slot],
                                      sem.at[slot, 0]).start()
                pltpu.make_async_copy(v_hbm.at[pl.ds(pg0, SP), h],
                                      v_scr.at[slot],
                                      sem.at[slot, 1]).start()

            @pl.when(jnp.logical_not(seq))
            def _():
                for i in range(SP):
                    pltpu.make_async_copy(k_hbm.at[ids[i], h],
                                          k_scr.at[slot, i],
                                          sem.at[slot, 0]).start()
                    pltpu.make_async_copy(v_hbm.at[ids[i], h],
                                          v_scr.at[slot, i],
                                          sem.at[slot, 1]).start()

        def wait_group(slot, g):
            ids, pg0, seq = _group_info(pages_ref, b, start_pg, live, g,
                                        sp=SP, pool_pages=POOL)
            if SP == 1:
                pltpu.make_async_copy(k_hbm.at[ids[0], h],
                                      k_scr.at[slot, 0],
                                      sem.at[slot, 0]).wait()
                pltpu.make_async_copy(v_hbm.at[ids[0], h],
                                      v_scr.at[slot, 0],
                                      sem.at[slot, 1]).wait()
                return

            @pl.when(seq)
            def _():
                pltpu.make_async_copy(k_hbm.at[pl.ds(pg0, SP), h],
                                      k_scr.at[slot],
                                      sem.at[slot, 0]).wait()
                pltpu.make_async_copy(v_hbm.at[pl.ds(pg0, SP), h],
                                      v_scr.at[slot],
                                      sem.at[slot, 1]).wait()

            @pl.when(jnp.logical_not(seq))
            def _():
                for i in range(SP):
                    pltpu.make_async_copy(k_hbm.at[ids[i], h],
                                          k_scr.at[slot, i],
                                          sem.at[slot, 0]).wait()
                    pltpu.make_async_copy(v_hbm.at[ids[i], h],
                                          v_scr.at[slot, i],
                                          sem.at[slot, 1]).wait()

        # N_BUF-deep pipeline: up to N_BUF - 1 group copies in flight
        # ahead of the compute, hiding per-DMA issue latency (double
        # buffering left ~40% of the loop waiting at 16k live tokens)
        for w in range(N_BUF - 1):
            @pl.when(w < num_g)
            def _(w=w):
                start_group(w, w)

        spage = SP * page  # tokens scored per loop iteration

        def body(g, carry):
            m, l, acc = carry
            slot = jax.lax.rem(g, N_BUF)

            @pl.when(g + N_BUF - 1 < num_g)
            def _():
                start_group(jax.lax.rem(g + N_BUF - 1, N_BUF),
                            g + N_BUF - 1)

            wait_group(slot, g)

            D = q.shape[-1]
            rows_kv = SP * k_scr.shape[2]
            kv_k = k_scr[slot].astype(q.dtype).reshape(rows_kv, -1)
            kv_v = v_scr[slot].astype(q.dtype).reshape(rows_kv, -1)
            s = _packed_scores(q, kv_k, page=spage, D=D) * scale
            if logit_softcap is not None:
                s = logit_softcap * jnp.tanh(s / logit_softcap)

            qpos = (q_off_ref[b] + iq * block_q
                    + jax.lax.broadcasted_iota(
                        jnp.int32, (group * block_q, 1), 0) % block_q)
            cols = jax.lax.broadcasted_iota(
                jnp.int32, (1, spage), 1)
            kpos = ((start_pg + g * SP) * page
                    + _packed_col_token(cols, page=spage, D=D))
            mask = kpos <= jnp.minimum(qpos, kv_len_ref[b] - 1)
            if sliding_window is not None:
                if window_kind == "chunked":
                    mask &= (kpos // sliding_window
                             == qpos // sliding_window)
                else:
                    mask &= kpos > qpos - sliding_window
            s = jnp.where(mask, s, _NEG_INF)

            m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l = alpha * l + jnp.sum(p, axis=1, keepdims=True)
            acc = alpha * acc + _packed_pv(p.astype(kv_v.dtype), kv_v,
                                           page=spage, D=D)
            return m_new, l, acc

        rows = group * block_q
        D = q.shape[-1]
        m0 = jnp.full((rows, 1), _NEG_INF, jnp.float32)
        l0 = jnp.zeros((rows, 1), jnp.float32)
        a0 = jnp.zeros((rows, D), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, num_g, body, (m0, l0, a0))
        if sinks_ref is not None:
            snk = sinks_ref[0]  # [rows, 1] f32, wrapper-expanded
            m2 = jnp.maximum(m, snk)
            l2 = l * jnp.exp(m - m2) + jnp.exp(snk - m2)
            out = acc * jnp.exp(m - m2) / l2
        else:
            safe = jnp.where(l == 0.0, 1.0, l)
            out = jnp.where(l == 0.0, 0.0, acc / safe)
        o_ref[0] = out.reshape(group, block_q, -1).astype(o_ref.dtype)

    pl.run_scoped(
        scoped,
        k_scr=pltpu.VMEM((N_BUF, SP) + tuple(k_hbm.shape[2:]),
                         k_hbm.dtype),
        v_scr=pltpu.VMEM((N_BUF, SP) + tuple(v_hbm.shape[2:]),
                         v_hbm.dtype),
        sem=pltpu.SemaphoreType.DMA((N_BUF, 2)),
    )


def _dma_page_view(pool):
    """[P, H, page, D] -> [P, H, page*D/128, 128] when D is not lane-
    aligned: HBM DMA slices must be multiples of 128 in the last dim.
    Contiguous reshape — no data movement.

    The landed rows are NOT reshaped back in-kernel (lane-crossing
    vector reshapes don't lower under Mosaic); instead the kernel scores
    each packed sub-lane-range with its own matmul and remaps the score
    columns (_packed_scores / _packed_col_token / _packed_pv), so the
    DMA kernels cover D=64 (tinyllama, longchat-tiny, phi-class) as well
    as the D=128 7B+ families."""
    P, H, page, D = pool.shape
    if D % 128 == 0:
        return pool
    _pack_factor(page, D)  # validates 128 % D == 0
    if page % (128 // D):
        raise ValueError(f"page ({page}) must be a multiple of {128 // D}")
    return pool.reshape(P, H, page * D // 128, 128)


@functools.partial(
    jax.jit, static_argnames=("block_q", "interpret", "sliding_window",
                              "sm_scale", "logit_softcap", "window_kind"))
def paged_attention_dma(
    q: jax.Array,
    k_pool: jax.Array,  # [P, H_kv, page, D] head-major pages (HBM)
    v_pool: jax.Array,
    page_table: jax.Array,
    q_offset: jax.Array,
    kv_len: jax.Array,
    *,
    block_q: int = 128,
    interpret: Optional[bool] = None,
    sliding_window: Optional[int] = None,
    sm_scale: Optional[float] = None,
    logit_softcap: Optional[float] = None,
    window_kind: str = "sliding",
    sinks: Optional[jax.Array] = None,
) -> jax.Array:
    """:func:`paged_attention` with kernel-driven page DMA (see
    _paged_dma_kernel). Same contract; preferred for decode."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, T, H, D = q.shape
    P, Hkv, page, _ = k_pool.shape
    if H % Hkv:
        raise ValueError(f"H ({H}) must divide into H_kv ({Hkv})")
    group = H // Hkv
    scale = sm_scale if sm_scale is not None else 1.0 / (D**0.5)

    bq = min(block_q, _round_up(T, 16))
    Tp = _round_up(T, bq)
    qh = jnp.pad(q.transpose(0, 2, 1, 3),
                 ((0, 0), (0, 0), (0, Tp - T), (0, 0)))
    k_pool = _dma_page_view(k_pool)
    v_pool = _dma_page_view(v_pool)

    grid = (B, Hkv, Tp // bq)
    has_sinks = sinks is not None
    kernel = functools.partial(_paged_dma_kernel, block_q=bq, page=page,
                               group=group, scale=scale,
                               super_pages=_super_pages(page),
                               sliding_window=sliding_window,
                               logit_softcap=logit_softcap,
                               window_kind=window_kind,
                               has_sinks=has_sinks)
    in_specs = [
        pl.BlockSpec((1, group, bq, D),
                     lambda b, h, iq, *_: (b, h, iq, 0)),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    inputs = [qh, k_pool, v_pool]
    if has_sinks:
        in_specs.append(pl.BlockSpec(
            (1, group * bq, 1), lambda b, h, iq, *_: (h, 0, 0)))
        inputs.append(jnp.repeat(
            jnp.asarray(sinks, jnp.float32).reshape(Hkv, group, 1),
            bq, axis=1).reshape(Hkv, group * bq, 1))
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, group, bq, D),
                                   lambda b, h, iq, *_: (b, h, iq, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, Tp, D), q.dtype),
        interpret=interpret,
    )(page_table.astype(jnp.int32), q_offset.astype(jnp.int32),
      kv_len.astype(jnp.int32), *inputs)
    return out[:, :, :T].transpose(0, 2, 1, 3)


def _paged_dma_kernel_q(pages_ref, q_off_ref, kv_len_ref, *refs, block_q,
                        page, group, scale, super_pages=1,
                        sliding_window=None, window_kind="sliding",
                        logit_softcap=None, has_sinks=False):
    """Int8 variant of :func:`_paged_dma_kernel`: pages stream as int8
    (half the bytes) together with their per-token scale rows; dequant
    is the usual column-correction fused into the online softmax.

    Round 4 (VERDICT r3 next #5): compute is FUSED across the
    coalesced group exactly like the bf16 kernel — one packed MXU dot
    and one online-softmax update per ``super_pages * page`` tokens.
    The r3 version kept per-sub-page compute because regrouping the
    landed per-page scale rows into the super-page packed column order
    looked like a lane-crossing relayout; it is not — the orders agree
    blockwise, so the group vector is just ``pack * SP`` STATIC
    ``R``-lane slices concatenated (``_super_scales``), the same
    concat-along-lanes Mosaic already lowers for ``_packed_scores``.
    No writer-side pool layout change is needed."""
    if has_sinks:
        q_ref, k_hbm, v_hbm, ks_hbm, vs_hbm, sinks_ref, o_ref = refs
    else:
        q_ref, k_hbm, v_hbm, ks_hbm, vs_hbm, o_ref = refs
        sinks_ref = None
    b = pl.program_id(0)
    h = pl.program_id(1)
    iq = pl.program_id(2)
    SP = super_pages
    POOL = k_hbm.shape[0]

    live = (kv_len_ref[b] + page - 1) // page
    # causal-dead pages never visited (see _paged_dma_kernel)
    live = jnp.minimum(
        live, (q_off_ref[b] + (iq + 1) * block_q - 1) // page + 1)
    start_pg = jnp.int32(0)
    if sliding_window is not None:
        qmin = q_off_ref[b] + iq * block_q
        if window_kind == "chunked":
            start_pg = (qmin // sliding_window * sliding_window) // page
        else:
            start_pg = jnp.maximum((qmin - sliding_window + 1) // page, 0)
    num_j = live - start_pg
    num_g = (num_j + SP - 1) // SP

    # native-dtype MXU dots, f32 accumulation (see ops/attention.py)
    q = q_ref[0].reshape(group * block_q, -1)

    def scoped(k_scr, v_scr, ks_scr, vs_scr, sem):
        streams = ((k_hbm, k_scr, 0), (v_hbm, v_scr, 1),
                   (ks_hbm, ks_scr, 2), (vs_hbm, vs_scr, 3))

        def group_dmas(slot, g):
            """List of (descriptor, predicate) for group ``g``; scale
            pools index [P, ...] (no head axis)."""
            ids, pg0, seq = _group_info(pages_ref, b, start_pg, live, g,
                                        sp=SP, pool_pages=POOL)
            out = []
            for hbm, scr, si in streams:
                headed = hbm is k_hbm or hbm is v_hbm
                if SP == 1:
                    src = hbm.at[ids[0], h] if headed else hbm.at[ids[0]]
                    out.append((pltpu.make_async_copy(
                        src, scr.at[slot, 0], sem.at[slot, si]), None))
                    continue
                src = (hbm.at[pl.ds(pg0, SP), h] if headed
                       else hbm.at[pl.ds(pg0, SP)])
                out.append((pltpu.make_async_copy(
                    src, scr.at[slot], sem.at[slot, si]), seq))
                for i in range(SP):
                    src = hbm.at[ids[i], h] if headed else hbm.at[ids[i]]
                    out.append((pltpu.make_async_copy(
                        src, scr.at[slot, i], sem.at[slot, si]),
                        jnp.logical_not(seq)))
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

        spage = SP * page  # tokens scored per loop iteration

        def body(g, carry):
            m, l, acc = carry
            slot = jax.lax.rem(g, N_BUF)

            @pl.when(g + N_BUF - 1 < num_g)
            def _():
                start_group(jax.lax.rem(g + N_BUF - 1, N_BUF),
                            g + N_BUF - 1)

            wait_group(slot, g)

            D = q.shape[-1]
            # fused group compute: stack the landed pages to one packed
            # super-page (token = pack*row + i holds globally, see the
            # bf16 kernel), assemble the matching scale vectors from
            # static R-lane slices, then ONE scored dot + ONE
            # online-softmax update for the whole group. Dead sub-pages
            # (beyond live) are fully masked; their (finite, stale)
            # scales touch only masked columns.
            rows_kv = SP * k_scr.shape[2]
            kv_k = k_scr[slot].astype(q.dtype).reshape(rows_kv, -1)
            kv_v = v_scr[slot].astype(q.dtype).reshape(rows_kv, -1)
            ksc = _super_scales(ks_scr[slot], page=page, D=D,
                                sp=SP).astype(jnp.float32)
            vsc = _super_scales(vs_scr[slot], page=page, D=D,
                                sp=SP).astype(jnp.float32)
            s = _packed_scores(q, kv_k, page=spage, D=D) * (ksc * scale)
            if logit_softcap is not None:
                s = logit_softcap * jnp.tanh(s / logit_softcap)

            qpos = (q_off_ref[b] + iq * block_q
                    + jax.lax.broadcasted_iota(
                        jnp.int32, (group * block_q, 1), 0) % block_q)
            cols = jax.lax.broadcasted_iota(jnp.int32, (1, spage), 1)
            kpos = ((start_pg + g * SP) * page
                    + _packed_col_token(cols, page=spage, D=D))
            mask = kpos <= jnp.minimum(qpos, kv_len_ref[b] - 1)
            if sliding_window is not None:
                if window_kind == "chunked":
                    mask &= (kpos // sliding_window
                             == qpos // sliding_window)
                else:
                    mask &= kpos > qpos - sliding_window
            s = jnp.where(mask, s, _NEG_INF)

            m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p2 = jnp.exp(s - m_new)
            l = alpha * l + jnp.sum(p2, axis=1, keepdims=True)
            acc = alpha * acc + _packed_pv(
                (p2 * vsc).astype(kv_v.dtype), kv_v, page=spage, D=D)
            return m_new, l, acc

        rows = group * block_q
        D = q.shape[-1]
        m0 = jnp.full((rows, 1), _NEG_INF, jnp.float32)
        l0 = jnp.zeros((rows, 1), jnp.float32)
        a0 = jnp.zeros((rows, D), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, num_g, body, (m0, l0, a0))
        if sinks_ref is not None:
            snk = sinks_ref[0]  # [rows, 1] f32, wrapper-expanded
            m2 = jnp.maximum(m, snk)
            l2 = l * jnp.exp(m - m2) + jnp.exp(snk - m2)
            out = acc * jnp.exp(m - m2) / l2
        else:
            safe = jnp.where(l == 0.0, 1.0, l)
            out = jnp.where(l == 0.0, 0.0, acc / safe)
        o_ref[0] = out.reshape(group, block_q, -1).astype(o_ref.dtype)

    pl.run_scoped(
        scoped,
        k_scr=pltpu.VMEM((N_BUF, SP) + tuple(k_hbm.shape[2:]),
                         k_hbm.dtype),
        v_scr=pltpu.VMEM((N_BUF, SP) + tuple(v_hbm.shape[2:]),
                         v_hbm.dtype),
        ks_scr=pltpu.VMEM((N_BUF, SP) + tuple(ks_hbm.shape[1:]),
                          ks_hbm.dtype),
        vs_scr=pltpu.VMEM((N_BUF, SP) + tuple(vs_hbm.shape[1:]),
                          vs_hbm.dtype),
        sem=pltpu.SemaphoreType.DMA((N_BUF, 4)),
    )


@functools.partial(
    jax.jit, static_argnames=("block_q", "interpret", "sliding_window",
                              "sm_scale", "logit_softcap", "window_kind"))
def quantized_paged_attention_dma(
    q: jax.Array,
    k_sym_pool: jax.Array,  # int8 [P, H_kv, page, D]
    v_sym_pool: jax.Array,
    k_scale_pool: jax.Array,  # f32 [P, page]
    v_scale_pool: jax.Array,
    page_table: jax.Array,
    q_offset: jax.Array,
    kv_len: jax.Array,
    *,
    block_q: int = 128,
    interpret: Optional[bool] = None,
    sliding_window: Optional[int] = None,
    sm_scale: Optional[float] = None,
    logit_softcap: Optional[float] = None,
    window_kind: str = "sliding",
    sinks: Optional[jax.Array] = None,
) -> jax.Array:
    """:func:`quantized_paged_attention` with kernel-driven page DMA."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, T, H, D = q.shape
    P, Hkv, page, _ = k_sym_pool.shape
    group = H // Hkv
    scale = sm_scale if sm_scale is not None else 1.0 / (D**0.5)

    bq = min(block_q, _round_up(T, 16))
    Tp = _round_up(T, bq)
    qh = jnp.pad(q.transpose(0, 2, 1, 3),
                 ((0, 0), (0, 0), (0, Tp - T), (0, 0)))
    k_sym_pool = _dma_page_view(k_sym_pool)
    v_sym_pool = _dma_page_view(v_sym_pool)
    # scale rows: permute into packed column order (D < 128), then
    # lane-pad to 128 so their DMA slices are aligned
    pad = _round_up(page, 128) - page
    ks = jnp.pad(_packed_scale_perm(k_scale_pool, page=page, D=D),
                 ((0, 0), (0, pad)))[:, None, :]
    vs = jnp.pad(_packed_scale_perm(v_scale_pool, page=page, D=D),
                 ((0, 0), (0, pad)))[:, None, :]

    grid = (B, Hkv, Tp // bq)
    has_sinks = sinks is not None
    kernel = functools.partial(_paged_dma_kernel_q, block_q=bq, page=page,
                               group=group, scale=scale,
                               super_pages=_super_pages(page),
                               sliding_window=sliding_window,
                               logit_softcap=logit_softcap,
                               window_kind=window_kind,
                               has_sinks=has_sinks)
    in_specs = [
        pl.BlockSpec((1, group, bq, D),
                     lambda b, h, iq, *_: (b, h, iq, 0)),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    inputs = [qh, k_sym_pool, v_sym_pool, ks, vs]
    if has_sinks:
        in_specs.append(pl.BlockSpec(
            (1, group * bq, 1), lambda b, h, iq, *_: (h, 0, 0)))
        inputs.append(jnp.repeat(
            jnp.asarray(sinks, jnp.float32).reshape(Hkv, group, 1),
            bq, axis=1).reshape(Hkv, group * bq, 1))
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, group, bq, D),
                                   lambda b, h, iq, *_: (b, h, iq, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, Tp, D), q.dtype),
        interpret=interpret,
    )(page_table.astype(jnp.int32), q_offset.astype(jnp.int32),
      kv_len.astype(jnp.int32), *inputs)
    return out[:, :, :T].transpose(0, 2, 1, 3)
