"""Paged KV pool + paged forward pass.

Dense slots (llama.new_kv_cache) reserve ``S_max`` tokens per sequence;
the paged pool shares one global page arena across all sequences and
maps positions through per-sequence page tables, so HBM is bounded by
*actual* tokens resident (vLLM's memory model, rebuilt for TPU on the
Pallas paged-attention kernel in ops/paged_attention.py).

Page size should divide the cache-engine chunk_size so retrieved chunks
land on whole pages.
"""

import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lmcache_tpu.models import llama
from lmcache_tpu.models.llama import (_attn_residual, _mlp_residual,
                                      _qkv_heads, _rms_norm)
from lmcache_tpu.ops.paged_attention import (
    paged_attention, paged_attention_reference, quantized_paged_attention,
    quantized_paged_attention_reference)


def new_paged_kv_pool(cfg: llama.LlamaConfig, num_pages: int,
                      page_size: int) -> jax.Array:
    """Global page arena [L, 2, P, H_kv, page_size, D] — HEAD-major
    pages, so the Pallas kernel DMAs page blocks directly (a token-major
    arena would force a whole-arena relayout per layer per step)."""
    return jnp.zeros((cfg.n_layers, 2, num_pages, cfg.n_kv_heads,
                      page_size, cfg.head_dim), jnp.dtype(cfg.dtype))


class PageAllocator:
    """Host-side refcounted free-list of page ids (page 0 is reserved as
    the null page that padding page-table entries point at).

    Refcounts enable prefix sharing: requests with a common prompt
    prefix reference the SAME physical pages (``share``); a page returns
    to the free list only when its last referent releases it. Shared
    prefix pages are immutable by construction (each request writes only
    at positions past its shared prefix), so no copy-on-write copy is
    ever needed — sharing is always safe until divergence.

    Arena-as-cache: freed pages keep their content and can be pulled
    back out of the free list by id (``reclaim``) as long as they have
    not been reallocated. ``alloc`` hands out the LEAST-recently-freed
    pages first so cached prefixes survive as long as possible."""

    def __init__(self, num_pages: int):
        from collections import OrderedDict
        self.num_pages = num_pages
        # insertion order == recycle order: alloc pops the FRONT (pages
        # never used / least-recently freed), free appends to the BACK —
        # recently-freed prefix-cached pages are reallocated last. All
        # operations O(1) per page.
        self._free: "OrderedDict[int, None]" = OrderedDict(
            (p, None) for p in range(1, num_pages))
        self._rc: Dict[int, int] = {}

    @property
    def num_free(self) -> int:
        return len(self._free)

    def refcount(self, page: int) -> int:
        return self._rc.get(page, 0)

    def alloc(self, n: int) -> List[int]:
        if n > len(self._free):
            raise MemoryError(
                f"paged pool exhausted: want {n}, free {len(self._free)}")
        pages = [self._free.popitem(last=False)[0] for _ in range(n)]
        for p in pages:
            self._rc[p] = 1
        return pages

    def share(self, pages: List[int]) -> None:
        """Take an additional reference on already-allocated pages."""
        for p in pages:
            if self._rc.get(p, 0) <= 0:
                raise ValueError(f"page {p} is not allocated")
            self._rc[p] += 1

    def reclaim(self, pages: List[int]) -> None:
        """Pull specific FREE pages back out of the free list (their
        content is intact: nothing was allocated over them)."""
        for p in pages:
            if self._rc.get(p, 0) > 0:
                raise ValueError(f"page {p} is live, use share()")
            del self._free[p]
            self._rc[p] = 1

    def free(self, pages: List[int]) -> List[int]:
        """Drop one reference per page; returns the pages that actually
        reached refcount 0 and went back to the free list."""
        freed = []
        for p in pages:
            if not 0 < p < self.num_pages:
                raise ValueError(f"bad page id {p}")
            rc = self._rc.get(p, 1) - 1
            if rc <= 0:
                self._rc.pop(p, None)
                self._free[p] = None
                freed.append(p)
            else:
                self._rc[p] = rc
        return freed


def pages_needed(num_tokens: int, page_size: int) -> int:
    return -(-num_tokens // page_size)


def _shard_paged_attend(attend, mesh, n_kv_heads: int, batch: int, *,
                        quantized: bool, sinks: bool = False):
    """Wrap a paged-attention kernel in ``shard_map`` over ``mesh``.

    Pallas calls have no GSPMD partitioning rule, so under plain ``jit``
    a mesh-sharded arena would be all-gathered onto every chip before
    each call. But paged attention is *embarrassingly parallel over kv
    heads* (the kernel grid axis is the kv head; GQA groups never mix
    heads), so the manual-sharding formulation is exact and collective-
    free: each chip runs the kernel over its own head slice of the arena
    and its own query-head group slice, with page tables and lengths
    replicated. Batch shards over "data" the same way.

    Falls back to ``None`` (caller keeps the unwrapped kernel) when the
    head/batch extents don't divide the mesh — mirroring GSPMD's own
    divisibility requirement for the dense path.
    """
    from jax.sharding import PartitionSpec as P

    from lmcache_tpu.parallel.mesh import shard_map_unchecked

    tp = mesh.shape.get("model", 1)
    dp = mesh.shape.get("data", 1)
    if n_kv_heads % tp:
        return None
    # batch rides "data" when it divides (decode at full batch);
    # otherwise (B=1 prefill on a dp>1 mesh) replicate the batch — the
    # head sharding still avoids the arena gather, which is the cost
    # that matters
    bax = "data" if batch % dp == 0 else None

    qspec = P(bax, None, "model", None)  # [B, T, H, D] heads grouped
    pool = P(None, "model", None, None)  # [P, H_kv, page, D] arena
    tab = P(bax, None)  # [B, NP]
    vec = P(bax,)  # [B]
    if quantized:
        scl = P(None, None)  # [P, page] per-token scales, head-free
        in_specs = (qspec, pool, pool, scl, scl, tab, vec, vec)
    else:
        in_specs = (qspec, pool, pool, tab, vec, vec)
    if sinks:
        in_specs = in_specs + (P("model"),)  # [H] per-head sink logits

    return shard_map_unchecked(attend, mesh, in_specs=in_specs,
                     out_specs=qspec)


def forward_paged(
    params: llama.Params,
    cfg: llama.LlamaConfig,
    tokens: jax.Array,  # int32 [B, T]
    start_pos: jax.Array,  # int32 [B]
    kv_pool: jax.Array,  # [L, 2, P, H_kv, page, D] (head-major pages)
    page_table: jax.Array,  # int32 [B, NP]
    *,
    use_pallas: bool = True,
    last_logit_only: bool = False,
    mesh=None,
) -> Tuple[jax.Array, jax.Array]:
    """:func:`llama.forward` against the shared paged pool.

    New tokens' KV is scattered into the pages named by ``page_table``;
    attention gathers pages by DMA inside the Pallas kernel. Returns
    (logits, updated pool).

    With ``mesh``, the pallas kernel runs under ``shard_map`` with the
    arena's kv heads on "model" (see :func:`_shard_paged_attend`) — the
    sharded arena is consumed in place, never gathered.
    """
    B, T = tokens.shape
    page = kv_pool.shape[4]
    positions = start_pos[:, None] + jnp.arange(T)[None, :]  # [B, T]
    kv_len = start_pos + T
    if use_pallas:
        # the manual-DMA kernel covers D%128 (every 7B+ family) AND
        # D dividing 128 (tinyllama-class D=64, via packed-lane scoring
        # — ops/paged_attention._packed_scores); other head dims keep
        # the revisit-pinned grid kernel
        from lmcache_tpu.ops.paged_attention import paged_attention_dma
        D = cfg.head_dim
        impl = (paged_attention_dma
                if D % 128 == 0 or 128 % D == 0 else paged_attention)
    else:
        impl = paged_attention_reference

    def make(w):
        base = functools.partial(impl, sliding_window=w,
                                 sm_scale=cfg.sm_scale,
                                 logit_softcap=cfg.attn_logit_softcap,
                                 window_kind=cfg.local_attention_kind)
        if cfg.attn_sinks:
            def a(q, kp, vp, pt, q_off, kvl, snk, base=base):
                return base(q, kp, vp, pt, q_off, kvl, sinks=snk)
        else:
            a = base
        if use_pallas and mesh is not None:
            sharded = _shard_paged_attend(a, mesh, cfg.n_kv_heads, B,
                                          quantized=False,
                                          sinks=cfg.attn_sinks)
            if sharded is not None:
                a = sharded
        return a

    attend, layer_globals = llama._attend_dispatch(cfg, make)

    # per-(batch, new-token) page id and in-page offset
    pidx = jnp.take_along_axis(page_table, positions // page,
                               axis=1)  # [B, T]
    poff = positions % page
    heads = jnp.arange(cfg.n_kv_heads)[None, None, :]  # [1, 1, H_kv]

    x = llama._embed(params, cfg, tokens)

    def layer(x, scanned):
        lp, pool_l, g = scanned  # pool_l: [2, P, H_kv, page, D]
        h = llama._attn_input(x, lp, cfg)
        q, k, v = _qkv_heads(h, lp, cfg, positions, g)

        # scatter [B, T, H, D] new tokens into head-major pages:
        # pool[p, h, o] = kv[b, t, h] with (p, o) from the page table
        pool_l = pool_l.at[0, pidx[..., None], heads,
                           poff[..., None]].set(k.astype(pool_l.dtype))
        pool_l = pool_l.at[1, pidx[..., None], heads,
                           poff[..., None]].set(v.astype(pool_l.dtype))

        extra = (lp["sinks"],) if cfg.attn_sinks else ()
        attn = attend(g, q, pool_l[0], pool_l[1], page_table, start_pos,
                      kv_len, *extra)
        x = _attn_residual(x, attn.reshape(B, T, -1), lp, cfg)
        x = _mlp_residual(x, lp, cfg)
        return x, pool_l

    x, new_pool = jax.lax.scan(
        layer, x, (params["layers"], kv_pool, layer_globals))
    if last_logit_only:
        x = x[:, -1:]
    return llama._lm_logits(x, params, cfg), new_pool


def new_quantized_paged_pool(cfg: llama.LlamaConfig, num_pages: int,
                             page_size: int) -> Dict[str, jax.Array]:
    """Int8 page arena: {"sym" [L,2,P,H,page,D] i8, "scale" [L,2,P,page]}.

    Half the HBM of the bf16 arena; consumed by the fused int8 paged
    kernel (ops/paged_attention.quantized_paged_attention). Head-major
    pages like :func:`new_paged_kv_pool`."""
    return {
        "sym": jnp.zeros((cfg.n_layers, 2, num_pages, cfg.n_kv_heads,
                          page_size, cfg.head_dim), jnp.int8),
        "scale": jnp.ones((cfg.n_layers, 2, num_pages, page_size),
                          jnp.float32),
    }


def forward_paged_quantized(
    params: llama.Params,
    cfg: llama.LlamaConfig,
    tokens: jax.Array,  # int32 [B, T]
    start_pos: jax.Array,  # int32 [B]
    kv_pool: Dict[str, jax.Array],  # new_quantized_paged_pool()
    page_table: jax.Array,  # int32 [B, NP]
    *,
    use_pallas: bool = True,
    last_logit_only: bool = False,
    mesh=None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """:func:`forward_paged` over the int8 page arena: per-(layer, token)
    quantization on write, fused dequant on read."""
    B, T = tokens.shape
    page = kv_pool["sym"].shape[4]
    positions = start_pos[:, None] + jnp.arange(T)[None, :]
    kv_len = start_pos + T
    if use_pallas:
        from lmcache_tpu.ops.paged_attention import (
            quantized_paged_attention_dma)
        D = cfg.head_dim
        impl = (quantized_paged_attention_dma
                if D % 128 == 0 or 128 % D == 0
                else quantized_paged_attention)
    else:
        impl = quantized_paged_attention_reference

    def make(w):
        base = functools.partial(impl, sliding_window=w,
                                 sm_scale=cfg.sm_scale,
                                 logit_softcap=cfg.attn_logit_softcap,
                                 window_kind=cfg.local_attention_kind)
        if cfg.attn_sinks:
            def a(q, kp, vp, ksc, vsc, pt, q_off, kvl, snk, base=base):
                return base(q, kp, vp, ksc, vsc, pt, q_off, kvl,
                            sinks=snk)
        else:
            a = base
        if use_pallas and mesh is not None:
            sharded = _shard_paged_attend(a, mesh, cfg.n_kv_heads, B,
                                          quantized=True,
                                          sinks=cfg.attn_sinks)
            if sharded is not None:
                a = sharded
        return a

    attend, layer_globals = llama._attend_dispatch(cfg, make)

    pidx = jnp.take_along_axis(page_table, positions // page, axis=1)
    poff = positions % page
    heads = jnp.arange(cfg.n_kv_heads)[None, None, :]

    x = llama._embed(params, cfg, tokens)

    def quant_tokens(t):  # [B, T, H_kv, D] -> i8 sym + [B, T] scale
        t32 = t.astype(jnp.float32)
        absmax = jnp.max(jnp.abs(t32), axis=(2, 3))
        scale = jnp.where(absmax == 0.0, 1.0, absmax) / 127.0
        sym = jnp.round(t32 / scale[:, :, None, None])
        return jnp.clip(sym, -127, 127).astype(jnp.int8), scale

    def layer(x, scanned):
        lp, pool_l, g = scanned  # {"sym" [2,P,H,page,D], "scale" ...}
        h = llama._attn_input(x, lp, cfg)
        q, k, v = _qkv_heads(h, lp, cfg, positions, g)

        k_sym, k_scale = quant_tokens(k)
        v_sym, v_scale = quant_tokens(v)
        sym = pool_l["sym"].at[0, pidx[..., None], heads,
                               poff[..., None]].set(k_sym)
        sym = sym.at[1, pidx[..., None], heads, poff[..., None]].set(v_sym)
        scl = pool_l["scale"].at[0, pidx, poff].set(k_scale)
        scl = scl.at[1, pidx, poff].set(v_scale)

        extra = (lp["sinks"],) if cfg.attn_sinks else ()
        attn = attend(g, q, sym[0], sym[1], scl[0], scl[1], page_table,
                      start_pos, kv_len, *extra)
        x = _attn_residual(x, attn.reshape(B, T, -1), lp, cfg)
        x = _mlp_residual(x, lp, cfg)
        return x, {"sym": sym, "scale": scl}

    x, new_pool = jax.lax.scan(
        layer, x, (params["layers"], kv_pool, layer_globals))
    if last_logit_only:
        x = x[:, -1:]
    return llama._lm_logits(x, params, cfg), new_pool
