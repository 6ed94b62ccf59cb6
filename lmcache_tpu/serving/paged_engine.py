"""Paged serving engine: continuous batching over a shared page arena.

The dense engine (serving/engine.py) reserves ``S_max`` tokens of HBM per
slot; this variant allocates fixed-size pages on demand from one global
pool (models/paged.py + the Pallas paged-attention kernel), so memory is
bounded by tokens actually resident and admission applies backpressure
when the arena is full — the vLLM memory model, TPU-native.

Page size divides the cache-engine chunk_size, so a retrieved cache
chunk is written as whole pages with one scatter.
"""

import functools
import time
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from lmcache_tpu.cache_engine import LMCacheEngine
from lmcache_tpu.logging_utils import init_logger
from lmcache_tpu.models import llama
from lmcache_tpu.models.paged import (PageAllocator, forward_paged,
                                      new_paged_kv_pool, pages_needed)
from lmcache_tpu.serving.engine import ServingEngine, _bucket
from lmcache_tpu.serving.request import Request, RequestState

logger = init_logger(__name__)


class PagedServingEngine(ServingEngine):

    def __init__(
        self,
        cfg: llama.LlamaConfig,
        params,
        *,
        max_batch: int = 8,
        max_seq: Optional[int] = None,
        num_pages: int = 256,
        page_size: int = 64,
        cache_engine: Optional[LMCacheEngine] = None,
        eos_token_id: Optional[int] = None,
        save_decode_cache: bool = False,
        use_pallas: Optional[bool] = None,
        mesh=None,
        decode_block: int = 1,
        prefill_chunk: int = 512,
        kv_dtype: str = "native",  # "native" | "int8" (half-size arena)
        spec_lookahead: int = 0,
        spec_ngram: int = 3,
        blend_recompute_ratio: float = 0.15,
        prefill_token_budget: Optional[int] = None,
        admission_window: int = 8,
        max_admission_bypass: int = 64,
    ):
        if (cache_engine is not None
                and cache_engine.chunk_size % page_size != 0):
            raise ValueError("page_size must divide the cache chunk_size")
        # _alloc_pool (called from super().__init__) reads these to build
        # the page arena — the dense [L, 2, B, S_max, H, D] pool is never
        # materialized
        self.page_size = page_size
        self.num_pages = num_pages
        super().__init__(cfg, params, max_batch=max_batch, max_seq=max_seq,
                         cache_engine=cache_engine,
                         eos_token_id=eos_token_id,
                         save_decode_cache=save_decode_cache,
                         use_pallas=use_pallas, mesh=mesh,
                         decode_block=decode_block,
                         prefill_chunk=prefill_chunk, kv_dtype=kv_dtype,
                         spec_lookahead=spec_lookahead,
                         spec_ngram=spec_ngram,
                         blend_recompute_ratio=blend_recompute_ratio,
                         prefill_token_budget=prefill_token_budget,
                         admission_window=admission_window,
                         max_admission_bypass=max_admission_bypass)
        quantized = kv_dtype == "int8"

        from lmcache_tpu.models.paged import forward_paged_quantized

        fwd = functools.partial(
            forward_paged_quantized if quantized else forward_paged,
            cfg=cfg, use_pallas=self.use_pallas, mesh=self.mesh)

        @functools.partial(jax.jit, donate_argnums=(3,))
        def prefill_paged(params, tokens, start, pool, table, last_idx):
            logits, pool = fwd(params, tokens=tokens, start_pos=start,
                               kv_pool=pool, page_table=table)
            return logits[0, last_idx], pool

        @functools.partial(jax.jit, donate_argnums=(3,))
        def decode_paged(params, tokens, start, pool, tables):
            logits, pool = fwd(params, tokens=tokens, start_pos=start,
                               kv_pool=pool, page_table=tables)
            return logits[:, 0], pool

        @functools.partial(jax.jit, donate_argnums=(3,))
        def spec_paged(params, tokens, start, pool, tables):
            logits, pool = fwd(params, tokens=tokens, start_pos=start,
                               kv_pool=pool, page_table=tables)
            return logits, pool

        from lmcache_tpu.serving.engine import _sample_tokens

        @functools.partial(jax.jit, donate_argnums=(3,),
                           static_argnames=("mode",))
        def decode_block_paged(params, tokens, start, pool, tables, temps,
                               keys, steps0, topks, topps, *, mode="full"):
            def body(carry, i):
                tokens, start, pool = carry
                logits, pool = fwd(params, tokens=tokens, start_pos=start,
                                   kv_pool=pool, page_table=tables)
                toks = _sample_tokens(logits[:, 0], temps, keys, steps0 + i,
                                      topks, topps, mode=mode)
                return (toks[:, None].astype(jnp.int32), start + 1,
                        pool), toks

            (_, _, pool), toks = jax.lax.scan(
                body, (tokens, start, pool),
                jnp.arange(decode_block, dtype=jnp.int32))
            return toks.T, pool

        @functools.partial(jax.jit, donate_argnums=(0,))
        def inject_pages(pool, blob, pages):
            # blob [L, 2, n*page, H, D] (wire fmt) -> head-major pages;
            # the relayout touches one chunk's pages, never the arena
            L, _, _, H, D = blob.shape
            n = pages.shape[0]
            pg = self.page_size
            if quantized:
                b32 = blob.astype(jnp.float32)
                absmax = jnp.max(jnp.abs(b32), axis=(3, 4))  # [L,2,n*page]
                scl = jnp.where(absmax == 0.0, 1.0, absmax) / 127.0
                sym = jnp.clip(jnp.round(b32 / scl[..., None, None]), -127,
                               127).astype(jnp.int8)
                sym = sym.reshape(L, 2, n, pg, H, D).transpose(
                    0, 1, 2, 4, 3, 5)  # [L, 2, n, H, page, D]
                scl = scl.reshape(L, 2, n, pg)
                return {
                    "sym": pool["sym"].at[:, :, pages].set(sym),
                    "scale": pool["scale"].at[:, :, pages].set(scl),
                }
            paged = blob.reshape(L, 2, n, pg, H, D).transpose(
                0, 1, 2, 4, 3, 5)
            return pool.at[:, :, pages].set(paged.astype(pool.dtype))

        @jax.jit
        def read_pages(pool, pages):
            # gather whole pages -> wire fmt [L, 2, n*page, H, D]
            if quantized:
                g = pool["sym"][:, :, pages].astype(
                    jnp.float32)  # [L, 2, n, H, page, D]
                s = pool["scale"][:, :, pages]  # [L, 2, n, page]
                g = (g * s[:, :, :, None, :, None]).astype(
                    jnp.dtype(cfg.dtype))
            else:
                g = pool[:, :, pages]  # [L, 2, n, H, page, D]
            L, _, n, H, pg, D = g.shape
            return g.transpose(0, 1, 2, 4, 3, 5).reshape(L, 2, n * pg, H, D)

        self._prefill_paged = prefill_paged
        self._decode_paged = decode_paged
        self._spec_paged = spec_paged
        self._decode_block_paged = decode_block_paged
        self._inject_pages = inject_pages
        self._read_pages = read_pages

    def _alloc_pool(self):
        """Build the page arena instead of the dense slot pool (ADVICE r1:
        the transient dense allocation defeated the paged memory model).
        The scheduler state (allocator, tables, prefix-sharing index) is
        arena-agnostic; the arena tensor itself comes from
        :meth:`_alloc_arena` (overridden by the MLA paged engine)."""
        # page-table width covers S + write-horizon positions: idle rows
        # park decode writes at >= S (engine.py _gather_sampling_rows)
        # and speculative verification may write past the end; those
        # land in the null page or masked in-page slack
        self.NP = -(-(self.S + self._write_horizon) // self.page_size)
        self.allocator = PageAllocator(self.num_pages)
        # host-side page tables; row per slot, null page 0 as padding
        self.page_tables = np.zeros((self.B, self.NP), np.int32)
        self._req_pages = {}  # request_id -> List[int]
        # prefix sharing: rolling page-granularity prefix hash -> resident
        # page id (registered once a request's prefill completes; removed
        # when the page's last referent frees it)
        self._resident = {}  # hash -> page id
        self._page_hash = {}  # page id -> hash (reverse index)
        self._req_shared = {}  # request_id -> tokens served by shared pages
        return self._alloc_arena()

    def _alloc_arena(self):
        """The arena tensor. With a mesh, kv heads shard over "model"
        (pages are shared by the whole batch, so there is no data-axis
        sharding — the arena is the cross-request resource)."""
        from lmcache_tpu.models.paged import new_quantized_paged_pool
        pool = (new_quantized_paged_pool(self.cfg, self.num_pages,
                                         self.page_size)
                if self.kv_dtype == "int8" else
                new_paged_kv_pool(self.cfg, self.num_pages, self.page_size))
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            if (self.use_pallas
                    and self.cfg.n_kv_heads % self.mesh.shape["model"]):
                # models/paged._shard_paged_attend falls back to the
                # unwrapped pallas call in this case, and pallas operands
                # have no GSPMD rule — the sharded arena would be
                # gathered onto every chip per step
                logger.warning(
                    "n_kv_heads (%d) does not divide the mesh's model "
                    "axis (%d): the paged pallas kernels cannot be "
                    "shard_map'ed and the arena will be gathered per "
                    "step; consider use_pallas=False",
                    self.cfg.n_kv_heads, self.mesh.shape["model"])
            head_sh = NamedSharding(
                self.mesh, P(None, None, None, "model", None, None))
            if self.kv_dtype == "int8":
                pool = {
                    "sym": jax.device_put(pool["sym"], head_sh),
                    "scale": jax.device_put(
                        pool["scale"], NamedSharding(self.mesh, P())),
                }
            else:
                pool = jax.device_put(pool, head_sh)
        return pool

    # -- scheduler hooks -----------------------------------------------------

    def _page_hashes(self, req: Request, tokens: np.ndarray):
        """Rolling page-granularity prefix hashes of the request's
        tokens, memoized on the request: _can_admit runs every scheduler
        step while the request waits, and a 16k-token prompt costs ~1000
        sha256 calls per recomputation."""
        cached = getattr(req, "_page_hash_cache", None)
        if cached is not None and cached[0] == len(tokens):
            return cached[1]
        from lmcache_tpu.chunks import prefix_chunk_hashes
        hashes = prefix_chunk_hashes(tokens, self.page_size)
        req._page_hash_cache = (len(tokens), hashes)
        return hashes

    def _match_resident_prefix(self, req: Request, tokens: np.ndarray):
        """Longest run of already-resident pages whose rolling prefix
        hash matches this prompt. Capped so at least one token is always
        recomputed (the prefill must yield next-token logits). Blend
        requests never match (their admission path takes no shared
        pages)."""
        if (req.context_chunks is not None or tokens is None
                or len(tokens) < 2):
            return []
        max_pages = (len(tokens) - 1) // self.page_size
        shared = []
        for h in self._page_hashes(req, tokens)[:max_pages]:
            page = self._resident.get(h)
            if page is None:
                break
            shared.append(page)
        return shared

    def _admission_pages(self, req: Request, tokens) -> int:
        """Pages a request needs AT ADMISSION. With a cache engine,
        prompt-only (decode pages grow on demand; exhaustion preempts
        into the tiers). Without one, preemption is impossible, so the
        full worst-case prompt+max_new footprint is reserved up front —
        arena exhaustion then backpressures at admission instead of
        hard-failing mid-decode."""
        n = len(tokens)
        if self.cache_engine is None:
            n += req.sampling.max_new_tokens
        return pages_needed(n, self.page_size)

    def _alloc_pages(self, n):
        """Allocate fresh pages, evicting any stale prefix-cache
        registrations they still carry (arena-as-cache: freed pages stay
        reusable until this moment)."""
        pages = self.allocator.alloc(n)
        for p in pages:
            h = self._page_hash.pop(p, None)
            if h is not None and self._resident.get(h) == p:
                del self._resident[h]
        return pages

    def _can_admit(self, req: Request) -> bool:
        """Admission needs FRESH pages for the unshared part of the
        prompt only — shared-prefix pages are already resident (live, or
        freed-but-unrecycled), and decode pages are allocated on demand
        (with preemption when the arena is full). Occupancy is bounded
        by distinct tokens actually resident, not by worst-case
        ``max_new_tokens`` reservations (except without a cache engine —
        see _admission_pages)."""
        tokens = req.all_tokens
        matched = self._match_resident_prefix(req, tokens)
        fresh = self._admission_pages(req, tokens) - len(matched)
        # reclaiming free-but-cached matches also consumes free-list slots
        reclaimed = sum(1 for p in matched
                        if self.allocator.refcount(p) == 0)
        return fresh + reclaimed <= self.allocator.num_free

    def _on_admission_stall(self, req: Request) -> None:
        raise MemoryError(
            f"request {req.request_id} needs "
            f"{self._admission_pages(req, req.all_tokens)} pages; "
            f"arena has {self.allocator.num_free} and nothing is running")

    def _on_slot_assigned(self, req: Request) -> None:
        tokens = req.all_tokens
        shared = self._match_resident_prefix(req, tokens)
        if shared:
            # live pages take an extra reference; freed-but-cached pages
            # are pulled back out of the free list content-intact
            live = [p for p in shared if self.allocator.refcount(p) > 0]
            cached = [p for p in shared if self.allocator.refcount(p) == 0]
            self.allocator.share(live)
            self.allocator.reclaim(cached)
        own = self._alloc_pages(
            self._admission_pages(req, tokens) - len(shared))
        pages = shared + own
        self._req_pages[req.request_id] = pages
        self._req_shared[req.request_id] = len(shared) * self.page_size
        self.page_tables[req.slot] = 0
        self.page_tables[req.slot, :len(pages)] = pages

    def _prefill_segment(self, req: Request, pos: int, seg: np.ndarray):
        T = len(seg)
        Tp = T if T == self.prefill_chunk else _bucket(T)
        padded = np.zeros(Tp, np.int32)
        padded[:T] = seg
        table = jnp.asarray(self.page_tables[req.slot:req.slot + 1],
                            jnp.int32)
        logits, self.kv_pool = self._prefill_paged(
            self.params, jnp.asarray(padded)[None, :],
            jnp.asarray([pos], jnp.int32), self.kv_pool, table,
            jnp.asarray(T - 1, jnp.int32))
        return logits

    # -- decode-page growth + preemption -------------------------------------

    def _pick_victim(self, requester: Request) -> Optional[Request]:
        """Latest-admitted running request — possibly the requester
        itself (the newest request yields so older ones finish; vLLM's
        priority order). Blend requests are never preempted (their
        healed KV cannot be stored and restored exactly)."""
        for r in reversed(self.running):
            if r.context_chunks is not None:
                continue
            return r
        return None

    def _preempt(self, victim: Request) -> None:
        """Evict a running request: persist its computed KV (prompt +
        decoded tokens) to the cache tiers, free its pages and slot, and
        push it to the FRONT of the waiting queue. On re-admission the
        prefix is restored via retrieve and at most one token-equivalent
        is recomputed, so greedy output is unchanged."""
        n = victim.total_len - 1  # pool holds KV for total-1 tokens
        pages = self._req_pages[victim.request_id]
        n_pages = pages_needed(n, self.page_size)
        blob = self._read_pages(
            self.kv_pool, jnp.asarray(pages[:n_pages], jnp.int32))[:, :, :n]
        # durable before the pages are reused
        self.cache_engine.store(victim.all_tokens[:n], blob, blocking=True)
        self.running.remove(victim)
        self._release(victim)
        self.free_slots.append(victim.slot)
        victim.slot = None
        victim.state = RequestState.WAITING
        victim.num_preemptions += 1
        self.waiting.insert(0, victim)
        logger.info("Preempted request %s at %d tokens (arena full)",
                    victim.request_id, n)

    def _ensure_decode_pages(self) -> None:
        """Before a decode step, grow every running request's page list
        to cover the tokens the step will write (decode block or
        speculative lookahead); when the arena cannot satisfy a growth,
        preempt victims until it can."""
        db = self._write_horizon
        for r in list(self.running):
            if r not in self.running:  # preempted by an earlier growth
                continue
            cap = r.num_prompt_tokens + r.sampling.max_new_tokens
            target = min(
                r.num_prompt_tokens + len(r.output_tokens) - 1 + db, cap)
            pages = self._req_pages[r.request_id]
            need = pages_needed(target, self.page_size) - len(pages)
            if need <= 0:
                continue
            preempted_self = False
            while need > self.allocator.num_free:
                victim = self._pick_victim(r)
                if victim is None or self.cache_engine is None:
                    raise MemoryError(
                        f"arena exhausted: request {r.request_id} needs "
                        f"{need} more pages, {self.allocator.num_free} "
                        f"free, and no preemptable victim"
                        + ("" if self.cache_engine is not None
                           else " (no cache engine to evict into)"))
                self._preempt(victim)
                if victim is r:
                    preempted_self = True
                    break  # the requester yielded; skip its growth
            if preempted_self:
                continue
            start_idx = len(pages)
            new = self._alloc_pages(need)
            self.page_tables[r.slot, start_idx:start_idx + need] = new
            pages.extend(new)

    # -- internals ----------------------------------------------------------

    def _stream_inject(self, req: Request, tokens: np.ndarray) -> int:
        """Streamed cache retrieval onto whole pages: each chunk is
        scattered into its pages the moment it arrives, overlapping the
        device upload with the fetch + decode of the next chunk.
        page_size divides chunk_size, so every streamed chunk starts
        page-aligned; a trailing partial page is dropped (prefill
        recomputes it). Returns the number of cached tokens injected."""
        shared_tok = self._req_shared.get(req.request_id, 0)
        if self.cache_engine is None:
            return shared_tok
        pages = self._req_pages[req.request_id]
        limit = len(tokens) - 1  # always recompute >= 1 token
        cached = shared_tok
        mask = None
        if shared_tok:
            # the shared-prefix pages already hold live KV — skip their
            # tokens in the cache-tier stream (zero-copy beats retrieve)
            mask = np.ones(len(tokens), bool)
            mask[:shared_tok] = False

        # grouped injection (see ServingEngine._stream_inject): host
        # chunks accumulate and decode/upload as ONE device program per
        # group; every group stays page-aligned because only the final
        # (clipped) chunk can be a non-multiple of page_size and it
        # flushes the group immediately.
        from lmcache_tpu import kv
        pending: list = []
        pending_pos = 0
        pending_key = None
        # decoded-but-not-scattered (blob, pos): group k+1's decode is
        # dispatched before group k scatters (ServingEngine pipelining)
        staged = None
        deferred: list = []

        def scatter(blob, pos):
            t = blob.shape[2]
            first_page = pos // self.page_size
            n_pages = t // self.page_size
            self.kv_pool = self._inject_pages(
                self.kv_pool, blob,
                jnp.asarray(pages[first_page:first_page + n_pages],
                            jnp.int32))

        def flush():
            nonlocal pending, pending_key, staged
            if not pending:
                return
            blob, ovf, redo = self._finish_group(pending)
            if ovf is not None:
                deferred.append((ovf, redo, pending_pos))
            if staged is not None:
                scatter(*staged)
            staged = (blob, pending_pos)
            pending = []
            pending_key = None

        stream = self.cache_engine.retrieve_stream(tokens, mask=mask)
        try:
            for blob, pos, n in stream:
                take = min(n, limit - pos)
                if take <= 0:
                    break
                aligned = (take // self.page_size) * self.page_size
                if aligned <= 0:
                    break
                if aligned < n:
                    blob = kv.slice_blob_tokens(blob, "vllm", 0, aligned)
                if isinstance(blob, jnp.ndarray) and not isinstance(
                        blob, np.ndarray):
                    flush()
                    scatter(blob, pos)
                else:
                    key = self._group_key(blob)
                    if pending and key != pending_key:
                        flush()
                    if not pending:
                        pending_pos = pos
                        pending_key = key
                    pending.append(blob)
                    if len(pending) >= self.inject_group_chunks:
                        flush()
                cached = pos + aligned
                if aligned < n:
                    break
        finally:
            stream.close()
        flush()
        if staged is not None:
            scatter(*staged)
        if deferred:
            flags = np.asarray(jnp.stack([d[0] for d in deferred]))
            for tripped, (_, redo, pos) in zip(flags, deferred):
                if tripped:
                    scatter(redo(), pos)
        return cached

    def _admit_blend(self, req: Request) -> None:
        """CacheBlend admission onto pages: blend the chunk KV, pad the
        blob to whole pages (the tail garbage sits past kv_len and is
        masked), scatter it in, and start decoding."""
        pages = self._req_pages[req.request_id]
        blender = self._get_blender()
        logits, kv_blob, info = blender.blend(req.context_chunks)
        T = info["total_tokens"]
        req.blended_tokens_recomputed = info["recomputed_tokens"]
        req.cached_prefix_len = T - info["recomputed_tokens"]

        n_pages = pages_needed(T, self.page_size)
        pad = n_pages * self.page_size - T
        if pad:
            kv_blob = jnp.pad(kv_blob,
                              ((0, 0), (0, 0), (0, pad), (0, 0), (0, 0)))
        self.kv_pool = self._inject_pages(
            self.kv_pool, kv_blob.astype(jnp.dtype(self.cfg.dtype)),
            jnp.asarray(pages[:n_pages], jnp.int32))

        self._assign_slot_key(req)
        tok = self._sample_row(logits, req)
        req.output_tokens.append(tok)
        self._record_row_logprobs(req, logits, tok)
        req.ttft_s = time.perf_counter() - req.arrival_s
        self.running.append(req)
        self._maybe_finish(req)

    def _spec_forward(self, inp, start):
        tables = jnp.asarray(self.page_tables, jnp.int32)
        logits, self.kv_pool = self._spec_paged(self.params, inp, start,
                                                self.kv_pool, tables)
        return logits

    def _decode_all(self) -> None:
        from lmcache_tpu.serving.engine import (_sample_tokens,
                                                _sampling_mode)
        self._ensure_decode_pages()
        need_lp = any(r.sampling.logprobs > 0 for r in self.running)
        if (self.spec_lookahead and not need_lp and any(
                r.sampling.temperature == 0.0 for r in self.running)):
            self._decode_speculative()
            return
        last, start, temps, steps, topks, topps = \
            self._gather_sampling_rows()
        keys = jnp.asarray(self._slot_keys)
        mode = _sampling_mode(self.running)

        tables = jnp.asarray(self.page_tables, jnp.int32)
        if self.decode_block > 1 and not need_lp:
            toks, self.kv_pool = self._decode_block_paged(
                self.params, jnp.asarray(last), jnp.asarray(start),
                self.kv_pool, tables, jnp.asarray(temps), keys,
                jnp.asarray(steps), jnp.asarray(topks), jnp.asarray(topps),
                mode=mode)
            toks = np.asarray(toks)
            for r in list(self.running):
                for j in range(self.decode_block):
                    r.output_tokens.append(int(toks[r.slot, j]))
                    if r.is_finished(self.eos_token_id):
                        break
                self._maybe_finish(r)
            return

        logits, self.kv_pool = self._decode_paged(
            self.params, jnp.asarray(last), jnp.asarray(start),
            self.kv_pool, tables)
        toks = np.asarray(
            _sample_tokens(logits, jnp.asarray(temps), keys,
                           jnp.asarray(steps), jnp.asarray(topks),
                           jnp.asarray(topps), mode=mode))
        for r in list(self.running):
            tok = int(toks[r.slot])
            r.output_tokens.append(tok)
            if need_lp:
                self._record_row_logprobs(r, logits[r.slot], tok)
            self._maybe_finish(r)

    def _store_back(self, req: Request) -> None:
        if self.cache_engine is None or req.context_chunks is not None:
            # blend KV is approximately healed — never store it under
            # exact prefix-chunk hashes (see ServingEngine._store_back)
            self._release(req)
            return
        n = (req.total_len
             if self.save_decode_cache else req.num_prompt_tokens)
        n = min(n, req.total_len - 1)
        if n > 0:
            pages = self._req_pages[req.request_id]
            n_pages = pages_needed(n, self.page_size)
            blob = self._read_pages(
                self.kv_pool, jnp.asarray(pages[:n_pages],
                                          jnp.int32))[:, :, :n]
            self.cache_engine.store(req.all_tokens[:n], blob,
                                    blocking=False)
        self._release(req)

    def _on_prefill_complete(self, req: Request) -> None:
        """Register the request's fully-written prompt pages in the
        resident-prefix index so later same-prefix requests share them
        (page i is immutable once positions [(i)*page, (i+1)*page) are
        prefilled: decode writes only past the prompt)."""
        if req.context_chunks is not None:
            return  # blend KV is approximate — never share it as exact
        from lmcache_tpu.chunks import prefix_chunk_hashes
        tokens = req.all_tokens
        pages = self._req_pages[req.request_id]
        hashes = prefix_chunk_hashes(tokens, self.page_size)
        for i in range(len(tokens) // self.page_size):
            p = pages[i]
            if p in self._page_hash:
                continue  # already registered (a shared page)
            self._page_hash[p] = hashes[i]
            self._resident.setdefault(hashes[i], p)

    def _release(self, req: Request) -> None:
        pages = self._req_pages.pop(req.request_id, None)
        self._req_shared.pop(req.request_id, None)
        if pages:
            # arena-as-cache: freed pages KEEP their prefix-index
            # registrations (content is intact until reallocation, when
            # _alloc_pages evicts the entry) — a follow-up same-prefix
            # request reclaims them zero-copy
            self.allocator.free(pages)
            self.page_tables[req.slot] = 0
