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
        decode_block: int = 1,
        prefill_chunk: int = 512,
        kv_dtype: str = "native",  # "native" | "int8" (half-size arena)
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
                         use_pallas=use_pallas, decode_block=decode_block,
                         prefill_chunk=prefill_chunk, kv_dtype=kv_dtype)
        quantized = kv_dtype == "int8"

        from lmcache_tpu.models.paged import forward_paged_quantized

        fwd = functools.partial(
            forward_paged_quantized if quantized else forward_paged,
            cfg=cfg, use_pallas=self.use_pallas)

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

        from lmcache_tpu.serving.engine import _sample_tokens

        @functools.partial(jax.jit, donate_argnums=(3,))
        def decode_block_paged(params, tokens, start, pool, tables, temps,
                               keys, steps0, topks, topps):
            def body(carry, i):
                tokens, start, pool = carry
                logits, pool = fwd(params, tokens=tokens, start_pos=start,
                                   kv_pool=pool, page_table=tables)
                toks = _sample_tokens(logits[:, 0], temps, keys, steps0 + i,
                                      topks, topps)
                return (toks[:, None].astype(jnp.int32), start + 1,
                        pool), toks

            (_, _, pool), toks = jax.lax.scan(
                body, (tokens, start, pool),
                jnp.arange(decode_block, dtype=jnp.int32))
            return toks.T, pool

        @functools.partial(jax.jit, donate_argnums=(0,))
        def inject_pages(pool, blob, pages):
            # blob [L, 2, n*page, H, D] (model dtype) -> whole pages
            L = blob.shape[0]
            n = pages.shape[0]
            if quantized:
                b32 = blob.astype(jnp.float32)
                absmax = jnp.max(jnp.abs(b32), axis=(3, 4))  # [L,2,n*page]
                scl = jnp.where(absmax == 0.0, 1.0, absmax) / 127.0
                sym = jnp.clip(jnp.round(b32 / scl[..., None, None]), -127,
                               127).astype(jnp.int8)
                sym = sym.reshape(L, 2, n, self.page_size, *blob.shape[3:])
                scl = scl.reshape(L, 2, n, self.page_size)
                return {
                    "sym": pool["sym"].at[:, :, pages].set(sym),
                    "scale": pool["scale"].at[:, :, pages].set(scl),
                }
            paged = blob.reshape(L, 2, n, self.page_size, *blob.shape[3:])
            return pool.at[:, :, pages].set(paged.astype(pool.dtype))

        @jax.jit
        def read_pages(pool, pages):
            # gather whole pages -> [L, 2, n*page, H, D] in model dtype
            if quantized:
                g = pool["sym"][:, :, pages].astype(jnp.float32)
                s = pool["scale"][:, :, pages]
                g = (g * s[..., None, None]).astype(jnp.dtype(cfg.dtype))
                L = g.shape[0]
                return g.reshape(L, 2, -1, *g.shape[4:])
            L = pool.shape[0]
            g = pool[:, :, pages]  # [L, 2, n, page, H, D]
            return g.reshape(L, 2, -1, *pool.shape[4:])

        self._prefill_paged = prefill_paged
        self._decode_paged = decode_paged
        self._decode_block_paged = decode_block_paged
        self._inject_pages = inject_pages
        self._read_pages = read_pages

    def _alloc_pool(self):
        """Build the page arena instead of the dense slot pool (ADVICE r1:
        the transient dense allocation defeated the paged memory model)."""
        from lmcache_tpu.models.paged import new_quantized_paged_pool
        self.NP = -(-self.S // self.page_size)  # page-table width
        self.allocator = PageAllocator(self.num_pages)
        # host-side page tables; row per slot, null page 0 as padding
        self.page_tables = np.zeros((self.B, self.NP), np.int32)
        self._req_pages = {}  # request_id -> List[int]
        if self.kv_dtype == "int8":
            return new_quantized_paged_pool(self.cfg, self.num_pages,
                                            self.page_size)
        return new_paged_kv_pool(self.cfg, self.num_pages, self.page_size)

    # -- scheduler ----------------------------------------------------------

    def step(self) -> None:
        if self.waiting and self.free_slots:
            req = self.waiting[0]
            needed = pages_needed(
                req.num_prompt_tokens + req.sampling.max_new_tokens,
                self.page_size)
            if needed <= self.allocator.num_free:
                self._admit(self.waiting.pop(0))
                return
            if not self.running:
                raise MemoryError(
                    f"request {req.request_id} needs {needed} pages; arena "
                    f"has {self.allocator.num_free} and nothing is running")
            # backpressure: keep decoding until pages free up
        if self.running:
            self._decode_all()

    # -- internals ----------------------------------------------------------

    def _admit(self, req: Request) -> None:
        slot = self.free_slots.pop(0)
        req.slot = slot
        req.state = RequestState.RUNNING

        total = req.num_prompt_tokens + req.sampling.max_new_tokens
        pages = self.allocator.alloc(pages_needed(total, self.page_size))
        self._req_pages[req.request_id] = pages
        self.page_tables[slot] = 0
        self.page_tables[slot, :len(pages)] = pages

        if req.context_chunks is not None:
            self._admit_blend_paged(req, pages)
            return

        prompt = req.prompt_tokens
        cached = self._stream_inject_pages(prompt, pages)
        req.cached_prefix_len = cached

        # chunked prefill: fixed-size segments, one compiled program
        PC = self.prefill_chunk
        table = jnp.asarray(self.page_tables[slot:slot + 1], jnp.int32)
        pos, n, logits = cached, len(prompt), None
        while pos < n:
            seg = prompt[pos:pos + PC]
            T = len(seg)
            Tp = PC if T == PC else _bucket(T)
            padded = np.zeros(Tp, np.int32)
            padded[:T] = seg
            logits, self.kv_pool = self._prefill_paged(
                self.params, jnp.asarray(padded)[None, :],
                jnp.asarray([pos], jnp.int32), self.kv_pool, table,
                jnp.asarray(T - 1, jnp.int32))
            pos += T
        self._assign_slot_key(req)
        tok = self._sample_row(logits, req)
        req.output_tokens.append(tok)
        req.ttft_s = time.perf_counter() - req.arrival_s
        self.running.append(req)
        self._maybe_finish(req)

    def _stream_inject_pages(self, prompt: np.ndarray, pages) -> int:
        """Streamed cache retrieval onto whole pages: each chunk is
        scattered into its pages the moment it arrives, overlapping the
        device upload with the fetch + decode of the next chunk.
        page_size divides chunk_size, so every streamed chunk starts
        page-aligned; a trailing partial page is dropped (prefill
        recomputes it). Returns the number of cached tokens injected."""
        if self.cache_engine is None:
            return 0
        limit = len(prompt) - 1  # always recompute >= 1 token
        cached = 0
        stream = self.cache_engine.retrieve_stream(prompt)
        try:
            for blob, pos, n in stream:
                take = min(n, limit - pos)
                if take <= 0:
                    break
                aligned = (take // self.page_size) * self.page_size
                if aligned <= 0:
                    break
                first_page = pos // self.page_size
                n_pages = aligned // self.page_size
                self.kv_pool = self._inject_pages(
                    self.kv_pool, jnp.asarray(blob[:, :, :aligned]),
                    jnp.asarray(pages[first_page:first_page + n_pages],
                                jnp.int32))
                cached = pos + aligned
                if aligned < n:
                    break
        finally:
            stream.close()
        return cached

    def _admit_blend_paged(self, req: Request, pages) -> None:
        """CacheBlend admission onto pages: blend the chunk KV, pad the
        blob to whole pages (the tail garbage sits past kv_len and is
        masked), scatter it in, and start decoding."""
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
        req.ttft_s = time.perf_counter() - req.arrival_s
        self.running.append(req)
        self._maybe_finish(req)

    def _decode_all(self) -> None:
        from lmcache_tpu.serving.engine import _sample_tokens
        last, start, temps, steps, topks, topps = \
            self._gather_sampling_rows()
        keys = jnp.asarray(self._slot_keys)

        tables = jnp.asarray(self.page_tables, jnp.int32)
        if self.decode_block > 1:
            toks, self.kv_pool = self._decode_block_paged(
                self.params, jnp.asarray(last), jnp.asarray(start),
                self.kv_pool, tables, jnp.asarray(temps), keys,
                jnp.asarray(steps), jnp.asarray(topks), jnp.asarray(topps))
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
                           jnp.asarray(topps)))
        for r in list(self.running):
            r.output_tokens.append(int(toks[r.slot]))
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

    def _release(self, req: Request) -> None:
        pages = self._req_pages.pop(req.request_id, None)
        if pages:
            self.allocator.free(pages)
            self.page_tables[req.slot] = 0
