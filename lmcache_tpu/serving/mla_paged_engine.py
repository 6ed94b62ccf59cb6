"""Paged serving engine for Multi-head Latent Attention models.

:class:`PagedServingEngine`'s arena economics — fixed-size pages
allocated on demand, admission backpressure, copy-on-write prefix
sharing, preemption to the cache tiers — over the MLA latent cache:
pages are ``[page_size, r+p]`` latent rows with NO head axis, so at
DeepSeek-V2 geometry one latent page holds ~57x the tokens of an
expanded-KV page of equal bytes, and the same arena serves ~57x the
concurrent context.

The whole scheduler (page allocator, rolling prefix-hash sharing,
decode-page growth, preemption, streamed cache injection) is inherited
unchanged — it is arena-agnostic; this class swaps the arena tensor
(``mla.new_paged_latent_pool``), the jitted model ops
(``mla.forward_paged``), and the page<->wire-blob converters (latent
blobs are ``[L, 1, T, 1, r+p]``, so LMCacheEngine store/retrieve
semantics — reference lmcache/cache_engine.py:230-381 — apply verbatim).
"""

import functools

import jax
import jax.numpy as jnp

from lmcache_tpu.logging_utils import init_logger
from lmcache_tpu.models import mla
from lmcache_tpu.serving.paged_engine import PagedServingEngine

logger = init_logger(__name__)


class MLAPagedServingEngine(PagedServingEngine):

    def __init__(self, cfg: mla.MLAConfig, params, **kwargs):
        if kwargs.get("kv_dtype", "native") not in ("native", "int8"):
            raise ValueError(
                f"kv_dtype {kwargs['kv_dtype']!r}: expected 'native' or "
                "'int8'")
        super().__init__(cfg, params, **kwargs)
        quantized = self.kv_dtype == "int8"
        if (self.mesh is not None and self.use_pallas
                and cfg.n_heads % self.mesh.shape.get("model", 1)):
            # mla._shard_paged_latent_attend would silently fall back to
            # an unwrapped pallas call, which has no GSPMD rule
            raise ValueError(
                f"n_heads ({cfg.n_heads}) must divide the mesh's model "
                f"axis ({self.mesh.shape.get('model', 1)}) for the paged "
                "latent kernel; run the einsum path (use_pallas=False)")

        use_pallas = self.use_pallas
        eng_mesh = self.mesh
        page = self.page_size

        def fwd(params, tokens, start, pool, table):
            return mla.forward_paged(params, cfg, tokens, start, pool,
                                     table, use_pallas=use_pallas,
                                     mesh=eng_mesh)

        @functools.partial(jax.jit, donate_argnums=(3,))
        def prefill_paged(params, tokens, start, pool, table, last_idx):
            logits, pool = fwd(params, tokens, start, pool, table)
            return logits[0, last_idx], pool

        @functools.partial(jax.jit, donate_argnums=(3,))
        def decode_paged(params, tokens, start, pool, tables):
            logits, pool = fwd(params, tokens, start, pool, tables)
            return logits[:, 0], pool

        @functools.partial(jax.jit, donate_argnums=(3,))
        def spec_paged(params, tokens, start, pool, tables):
            logits, pool = fwd(params, tokens, start, pool, tables)
            return logits, pool

        from lmcache_tpu.serving.engine import _sample_tokens
        decode_block = self.decode_block

        @functools.partial(jax.jit, donate_argnums=(3,),
                           static_argnames=("mode",))
        def decode_block_paged(params, tokens, start, pool, tables, temps,
                               keys, steps0, topks, topps, *, mode="full"):
            def body(carry, i):
                tokens, start, pool = carry
                logits, pool = fwd(params, tokens, start, pool, tables)
                toks = _sample_tokens(logits[:, 0], temps, keys,
                                      steps0 + i, topks, topps, mode=mode)
                return (toks[:, None].astype(jnp.int32), start + 1,
                        pool), toks

            (_, _, pool), toks = jax.lax.scan(
                body, (tokens, start, pool),
                jnp.arange(decode_block, dtype=jnp.int32))
            return toks.T, pool

        @functools.partial(jax.jit, donate_argnums=(0,))
        def inject_pages(pool, blob, pages):
            # latent wire blob [L, 1, n*page, 1, C] -> arena pages.
            # Wire blobs stay LOSSLESS native-dtype latents at the
            # LOGICAL latent dim (tiers, serde, server unchanged); the
            # arena is lane-padded (mla.latent_pad_dim) so the pad is
            # added here; an int8 arena re-quantizes here
            L, _, _, _, C = blob.shape
            n = pages.shape[0]
            paged = mla.pad_latents(
                cfg, blob[:, 0, :, 0, :].reshape(L, n, page, C))
            if quantized:
                from lmcache_tpu.ops.latent_attention import \
                    quantize_latents
                sym, scl = quantize_latents(paged)
                return {
                    "sym": pool["sym"].at[:, pages].set(sym),
                    "scale": pool["scale"].at[:, pages].set(scl),
                }
            return pool.at[:, pages].set(paged.astype(pool.dtype))

        @jax.jit
        def read_pages(pool, pages):
            # gather whole pages -> wire blob [L, 1, n*page, 1, C]
            # (the arena's lane pad is stripped: wire stays logical C)
            if quantized:
                g = (pool["sym"][:, pages].astype(jnp.float32)
                     * pool["scale"][:, pages][..., None]).astype(
                         jnp.dtype(cfg.dtype))  # [L, n, page, Cp]
            else:
                g = pool[:, pages]  # [L, n, page, Cp]
            g = g[..., :cfg.latent_dim]
            L, n, pg, C = g.shape
            return g.reshape(L, n * pg, C)[:, None, :, None, :]

        self._prefill_paged = prefill_paged
        self._decode_paged = decode_paged
        self._spec_paged = spec_paged
        self._decode_block_paged = decode_block_paged
        self._inject_pages = inject_pages
        self._read_pages = read_pages

    def _alloc_arena(self):
        pool = (mla.new_quantized_paged_latent_pool(
                    self.cfg, self.num_pages, self.page_size)
                if self.kv_dtype == "int8" else
                mla.new_paged_latent_pool(self.cfg, self.num_pages,
                                          self.page_size))
        if self.mesh is not None:
            # pages are the cross-request resource and the latent has no
            # head axis: fully replicated (queries shard instead —
            # mla._shard_paged_latent_attend)
            from jax.sharding import NamedSharding, PartitionSpec as P
            pool = jax.tree.map(
                lambda a: jax.device_put(
                    a, NamedSharding(self.mesh, P())), pool)
        return pool

    def _get_blender(self):
        if self._blender is None:
            if self.cache_engine is None:
                raise ValueError(
                    "context_chunks requests need a cache_engine")
            from lmcache_tpu.blend_mla import MLACacheBlender
            self._blender = MLACacheBlender(
                self.cfg, self.params, self.cache_engine,
                recompute_ratio=self._blend_ratio)
        return self._blender
