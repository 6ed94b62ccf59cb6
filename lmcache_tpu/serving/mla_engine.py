"""Serving engine for Multi-head Latent Attention models.

Same continuous-batching scheduler as :class:`ServingEngine` (multi-
admission, per-step prefill segments interleaved with decode, prompt-
lookup speculation, decode blocks, cache-tier reuse) — only the resident
KV state differs: ONE latent pool ``[L, B, S, r+p]`` instead of the
per-head ``[L, 2, B, H, S, D]`` pool. At DeepSeek-V2 geometry that is a
~57x smaller residence, so the same HBM holds ~57x more concurrent
context — the serving-side payoff of MLA, and the reason this engine
exists as a first-class citizen rather than an adapter over expanded
K/V (HF's implementations expand the latents into per-head K/V caches;
see models/mla.py).

The scheduler, speculation, sampling, and cache-reuse logic is inherited
unchanged; this class swaps the jitted model ops (prefill segment,
decode/spec/block steps, slot slice/write-back, chunk inject, slot read)
for latent-pool versions, exactly as PagedServingEngine swaps them for
page-table versions. Wire blobs are ``[L, 1, T, 1, r+p]``
(mla.cache_to_blob), so LMCacheEngine store/retrieve semantics
(reference lmcache/cache_engine.py:230-381) apply verbatim.
"""

import functools

import jax
import jax.numpy as jnp

from lmcache_tpu.logging_utils import init_logger
from lmcache_tpu.models import mla
from lmcache_tpu.serving.engine import ServingEngine

logger = init_logger(__name__)


class MLAServingEngine(ServingEngine):

    def __init__(self, cfg: mla.MLAConfig, params, **kwargs):
        super().__init__(cfg, params, **kwargs)
        if (self.mesh is not None and self.use_pallas
                and cfg.n_heads % self.mesh.shape.get("model", 1)):
            # the kernel runs under shard_map with q heads on "model"
            # (mla._shard_latent_attend); an indivisible head count would
            # silently fall back to an unwrapped pallas call, which has no
            # GSPMD rule — fail loudly instead
            raise ValueError(
                f"n_heads ({cfg.n_heads}) must divide the mesh's model "
                f"axis ({self.mesh.shape.get('model', 1)}) for the latent "
                "pallas kernel; run the einsum path (use_pallas=False)")

        use_pallas = self.use_pallas
        eng_mesh = self.mesh

        def fwd(params, tokens, start_pos, kv_cache):
            return mla.forward(params, cfg, tokens, start_pos, kv_cache,
                               use_pallas=use_pallas, mesh=eng_mesh)

        @functools.partial(jax.jit, static_argnames=("seg_len",),
                           donate_argnums=(3,))
        def prefill_seg(params, tokens_dev, pos, slot_cache, last_idx, *,
                        seg_len):
            seg = jax.lax.dynamic_slice(tokens_dev, (0, pos), (1, seg_len))
            logits, slot_cache = fwd(params, tokens=seg,
                                     start_pos=pos[None],
                                     kv_cache=slot_cache)
            return logits[0, last_idx], slot_cache

        @jax.jit
        def slice_out(pool, slot):
            # latent pool leaves [L, B, S, ...]: slot axis is 1 (the
            # int8 pool is a {"sym", "scale"} tree with the same axes)
            return jax.tree.map(
                lambda a: jax.lax.dynamic_slice_in_dim(a, slot, 1,
                                                       axis=1), pool)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def write_back(pool, slot_cache, slot):
            return jax.tree.map(
                lambda p, c: jax.lax.dynamic_update_slice_in_dim(
                    p, c, slot, axis=1), pool, slot_cache)

        @functools.partial(jax.jit, donate_argnums=(3,))
        def decode_step(params, tokens, start, pool):
            logits, pool = fwd(params, tokens=tokens, start_pos=start,
                               kv_cache=pool)
            return logits[:, 0], pool

        @functools.partial(jax.jit, donate_argnums=(3,))
        def spec_step(params, tokens, start, pool):
            logits, pool = fwd(params, tokens=tokens, start_pos=start,
                               kv_cache=pool)
            return logits, pool

        from lmcache_tpu.serving.engine import _sample_tokens
        decode_block = self.decode_block

        @functools.partial(jax.jit, donate_argnums=(3,),
                           static_argnames=("mode",))
        def decode_block_step(params, tokens, start, pool, temps, keys,
                              steps0, topks, topps, *, mode="full"):
            def body(carry, i):
                tokens, start, pool = carry
                logits, pool = fwd(params, tokens=tokens, start_pos=start,
                                   kv_cache=pool)
                toks = _sample_tokens(logits[:, 0], temps, keys,
                                      steps0 + i, topks, topps, mode=mode)
                return (toks[:, None].astype(jnp.int32), start + 1,
                        pool), toks

            (_, _, pool), toks = jax.lax.scan(
                body, (tokens, start, pool),
                jnp.arange(decode_block, dtype=jnp.int32))
            return toks.T, pool

        quantized = self.kv_dtype == "int8"
        cfg_dtype = jnp.dtype(cfg.dtype)
        if quantized:
            from lmcache_tpu.ops.latent_attention import (
                dequantize_latents, quantize_latents)

            @functools.partial(jax.jit, donate_argnums=(0,))
            def inject(pool, blob, slot, pos):
                # bf16 latent wire blob -> re-quantized into the int8
                # pool (the wire format stays the lossless latent, so
                # cached chunks remain tier/serde/server-compatible)
                lat = blob[:, 0, :, 0, :]  # [L, t, C]
                sym, sc = quantize_latents(lat)
                new_sym = jax.lax.dynamic_update_slice(
                    pool["sym"], sym[:, None], (0, slot, pos, 0))
                new_sc = jax.lax.dynamic_update_slice(
                    pool["scale"], sc[:, None], (0, slot, pos))
                return {"sym": new_sym, "scale": new_sc}

            @jax.jit
            def read_slot(pool, slot):
                lat = dequantize_latents(pool["sym"][:, slot],
                                         pool["scale"][:, slot],
                                         cfg_dtype)  # [L, S, C]
                return lat[:, None, :, None, :]  # wire blob
        else:
            @functools.partial(jax.jit, donate_argnums=(0,))
            def inject(pool, blob, slot, pos):
                # latent wire blob [L, 1, t, 1, C] -> pool[:, slot, pos:pos+t]
                upd = blob[:, 0, :, 0, :][:, None].astype(pool.dtype)
                return jax.lax.dynamic_update_slice(pool, upd,
                                                    (0, slot, pos, 0))

            @jax.jit
            def read_slot(pool, slot):
                return pool[:, slot][:, None, :, None, :]  # wire blob

        self._prefill_seg = prefill_seg
        self._slice_out = slice_out
        self._write_back = write_back
        self._decode_step = decode_step
        self._spec_step = spec_step
        self._decode_block_step = decode_block_step
        self._inject = inject
        self._read_slot = read_slot

    def _alloc_pool(self):
        if self.kv_dtype == "int8":
            pool = mla.new_quantized_latent_cache(
                self.cfg, self.B, self.S + self._write_horizon)
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                from lmcache_tpu.parallel.mesh import latent_cache_sharding
                sym_sh = latent_cache_sharding(self.mesh)
                pool = {
                    "sym": jax.device_put(pool["sym"], sym_sh),
                    "scale": jax.device_put(
                        pool["scale"],
                        NamedSharding(self.mesh, P(*sym_sh.spec[:3]))),
                }
            return pool
        pool = mla.new_latent_cache(self.cfg, self.B,
                                    self.S + self._write_horizon)
        if self.mesh is not None:
            # batch on "data"; REPLICATED over "model" — the latent has
            # no head axis to shard (parallel/mesh.py shard_params)
            from lmcache_tpu.parallel.mesh import latent_cache_sharding
            pool = jax.device_put(pool, latent_cache_sharding(self.mesh))
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
