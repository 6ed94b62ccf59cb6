"""Continuous-batching serving engine with KV-cache reuse.

Replaces the reference's external vLLM integration (hook contract:
reference docs/source/developer_tutorial/LLM_Engine.rst:25-117) with a
native loop. TPU-first structure:

- ONE resident KV pool ``[L, 2, B, S, H_kv, D]`` (optionally mesh-sharded:
  batch on "data", heads on "model"); requests own slots of it,
- decode is a single jitted step over the whole batch every iteration
  (inactive slots write one garbage token into their free slot at pos 0,
  which the next prefill overwrites — keeps the step shape static),
- prefill runs per-request at bucketed lengths (powers of two) so XLA
  compiles a bounded set of programs,
- cache reuse: on admission the prompt is looked up in the LMCacheEngine;
  the hit prefix is injected into the slot and only the suffix is
  prefilled (reference ``build_partial_prefill_input`` semantics,
  LLM_Engine.rst:108-117); on completion the KV is stored back
  asynchronously (prefill tokens, plus decode tokens when
  ``save_decode_cache`` is on, reference config.py:31).
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
from lmcache_tpu.serving.request import Request, RequestState

logger = init_logger(__name__)


def _bucket(n: int, lo: int = 16) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


class ServingEngine:

    def __init__(
        self,
        cfg: llama.LlamaConfig,
        params,
        *,
        max_batch: int = 8,
        max_seq: Optional[int] = None,
        cache_engine: Optional[LMCacheEngine] = None,
        eos_token_id: Optional[int] = None,
        save_decode_cache: bool = False,
        use_pallas: Optional[bool] = None,
        mesh=None,
        kv_dtype: str = "native",  # "native" (model dtype) | "int8"
        blend_recompute_ratio: float = 0.15,
        decode_block: int = 1,
        prefill_chunk: int = 512,
    ):
        self.cfg = cfg
        self.params = params
        self.B = max_batch
        self.S = max_seq or cfg.max_seq_len
        self.cache_engine = cache_engine
        self.eos_token_id = eos_token_id
        self.save_decode_cache = save_decode_cache
        if use_pallas is None:
            use_pallas = jax.default_backend() != "cpu"
        self.use_pallas = use_pallas
        self.mesh = mesh
        if kv_dtype not in ("native", "int8"):
            raise ValueError(f"Invalid kv_dtype: {kv_dtype}")
        self.kv_dtype = kv_dtype
        quantized = kv_dtype == "int8"

        self.kv_pool = (llama.new_quantized_kv_cache(cfg, self.B, self.S)
                        if quantized else
                        llama.new_kv_cache(cfg, self.B, self.S))
        if mesh is not None:
            from lmcache_tpu.parallel import kv_cache_sharding
            if quantized:
                from jax.sharding import NamedSharding, PartitionSpec as P
                self.kv_pool = {
                    "sym": jax.device_put(self.kv_pool["sym"],
                                          kv_cache_sharding(mesh)),
                    "scale": jax.device_put(
                        self.kv_pool["scale"],
                        NamedSharding(mesh, P(None, None, "data", None))),
                }
            else:
                self.kv_pool = jax.device_put(self.kv_pool,
                                              kv_cache_sharding(mesh))
        self.free_slots = list(range(self.B))
        self.waiting: List[Request] = []
        self.running: List[Request] = []
        self.finished: List[Request] = []
        self._rng = jax.random.PRNGKey(0)

        fwd = functools.partial(
            llama.forward_quantized if quantized else llama.forward,
            cfg=cfg, use_pallas=self.use_pallas)

        @functools.partial(jax.jit, donate_argnums=(3,))
        def prefill_step(params, tokens, start, cache, slot, last_idx):
            # tokens [1, Tp]; write into pool slot, return last real logits
            # (the pool is a bare array, or a {"sym","scale"} tree in int8
            # mode — batch is axis 2 in every leaf)
            kv_slice = jax.tree.map(
                lambda a: jax.lax.dynamic_slice_in_dim(a, slot, 1, axis=2),
                cache)
            logits, new_slice = fwd(params, tokens=tokens, start_pos=start,
                                    kv_cache=kv_slice)
            cache = jax.tree.map(
                lambda c, n: jax.lax.dynamic_update_slice_in_dim(
                    c, n, slot, axis=2), cache, new_slice)
            return logits[0, last_idx], cache

        @functools.partial(jax.jit, donate_argnums=(3,))
        def decode_step(params, tokens, start, cache):
            # tokens [B, 1]; one token for every slot
            logits, cache = fwd(params, tokens=tokens, start_pos=start,
                                kv_cache=cache)
            return logits[:, 0], cache

        @functools.partial(jax.jit, donate_argnums=(3,))
        def decode_block_step(params, tokens, start, cache, temps, topks,
                              rng):
            # run `decode_block` steps fully on device — sampling included
            # — so the host round-trip cost amortizes over the block.
            # Requests that hit a stop mid-block produce extra tokens the
            # scheduler truncates; their KV writes are garbage past the
            # stop, which the next slot occupant's prefill overwrites.
            def body(carry, _):
                tokens, start, cache, rng = carry
                logits, cache = fwd(params, tokens=tokens, start_pos=start,
                                    kv_cache=cache)
                rng, sub = jax.random.split(rng)
                toks = sample(logits[:, 0], temps, sub, topks)  # [B]
                return (toks[:, None].astype(jnp.int32), start + 1, cache,
                        rng), toks

            (_, _, cache, _), toks = jax.lax.scan(
                body, (tokens, start, cache, rng), None,
                length=decode_block)
            return toks.T, cache  # [B, decode_block]

        @functools.partial(jax.jit, donate_argnums=(0,))
        def inject(cache, blob, slot):
            # blob [L, 2, t, H, D] (model dtype) -> cache[:, :, slot, :t]
            if quantized:
                b32 = blob.astype(jnp.float32)
                absmax = jnp.max(jnp.abs(b32), axis=(3, 4))  # [L, 2, t]
                scl = jnp.where(absmax == 0.0, 1.0, absmax) / 127.0
                sym = jnp.clip(jnp.round(b32 / scl[..., None, None]), -127,
                               127).astype(jnp.int8)
                return {
                    "sym":
                    jax.lax.dynamic_update_slice(cache["sym"],
                                                 sym[:, :, None],
                                                 (0, 0, slot, 0, 0, 0)),
                    "scale":
                    jax.lax.dynamic_update_slice(cache["scale"],
                                                 scl[:, :, None],
                                                 (0, 0, slot, 0)),
                }
            return jax.lax.dynamic_update_slice(
                cache, blob[:, :, None].astype(cache.dtype),
                (0, 0, slot, 0, 0, 0))

        @jax.jit
        def read_slot(cache, slot):
            # KV blob [L, 2, S, H, D] of one slot, dequantized if needed
            if quantized:
                sym = cache["sym"][:, :, slot]
                scl = cache["scale"][:, :, slot]
                return (sym.astype(jnp.float32) *
                        scl[..., None, None]).astype(jnp.dtype(cfg.dtype))
            return cache[:, :, slot]

        @jax.jit
        def sample(logits, temperature, rng, top_k=0):
            # logits [..., V]; temperature 0 => greedy; top_k > 0 limits
            # sampling to the k highest-probability tokens per position
            greedy = jnp.argmax(logits, axis=-1)
            t = jnp.asarray(temperature, jnp.float32)
            k = jnp.asarray(top_k, jnp.int32)
            # k-th largest value per row as the cutoff (k=0 -> no cutoff)
            sorted_desc = jnp.sort(logits, axis=-1)[..., ::-1]
            idx = jnp.clip(k - 1, 0, logits.shape[-1] - 1)
            cutoff = jnp.take_along_axis(
                sorted_desc,
                jnp.broadcast_to(jnp.expand_dims(idx, -1),
                                 logits.shape[:-1] + (1,)), -1)
            restricted = jnp.where(logits >= cutoff, logits, -jnp.inf)
            eff = jnp.where(jnp.expand_dims(k, -1) > 0, restricted, logits)
            scaled = eff / jnp.expand_dims(jnp.maximum(t, 1e-6), -1)
            drawn = jax.random.categorical(rng, scaled, axis=-1)
            return jnp.where(t > 0.0, drawn, greedy)

        self._prefill_step = prefill_step
        self._decode_step = decode_step
        self._decode_block_step = decode_block_step
        self.decode_block = decode_block
        self.prefill_chunk = prefill_chunk
        self._inject = inject
        self._read_slot = read_slot
        self._sample = sample

        # CacheBlend path (non-prefix reuse for chunked RAG prompts);
        # built lazily on the first context_chunks request
        self._blend_ratio = blend_recompute_ratio
        self._blender = None

    def _get_blender(self):
        if self._blender is None:
            if self.cache_engine is None:
                raise ValueError(
                    "context_chunks requests need a cache_engine")
            from lmcache_tpu.blend import CacheBlender
            self._blender = CacheBlender(self.cfg, self.params,
                                         self.cache_engine,
                                         recompute_ratio=self._blend_ratio)
        return self._blender

    # -- public API ---------------------------------------------------------

    def add_request(self, req: Request) -> Request:
        if req.num_prompt_tokens >= self.S:
            raise ValueError(
                f"prompt ({req.num_prompt_tokens}) >= max_seq ({self.S})")
        self.waiting.append(req)
        return req

    def has_work(self) -> bool:
        return bool(self.waiting or self.running)

    def run(self) -> List[Request]:
        """Drive until all requests finish; returns them."""
        while self.has_work():
            self.step()
        return self.finished

    def generate(self, prompts, sampling=None) -> List[Request]:
        """Convenience: submit a batch of prompts and run to completion."""
        from lmcache_tpu.serving.request import SamplingParams
        reqs = [
            Request(p, sampling or SamplingParams()) for p in prompts
        ]
        for r in reqs:
            self.add_request(r)
        self.run()
        return reqs

    # -- scheduler ----------------------------------------------------------

    def step(self) -> None:
        """One scheduler iteration: admit one waiting request (prefill) or
        run one batched decode step."""
        if self.waiting and self.free_slots:
            self._admit(self.waiting.pop(0))
        elif self.running:
            self._decode_all()

    # -- internals ----------------------------------------------------------

    def _next_rng(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def _admit(self, req: Request) -> None:
        slot = self.free_slots.pop(0)
        req.slot = slot
        req.state = RequestState.RUNNING

        if req.context_chunks is not None:
            self._admit_blend(req)
            return

        prompt = req.prompt_tokens
        cached = 0
        if self.cache_engine is not None:
            blob, mask = self.cache_engine.retrieve(prompt,
                                                    return_tuple=False)
            cached = int(np.asarray(mask).sum())
            # always recompute >=1 token so prefill yields the next logits
            cached = min(cached, len(prompt) - 1)
            if cached > 0:
                blob = blob[:, :, :cached]
                self.kv_pool = self._inject(self.kv_pool, jnp.asarray(blob),
                                            slot)
        req.cached_prefix_len = cached
        logits = self._chunked_prefill(prompt, cached, slot)
        tok = int(
            self._sample(logits, jnp.float32(req.sampling.temperature),
                         self._next_rng(), req.sampling.top_k))
        req.output_tokens.append(tok)
        req.ttft_s = time.perf_counter() - req.arrival_s
        self.running.append(req)
        self._maybe_finish(req)

    def _chunked_prefill(self, prompt: np.ndarray, cached: int,
                         slot: int):
        """Prefill the uncached suffix in fixed-size chunks so XLA
        compiles at most two prefill programs (chunk-sized and the
        bucketed tail) regardless of prompt length. Intermediate chunks'
        dispatches pipeline; only the final one's logits are used."""
        PC = self.prefill_chunk
        pos = cached
        n = len(prompt)
        logits = None
        while pos < n:
            seg = prompt[pos:pos + PC]
            T = len(seg)
            Tp = PC if T == PC else _bucket(T)
            padded = np.zeros(Tp, np.int32)
            padded[:T] = seg
            logits, self.kv_pool = self._prefill_step(
                self.params, jnp.asarray(padded)[None, :],
                jnp.asarray([pos], jnp.int32), self.kv_pool,
                jnp.asarray(slot, jnp.int32), jnp.asarray(T - 1, jnp.int32))
            pos += T
        return logits

    def _admit_blend(self, req: Request) -> None:
        """Admit a chunked-context request via CacheBlend: reuse each
        chunk's independently-cached KV (any position), heal a selected
        fraction, and start decoding immediately — no full prefill."""
        blender = self._get_blender()
        logits, kv_blob, info = blender.blend(req.context_chunks)
        req.blended_tokens_recomputed = info["recomputed_tokens"]
        req.cached_prefix_len = info["total_tokens"] - info[
            "recomputed_tokens"]
        self.kv_pool = self._inject(self.kv_pool,
                                    kv_blob.astype(jnp.dtype(
                                        self.cfg.dtype)),
                                    jnp.asarray(req.slot, jnp.int32))
        tok = int(
            self._sample(logits, jnp.float32(req.sampling.temperature),
                         self._next_rng(), req.sampling.top_k))
        req.output_tokens.append(tok)
        req.ttft_s = time.perf_counter() - req.arrival_s
        self.running.append(req)
        self._maybe_finish(req)

    def _decode_all(self) -> None:
        last = np.zeros((self.B, 1), np.int32)
        start = np.zeros(self.B, np.int32)
        temps = np.zeros(self.B, np.float32)
        topks = np.zeros(self.B, np.int32)
        # KV state: prefill wrote the prompt; each decode step writes its
        # input token. After n sampled tokens the pool holds
        # prompt + (n - 1) of them, so the next write position is
        # prompt_len + n - 1 and the input is the newest sampled token.
        for r in self.running:
            last[r.slot, 0] = r.output_tokens[-1]
            start[r.slot] = r.num_prompt_tokens + len(r.output_tokens) - 1
            temps[r.slot] = r.sampling.temperature
            topks[r.slot] = r.sampling.top_k

        if self.decode_block > 1:
            toks, self.kv_pool = self._decode_block_step(
                self.params, jnp.asarray(last), jnp.asarray(start),
                self.kv_pool, jnp.asarray(temps), jnp.asarray(topks),
                self._next_rng())
            toks = np.asarray(toks)  # [B, decode_block]
            for r in list(self.running):
                for j in range(self.decode_block):
                    r.output_tokens.append(int(toks[r.slot, j]))
                    if r.is_finished(self.eos_token_id):
                        break
                self._maybe_finish(r)
            return

        logits, self.kv_pool = self._decode_step(self.params,
                                                 jnp.asarray(last),
                                                 jnp.asarray(start),
                                                 self.kv_pool)
        toks = np.asarray(
            self._sample(logits, jnp.asarray(temps), self._next_rng(),
                         jnp.asarray(topks)))
        for r in list(self.running):
            r.output_tokens.append(int(toks[r.slot]))
            self._maybe_finish(r)

    def _maybe_finish(self, req: Request) -> None:
        if not req.is_finished(self.eos_token_id):
            return
        req.state = RequestState.FINISHED
        req.finish_s = time.perf_counter()
        self.running = [r for r in self.running if r is not req]
        self.finished.append(req)
        self._store_back(req)
        self.free_slots.append(req.slot)

    def _store_back(self, req: Request) -> None:
        """Store the finished request's KV into the cache tiers
        (asynchronously; reference lmcache_store_kv semantics)."""
        if self.cache_engine is None:
            return
        n = req.total_len if self.save_decode_cache else req.num_prompt_tokens
        # the pool holds KV for total_len - 1 tokens (the newest sampled
        # token was never forwarded)
        n = min(n, req.total_len - 1)
        if n <= 0:
            return
        tokens = req.all_tokens[:n]
        blob = self._read_slot(self.kv_pool,
                               jnp.asarray(req.slot))[:, :, :n]
        self.cache_engine.store(tokens, blob, blocking=False)
