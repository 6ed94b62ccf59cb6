"""CacheBlend: non-prefix KV reuse with selective recompute.

The reference names this capability (README.md:8 "reuse the KV caches of
*any* reused text (not necessarily prefix)", implemented in a sister repo
per README.md:77, EuroSys'25 arXiv:2405.16444) but ships no code; the
``roi`` parameter reserved in retrieve() (reference cache_engine.py:289)
is its hook. This module is a from-scratch TPU design.

The problem: a RAG prompt is a concatenation of text chunks whose KV was
cached *independently* (each prefilled standalone at positions 0..t).
Naive concatenation is wrong twice over: rotary embeddings encode the
wrong positions, and all cross-chunk attention is missing.

The blend recipe (one jitted program):

1. **Position correction** — RoPE is a rotation, so moving a cached key
   from position p to p + delta multiplies by the delta rotation; each
   chunk needs one scalar-delta re-rotation of its keys (values carry no
   positional encoding).
2. **Deviation-guided selection** — recompute layer 0 exactly (its KV
   depends only on embeddings), run it through attention over the blended
   cache, and compute true layer-1 KV for every token; the tokens whose
   layer-1 K/V deviates most from the cached KV (the cross-chunk-attention
   victims) are selected, a static ``ceil(ratio * T)`` of them.
3. **Selective recompute** — only the selected tokens flow through layers
   1..L-1; at each layer their recomputed K/V is scattered back into the
   blended cache before attention, so later layers and the final decode
   see self-healed KV.

``recompute_ratio=1.0`` degenerates to an exact full prefill (the
correctness anchor in tests/test_blend.py); ``0.0`` is naive reuse.
"""

import functools
from typing import List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from lmcache_tpu.models import llama
from lmcache_tpu.models.llama import (_attn_residual, _mlp_residual,
                                      _rms_norm, _rope)
from lmcache_tpu.ops.attention import _NEG_INF


def rope_shift_keys(keys: jax.Array, delta, theta: float,
                    rotary_dim=None, interleaved=False,
                    scaling=None, inv_freq=None) -> jax.Array:
    """Re-rotate RoPE'd keys by ``delta`` positions.

    keys: [..., T, H, D] (token axis third-from-last). delta: scalar or
    broadcastable per-token offset. ``rotary_dim``/``interleaved``/
    ``scaling`` follow models.llama._rope (GLM partial interleaved
    rotary; linear/llama3 context-extension frequency scaling — the
    shift must spin at the *scaled* frequencies or re-rotated keys land
    at the wrong effective positions). ``inv_freq`` overrides the
    derived frequencies; it may carry leading broadcast axes (e.g.
    ``[L, 1, rd/2]`` for per-layer dual-theta families) that broadcast
    against ``delta[..., None]``.
    """
    from lmcache_tpu.models.llama import rope_inv_freq
    D = keys.shape[-1]
    rd = rotary_dim or D
    kr = keys[..., :rd].astype(jnp.float32)
    # the shift is a pure rotation at the scaled frequencies: the keys
    # already carry the yarn mscale from their original roping, so it
    # is NOT reapplied here
    if inv_freq is None:
        inv_freq, _ = rope_inv_freq(theta, rd, scaling)
    angles = jnp.asarray(delta, jnp.float32)[..., None] * inv_freq
    if interleaved:
        cos = jnp.repeat(jnp.cos(angles), 2, axis=-1)
        sin = jnp.repeat(jnp.sin(angles), 2, axis=-1)
        k1, k2 = kr[..., 0::2], kr[..., 1::2]
        rotated = jnp.stack([-k2, k1], axis=-1).reshape(kr.shape)
    else:
        cos = jnp.concatenate([jnp.cos(angles)] * 2, axis=-1)
        sin = jnp.concatenate([jnp.sin(angles)] * 2, axis=-1)
        k1, k2 = jnp.split(kr, 2, axis=-1)
        rotated = jnp.concatenate([-k2, k1], axis=-1)
    # broadcast over head axis: [..., 1, D]
    cos, sin = cos[..., None, :], sin[..., None, :]
    out = (kr * cos + rotated * sin).astype(keys.dtype)
    if rd == D:
        return out
    return jnp.concatenate([out, keys[..., rd:]], axis=-1)


def _attend_selected(q, k, v, qpos, kv_len, group, sm_scale=None,
                     logit_softcap=None, sliding_window=None,
                     is_global=None, window_kind="sliding",
                     sinks=None):
    """Attention for gathered (non-contiguous) query tokens.

    q: [n, H, D] at global positions qpos [n]; k/v: [T, H_kv, D].
    Causal over global positions; kv valid below kv_len. Family traits
    mirror ops.attention.mha_reference: ``sm_scale``/``logit_softcap``
    (Gemma), ``sliding_window`` with an optional traced per-layer
    ``is_global`` override (alternating-pattern families — a global
    layer ignores the window)."""
    n, H, D = q.shape
    T, Hkv = k.shape[0], k.shape[1]
    qh = q.reshape(n, Hkv, group, D).astype(jnp.float32)
    scores = jnp.einsum("nhgd,thd->nhgt", qh, k.astype(jnp.float32))
    scores = scores * (sm_scale if sm_scale is not None else 1.0 / D**0.5)
    if logit_softcap is not None:
        scores = logit_softcap * jnp.tanh(scores / logit_softcap)
    kpos = jnp.arange(T)
    mask = (kpos[None, :] <= qpos[:, None]) & (kpos[None, :] < kv_len)
    if sliding_window is not None:
        if window_kind == "chunked":
            wmask = (kpos[None, :] // sliding_window
                     == qpos[:, None] // sliding_window)
        else:
            wmask = kpos[None, :] > qpos[:, None] - sliding_window
        if is_global is not None:
            wmask = wmask | is_global
        mask &= wmask
    scores = jnp.where(mask[:, None, None, :], scores, _NEG_INF)
    if sinks is not None:
        # attention sink (GPT-OSS): joins the softmax norm, then dropped
        snk = jnp.asarray(sinks, jnp.float32).reshape(1, Hkv, group, 1)
        m = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), snk)
        p = jnp.exp(scores - m)
        probs = p / (jnp.sum(p, axis=-1, keepdims=True)
                     + jnp.exp(snk - m))
    else:
        probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("nhgt,thd->nhgd", probs, v.astype(jnp.float32))
    return out.reshape(n, H * D).astype(q.dtype)


@functools.partial(jax.jit, static_argnames=("cfg", "n_recompute"))
def blend_prefill(
    params,
    cfg: llama.LlamaConfig,
    tokens: jax.Array,  # int32 [T] — the full concatenated prompt
    blended_kv: jax.Array,  # [L, 2, T, H_kv, D] position-corrected chunk KV
    n_recompute: int,
) -> Tuple[jax.Array, jax.Array]:
    """Self-heal blended KV and return (last-token logits [vocab],
    healed kv [L, 2, T, H_kv, D])."""
    T = tokens.shape[0]
    Hkv, D = cfg.n_kv_heads, cfg.head_dim
    group = cfg.n_heads // cfg.n_kv_heads
    positions = jnp.arange(T)
    kv_len = jnp.int32(T)
    wins = cfg.layer_windows()  # static per-layer is-global flags
    attend = functools.partial(_attend_selected, sm_scale=cfg.sm_scale,
                               logit_softcap=cfg.attn_logit_softcap,
                               sliding_window=cfg.sliding_window,
                               window_kind=cfg.local_attention_kind)

    lp0 = jax.tree.map(lambda a: a[0], params["layers"])

    def _proj(h, lp, w, b):
        y = h @ lp[w]
        return y + lp[b] if cfg.attention_bias else y  # Qwen/GLM bias

    def _freqs(g):
        """Per-layer rope frequencies (Gemma-3 dual theta / Llama-4
        iRoPE); None for uniform-rope families."""
        if cfg.rope_local_theta is None and not cfg.nope_on_global_layers:
            return None
        return llama._layer_rope_freqs(cfg, g)

    def _qk(h, lp, w, b, norm, n_heads, pos, freqs=None, g=None,
            is_query=False):
        """q or k heads [1, t, H, D]: project, per-head qk-norm (Qwen3),
        rope, post-rope L2 norm + NoPE query temperature (Llama-4) —
        mirroring models.llama._qkv_heads for gathered tokens."""
        y = _proj(h, lp, w, b)
        if cfg.qk_norm_flat:  # OLMo-2: full-width norm pre-reshape
            y = _rms_norm(y, lp[norm], cfg.norm_eps, cfg.norm_one_offset)
        y = y.reshape(1, -1, n_heads, D)
        if cfg.qk_norm:
            y = _rms_norm(y, lp[norm], cfg.norm_eps, cfg.norm_one_offset)
        y = _rope(y, pos, cfg.rope_theta, cfg.rotary_dim,
                  cfg.rope_interleaved, cfg.rope_scaling_spec,
                  freqs=freqs)
        static_g = isinstance(g, (bool, np.bool_))
        if cfg.qk_l2_norm and g is not None:
            yn = llama._l2_norm(y, cfg.norm_eps)  # rope layers only
            y = (y if g else yn) if static_g else jnp.where(g, y, yn)
        if is_query and cfg.attn_temperature_tuning and g is not None:
            scales = 1.0 + cfg.attn_scale * jnp.log1p(jnp.floor(
                (pos.astype(jnp.float32) + 1.0) / cfg.attn_floor_scale))
            ys = (y.astype(jnp.float32)
                  * scales[..., None, None]).astype(y.dtype)
            y = (ys if g else y) if static_g else jnp.where(g, ys, y)
        return y

    # ---- pass 1: exact layer 0 for ALL tokens + true layer-1 KV ----------
    x = llama._embed(params, cfg, tokens)  # [T, dim]
    h = llama._attn_input(x, lp0, cfg)
    g0 = bool(wins[0])
    f0 = _freqs(g0)
    q0 = _qk(h, lp0, "wq", "bq", "q_norm", cfg.n_heads, positions[None],
             freqs=f0, g=g0, is_query=True)[0]
    k0 = _qk(h, lp0, "wk", "bk", "k_norm", Hkv, positions[None],
             freqs=f0, g=g0)[0]
    v0 = _proj(h, lp0, "wv", "bv").reshape(T, Hkv, D)
    kv0 = jnp.stack([k0, v0]).astype(blended_kv.dtype)  # exact layer-0 KV
    blended_kv = blended_kv.at[0].set(kv0)

    attn = attend(q0, k0, v0, positions, kv_len, group,
                  is_global=bool(wins[0]),
                  sinks=(lp0["sinks"] if cfg.attn_sinks else None))
    x = _attn_residual(x, attn, lp0, cfg)
    x = _mlp_residual(x, lp0, cfg)

    # true layer-1 KV for all tokens (cheap: projections only)
    lp1 = jax.tree.map(lambda a: a[min(1, cfg.n_layers - 1)],
                       params["layers"])
    h1 = llama._attn_input(x, lp1, cfg)
    g1 = bool(wins[min(1, cfg.n_layers - 1)])
    k1_true = _qk(h1, lp1, "wk", "bk", "k_norm", Hkv, positions[None],
                  freqs=_freqs(g1), g=g1)[0]
    v1_true = _proj(h1, lp1, "wv", "bv").reshape(T, Hkv, D)

    # ---- deviation-guided token selection --------------------------------
    l1 = min(1, cfg.n_layers - 1)
    dev = (jnp.sum(
        (k1_true.astype(jnp.float32) -
         blended_kv[l1, 0].astype(jnp.float32))**2, axis=(1, 2)) + jnp.sum(
             (v1_true.astype(jnp.float32) -
              blended_kv[l1, 1].astype(jnp.float32))**2, axis=(1, 2)))
    # the final token must always be recomputed (it produces the logits)
    dev = dev.at[T - 1].set(jnp.inf)
    _, sel = jax.lax.top_k(dev, n_recompute)
    sel = jnp.sort(sel)  # keep causal order
    sel_pos = positions[sel]

    # ---- pass 2: selected tokens through layers 1..L-1 -------------------
    xs = x[sel]  # [n, dim]

    def layer(carry, scanned):
        xs, _ = carry
        lp, kv_l, g = scanned  # kv_l: [2, T, H_kv, D]
        h = llama._attn_input(xs, lp, cfg)
        n = xs.shape[0]
        fl = _freqs(g)
        q = _qk(h, lp, "wq", "bq", "q_norm", cfg.n_heads, sel_pos[None],
                freqs=fl, g=g, is_query=True)[0]
        k = _qk(h, lp, "wk", "bk", "k_norm", Hkv, sel_pos[None],
                freqs=fl, g=g)[0]
        v = _proj(h, lp, "wv", "bv").reshape(n, Hkv, D)
        # scatter healed KV before attending
        kv_l = kv_l.at[0, sel].set(k.astype(kv_l.dtype))
        kv_l = kv_l.at[1, sel].set(v.astype(kv_l.dtype))
        attn = attend(q, kv_l[0], kv_l[1], sel_pos, kv_len, group,
                      is_global=g,
                      sinks=(lp["sinks"] if cfg.attn_sinks else None))
        xs = _attn_residual(xs, attn, lp, cfg)
        xs = _mlp_residual(xs, lp, cfg)
        return (xs, None), kv_l

    rest = jax.tree.map(lambda a: a[1:], params["layers"])
    (xs, _), healed = jax.lax.scan(
        layer, (xs, None), (rest, blended_kv[1:], jnp.asarray(wins[1:])))
    blended_kv = jnp.concatenate([blended_kv[:1], healed], axis=0)

    logits = llama._lm_logits(xs[-1:], params, cfg)[0]
    return logits, blended_kv


def assemble_chunks(chunk_blobs: Sequence[np.ndarray],
                    theta: float, rotary_dim=None,
                    interleaved=False, scaling=None,
                    local_theta=None, global_layers=None,
                    nope_global=False) -> jax.Array:
    """Concatenate independently-cached chunk KV (vllm fmt
    [L, 2, t_i, H, D], each prefilled at positions 0..t_i) into one
    position-corrected [L, 2, T, H, D] buffer.

    ``local_theta``/``global_layers`` (dual-theta families, Gemma-3):
    sliding layers' keys were roped at ``local_theta`` unscaled, so
    their shift must spin at those frequencies — a per-layer
    ``[L, 1, rd/2]`` inv_freq rides the layer axis of the blob."""
    from lmcache_tpu.models.llama import rope_inv_freq
    inv = None
    if local_theta is not None or nope_global:
        D = chunk_blobs[0].shape[-1]
        rd = rotary_dim or D
        inv_g, _ = rope_inv_freq(theta, rd, scaling)
        if nope_global:
            # iRoPE: global layers' keys carry no positional encoding —
            # their shift is the identity (zero frequencies)
            inv_glb = jnp.zeros_like(inv_g)
            inv_loc = inv_g
        else:
            inv_glb = inv_g
            inv_loc, _ = rope_inv_freq(local_theta, rd, None)
        glb = jnp.asarray(global_layers, bool)[:, None, None]  # [L,1,1]
        inv = jnp.where(glb, inv_glb, inv_loc)  # [L, 1, rd/2]
    parts = []
    offset = 0
    for blob in chunk_blobs:
        blob = jnp.asarray(blob)
        t = blob.shape[2]
        k = rope_shift_keys(blob[:, 0],  # [L, t, H, D]
                            jnp.full((t,), offset, jnp.float32), theta,
                            rotary_dim, interleaved, scaling, inv_freq=inv)
        parts.append(jnp.stack([k, blob[:, 1]], axis=1))
        offset += t
    return jnp.concatenate(parts, axis=2)


class BlenderBase:
    """Shared store/retrieve/blend orchestration for the family-specific
    blenders (:class:`CacheBlender` for dense-KV models,
    :class:`lmcache_tpu.blend_mla.MLACacheBlender` for latent-KV models).

    Unlike prefix caching (rolling hash chains, chunks.py), blend chunks
    are keyed by their own content hash so the same document KV is
    reusable at any position in any prompt. Subclasses supply:
    ``_chunk_prefill(params, tokens[1, t]) -> wire blob``,
    ``_assemble(blobs) -> position-corrected cache``, and
    ``_heal(full_tokens, blended, n_rec) -> (logits, wire blob)``.
    """

    def __init__(self, cfg, params, cache_engine,
                 recompute_ratio: float = 0.15):
        self.cfg = cfg
        self.params = params
        self.engine = cache_engine
        self.ratio = recompute_ratio

    def _key(self, tokens: np.ndarray):
        from lmcache_tpu.chunks import hash_tokens
        from lmcache_tpu.utils import CacheEngineKey
        m = self.engine.metadata
        return CacheEngineKey("blend", m.model_name, m.world_size,
                              m.worker_id, hash_tokens(tokens))

    def store_chunk(self, tokens) -> None:
        """Prefill a text chunk standalone and cache its KV under a
        position-independent content hash."""
        tokens = np.asarray(tokens, np.int32)
        blob = self._chunk_prefill(self.params,
                                   jnp.asarray(tokens)[None, :])
        self.engine.engine_.put(self._key(tokens), blob, blocking=True)

    def blend(self, chunk_tokens: List[np.ndarray]):
        """Blend cached chunks into a healed prompt KV.

        Returns (last_logits [vocab], wire KV blob, info dict). Chunks
        missing from the cache are prefilled (and stored) first.
        """
        blobs, misses = [], 0
        for tokens in chunk_tokens:
            tokens = np.asarray(tokens, np.int32)
            blob = self.engine.engine_.get(self._key(tokens))
            if blob is None:
                misses += 1
                self.store_chunk(tokens)
                blob = self.engine.engine_.get(self._key(tokens))
            blobs.append(blob)

        full = np.concatenate([np.asarray(t, np.int32) for t in chunk_tokens])
        blended = self._assemble(blobs)
        T = len(full)
        n_rec = max(1, min(T, int(np.ceil(self.ratio * T))))
        logits, kv = self._heal(jnp.asarray(full), blended, n_rec)
        return logits, kv, {
            "num_chunks": len(chunk_tokens),
            "misses": misses,
            "recomputed_tokens": n_rec,
            "total_tokens": T,
        }


class CacheBlender(BlenderBase):
    """:class:`BlenderBase` for dense-KV (llama-family) models; the wire
    blob is vllm-format ``[L, 2, T, H_kv, D]``."""

    def __init__(self, cfg: llama.LlamaConfig, params, cache_engine,
                 recompute_ratio: float = 0.15):
        super().__init__(cfg, params, cache_engine, recompute_ratio)
        cfg_ = cfg

        @jax.jit
        def chunk_prefill(params, tokens):
            cache = llama.new_kv_cache(cfg_, 1, tokens.shape[1])
            _, cache = llama.forward(params, cfg_, tokens,
                                     jnp.zeros(1, jnp.int32), cache,
                                     use_pallas=False)
            # head-major pool [L, 2, H, T, D] -> wire blob [L, 2, T, H, D]
            return cache[:, :, 0].transpose(0, 1, 3, 2, 4)

        self._chunk_prefill = chunk_prefill

    def _assemble(self, blobs):
        per_layer = (self.cfg.rope_local_theta is not None
                     or self.cfg.nope_on_global_layers)
        return assemble_chunks(
            blobs, self.cfg.rope_theta, self.cfg.rotary_dim,
            self.cfg.rope_interleaved, self.cfg.rope_scaling_spec,
            local_theta=self.cfg.rope_local_theta,
            global_layers=(tuple(self.cfg.layer_windows())
                           if per_layer else None),
            nope_global=self.cfg.nope_on_global_layers)

    def _heal(self, full, blended, n_rec):
        return blend_prefill(self.params, self.cfg, full, blended, n_rec)
