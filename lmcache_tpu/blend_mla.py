"""CacheBlend for Multi-head Latent Attention models.

The dense-KV recipe (lmcache_tpu/blend.py; reference capability
README.md:8 / the ``roi`` hook reserved at reference
cache_engine.py:289-290) carries over to MLA with one structural
difference in each step:

1. **Position correction** — an MLA latent row is ``[c (r dims),
   k_pe (p dims)]`` (models/mla.py). The compressed latent ``c``
   carries NO positional encoding; only the shared MQA rope key
   ``k_pe`` was roped at chunk-local positions. Moving a chunk to a
   new offset therefore re-rotates ONLY the ``[r : r+p]`` slice of
   each latent — a (p/2)-frequency rotation per token instead of a
   full per-head key rotation. Values need nothing (they are read
   from the same latent's first ``r`` dims, positional-encoding-free).
2. **Deviation-guided selection** — the cached object per (layer,
   token) is one latent row, so the deviation signal is the squared
   distance between the true layer-1 latent and the blended one: no
   head reduction needed.
3. **Selective recompute** — selected tokens flow through layers
   1..L-1 with absorbed-MQA attention over the blended latent stream,
   scattering their healed latent rows back before attending.

``recompute_ratio=1.0`` degenerates to an exact full prefill (the
correctness anchor in tests/test_blend_mla.py).
"""

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from lmcache_tpu.blend import BlenderBase, rope_shift_keys
from lmcache_tpu.models import mla
from lmcache_tpu.models.llama import _rms_norm
from lmcache_tpu.models.mla import _mla_project, _moe_mlp
from lmcache_tpu.ops.attention import _NEG_INF


def shift_latent_positions(lat: jax.Array, delta,
                           cfg: mla.MLAConfig) -> jax.Array:
    """Re-rotate the rope slice ``[r : r+p]`` of latent rows by
    ``delta`` positions.

    lat: ``[..., T, C=r+p]``; delta: scalar or per-token ``[T]``. The
    rotation spins at the model's (possibly deepseek-yarn-scaled)
    frequencies; the yarn mscale already rides the cached ``k_pe``
    from its original roping and is not reapplied (a shift is a pure
    rotation — see blend.rope_shift_keys).
    """
    r = cfg.kv_lora_rank
    k_pe = rope_shift_keys(
        lat[..., None, r:],  # [..., T, 1(head), p]
        delta, cfg.rope_theta, None, cfg.rope_interleaved,
        cfg.rope_scaling_spec)[..., 0, :]
    return jnp.concatenate([lat[..., :r], k_pe.astype(lat.dtype)],
                           axis=-1)


def assemble_latent_chunks(chunk_blobs, cfg: mla.MLAConfig) -> jax.Array:
    """Concatenate independently-cached latent chunk blobs
    (``[L, 1, t_i, 1, C]`` wire format, each prefilled at positions
    0..t_i) into one position-corrected ``[L, T, C]`` latent stream."""
    parts, offset = [], 0
    for blob in chunk_blobs:
        lat = jnp.asarray(blob)[:, 0, :, 0, :]  # [L, t, C]
        t = lat.shape[1]
        parts.append(shift_latent_positions(
            lat, jnp.full((t,), offset, jnp.float32), cfg))
        offset += t
    return jnp.concatenate(parts, axis=1)


def _attend_selected_latent(q_full, lat, qpos, kv_len, rank, scale):
    """Absorbed-MQA attention for gathered (non-contiguous) tokens.

    q_full: ``[n, H, C]`` at global positions qpos ``[n]``; lat:
    ``[T, C]`` — scores against the whole latent row, values from its
    first ``rank`` dims (mirrors ops.latent_attention reference).
    Causal over global positions; keys valid below ``kv_len``."""
    lat32 = lat.astype(jnp.float32)
    scores = jnp.einsum("nhc,tc->nht", q_full.astype(jnp.float32),
                        lat32) * scale
    kpos = jnp.arange(lat.shape[0])
    mask = (kpos[None, :] <= qpos[:, None]) & (kpos[None, :] < kv_len)
    scores = jnp.where(mask[:, None, :], scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("nht,tr->nhr", probs, lat32[:, :rank])


@functools.partial(jax.jit, static_argnames=("cfg", "n_recompute"))
def mla_blend_prefill(
    params,
    cfg: mla.MLAConfig,
    tokens: jax.Array,  # int32 [T] — the full concatenated prompt
    blended: jax.Array,  # [L, T, C] position-corrected latent stream
    n_recompute: int,
) -> Tuple[jax.Array, jax.Array]:
    """Self-heal a blended latent stream and return (last-token logits
    [vocab], healed latents [L, T, C])."""
    T = tokens.shape[0]
    H, r = cfg.n_heads, cfg.kv_lora_rank
    L, kd = cfg.n_layers, cfg.n_dense_layers
    positions = jnp.arange(T)
    kv_len = jnp.int32(T)

    def lp_at(i):
        if i < kd:
            return jax.tree.map(lambda a: a[i], params["dense_layers"])
        return jax.tree.map(lambda a: a[i - kd], params["moe_layers"])

    def attn_residual(ctx, lp, xs):
        attn = jnp.einsum("nhr,hrv->nhv", ctx,
                          lp["w_kb_v"].astype(jnp.float32))
        attn = attn.astype(xs.dtype).reshape(xs.shape[0],
                                             H * cfg.v_head_dim)
        return xs + attn @ lp["wo"]

    def mlp_residual(xs, lp, moe):
        h = _rms_norm(xs, lp["mlp_norm"], cfg.norm_eps)
        if moe:
            y = _moe_mlp(h, lp, cfg)
        else:
            gate = jax.nn.silu((h @ lp["w_gate"]).astype(jnp.float32))
            up = (h @ lp["w_up"]).astype(jnp.float32)
            y = (gate * up).astype(xs.dtype) @ lp["w_down"]
        return xs + y

    # ---- pass 1: exact layer 0 for ALL tokens -----------------------------
    # (a layer-0 latent depends only on embeddings, so it is recomputed
    # exactly; attention then runs over the healed layer-0 stream)
    x = params["embed"][tokens]  # [T, dim]
    lp0 = lp_at(0)
    q0, new0 = _mla_project(x[None], lp0, cfg, positions[None])
    blended = blended.at[0].set(new0[0].astype(blended.dtype))
    ctx0 = _attend_selected_latent(q0[0], blended[0], positions, kv_len,
                                   r, cfg.sm_scale)
    x = attn_residual(ctx0, lp0, x)
    x = mlp_residual(x, lp0, moe=cfg.moe_layer(0))

    # ---- deviation-guided token selection ---------------------------------
    # true layer-1 latents for all tokens (projections only — cheap);
    # the tokens whose latents deviate most from the cached ones are the
    # cross-chunk-attention victims
    l1 = min(1, L - 1)
    _, new1 = _mla_project(x[None], lp_at(l1), cfg, positions[None])
    dev = jnp.sum((new1[0].astype(jnp.float32)
                   - blended[l1].astype(jnp.float32)) ** 2, axis=-1)
    # the final token must always be recomputed (it produces the logits)
    dev = dev.at[T - 1].set(jnp.inf)
    _, sel = jax.lax.top_k(dev, n_recompute)
    sel = jnp.sort(sel)  # keep causal order
    sel_pos = positions[sel]

    # ---- pass 2: selected tokens through layers 1..L-1 --------------------
    xs = x[sel]  # [n, dim]

    def layer(moe):
        def f(xs, scanned):
            lp, lat_l = scanned  # lat_l: [T, C]
            q, new = _mla_project(xs[None], lp, cfg, sel_pos[None])
            # scatter healed latent rows before attending
            lat_l = lat_l.at[sel].set(new[0].astype(lat_l.dtype))
            ctx = _attend_selected_latent(q[0], lat_l, sel_pos, kv_len,
                                          r, cfg.sm_scale)
            return mlp_residual(attn_residual(ctx, lp, xs), lp,
                                moe), lat_l
        return f

    healed = [blended[:1]]
    if kd > 1:
        rest = jax.tree.map(lambda a: a[1:], params["dense_layers"])
        xs, hd = jax.lax.scan(layer(False), xs, (rest, blended[1:kd]))
        healed.append(hd)
    if kd < L:
        # when layer 0 itself is MoE (kd == 0), skip it in the stack
        mp = (params["moe_layers"] if kd else jax.tree.map(
            lambda a: a[1:], params["moe_layers"]))
        xs, hm = jax.lax.scan(layer(True), xs,
                              (mp, blended[max(kd, 1):]))
        healed.append(hm)
    blended = jnp.concatenate(healed, axis=0)

    x = _rms_norm(xs[-1:], params["final_norm"], cfg.norm_eps)
    logits = (x @ params["lm_head"]).astype(jnp.float32)[0]
    return logits, blended


class MLACacheBlender(BlenderBase):
    """:class:`lmcache_tpu.blend.BlenderBase` for MLA models; the wire
    blob is the latent ``[L, 1, T, 1, C]`` (mla.cache_to_blob), so the
    healed result injects through the unchanged engine hooks."""

    def __init__(self, cfg: mla.MLAConfig, params, cache_engine,
                 recompute_ratio: float = 0.15):
        super().__init__(cfg, params, cache_engine, recompute_ratio)
        cfg_ = cfg

        @jax.jit
        def chunk_prefill(params, tokens):
            cache = mla.new_latent_cache(cfg_, 1, tokens.shape[1])
            _, cache = mla.forward(params, cfg_, tokens,
                                   jnp.zeros(1, jnp.int32), cache,
                                   use_pallas=False)
            return mla.cache_to_blob(cache, 0, tokens.shape[1])

        self._chunk_prefill = chunk_prefill

    def _assemble(self, blobs):
        return assemble_latent_chunks(blobs, self.cfg)

    def _heal(self, full, blended, n_rec):
        logits, lat = mla_blend_prefill(self.params, self.cfg, full,
                                        blended, n_rec)
        return logits, lat[:, None, :, None, :]  # wire blob
