"""Flash attention over the MLA latent cache (DeepSeek-V2/V3).

The absorbed-MLA score against token ``s`` is
``q_lat·c_s + q_pe·k_pe_s`` and the value is ``c_s`` itself — both parts
of the SAME cached latent row ``[c_s ; k_pe_s]`` (models/mla.py). So
with the query pre-concatenated as ``q_full = [q_lat ; q_pe]``:

- the score block is ONE matmul: ``q_full @ latents^T``,
- the value block is a prefix-slice of the latents already in VMEM:
  ``ctx += p @ latents[:, :r]``.

Each latent block is therefore streamed from HBM exactly once per
(batch, q-block) — the einsum path reads the cache twice (scores, then
context) and materializes [B, H, T, S] probabilities in HBM. Decode is
HBM-bandwidth-bound, so single-read streaming is the speed-of-light
shape for MLA decode.

MQA structure: all H query heads share the one latent stream, so the
(head, token) axes FLATTEN into one score-row axis — a decode step has
exactly H real rows (padding T per head to the sublane tile costs 8x
the score FLOPs, and absorbed MLA is arithmetic-intense enough — ~240
FLOP/byte at V2 geometry — that decode is compute-limited when padded).

On-chip (v5e tunnel, B=8, S=16k, H=128, C=576, bf16): 2.75 ms vs the
einsum's 4.06 ms (1.48x), near the environment's effective matmul
ceiling for these shapes.

Shapes: ``q_full [B, T, H, C]`` (C = kv_lora_rank + qk_rope_head_dim),
``latents [B, S, C]`` (one layer of the pool), out ``[B, T, H, r]``
(latent-space context; the model applies ``w_kb_v`` after).
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def latent_attention_reference(q_full, latents, q_offset, kv_len, *,
                               rank, scale):
    """jnp reference (and CPU fallback). q_full [B, T, H, C],
    latents [B, S, C] -> [B, T, H, rank] in float32."""
    B, T, H, C = q_full.shape
    S = latents.shape[1]
    lat = latents.astype(jnp.float32)
    scores = jnp.einsum("bthc,bsc->bhts", q_full.astype(jnp.float32),
                        lat) * scale
    qpos = q_offset[:, None] + jnp.arange(T)[None, :]
    kpos = jnp.arange(S)[None, :]
    mask = (kpos[:, None, :] <= qpos[:, :, None]) & (
        kpos[:, None, :] < kv_len[:, None, None])
    scores = jnp.where(mask[:, None], scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhts,bsr->bthr", probs, lat[..., :rank])


def _latent_kernel(q_off_ref, kv_len_ref, *refs, block_r, block_k,
                   n_tok, rank, scale, has_scale=False):
    """Shared body for the bf16 and int8 latent streams: with
    ``has_scale`` the block is int8 and its per-token scales correct
    score COLUMNS and probability COLUMNS (the fused-dequant trick of
    ops/quantized_attention.py, on the one MQA stream)."""
    if has_scale:
        q_ref, kv_ref, sc_ref, o_ref, m_scr, l_scr, acc_scr = refs
    else:
        q_ref, kv_ref, o_ref, m_scr, l_scr, acc_scr = refs
        sc_ref = None
    b = pl.program_id(0)
    ir = pl.program_id(1)
    ik = pl.program_id(2)
    num_k = pl.num_programs(2)

    @pl.when(ik == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # Rows are the FLATTENED (head, token) axis — row g is head g//T,
    # token g%T — so a decode step (T=1) has exactly H real rows instead
    # of H blocks padded to the sublane tile each (8x wasted score
    # FLOPs; absorbed-MLA attention has enough arithmetic intensity that
    # decode is compute-limited, not bandwidth-limited, when padded).
    # Matmuls run in the NATIVE dtype (MXU bf16 x bf16 -> f32
    # accumulate): f32 in-kernel copies blow the VMEM budget at H=128.
    q = q_ref[0]  # [block_r, C]
    kv = kv_ref[0].astype(q.dtype)  # [bk, C] — the ONE stream (int8
    #                                 dequantizes into the query dtype)

    s = jax.lax.dot_general(q, kv, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if has_scale:
        s = s * (sc_ref[0].astype(jnp.float32) * scale)
    else:
        s = s * scale

    # 1-D broadcast positions + folded causal/length compare
    # (see ops/attention.py _flash_kernel)
    g = (ir * block_r + jax.lax.broadcasted_iota(
        jnp.int32, (block_r, 1), 0))
    qpos = q_off_ref[b] + g % n_tok
    kpos = ik * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (1, block_k), 1)
    mask = kpos <= jnp.minimum(qpos, kv_len_ref[b] - 1)
    s = jnp.where(mask, s, _NEG_INF)

    m_prev = m_scr[:]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)

    l_scr[:] = alpha * l_scr[:] + jnp.sum(p, axis=1, keepdims=True)
    # value = the latent prefix of the SAME block already in VMEM; with
    # scales, the probabilities absorb the per-token scale first
    pv = (p * sc_ref[0].astype(jnp.float32)) if has_scale else p
    acc_scr[:] = alpha * acc_scr[:] + jax.lax.dot_general(
        pv.astype(kv.dtype), kv[:, :rank], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_scr[:] = m_new

    @pl.when(ik == num_k - 1)
    def _():
        l = l_scr[:]
        safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = jnp.where(l == 0.0, 0.0,
                             acc_scr[:] / safe).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(
    jax.jit,
    static_argnames=("rank", "scale", "block_q", "block_k", "interpret"))
def latent_flash_attention(
    q_full: jax.Array,  # [B, T, H, C]
    latents: jax.Array,  # [B, S, C]
    q_offset: jax.Array,  # int32 [B]
    kv_len: jax.Array,  # int32 [B]
    *,
    rank: int,
    scale: float,
    block_q: int = 128,
    block_k: int = 2048,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Single-read streaming MLA attention; see module docstring.

    Returns [B, T, H, rank] latent-space context in q_full's dtype."""
    return _latent_call(q_full, latents, None, q_offset, kv_len,
                        rank=rank, scale=scale, block_q=block_q,
                        block_k=block_k, interpret=interpret)


def _latent_call(q_full, latents, lat_scale, q_offset, kv_len, *, rank,
                 scale, block_q, block_k, interpret):
    """Shared pallas_call builder for the bf16 and int8 latent
    streams (``lat_scale`` present => int8 with fused dequant)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, T, H, C = q_full.shape
    S = latents.shape[1]

    # flatten (head, token) into one row axis; row g = (head g//T,
    # token g%T). Padding is then at most one row block total instead of
    # 7/8 of every decode block (see kernel comment).
    R = H * T
    bR = min(block_q * 8, _round_up(R, 8), 1024)
    bk = min(block_k, _round_up(S, 128))
    Rp, Sp = _round_up(R, bR), _round_up(S, bk)

    qh = q_full.transpose(0, 2, 1, 3).reshape(B, R, C)
    qh = jnp.pad(qh, ((0, 0), (0, Rp - R), (0, 0)))
    lat = jnp.pad(latents, ((0, 0), (0, Sp - S), (0, 0)))

    has_scale = lat_scale is not None
    in_specs = [
        pl.BlockSpec((1, bR, C), lambda b, ir, ik, *_: (b, ir, 0)),
        pl.BlockSpec((1, bk, C), lambda b, ir, ik, *_: (b, ik, 0)),
    ]
    inputs = [qh, lat]
    if has_scale:
        in_specs.append(pl.BlockSpec(
            (1, 1, bk), lambda b, ir, ik, *_: (b, 0, ik)))
        inputs.append(jnp.pad(lat_scale,
                              ((0, 0), (0, Sp - S)))[:, None, :])

    grid = (B, Rp // bR, Sp // bk)
    kernel = functools.partial(_latent_kernel, block_r=bR, block_k=bk,
                               n_tok=T, rank=rank, scale=scale,
                               has_scale=has_scale)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, bR, rank),
                                   lambda b, ir, ik, *_: (b, ir, 0)),
            scratch_shapes=[
                pltpu.VMEM((bR, 1), jnp.float32),
                pltpu.VMEM((bR, 1), jnp.float32),
                pltpu.VMEM((bR, rank), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Rp, rank), q_full.dtype),
        interpret=interpret,
    )(q_offset.astype(jnp.int32), kv_len.astype(jnp.int32), *inputs)
    return out[:, :R].reshape(B, H, T, rank).transpose(0, 2, 1, 3)


# ---------------------------------------------------------------------------
# Int8 latent cache (quantized MLA)
# ---------------------------------------------------------------------------


@jax.jit
def quantize_latents(latents: jax.Array):
    """Per-token symmetric int8 quantization of a latent stream.

    latents [..., S, C] -> (sym int8 [..., S, C], scale f32 [..., S]).
    The latent is already ~57x smaller than expanded KV at DeepSeek-V2
    geometry; int8 halves the decode-critical HBM stream again."""
    x32 = latents.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x32), axis=-1)
    scale = jnp.where(absmax == 0.0, 1.0, absmax) / 127.0
    sym = jnp.round(x32 / scale[..., None])
    return jnp.clip(sym, -127, 127).astype(jnp.int8), scale


def dequantize_latents(sym, scale, dtype=jnp.float32):
    return (sym.astype(jnp.float32) * scale[..., None]).astype(dtype)


def quantized_latent_attention_reference(q_full, lat_sym, lat_scale,
                                         q_offset, kv_len, *, rank, scale):
    """Dequantize then dense latent attention (tests / CPU path)."""
    return latent_attention_reference(
        q_full, dequantize_latents(lat_sym, lat_scale), q_offset, kv_len,
        rank=rank, scale=scale)


@functools.partial(
    jax.jit,
    static_argnames=("rank", "scale", "block_q", "block_k", "interpret"))
def quantized_latent_flash_attention(
    q_full: jax.Array,  # [B, T, H, C]
    lat_sym: jax.Array,  # int8 [B, S, C]
    lat_scale: jax.Array,  # f32 [B, S]
    q_offset: jax.Array,
    kv_len: jax.Array,
    *,
    rank: int,
    scale: float,
    block_q: int = 128,
    block_k: int = 2048,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """:func:`latent_flash_attention` over an int8 latent cache: the
    per-token scales ride the shared kernel body as an extra operand
    (fused dequant — see _latent_kernel)."""
    return _latent_call(q_full, lat_sym, lat_scale, q_offset, kv_len,
                        rank=rank, scale=scale, block_q=block_q,
                        block_k=block_k, interpret=interpret)
