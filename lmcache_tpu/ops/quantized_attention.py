"""Fused dequant + flash attention over an int8-quantized KV cache.

The north-star kernel (BASELINE.json): CacheGen-style per-token
symmetric quantization fused INTO attention, so the KV cache lives in
HBM at int8 — half the bytes of bf16 — and is dequantized on the fly in
VMEM. Decode attention is HBM-bandwidth-bound, so halving KV bytes is
~2x decode-attention speed at equal accuracy budget.

The fusion trick: the per-token scale never touches the K/V tiles.
Dequantizing K multiplies *columns* of the score matrix, and
dequantizing V multiplies *columns* of the probability matrix:

    scores[i, j] = (q_i . k_j_int) * k_scale[j] * softmax_scale
    out[i]      += sum_j (p[i, j] * v_scale[j]) * v_int_j

so both corrections are lane-dimension broadcasts — no transposes, no
materialized f32 KV, and the MXU matmuls consume the int8 tiles
directly (converted in-register).

Layouts (head-major, matching ops/attention.py's internal layout):
    q        f32/bf16 [B, T, H, D]
    k/v_sym  int8 [B, S, H_kv, D]  centered symbols in [-127, 127]
    k/v_scale f32 [B, S]           per-token absmax / 127
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lmcache_tpu.ops.attention import _NEG_INF, _round_up, mha_reference


@jax.jit
def quantize_kv_for_cache(
        k: jax.Array, v: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Per-token symmetric int8 quantization of KV buffers.

    k, v: [B, S, H_kv, D] -> (k_sym, v_sym int8, k_scale, v_scale f32
    [B, S]). Runs on-device; XLA fuses the absmax + scale + round chain.
    """

    def quant(x):
        x32 = x.astype(jnp.float32)
        absmax = jnp.max(jnp.abs(x32), axis=(2, 3))  # [B, S]
        scale = jnp.where(absmax == 0.0, 1.0, absmax) / 127.0
        sym = jnp.round(x32 / scale[:, :, None, None])
        return jnp.clip(sym, -127, 127).astype(jnp.int8), scale

    k_sym, k_scale = quant(k)
    v_sym, v_scale = quant(v)
    return k_sym, v_sym, k_scale, v_scale


@jax.jit
def dequantize_kv(sym: jax.Array, scale: jax.Array,
                  dtype=jnp.float32) -> jax.Array:
    """[B, S, H, D] int8 + [B, S] scales -> dense KV."""
    return (sym.astype(jnp.float32) *
            scale[:, :, None, None]).astype(dtype)


def _qflash_kernel(q_off_ref, kv_len_ref, *rest, block_q,
                   block_k, group, scale, sliding_window=None,
                   total_kb=None, has_slot=False, logit_softcap=None,
                   window_kind="sliding", has_sinks=False):
    if has_slot:
        _slot_ref, *rest = rest
    if has_sinks:
        (q_ref, k_ref, v_ref, ks_ref, vs_ref, sinks_ref, o_ref, m_scr,
         l_scr, acc_scr) = rest
    else:
        (q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref, m_scr, l_scr,
         acc_scr) = rest
        sinks_ref = None
    b = pl.program_id(0)
    iq = pl.program_id(2)
    ik = pl.program_id(3)
    num_k = pl.num_programs(3)

    @pl.when(ik == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # windowed: the KV grid is a sliding span of blocks whose start the
    # index_map computed from scalar prefetch (ops/attention.py)
    kb = ik
    if sliding_window is not None:
        from lmcache_tpu.ops.attention import _window_start_block
        kb = ik + _window_start_block(
            q_off_ref[b], iq, block_q=block_q, block_k=block_k,
            total_kb=total_kb, num_kb=num_k,
            sliding_window=sliding_window, window_kind=window_kind)

    # causal block skip: index_map pinned above-diagonal blocks' DMA to
    # the last live block; the body skips their compute entirely (see
    # ops/attention._flash_kernel)
    qpos_max = q_off_ref[b] + (iq + 1) * block_q - 1
    live = kb * block_k <= qpos_max

    @pl.when(live)
    def _():
        # whole GQA group per program (KV streamed once per kv head).
        # int8 KV dequantizes into the QUERY dtype in-register (int8 is
        # exact in bf16) so the MXU runs at bf16 rate; scores accumulate
        # f32 via preferred_element_type.
        q = q_ref[0].reshape(group * block_q, -1)
        k = k_ref[0, 0].astype(q.dtype)  # [bk, D]
        v = v_ref[0, 0].astype(q.dtype)  # [bk, D]
        k_scale = ks_ref[0].astype(jnp.float32)  # [1, bk]
        v_scale = vs_ref[0].astype(jnp.float32)  # [1, bk]

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * (k_scale * scale)  # fused K dequant: per-column correction
        if logit_softcap is not None:
            s = logit_softcap * jnp.tanh(s / logit_softcap)

        # 1-D broadcast positions + folded causal/length compare
        # (see ops/attention.py _flash_kernel)
        qpos = (q_off_ref[b] + iq * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (group * block_q, 1), 0) % block_q)
        kpos = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (1, block_k), 1)
        mask = kpos <= jnp.minimum(qpos, kv_len_ref[b] - 1)
        if sliding_window is not None:
            if window_kind == "chunked":
                mask &= kpos // sliding_window == qpos // sliding_window
            else:
                mask &= kpos > qpos - sliding_window
        s = jnp.where(mask, s, _NEG_INF)

        m_prev = m_scr[:]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)

        l_new = alpha * l_scr[:] + jnp.sum(p, axis=1, keepdims=True)
        # fused V dequant: per-column correction of probs (in f32, before
        # the matmul-rate cast)
        pv = (p * v_scale).astype(v.dtype)
        acc_new = alpha * acc_scr[:] + jax.lax.dot_general(
            pv, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        m_scr[:] = m_new
        l_scr[:] = l_new
        acc_scr[:] = acc_new

    @pl.when(ik == num_k - 1)
    def _():
        l = l_scr[:]
        if has_sinks:
            # attention-sink tail correction (ops/attention._flash_kernel)
            m = m_scr[:]
            snk = sinks_ref[0]  # [group*bq, 1] f32, wrapper-expanded
            m2 = jnp.maximum(m, snk)
            l2 = l * jnp.exp(m - m2) + jnp.exp(snk - m2)
            out = acc_scr[:] * jnp.exp(m - m2) / l2
        else:
            safe = jnp.where(l == 0.0, 1.0, l)
            out = jnp.where(l == 0.0, 0.0, acc_scr[:] / safe)
        o_ref[0] = out.reshape(group, block_q, -1).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("block_q", "block_k", "interpret",
                                    "kv_head_major", "sliding_window",
                                    "sm_scale", "logit_softcap",
                                    "window_kind"))
def quantized_flash_attention(
    q: jax.Array,
    k_sym: jax.Array,
    v_sym: jax.Array,
    k_scale: jax.Array,
    v_scale: jax.Array,
    q_offset: jax.Array,
    kv_len: jax.Array,
    *,
    block_q: Optional[int] = None,
    block_k: int = 1024,
    interpret: Optional[bool] = None,
    kv_head_major: bool = False,
    sliding_window: Optional[int] = None,
    kv_slot: Optional[jax.Array] = None,
    sm_scale: Optional[float] = None,
    logit_softcap: Optional[float] = None,
    window_kind: str = "sliding",
    sinks: Optional[jax.Array] = None,
) -> jax.Array:
    """Flash attention reading int8 KV directly from HBM.

    Same contract as ops.attention.flash_attention, with
    (k_sym, v_sym, k_scale, v_scale) from :func:`quantize_kv_for_cache`;
    ``kv_head_major=True`` takes sym buffers as [B, H_kv, S, D] (the
    live-pool layout — no per-step full-KV transpose). ``kv_slot`` as
    in flash_attention: KV/scales carry the full pool batch and the
    single query row attends to pool row kv_slot[0].
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, T, H, D = q.shape
    if kv_slot is not None and (B != 1 or not kv_head_major):
        raise ValueError("kv_slot requires B == 1 and kv_head_major")
    if kv_head_major:
        Hkv, S = k_sym.shape[1], k_sym.shape[2]
    else:
        S, Hkv = k_sym.shape[1], k_sym.shape[2]
    if H % Hkv:
        raise ValueError(f"H ({H}) must be a multiple of H_kv ({Hkv})")
    group = H // Hkv
    scale = sm_scale if sm_scale is not None else 1.0 / (D**0.5)

    if block_q is None:
        # cap group * bq at ~1024 rows (VMEM score scratch) and widen
        # the q block for small groups (see ops.attention)
        block_q = min(max(1024 // group, 64), 256)
    bq = min(block_q, _round_up(T, 16))
    bk = min(block_k, _round_up(S, 128))  # int8 sublane tile
    Tp, Sp = _round_up(T, bq), _round_up(S, bk)

    qh = jnp.pad(q.transpose(0, 2, 1, 3),
                 ((0, 0), (0, 0), (0, Tp - T), (0, 0)))
    kh = k_sym if kv_head_major else k_sym.transpose(0, 2, 1, 3)
    vh = v_sym if kv_head_major else v_sym.transpose(0, 2, 1, 3)
    kh = jnp.pad(kh, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))
    vh = jnp.pad(vh, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))
    ks = jnp.pad(k_scale, ((0, 0), (0, Sp - S)))[:, None, :]  # [B, 1, Sp]
    vs = jnp.pad(v_scale, ((0, 0), (0, Sp - S)))[:, None, :]

    total_kb = Sp // bk
    num_kb = total_kb
    if sliding_window is not None:
        num_kb = min(total_kb, (sliding_window + bq - 2) // bk + 2)
    has_slot = kv_slot is not None

    def kv_index(b, h, iq, ik, *scalars):
        q_off = scalars[0]
        kb = b if not has_slot else scalars[-1][0]
        if sliding_window is None:
            # pin above-causal blocks to the last live block (repeat
            # index -> no refetch; body skips compute)
            qpos_max = q_off[b] + (iq + 1) * bq - 1
            limit = jnp.minimum(qpos_max // bk, total_kb - 1)
            return (kb, h, jnp.minimum(ik, limit), 0)
        from lmcache_tpu.ops.attention import _window_start_block
        start = _window_start_block(
            q_off[b], iq, block_q=bq, block_k=bk, total_kb=total_kb,
            num_kb=num_kb, sliding_window=sliding_window,
            window_kind=window_kind)
        return (kb, h, start + ik, 0)

    def scale_index(b, h, iq, ik, *scalars):
        bi, _, ki, _ = kv_index(b, h, iq, ik, *scalars)
        return (bi, 0, ki)

    grid = (B, Hkv, Tp // bq, num_kb)
    has_sinks = sinks is not None
    kernel = functools.partial(_qflash_kernel, block_q=bq, block_k=bk,
                               group=group, scale=scale,
                               sliding_window=sliding_window,
                               total_kb=total_kb, has_slot=has_slot,
                               logit_softcap=logit_softcap,
                               window_kind=window_kind,
                               has_sinks=has_sinks)
    scalar_args = [q_offset.astype(jnp.int32), kv_len.astype(jnp.int32)]
    if has_slot:
        scalar_args.append(kv_slot.astype(jnp.int32))
    in_specs = [
        pl.BlockSpec((1, group, bq, D),
                     lambda b, h, iq, ik, *_: (b, h, iq, 0)),
        pl.BlockSpec((1, 1, bk, D), kv_index),
        pl.BlockSpec((1, 1, bk, D), kv_index),
        pl.BlockSpec((1, 1, bk), scale_index),
        pl.BlockSpec((1, 1, bk), scale_index),
    ]
    inputs = [qh, kh, vh, ks, vs]
    if has_sinks:
        in_specs.append(pl.BlockSpec(
            (1, group * bq, 1), lambda b, h, iq, ik, *_: (h, 0, 0)))
        inputs.append(jnp.repeat(
            jnp.asarray(sinks, jnp.float32).reshape(Hkv, group, 1),
            bq, axis=1).reshape(Hkv, group * bq, 1))
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=len(scalar_args),
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, group, bq, D),
                                   lambda b, h, iq, ik, *_: (b, h, iq, 0)),
            scratch_shapes=[
                pltpu.VMEM((group * bq, 1), jnp.float32),
                pltpu.VMEM((group * bq, 1), jnp.float32),
                pltpu.VMEM((group * bq, D), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, Tp, D), q.dtype),
        interpret=interpret,
    )(*scalar_args, *inputs)
    return out[:, :, :T].transpose(0, 2, 1, 3)


def quantized_attention_reference(q, k_sym, v_sym, k_scale, v_scale,
                                  q_offset, kv_len,
                                  sliding_window=None, sm_scale=None,
                                  logit_softcap=None,
                                  window_kind="sliding",
                                  sinks=None) -> jax.Array:
    """Unfused reference: dequantize then dense attention (for tests)."""
    k = dequantize_kv(k_sym, k_scale)
    v = dequantize_kv(v_sym, v_scale)
    return mha_reference(q, k, v, q_offset, kv_len,
                         sliding_window=sliding_window, sm_scale=sm_scale,
                         logit_softcap=logit_softcap,
                         window_kind=window_kind, sinks=sinks)
