"""Ring (context-parallel) attention: the SEQUENCE axis sharded over a
mesh axis, with KV blocks rotating around the ring on ICI.

The reference has no sequence parallelism anywhere — its long-context
story is fixed-size token chunking of the KV stream (reference
lmcache/cache_engine.py:68-84) and the SURVEY names chunked KV as "the
natural unit for context-parallel / ring-attention-style streaming of
long contexts — no Ulysses/ring code exists to port" (SURVEY §2). This
module is that TPU-native design:

- every device holds a CONTIGUOUS block of the sequence's q/k/v
  (``T/P`` tokens) — the same contiguous-chunk unit the cache engine
  stores, so a retrieved chunk lands on its ring position without
  resharding;
- at each of ``P`` ring steps a device attends its local queries
  against the KV block currently resident, accumulating the standard
  online-softmax partials ``(m, l, acc)``, then passes the block to its
  neighbor via ``lax.ppermute`` — the collective rides ICI and overlaps
  with the next step's compute under XLA's scheduler;
- no device ever materializes more than ``2 * T/P`` tokens of KV, so a
  16k-context prefill on an 8-device mesh peaks at 2k tokens of KV per
  chip: memory AND attention FLOPs scale down with the mesh;
- causality skips the compute (not the permute) of blocks that are
  entirely in a query block's future: device ``i`` does useful work on
  ``i + 1`` of the ``P`` steps, matching causal ring attention's
  expected cost.

Composable with tensor parallelism: shard heads on one mesh axis and
the sequence on another; the ring only touches the sequence axis while
each device streams its own head slice (see ``ring_attention``'s
``in_specs``).
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from lmcache_tpu.parallel.mesh import shard_map_unchecked

_NEG_INF = -1e30


def _ring_body(q, k, v, q_offset, kv_len, is_global, sinks, *,
               seq_axis: str, scale, logit_softcap=None,
               sliding_window=None, window_kind="sliding",
               has_global_flag=False, has_sinks=False):
    """Per-device ring attention. q/k/v: local [B, Tl, H(_kv), D].

    ``sliding_window``/``window_kind`` follow ops.attention; the traced
    ``is_global`` scalar (alternating-pattern families, riding the
    caller's layer scan) overrides the window per layer — a global
    layer attends full-causal. Ring blocks entirely outside a local
    (non-global) layer's window skip compute but keep the permute."""
    p = jax.lax.axis_size(seq_axis)
    my = jax.lax.axis_index(seq_axis)
    B, Tl, H, D = q.shape
    Hkv = k.shape[2]
    G = H // Hkv
    glb = (is_global[0] if has_global_flag
           else jnp.asarray(False))

    # [B, Hkv, G, Tl, D] query groups; positions are GLOBAL
    qh = q.reshape(B, Tl, Hkv, G, D).transpose(0, 2, 3, 1, 4)
    qpos = (q_offset[:, None] + my * Tl
            + jnp.arange(Tl)[None, :])  # [B, Tl]

    m0 = jnp.full((B, Hkv, G, Tl, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((B, Hkv, G, Tl, 1), jnp.float32)
    a0 = jnp.zeros((B, Hkv, G, Tl, D), jnp.float32)

    def step(r, carry):
        m, l, acc, kr, vr = carry
        src = jax.lax.rem(my - r + p, p)  # ring block currently held

        def update(args):
            m, l, acc = args
            kh = kr.transpose(0, 2, 1, 3)  # [B, Hkv, Tl, D]
            vh = vr.transpose(0, 2, 1, 3)
            s = jnp.einsum("bhgtd,bhsd->bhgts", qh, kh,
                           preferred_element_type=jnp.float32) * scale
            if logit_softcap is not None:
                s = logit_softcap * jnp.tanh(s / logit_softcap)
            kpos = (q_offset[:, None] + src * Tl
                    + jnp.arange(Tl)[None, :])  # [B, Tl]
            mask = ((kpos[:, None, :] <= qpos[:, :, None])
                    & (kpos[:, None, :] < kv_len[:, None, None]))
            if sliding_window is not None:
                if window_kind == "chunked":
                    wmask = (kpos[:, None, :] // sliding_window
                             == qpos[:, :, None] // sliding_window)
                else:
                    wmask = (kpos[:, None, :]
                             > qpos[:, :, None] - sliding_window)
                mask &= wmask | glb
            s = jnp.where(mask[:, None, None, :, :], s, _NEG_INF)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            # explicit zero for masked entries: when a block is FULLY
            # masked for some row, m_new stays -1e30 there and
            # exp(s - m_new) would be 1 (uniform garbage) — the l == 0
            # zero-output contract below depends on masked probs being
            # exactly 0, not on the block having been skipped
            pr = jnp.exp(s - m_new) * mask[:, None, None, :, :]
            l = alpha * l + jnp.sum(pr, axis=-1, keepdims=True)
            acc = alpha * acc + jnp.einsum(
                "bhgts,bhsd->bhgtd", pr.astype(vh.dtype), vh,
                preferred_element_type=jnp.float32)
            return m_new, l, acc

        # blocks entirely in this device's future do nothing: skip the
        # matmuls, keep the permute (everyone rotates in lockstep); for
        # a windowed (non-global) layer, blocks entirely older than the
        # oldest query's window skip too
        live = src <= my
        if sliding_window is not None:
            if window_kind == "chunked":
                # Chunk boundaries are nonlinear in each row's ABSOLUTE
                # positions (floor to a multiple of W), so with ragged
                # q_offset the skip must be decided per row: row b needs
                # the block iff its newest key position reaches b's own
                # chunk start. Skip only when NO row needs it.
                qmin = q_offset + my * Tl  # [B] oldest local query pos
                cstart = qmin - jax.lax.rem(qmin, sliding_window)
                newest = q_offset + (src + 1) * Tl - 1  # [B]
                in_window = jnp.any(newest >= cstart)
            else:
                # trailing window: q_offset cancels on both sides, the
                # skip is offset-independent
                in_window = (src + 1) * Tl > my * Tl - sliding_window + 1
            live &= in_window | glb
        m, l, acc = jax.lax.cond(live, update,
                                 lambda args: args, (m, l, acc))
        perm = [(i, (i + 1) % p) for i in range(p)]
        kr = jax.lax.ppermute(kr, seq_axis, perm)
        vr = jax.lax.ppermute(vr, seq_axis, perm)
        return m, l, acc, kr, vr

    m, l, acc, _, _ = jax.lax.fori_loop(0, p, step, (m0, l0, a0, k, v))
    if has_sinks:
        # attention-sink tail correction (GPT-OSS): sinks [H_loc] holds
        # this device's head slice
        snk = sinks.astype(jnp.float32).reshape(1, Hkv, G, 1, 1)
        m2 = jnp.maximum(m, snk)
        l2 = l * jnp.exp(m - m2) + jnp.exp(snk - m2)
        out = acc * jnp.exp(m - m2) / l2
    else:
        safe = jnp.where(l == 0.0, 1.0, l)
        out = jnp.where(l == 0.0, 0.0, acc / safe)
    # [B, Hkv, G, Tl, D] -> [B, Tl, H, D]
    return out.transpose(0, 3, 1, 2, 4).reshape(B, Tl, H, D).astype(
        q.dtype)


def ring_attention(
    q: jax.Array,  # [B, T, H, D], T sharded on seq_axis
    k: jax.Array,  # [B, T, H_kv, D]
    v: jax.Array,
    q_offset: jax.Array,  # int32 [B] global position of token 0
    kv_len: jax.Array,  # int32 [B] valid tokens (ragged batches)
    mesh: Mesh,
    *,
    seq_axis: str = "data",
    head_axis: Optional[str] = "model",
    sm_scale: Optional[float] = None,
    logit_softcap: Optional[float] = None,
    sliding_window: Optional[int] = None,
    window_kind: str = "sliding",
    is_global=None,
    sinks: Optional[jax.Array] = None,
) -> jax.Array:
    """Causal ring attention over ``mesh``. See module docstring.

    ``T`` must divide evenly by the ``seq_axis`` size (pad the prompt
    to a multiple — the cache-engine chunk size already is one), and
    kv heads by ``head_axis`` when set (TP x CP composition: each
    device streams its own head slice of its ring block).

    ``sliding_window``/``window_kind`` follow ops.attention (trailing
    window or Llama-4 chunks); the optional traced ``is_global`` scalar
    makes THIS call attend full-causal instead (alternating-pattern
    families ride it through the layer scan). Ring blocks outside a
    windowed layer's reach skip compute, so window/chunk attention
    costs ~W/T of the full ring.
    """
    B, T, H, D = q.shape
    Hkv = k.shape[2]
    p = mesh.shape[seq_axis]
    if T % p:
        raise ValueError(f"T ({T}) must divide the {seq_axis!r} axis "
                         f"size ({p})")
    tp = mesh.shape.get(head_axis, 1) if head_axis else 1
    hax = head_axis if (head_axis and H % tp == 0
                        and Hkv % tp == 0) else None
    scale = sm_scale if sm_scale is not None else 1.0 / (D**0.5)

    has_flag = is_global is not None
    flag = (jnp.asarray(is_global, bool).reshape(1) if has_flag
            else jnp.zeros((1,), bool))
    has_sinks = sinks is not None
    snk = (jnp.asarray(sinks, jnp.float32) if has_sinks
           else jnp.zeros((H,), jnp.float32))
    body = functools.partial(_ring_body, seq_axis=seq_axis, scale=scale,
                             logit_softcap=logit_softcap,
                             sliding_window=sliding_window,
                             window_kind=window_kind,
                             has_global_flag=has_flag,
                             has_sinks=has_sinks)
    spec_q = P(None, seq_axis, hax, None)
    spec_kv = P(None, seq_axis, hax, None)
    return shard_map_unchecked(
        body, mesh,
        in_specs=(spec_q, spec_kv, spec_kv, P(), P(), P(), P(hax)),
        out_specs=spec_q,
    )(q, k, v, q_offset.astype(jnp.int32), kv_len.astype(jnp.int32),
      flag, snk)
