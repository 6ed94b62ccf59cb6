"""Prefill flash-attention MFU decomposition + scheduling experiments
(VERDICT r3 next #4).

The kernel sits at ~92 TFLOP/s (~47% of v5e bf16 peak). Hypothesis
from round 3: the online-softmax VPU chain SERIALIZES with the MXU
dots inside each grid step (QK -> softmax -> PV is a dependency
chain; Mosaic does not cross-step software-pipeline compute), so
kernel time ~= MXU time + VPU time instead of max(...).

This tool measures ablated kernel variants to PROVE the attribution
(a timing-based trace substitute — XProf is unavailable through the
axon tunnel) and tests a restructuring that gives the scheduler
independent chains:

- full:      the production kernel
- mxu_only:  softmax chain removed (acc += s @ v directly) — pure
             MXU + mask floor
- no_mask:   mask compare/where removed (interior-block model)
- pair:      TWO k-blocks per grid step; both QK dots issue before
             either softmax update, so block j+1's dot can overlap
             block j's VPU work
- pipelined: (r5, VERDICT r4 next #7) TRUE software pipeline across
             grid steps: block j's masked scores are stashed in a VMEM
             scratch; step j+1 issues block j+1's QK dot FIRST and then
             runs block j's softmax + PV from the stash (its V block
             DMA lags one grid step), so the VPU softmax chain overlaps
             the next block's MXU dot instead of serializing between
             them. One extra drain step per q-block flushes the stash.

    python tools/bench_prefill_mfu.py
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="tiny geometry numeric check (CPU interpret)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from lmcache_tpu.ops.attention import (_NEG_INF, _flash_kernel,
                                           _round_up, flash_attention)

    B, Hkv, G, D, S = 1, 8, 4, 128, 8192
    if args.small:
        B, Hkv, G, D, S = 1, 2, 2, 128, 512
    H = Hkv * G
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, Hkv, S, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, Hkv, S, D)), jnp.bfloat16)
    zo = jnp.zeros((B,), jnp.int32)
    sl = jnp.full((B,), S, jnp.int32)
    causal_flops = 0.5 * S * S * H * D * 2 * 2

    def timeit(fn, trials=8, reps=20):
        if args.small:
            trials, reps = 1, 1
        np.asarray(fn())
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn()
            np.asarray(out)
            best = min(best, (time.perf_counter() - t0) / reps)
        return best

    # ---- variant kernels (kv-head-major, causal, no windows) -----------
    bq, bk = (128, 128) if args.small else (256, 1024)
    Tp = _round_up(S, bq)
    total_kb = _round_up(S, bk) // bk
    scale = 1.0 / D**0.5

    def variant_kernel(q_off_ref, kv_len_ref, q_ref, k_ref, v_ref, o_ref,
                       m_scr, l_scr, acc_scr, *, mode, pair=False):
        b = pl.program_id(0)
        iq = pl.program_id(2)
        ik = pl.program_id(3)
        num_k = pl.num_programs(3)

        @pl.when(ik == 0)
        def _():
            m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
            l_scr[:] = jnp.zeros_like(l_scr)
            acc_scr[:] = jnp.zeros_like(acc_scr)

        span = 2 if pair else 1
        qpos_max = q_off_ref[b] + (iq + 1) * bq - 1
        q_ = q_ref[0].reshape(G * bq, -1)

        def sub(j):
            kb = ik * span + j
            live = kb * bk <= qpos_max

            @pl.when(live)
            def _():
                kk = k_ref[0, 0, j * bk:(j + 1) * bk]
                vv = v_ref[0, 0, j * bk:(j + 1) * bk]
                s = jax.lax.dot_general(
                    q_, kk, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                if mode == "mxu_only":
                    acc_scr[:] += jax.lax.dot_general(
                        s.astype(vv.dtype), vv, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    l_scr[:] += 1.0
                    return
                if mode != "no_mask":
                    qpos = (q_off_ref[b] + iq * bq
                            + jax.lax.broadcasted_iota(
                                jnp.int32, (G * bq, 1), 0) % bq)
                    kpos = kb * bk + jax.lax.broadcasted_iota(
                        jnp.int32, (1, bk), 1)
                    mask = kpos <= jnp.minimum(qpos, kv_len_ref[b] - 1)
                    s = jnp.where(mask, s, _NEG_INF)
                m_prev = m_scr[:]
                m_new = jnp.maximum(m_prev,
                                    jnp.max(s, axis=1, keepdims=True))
                alpha = jnp.exp(m_prev - m_new)
                p = jnp.exp(s - m_new)
                l_scr[:] = alpha * l_scr[:] + jnp.sum(p, axis=1,
                                                      keepdims=True)
                acc_scr[:] = alpha * acc_scr[:] + jax.lax.dot_general(
                    p.astype(vv.dtype), vv, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                m_scr[:] = m_new

        for j in range(span):
            sub(j)

        @pl.when(ik == num_k - 1)
        def _():
            ll = l_scr[:]
            safe = jnp.where(ll == 0.0, 1.0, ll)
            out = jnp.where(ll == 0.0, 0.0, acc_scr[:] / safe)
            o_ref[0] = out.reshape(G, bq, -1).astype(o_ref.dtype)

    def pipelined_kernel(q_off_ref, kv_len_ref, q_ref, k_ref, v_ref,
                         o_ref, m_scr, l_scr, acc_scr, s_scr, *, nkb,
                         bq, bk):
        b = pl.program_id(0)
        iq = pl.program_id(2)
        ik = pl.program_id(3)  # in [0, nkb + 1): one extra drain step

        @pl.when(ik == 0)
        def _():
            m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
            l_scr[:] = jnp.zeros_like(l_scr)
            acc_scr[:] = jnp.zeros_like(acc_scr)

        qpos_max = q_off_ref[b] + (iq + 1) * bq - 1
        qpos = (q_off_ref[b] + iq * bq + jax.lax.broadcasted_iota(
            jnp.int32, (G * bq, 1), 0) % bq)
        live_cur = (ik < nkb) & (ik * bk <= qpos_max)
        live_prev = (ik >= 1) & ((ik - 1) * bk <= qpos_max)

        def qk_to_stash():
            q_ = q_ref[0].reshape(G * bq, -1)
            kk = k_ref[0, 0]
            s = jax.lax.dot_general(
                q_, kk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            kpos = ik * bk + jax.lax.broadcasted_iota(
                jnp.int32, (1, bk), 1)
            mask = kpos <= jnp.minimum(qpos, kv_len_ref[b] - 1)
            return jnp.where(mask, s, _NEG_INF)

        def softmax_prev(s_prev):
            vv = v_ref[0, 0]
            m_prev = m_scr[:]
            m_new = jnp.maximum(
                m_prev, jnp.max(s_prev, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s_prev - m_new)
            l_scr[:] = alpha * l_scr[:] + jnp.sum(p, axis=1,
                                                  keepdims=True)
            acc_scr[:] = alpha * acc_scr[:] + jax.lax.dot_general(
                p.astype(vv.dtype), vv, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m_scr[:] = m_new

        # interior steps (both halves live) are ONE basic block: the
        # current block's dot precedes the previous block's softmax
        # with no control-flow boundary between them, so the static
        # scheduler is free to interleave MXU and VPU chains
        @pl.when(live_cur & live_prev)
        def _():
            s_prev = s_scr[:]
            s_cur = qk_to_stash()
            softmax_prev(s_prev)
            s_scr[:] = s_cur

        @pl.when(live_cur & ~live_prev)
        def _():
            s_scr[:] = qk_to_stash()

        @pl.when(~live_cur & live_prev)
        def _():
            softmax_prev(s_scr[:])

        @pl.when(ik == nkb)
        def _():
            ll = l_scr[:]
            safe = jnp.where(ll == 0.0, 1.0, ll)
            out = jnp.where(ll == 0.0, 0.0, acc_scr[:] / safe)
            o_ref[0] = out.reshape(G, bq, -1).astype(o_ref.dtype)

    def build_pipelined():
        # stash VMEM = 2 * G*bqp * bkp * 4B: block sizes are tunable so
        # the VMEM headroom experiment is a flag, not an edit
        bqp = int(os.environ.get("LMCACHE_MFU_BQ", bq))
        bkp = int(os.environ.get("LMCACHE_MFU_BK", bk))
        nkb = _round_up(S, bkp) // bkp
        grid = (B, Hkv, Tp // bqp, nkb + 1)

        def k_index(b, h, iq, ik, *scalars):
            q_off = scalars[0]
            limit = jnp.minimum((q_off[b] + (iq + 1) * bqp - 1) // bkp,
                                nkb - 1)
            return (b, h, jnp.minimum(ik, limit), 0)

        def v_index(b, h, iq, ik, *scalars):
            q_off = scalars[0]
            limit = jnp.minimum((q_off[b] + (iq + 1) * bqp - 1) // bkp,
                                nkb - 1)
            return (b, h, jnp.clip(ik - 1, 0, limit), 0)

        kern = functools.partial(pipelined_kernel, nkb=nkb, bq=bqp,
                                 bk=bkp)
        f = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((1, G, bqp, D),
                                 lambda b, h, iq, ik, *_: (b, h, iq, 0)),
                    pl.BlockSpec((1, 1, bkp, D), k_index),
                    pl.BlockSpec((1, 1, bkp, D), v_index),
                ],
                out_specs=pl.BlockSpec(
                    (1, G, bqp, D),
                    lambda b, h, iq, ik, *_: (b, h, iq, 0)),
                scratch_shapes=[
                    pltpu.VMEM((G * bqp, 1), jnp.float32),
                    pltpu.VMEM((G * bqp, 1), jnp.float32),
                    pltpu.VMEM((G * bqp, D), jnp.float32),
                    pltpu.VMEM((G * bqp, bkp), jnp.float32),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((B, H, Tp, D), jnp.bfloat16),
            interpret=jax.default_backend() == "cpu",
        )
        qh = q.transpose(0, 2, 1, 3)
        full_out = jax.jit(lambda: f(zo, sl, qh, k, v))
        timed = jax.jit(lambda: f(zo, sl, qh, k, v)[0, 0, :1, :1])
        return timed, full_out

    def build(mode, pair=False):
        span = 2 if pair else 1
        nkb = total_kb // span
        grid = (B, Hkv, Tp // bq, nkb)

        def kv_index(b, h, iq, ik, *scalars):
            q_off = scalars[0]
            qpos_max = q_off[b] + (iq + 1) * bq - 1
            limit = jnp.minimum(qpos_max // (bk * span), nkb - 1)
            return (b, h, jnp.minimum(ik, limit), 0)

        kern = functools.partial(variant_kernel, mode=mode, pair=pair)
        f = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((1, G, bq, D),
                                 lambda b, h, iq, ik, *_: (b, h, iq, 0)),
                    pl.BlockSpec((1, 1, bk * span, D), kv_index),
                    pl.BlockSpec((1, 1, bk * span, D), kv_index),
                ],
                out_specs=pl.BlockSpec(
                    (1, G, bq, D), lambda b, h, iq, ik, *_: (b, h, iq, 0)),
                scratch_shapes=[
                    pltpu.VMEM((G * bq, 1), jnp.float32),
                    pltpu.VMEM((G * bq, 1), jnp.float32),
                    pltpu.VMEM((G * bq, D), jnp.float32),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((B, H, Tp, D), jnp.bfloat16),
            interpret=jax.default_backend() == "cpu",
        )
        qh = q.transpose(0, 2, 1, 3)
        full_out = jax.jit(lambda: f(zo, sl, qh, k, v))
        timed = jax.jit(lambda: f(zo, sl, qh, k, v)[0, 0, :1, :1])
        return timed, full_out

    prod = jax.jit(lambda: flash_attention(
        q, k, v, zo, sl, kv_head_major=True)[0, 0, :1])
    t = timeit(prod)
    print(f"production: {t * 1e3:6.2f} ms  "
          f"{causal_flops / t / 1e12:6.1f} TFLOP/s "
          f"({causal_flops / t / 1e12 / 197 * 100:4.1f}% bf16 peak)")
    ref = np.asarray(flash_attention(q, k, v, zo, sl,
                                     kv_head_major=True).astype(
                                         jnp.float32))
    for name, mode, pair in [("full-rebuilt", "full", False),
                             ("mxu_only", "mxu_only", False),
                             ("no_mask", "no_mask", False),
                             ("pair", "full", True),
                             ("pair_no_mask", "no_mask", True),
                             ("pipelined", "pipelined", False)]:
        try:
            timed, full_out = (build_pipelined() if mode == "pipelined"
                               else build(mode, pair))
            note = ""
            if mode in ("full", "pipelined"):
                got = np.asarray(full_out().astype(jnp.float32))
                got = got.transpose(0, 2, 1, 3)[:, :S]
                err = float(np.max(np.abs(got - ref)))
                note = f"  max|err| {err:.2e}"
            tv = timeit(timed)
            print(f"{name:12s}: {tv * 1e3:6.2f} ms  "
                  f"{causal_flops / tv / 1e12:6.1f} TFLOP/s{note}")
        except Exception as e:
            import re
            msg = str(e)
            m = re.search(r"(Invalid[^\n]*|Check failed[^\n]*|"
                          r"Mosaic[^\n]*failed[^\n]*)", msg)
            print(f"{name:12s}: FAIL {(m.group(0) if m else msg)[:300]}")


if __name__ == "__main__":
    main()
