"""Paged-decode kernel benchmark: grid vs manual-DMA (coalesced).

Reproduces the docs/kernels.md and docs/mla.md round-3 tables on the
attached TPU. Methodology (see docs/architecture.md "Measurement
methodology"): interleaved best-of-N within one process — the tunnel's
per-process jitter inflates naive small samples by up to ~25% — and,
for the sub-floor latent kernels, CHAIN dependent calls inside one jit
to amortize the ~2.5 ms per-dispatch floor.

    python tools/bench_paged_decode.py            # dense paged, 7B geom
    python tools/bench_paged_decode.py --latent   # MLA latent arena
    python tools/bench_paged_decode.py --fragmented
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _interleaved_best(calls: dict, trials=8, reps=10):
    """{name: thunk} -> {name: best seconds/call}, A/B interleaved."""
    for fn in calls.values():
        np.asarray(fn())  # compile + settle
    best = {k: float("inf") for k in calls}
    for _ in range(trials):
        for name, fn in calls.items():
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn()
            np.asarray(out)
            best[name] = min(best[name],
                             (time.perf_counter() - t0) / reps)
    return best


def _table(B, NP, P, fragmented, rng):
    if fragmented:
        return np.stack([rng.permutation(P - 1)[:NP] + 1
                         for _ in range(B)])
    return np.stack([np.arange(1 + b * NP, 1 + (b + 1) * NP)
                     for b in range(B)])


def bench_dense(args):
    import jax
    import jax.numpy as jnp

    from lmcache_tpu.ops.paged_attention import (paged_attention,
                                                 paged_attention_dma)

    B, H, Hkv, D = args.batch, 32, 8, 128
    rng = np.random.default_rng(0)
    print(f"dense paged decode, 7B geometry B={B} H={H} Hkv={Hkv} D={D} "
          f"live={args.live} "
          f"({'fragmented' if args.fragmented else 'sequential'} tables)")
    for page in (64, 128):
        NP = args.live // page
        P = B * NP + 1
        kp = jnp.asarray(rng.standard_normal((P, Hkv, page, D)),
                         jnp.bfloat16)
        vp = jnp.asarray(rng.standard_normal((P, Hkv, page, D)),
                         jnp.bfloat16)
        pt = jnp.asarray(_table(B, NP, P, args.fragmented, rng), jnp.int32)
        q = jnp.asarray(rng.standard_normal((B, 1, H, D)), jnp.bfloat16)
        q_off = jnp.full((B,), args.live - 1, jnp.int32)
        kv_len = jnp.full((B,), args.live, jnp.int32)

        def call(impl):
            f = jax.jit(lambda q, k, v, pt, o, l: impl(
                q, k, v, pt, o, l)[0, 0, :1, :1])
            return lambda: f(q, kp, vp, pt, q_off, kv_len)

        best = _interleaved_best({
            "grid": call(paged_attention),
            "dma": call(paged_attention_dma),
        })
        print(f"  page={page:4d}: grid {best['grid']*1e3:6.2f} ms   "
              f"dma {best['dma']*1e3:6.2f} ms   "
              f"({best['grid']/best['dma']:.2f}x)")


def bench_int8(args):
    """Int8 paged decode: grid vs manual-DMA with the round-4 FUSED
    coalesced-group compute (one packed dot + one softmax update per
    super-page, like bf16 — VERDICT r3 next #5), against the bf16 DMA
    kernel as the 1.1x-parity target."""
    import jax
    import jax.numpy as jnp

    from lmcache_tpu.ops.paged_attention import (
        paged_attention_dma, quantized_paged_attention,
        quantized_paged_attention_dma)

    B, H, Hkv, D = args.batch, 32, 8, 128
    rng = np.random.default_rng(0)
    print(f"int8 paged decode, 7B geometry B={B} H={H} Hkv={Hkv} D={D} "
          f"live={args.live} "
          f"({'fragmented' if args.fragmented else 'sequential'} tables)")
    for page in (64, 128):
        NP = args.live // page
        P = B * NP + 1
        ks = jnp.asarray(rng.integers(-127, 127, (P, Hkv, page, D)),
                         jnp.int8)
        vs = jnp.asarray(rng.integers(-127, 127, (P, Hkv, page, D)),
                         jnp.int8)
        ksc = jnp.asarray(rng.random((P, page)) * 0.02 + 0.01,
                          jnp.float32)
        vsc = jnp.asarray(rng.random((P, page)) * 0.02 + 0.01,
                          jnp.float32)
        kb = jnp.asarray(rng.standard_normal((P, Hkv, page, D)),
                         jnp.bfloat16)
        vb = jnp.asarray(rng.standard_normal((P, Hkv, page, D)),
                         jnp.bfloat16)
        pt = jnp.asarray(_table(B, NP, P, args.fragmented, rng), jnp.int32)
        q = jnp.asarray(rng.standard_normal((B, 1, H, D)), jnp.bfloat16)
        q_off = jnp.full((B,), args.live - 1, jnp.int32)
        kv_len = jnp.full((B,), args.live, jnp.int32)

        def call_q(impl):
            f = jax.jit(lambda q, k, v, kc, vc, pt, o, l: impl(
                q, k, v, kc, vc, pt, o, l)[0, 0, :1, :1])
            return lambda: f(q, ks, vs, ksc, vsc, pt, q_off, kv_len)

        f16 = jax.jit(lambda q, k, v, pt, o, l: paged_attention_dma(
            q, k, v, pt, o, l)[0, 0, :1, :1])
        best = _interleaved_best({
            "grid-int8": call_q(quantized_paged_attention),
            "dma-int8": call_q(quantized_paged_attention_dma),
            "dma-bf16": (lambda: f16(q, kb, vb, pt, q_off, kv_len)),
        })
        print(f"  page={page:4d}: grid-int8 "
              f"{best['grid-int8']*1e3:6.2f} ms   "
              f"dma-int8 {best['dma-int8']*1e3:6.2f} ms   "
              f"dma-bf16 {best['dma-bf16']*1e3:6.2f} ms   "
              f"(int8/bf16 {best['dma-int8']/best['dma-bf16']:.2f}x)")


def bench_latent(args):
    import jax
    import jax.numpy as jnp

    from lmcache_tpu.ops.paged_latent_attention import (
        paged_latent_attention, paged_latent_attention_dma)

    B, H, rank, Cp = args.batch, 16, 512, 640  # V2-lite-ish shard
    CHAIN = 8
    rng = np.random.default_rng(0)
    print(f"MLA latent paged decode, B={B} H={H} rank={rank} Cp={Cp} "
          f"live={args.live}, {CHAIN}-chained (floor-amortized)")
    for page in (64, 128):
        NP = args.live // page
        P = B * NP + 1
        pool = jnp.asarray(rng.standard_normal((P, page, Cp)),
                           jnp.bfloat16)
        pt = jnp.asarray(_table(B, NP, P, args.fragmented, rng), jnp.int32)
        q = jnp.asarray(rng.standard_normal((B, 1, H, Cp)), jnp.bfloat16)
        q_off = jnp.full((B,), args.live - 1, jnp.int32)
        kv_len = jnp.full((B,), args.live, jnp.int32)

        def chained(impl):
            def f(q, pool, pt, o, l):
                for _ in range(CHAIN):
                    ctx = impl(q, pool, pt, o, l, rank=rank, scale=0.04)
                    q = q + ctx[0, 0, 0, 0].astype(q.dtype) * 1e-9
                return q[0, 0, :1, :1]
            jf = jax.jit(f)
            return lambda: jf(q, pool, pt, q_off, kv_len)

        best = _interleaved_best({
            "grid": chained(paged_latent_attention),
            "dma": chained(paged_latent_attention_dma),
        }, trials=6, reps=5)
        g, d = best["grid"] / CHAIN, best["dma"] / CHAIN
        print(f"  page={page:4d}: grid {g*1e3:6.3f} ms   "
              f"dma {d*1e3:6.3f} ms   ({g/d:.2f}x)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--latent", action="store_true")
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--fragmented", action="store_true",
                    help="shuffled page tables (coalescing fallback)")
    ap.add_argument("--live", type=int, default=16384)
    ap.add_argument("--batch", type=int, default=None)
    args = ap.parse_args()
    if args.batch is None:
        args.batch = 4 if args.latent else 8
    fn = (bench_latent if args.latent
          else bench_int8 if args.int8 else bench_dense)
    fn(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
