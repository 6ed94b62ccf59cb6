"""On-chip validation of the D=64 manual-DMA paged kernel.

Checks the packed-lane scoring path (ops/paged_attention._packed_scores)
lowers under Mosaic and matches the grid kernel bitwise, then times both
at partial and full table occupancy (TinyLlama decode geometry:
H=32, Hkv=4, D=64, page=64).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from lmcache_tpu.ops.paged_attention import (paged_attention,
                                             paged_attention_dma,
                                             quantized_paged_attention_dma,
                                             quantized_paged_attention)


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0][0, 0, 0])


def timeit(fn, reps=50):
    sync(fn())
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    assert jax.devices()[0].platform != "cpu", jax.devices()
    rng = np.random.default_rng(0)
    B, H, Hkv, D, page = 8, 32, 4, 64, 64
    NP = 256  # 16k-position table
    P = B * NP + 1
    kp = jnp.asarray(rng.standard_normal((P, Hkv, page, D)) * 0.1,
                     jnp.bfloat16)
    vp = jnp.asarray(rng.standard_normal((P, Hkv, page, D)) * 0.1,
                     jnp.bfloat16)
    pt = jnp.asarray(rng.permutation(P - 1)[:B * NP].reshape(B, NP) + 1,
                     jnp.int32)
    q = jnp.asarray(rng.standard_normal((B, 1, H, D)) * 0.1, jnp.bfloat16)

    for live in (2048, 16384):
        kv_len = jnp.full((B,), live, jnp.int32)
        q_off = kv_len - 1
        grid_out = paged_attention(q, kp, vp, pt, q_off, kv_len,
                                   interpret=False)
        dma_out = paged_attention_dma(q, kp, vp, pt, q_off, kv_len,
                                      interpret=False)
        # D=64 packed scoring splits the p@v matmul, changing the f32
        # accumulation ORDER vs the grid kernel — expect rounding-level
        # (bf16-ulp) differences, not bitwise equality
        diff = float(jnp.max(jnp.abs(
            grid_out.astype(jnp.float32) - dma_out.astype(jnp.float32))))
        ref = float(jnp.max(jnp.abs(grid_out.astype(jnp.float32))))
        tg = timeit(lambda: paged_attention(q, kp, vp, pt, q_off, kv_len,
                                            interpret=False))
        td = timeit(lambda: paged_attention_dma(q, kp, vp, pt, q_off,
                                                kv_len, interpret=False))
        print(f"live={live}: max_abs_diff={diff:.2e} (max_out={ref:.2e}) "
              f"grid={tg:.2f}ms dma={td:.2f}ms speedup={tg / td:.2f}x",
              flush=True)
        assert diff <= 0.01 * max(ref, 1e-3), (diff, ref)

    # int8 variant (scale permutation path)
    ks = jnp.asarray(rng.integers(-127, 128, (P, Hkv, page, D)), jnp.int8)
    vs = jnp.asarray(rng.integers(-127, 128, (P, Hkv, page, D)), jnp.int8)
    ksc = jnp.asarray(rng.uniform(0.01, 0.05, (P, page)), jnp.float32)
    vsc = jnp.asarray(rng.uniform(0.01, 0.05, (P, page)), jnp.float32)
    kv_len = jnp.full((B,), 2048, jnp.int32)
    q_off = kv_len - 1
    g = quantized_paged_attention(q, ks, vs, ksc, vsc, pt, q_off, kv_len,
                                  interpret=False)
    d = quantized_paged_attention_dma(q, ks, vs, ksc, vsc, pt, q_off,
                                      kv_len, interpret=False)
    diff = float(jnp.max(jnp.abs(
        g.astype(jnp.float32) - d.astype(jnp.float32))))
    ref = float(jnp.max(jnp.abs(g.astype(jnp.float32))))
    print(f"int8 live=2048: max_abs_diff={diff:.2e} (max_out={ref:.2e})",
          flush=True)
    assert diff <= 0.01 * max(ref, 1e-3), (diff, ref)
    print("OK", flush=True)


if __name__ == "__main__":
    main()
