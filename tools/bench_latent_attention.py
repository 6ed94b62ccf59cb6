"""On-chip bench: MLA latent decode attention — streaming kernel vs the
two-pass XLA einsum path, at DeepSeek-V2 geometry (H=128, r=512, p=64).

Decode reads B*S*(r+p) latents; single-read streaming is the
speed-of-light shape. Sync via np.asarray (block_until_ready does not
wait under the axon tunnel)."""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from lmcache_tpu.ops.latent_attention import (latent_attention_reference,
                                              latent_flash_attention)


def bench(fn, reps):
    np.asarray(fn())  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps - 1):
        out = fn()
    np.asarray(out)
    return (time.perf_counter() - t0) / (reps - 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=16384)
    ap.add_argument("--heads", type=int, default=128)
    ap.add_argument("--rank", type=int, default=512)
    ap.add_argument("--rope", type=int, default=64)
    ap.add_argument("--reps", type=int, default=30)
    args = ap.parse_args()

    B, S, H, r, p = args.batch, args.seq, args.heads, args.rank, args.rope
    C = r + p
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, 1, H, C)), jnp.bfloat16)
    lat = jnp.asarray(rng.standard_normal((B, S, C)), jnp.bfloat16)
    q_off = jnp.full(B, S - 1, jnp.int32)
    kv_len = jnp.full(B, S, jnp.int32)
    scale = (128 + p) ** -0.5

    ref_j = jax.jit(lambda: latent_attention_reference(
        q, lat, q_off, kv_len, rank=r, scale=scale))
    ker = jax.jit(lambda: latent_flash_attention(
        q, lat, q_off, kv_len, rank=r, scale=scale, interpret=False))

    got = np.asarray(ker(), np.float32)
    want = np.asarray(ref_j(), np.float32)
    err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9)
    print(f"rel err vs einsum: {err:.2e}")

    t_ref = bench(ref_j, args.reps)
    t_ker = bench(ker, args.reps)
    gb = B * S * C * 2 / 1e9
    print(f"B={B} S={S} H={H} C={C}  latents {gb*1e3:.0f} MB")
    print(f"einsum 2-pass: {t_ref*1e3:.2f} ms  ({gb*2/t_ref:.0f} GB/s "
          f"effective 2-read)")
    print(f"latent kernel: {t_ker*1e3:.2f} ms  ({gb/t_ker:.0f} GB/s "
          f"single-read)  {t_ref/t_ker:.2f}x")


if __name__ == "__main__":
    main()
