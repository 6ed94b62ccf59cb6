"""CacheGen quantization ops — run on the TPU, fused by XLA.

Math parity with the reference GPU path (reference:
lmcache/serde/cachegen_encoder.py:39-61 quant, :94-126 CDF
normalization, cachegen_decoder.py:24-35 dequant), reshaped for jnp:

- per-(layer, token) symmetric absmax quantization with per-layer
  graduated bin counts; symbols are uint8 in [0, 2*(bins//2 - 1)];
- histogram -> CDF per (layer, channel) computed as a static 33-pass
  masked reduction (no [L,T,C,33] one-hot materialization — that would
  be GBs for 7B-class geometry);
- uint16 CDF normalization via the "+arange" strict-monotonicity trick
  so every bin has nonzero width (required by the range coder).

All functions are jittable with static ``max_bins``.
"""

import functools

import jax
import jax.numpy as jnp

MAX_BINS = 32  # fixed CDF width (reference: value_range=32)


@jax.jit
def quantize(x: jax.Array, bins: jax.Array):
    """Quantize ``x [L, T, C]`` with per-layer ``bins [L]``.

    Returns (symbols uint8 [L, T, C], maxes f32 [L, T, 1]).
    """
    x = x.astype(jnp.float32)
    half = (bins // 2 - 1).astype(jnp.float32)[:, None, None]  # [L,1,1]
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)  # [L,T,1]
    safe = jnp.where(absmax == 0.0, 1.0, absmax)
    sym = jnp.round(x * (half / safe)) + half
    sym = jnp.clip(sym, 0.0, 2.0 * half)
    return sym.astype(jnp.uint8), absmax


@jax.jit
def dequantize(symbols: jax.Array, maxes: jax.Array,
               bins: jax.Array) -> jax.Array:
    """Inverse of :func:`quantize` -> f32 [L, T, C]."""
    half = (bins // 2 - 1).astype(jnp.float32)[:, None, None]
    centered = symbols.astype(jnp.float32) - half
    return centered * maxes / half


@functools.partial(jax.jit, static_argnames=("max_bins",))
def compute_cdf(symbols: jax.Array, max_bins: int = MAX_BINS) -> jax.Array:
    """Per-(layer, channel) empirical CDF of ``symbols [L, T, C]``.

    Returns uint16 [L, C, max_bins + 1] with cdf[..., 0] == 0, strictly
    increasing, and an implied final bound of 65536 (stored mod 2^16).
    """
    L, T, C = symbols.shape
    counts = jnp.stack(
        [(symbols == b).sum(axis=1) for b in range(max_bins)],
        axis=-1).astype(jnp.float32)  # [L, C, max_bins]
    pdf = counts / T
    cdf_f = jnp.cumsum(pdf, axis=-1)
    cdf_f = jnp.concatenate([jnp.zeros((L, C, 1), jnp.float32), cdf_f],
                            axis=-1)  # [L, C, max_bins+1], in [0, 1]
    scale = float(2**16 - max_bins)
    cdf_i = jnp.round(cdf_f * scale).astype(jnp.int32) + jnp.arange(
        max_bins + 1, dtype=jnp.int32)
    return cdf_i.astype(jnp.uint16)  # final entry 65536 wraps to 0
