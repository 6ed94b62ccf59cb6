"""KV-blob layout helpers.

The canonical unit flowing through every layer is a single "blob" array
holding all layers' K and V for a run of tokens (reference convention,
lmcache/cache_engine.py:98-161):

- ``"vllm"`` format:
  ``[num_layers, 2, num_tokens, num_kv_heads, head_size]``
- ``"huggingface"`` format:
  ``[num_layers, 2, num_kv_heads, num_tokens, head_size]``

These helpers are dtype/namespace-polymorphic: they work on both ``numpy``
arrays (host tiers) and ``jax.Array``s (HBM tier) without forcing a device
transfer. All shapes are static per chunk, which is what keeps the jitted
consumers (attention, codec kernels) compile-once.
"""

import functools
from typing import List, Sequence, Tuple, Union

import numpy as np

Array = Union[np.ndarray, "jax.Array"]  # noqa: F821
KVTuples = Tuple[Tuple[Array, Array], ...]


def _xp(arr: Array):
    """numpy for host arrays, jax.numpy for device arrays."""
    if isinstance(arr, np.ndarray):
        return np
    import jax.numpy as jnp
    return jnp


def token_axis(fmt: str) -> int:
    """Token axis within the 5-D blob."""
    if fmt == "vllm":
        return 2
    if fmt == "huggingface":
        return 3
    raise ValueError(f"Invalid format: {fmt}")


def num_tokens_in_blob(blob: Array, fmt: str) -> int:
    n = getattr(blob, "num_tokens", None)  # host-chunk protocol
    if n is not None:
        return n
    return blob.shape[token_axis(fmt)]


def num_tokens_in_tuples(kv: KVTuples, fmt: str) -> int:
    # per-layer entries are [num_tokens, heads, head_size] (vllm) or
    # [heads, num_tokens, head_size] (huggingface)
    if fmt == "vllm":
        return kv[0][0].shape[0]
    if fmt == "huggingface":
        return kv[0][0].shape[1]
    raise ValueError(f"Invalid format: {fmt}")


def tuple_to_blob(kv: KVTuples) -> Array:
    """Nested per-layer (K, V) tuples -> one [L, 2, ...] blob."""
    xp = _xp(kv[0][0])
    ks = xp.stack([layer[0] for layer in kv])
    vs = xp.stack([layer[1] for layer in kv])
    return xp.stack((ks, vs), axis=1)  # [L, 2, ...]


def blob_to_tuple(blob: Array) -> KVTuples:
    """One [L, 2, ...] blob -> nested per-layer (K, V) tuples (views)."""
    return tuple((blob[i, 0], blob[i, 1]) for i in range(blob.shape[0]))


def slice_blob_tokens(blob: Array, fmt: str, start: int,
                      end: int = None) -> Array:
    """Slice the blob along the token axis: ``blob[..., start:end, ...]``."""
    if hasattr(blob, "slice_tokens"):  # host-chunk protocol (lazy)
        return blob.slice_tokens(start, end)
    axis = token_axis(fmt)
    idx = [slice(None)] * blob.ndim
    idx[axis] = slice(start, end)
    return blob[tuple(idx)]


def ensure_blob(blob: Array, fmt: str = "vllm") -> Array:
    """Materialize a host-chunk (undecoded container) into a real KV
    blob array; arrays pass through unchanged.

    The storage pipeline yields :class:`CacheGenHostChunk`-style
    objects so decode + dequant can be batched on the accelerator
    (storage/serde/cachegen_serde.py); consumers that need a plain
    array per chunk call this."""
    if hasattr(blob, "to_blob"):
        return blob.to_blob()
    return blob


def chunk_blob(blob: Array, fmt: str, chunk_size: int,
               start: int = 0) -> List[Array]:
    """Split the blob into chunk_size-token pieces starting at ``start``.

    The last piece may be shorter. Pieces are materialized contiguously by
    the consumer (storage) — here we only produce slices/views.
    """
    n = num_tokens_in_blob(blob, fmt)
    return [
        slice_blob_tokens(blob, fmt, i, min(i + chunk_size, n))
        for i in range(start, n, chunk_size)
    ]


@functools.lru_cache(maxsize=None)
def _jit_concat(axis: int):
    import jax
    import jax.numpy as jnp
    return jax.jit(lambda *bs: jnp.concatenate(bs, axis=axis))


def concat_blobs(blobs: Sequence[Array], fmt: str) -> Array:
    if hasattr(blobs[0], "finish_concat"):
        # host-chunk protocol: one batched device decode+dequant for
        # the whole run instead of per-chunk dispatches
        return type(blobs[0]).finish_concat(list(blobs), fmt)
    xp = _xp(blobs[0])
    if xp is not np:
        # device blobs: run the concat under jit — the eager op pays a
        # per-call lowering that is ~10x the copy itself at 62 chunks.
        # One persistent wrapper per axis; jit's own cache keys on
        # (arity, shapes, dtype), which the fixed chunk_size keeps tiny.
        return _jit_concat(token_axis(fmt))(*blobs)
    return xp.concatenate(list(blobs), axis=token_axis(fmt))


def blob_dtype_str(blob: Array) -> str:
    return str(blob.dtype)
