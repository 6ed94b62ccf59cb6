"""TPU compute kernels (Pallas) and jnp reference implementations.

This package is the TPU-native replacement for the reference's CUDA hot
path (the external ``torchac_cuda`` package, reference: setup.py:19) plus
the attention/compute ops the reference delegated to vLLM:

- ``attention``  — flash attention over a paged/contiguous KV cache
  (prefill with cached prefix, and decode), Pallas with jnp reference.
- ``quant``      — CacheGen per-token symmetric quantization / dequant
  (reference: lmcache/serde/cachegen_encoder.py:17-61) as fused jnp/Pallas.
- ``rope``/``norms`` — rotary embeddings and RMSNorm.
"""

from lmcache_tpu.ops.attention import flash_attention, mha_reference

__all__ = ["flash_attention", "mha_reference"]
