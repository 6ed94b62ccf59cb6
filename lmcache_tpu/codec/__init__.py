"""CacheGen-style KV-cache codec (TPU-native).

Split of responsibilities (reference: the torchac_cuda CUDA package +
lmcache/serde/cachegen_{basics,encoder,decoder}.py):

- quantization / dequantization and CDF estimation run **on the TPU**
  (lmcache_tpu/ops/quant.py — jnp, fused by XLA; symbols travel to host
  as uint8, 2-4x smaller than the fp16 KV),
- bit-serial entropy coding runs **on host cores** in C++ with one
  independent range-coder stream per (layer, channel)
  (csrc/lmtc_codec.cc, OpenMP), keeping streams parallel-decodable
  exactly like the reference's GPU-thread-per-stream design.
"""

from lmcache_tpu.codec.range_coder import (encode_streams, decode_streams,
                                           codec_available)
from lmcache_tpu.codec.cachegen_config import CacheGenConfig

__all__ = [
    "encode_streams", "decode_streams", "codec_available", "CacheGenConfig"
]
