"""Model families served by the TPU-native engine.

The reference (lmcache) is a cache sidecar and keeps the model inside
vLLM; here the serving model is first-class so the whole stack —
prefill/decode, KV layout, cache reuse — is one coherent TPU program.
"""

from lmcache_tpu.models.llama import (LlamaConfig, forward,
                                      forward_quantized, init_params,
                                      load_hf, new_kv_cache,
                                      new_quantized_kv_cache)

__all__ = [
    "LlamaConfig", "init_params", "load_hf", "forward", "new_kv_cache",
    "forward_quantized", "new_quantized_kv_cache"
]
