"""Lossless serde using the safetensors container.

Capability parity with reference lmcache/storage_backend/serde/safe_serde.py.
safetensors' numpy backend has no bfloat16 support, so bf16 payloads are
bit-cast to uint16 for storage and the true dtype is recorded in the
container metadata.
"""

import ml_dtypes
import numpy as np
from safetensors.numpy import load as st_load
from safetensors.numpy import save as st_save

from lmcache_tpu.storage.serde.serde import Deserializer, Serializer

_KEY = "kv"
_BITCAST = {
    "bfloat16": np.uint16,
    "float8_e4m3fn": np.uint8,
    "float8_e5m2": np.uint8,
}


class SafeSerializer(Serializer):

    def to_bytes(self, blob) -> bytes:
        arr = np.ascontiguousarray(np.asarray(blob))
        meta = {}
        if arr.dtype.name in _BITCAST:
            meta["true_dtype"] = arr.dtype.name
            arr = arr.view(_BITCAST[arr.dtype.name])
        return st_save({_KEY: arr}, metadata=meta or None)


class SafeDeserializer(Deserializer):

    def from_bytes(self, bs: bytes) -> np.ndarray:
        import json
        import struct
        arr = st_load(bs)[_KEY]
        # safetensors.numpy.load drops metadata; re-read the header to
        # recover the true dtype for bit-cast payloads.
        (hlen, ) = struct.unpack_from("<Q", bs, 0)
        header = json.loads(bs[8:8 + hlen])
        meta = header.get("__metadata__") or {}
        true_dtype = meta.get("true_dtype")
        if true_dtype:
            arr = arr.view(np.dtype(getattr(ml_dtypes, true_dtype)))
        return arr
