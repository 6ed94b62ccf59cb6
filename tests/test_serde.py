"""Lossless serde round trips (reference: tests/test_serde.py covers the
lossy cachegen serde; the cachegen tests live in test_codec.py here)."""

import ml_dtypes
import numpy as np
import pytest

from lmcache_tpu.config import LMCacheEngineConfig, LMCacheEngineMetadata
from lmcache_tpu.storage.serde import CreateSerde
from lmcache_tpu.storage.serde.raw_serde import decode_array, encode_array


def _metadata(fmt="vllm"):
    return LMCacheEngineMetadata("test-model", 1, 0, fmt)


@pytest.mark.parametrize("dtype", [np.float32, np.float16,
                                   ml_dtypes.bfloat16, np.int8, np.uint8])
@pytest.mark.parametrize("serde_type", ["raw", "raw_zstd", "safetensors"])
def test_lossless_roundtrip(serde_type, dtype):
    config = LMCacheEngineConfig.from_legacy(backend="cpu")
    s, d = CreateSerde(serde_type, config, _metadata())
    rng = np.random.default_rng(0)
    arr = (rng.standard_normal((4, 2, 16, 2, 8)) * 3).astype(dtype)
    out = d.from_bytes(s.to_bytes(arr))
    assert out.dtype == arr.dtype
    assert out.shape == arr.shape
    np.testing.assert_array_equal(np.asarray(out), arr)


def test_raw_roundtrip_jax_array():
    import jax.numpy as jnp
    x = jnp.ones((2, 2, 4, 2, 8), dtype=jnp.bfloat16) * 1.5
    out = decode_array(encode_array(x))
    assert out.shape == x.shape
    assert out.dtype.name == "bfloat16"
    np.testing.assert_array_equal(out, np.asarray(x))


def test_raw_rejects_garbage():
    with pytest.raises(ValueError):
        decode_array(b"NOPE" + b"\x00" * 32)


def test_zstd_smaller_on_redundant_data():
    arr = np.zeros((64, 64), dtype=np.float32)
    raw = encode_array(arr)
    z = encode_array(arr, compress_level=3)
    assert len(z) < len(raw) // 10


def test_unknown_serde_type():
    config = LMCacheEngineConfig.from_legacy(backend="cpu")
    with pytest.raises(ValueError):
        CreateSerde("bogus", config, _metadata())


def test_debug_wrappers_installed():
    """GlobalConfig debug mode wraps serdes with timing wrappers
    (reference: serde/__init__.py:38-41) and they stay transparent."""
    import numpy as np

    from lmcache_tpu.config import (GlobalConfig, LMCacheEngineConfig,
                                    LMCacheEngineMetadata)
    from lmcache_tpu.storage.serde import CreateSerde
    from lmcache_tpu.storage.serde.serde import (DeserializerDebugWrapper,
                                                 SerializerDebugWrapper)

    cfg = LMCacheEngineConfig.from_defaults()
    meta = LMCacheEngineMetadata(model_name="m", world_size=1, worker_id=0,
                                 fmt="vllm", dtype="float32")
    try:
        GlobalConfig.set_debug(True)
        s, d = CreateSerde("raw", cfg, meta)
        assert isinstance(s, SerializerDebugWrapper)
        assert isinstance(d, DeserializerDebugWrapper)
        blob = np.random.default_rng(0).standard_normal(
            (2, 2, 8, 2, 4)).astype(np.float32)
        out = d.from_bytes(s.to_bytes(blob))
        np.testing.assert_array_equal(out, blob)
    finally:
        GlobalConfig.set_debug(False)
    s2, _ = CreateSerde("raw", cfg, meta)
    assert not isinstance(s2, SerializerDebugWrapper)
