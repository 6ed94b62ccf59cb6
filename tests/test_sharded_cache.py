"""Tensor-parallel cache addressing on a virtual 8-device mesh.

Each TP shard stores/retrieves only its own head-slice under its own
``worker_id`` namespace (reference: world_size/worker_id baked into every
key, lmcache/utils.py:12-39) — validated here with a real
``jax.sharding.Mesh`` and sharded arrays, which the reference never
tests (it has no multi-GPU tests at all, SURVEY §4)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from lmcache_tpu.cache_engine import LMCacheEngine  # noqa: E402
from lmcache_tpu.config import (LMCacheEngineConfig,  # noqa: E402
                                LMCacheEngineMetadata)
from lmcache_tpu.parallel import (MeshConfig, kv_blob_sharding,  # noqa: E402
                                  make_mesh, shard_blob_slice)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 virtual devices")
    return make_mesh(MeshConfig(data=1, model=4))


def _shard_engine(worker_id, world_size, autorelease):
    cfg = LMCacheEngineConfig.from_defaults(local_device="cpu",
                                            chunk_size=16)
    meta = LMCacheEngineMetadata(model_name="m", world_size=world_size,
                                 worker_id=worker_id, fmt="vllm",
                                 dtype="float32")
    return autorelease(LMCacheEngine(cfg, meta))


def test_per_shard_store_retrieve(mesh, autorelease):
    """Mesh-sharded blob -> per-shard store -> per-shard retrieve ->
    reassembly equals the original."""
    n_shards = mesh.shape["model"]
    rng = np.random.default_rng(0)
    L, T, H, D = 2, 48, 8, 64
    tokens = rng.integers(0, 32000, T, dtype=np.int32)
    blob_host = rng.standard_normal((L, 2, T, H, D)).astype(np.float32)
    blob = jax.device_put(jnp.asarray(blob_host),
                          kv_blob_sharding(mesh, "vllm"))

    engines = [
        _shard_engine(i, n_shards, autorelease) for i in range(n_shards)
    ]
    for i, eng in enumerate(engines):
        eng.store(tokens, shard_blob_slice(blob, "vllm", i, n_shards))

    rebuilt = []
    for i, eng in enumerate(engines):
        out, mask = eng.retrieve(tokens, return_tuple=False)
        assert mask.all()
        rebuilt.append(np.asarray(out))
    np.testing.assert_array_equal(np.concatenate(rebuilt, axis=3),
                                  blob_host)


def test_shard_namespaces_are_isolated(mesh, autorelease):
    """Worker 0's chunks are invisible to worker 1 (different key
    namespace) and to a different world_size deployment."""
    rng = np.random.default_rng(1)
    tokens = rng.integers(0, 32000, 32, dtype=np.int32)
    blob = rng.standard_normal((2, 2, 32, 2, 64)).astype(np.float32)

    w0 = _shard_engine(0, 4, autorelease)
    w1 = _shard_engine(1, 4, autorelease)
    other_ws = _shard_engine(0, 2, autorelease)

    w0.store(tokens, blob)
    assert w0.lookup(tokens) == 32
    assert w1.lookup(tokens) == 0
    assert other_ws.lookup(tokens) == 0


def test_shard_slice_shapes():
    blob = np.zeros((2, 2, 8, 8, 4))
    s = shard_blob_slice(blob, "vllm", 1, 4)
    assert s.shape == (2, 2, 8, 2, 4)
    hf = np.zeros((2, 2, 8, 8, 4))  # [L, 2, H, T, D]
    s2 = shard_blob_slice(hf, "huggingface", 3, 4)
    assert s2.shape == (2, 2, 2, 8, 4)
    with pytest.raises(ValueError):
        shard_blob_slice(blob, "vllm", 0, 3)
