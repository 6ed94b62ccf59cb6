"""Storage-backend factory / tiering tests (reference: tests/test_backends.py)."""

import time

import numpy as np
import pytest

from lmcache_tpu.config import LMCacheEngineConfig, LMCacheEngineMetadata
from lmcache_tpu.storage import CreateStorageBackend
from lmcache_tpu.storage.hybrid_backend import LMCHybridBackend
from lmcache_tpu.storage.local_backend import (LMCLocalBackend,
                                               LMCLocalDiskBackend)
from lmcache_tpu.storage.remote_backend import (LMCPipelinedRemoteBackend,
                                                LMCRemoteBackend)
from lmcache_tpu.utils import CacheEngineKey

METADATA = LMCacheEngineMetadata("test-model", 1, 0, "vllm")


def make_key(i=0):
    return CacheEngineKey("vllm", "test-model", 1, 0, f"hash{i}")


def blobs(n=3, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.standard_normal((2, 2, 8, 2, 4)).astype(np.float32)
            for _ in range(n)]


# -- factory dispatch --------------------------------------------------------

def test_factory_local_cpu(autorelease):
    config = LMCacheEngineConfig(local_device="cpu", remote_url=None)
    backend = autorelease(CreateStorageBackend(config, METADATA))
    assert isinstance(backend, LMCLocalBackend)


def test_factory_disk(tmp_path, autorelease):
    config = LMCacheEngineConfig(local_device=str(tmp_path / "d"),
                                 remote_url=None)
    backend = autorelease(CreateStorageBackend(config, METADATA))
    assert isinstance(backend, LMCLocalDiskBackend)


def test_factory_invalid():
    config = LMCacheEngineConfig(local_device=None, remote_url=None)
    with pytest.raises(ValueError):
        CreateStorageBackend(config, METADATA)


def test_factory_remote_and_hybrid(lmserver_process, autorelease):
    url = lmserver_process.url
    remote_cfg = LMCacheEngineConfig(local_device=None, remote_url=url)
    backend = autorelease(CreateStorageBackend(remote_cfg, METADATA))
    assert isinstance(backend, LMCRemoteBackend)

    hybrid_cfg = LMCacheEngineConfig(local_device="cpu", remote_url=url)
    backend = autorelease(CreateStorageBackend(hybrid_cfg, METADATA))
    assert isinstance(backend, LMCHybridBackend)

    piped_cfg = LMCacheEngineConfig(local_device=None, remote_url=url,
                                    pipelined_backend=True)
    backend = autorelease(CreateStorageBackend(piped_cfg, METADATA))
    assert isinstance(backend, LMCPipelinedRemoteBackend)


def test_factory_from_yaml(tmp_path, autorelease):
    yaml_path = tmp_path / "config.yaml"
    yaml_path.write_text("chunk_size: 64\nlocal_device: cpu\n")
    config = LMCacheEngineConfig.from_file(str(yaml_path))
    assert config.chunk_size == 64
    backend = autorelease(CreateStorageBackend(config, METADATA))
    assert isinstance(backend, LMCLocalBackend)


# -- local tiers --------------------------------------------------------------

@pytest.mark.parametrize("device", ["cpu", "tpu"])
def test_local_put_get(device, autorelease):
    backend = autorelease(LMCLocalBackend(device))
    key, blob = make_key(), blobs(1)[0]
    assert not backend.contains(key)
    backend.put(key, blob)
    assert backend.contains(key)
    np.testing.assert_array_equal(np.asarray(backend.get(key)), blob)
    assert backend.get(make_key(99)) is None


def test_local_nonblocking_put(autorelease):
    backend = autorelease(LMCLocalBackend("cpu"))
    key, blob = make_key(), blobs(1)[0]
    backend.put(key, blob, blocking=False)
    backend.flush()
    assert backend.contains(key)
    np.testing.assert_array_equal(backend.get(key), blob)


def test_local_lru_eviction(autorelease):
    bs = blobs(3)
    per = bs[0].nbytes
    backend = autorelease(LMCLocalBackend("cpu", capacity_bytes=2 * per))
    for i, b in enumerate(bs):
        backend.put(make_key(i), b)
    assert not backend.contains(make_key(0))  # oldest evicted
    assert backend.contains(make_key(1))
    assert backend.contains(make_key(2))
    assert backend.evictions == 1
    assert backend.total_bytes <= 2 * per


def test_disk_persistence_restart(tmp_path, autorelease):
    path = str(tmp_path / "disk")
    b1 = autorelease(LMCLocalDiskBackend(path))
    key, blob = make_key(), blobs(1)[0]
    b1.put(key, blob)
    b1.close()
    # new backend on the same dir sees the old key (restart recovery)
    b2 = autorelease(LMCLocalDiskBackend(path))
    assert b2.contains(key)
    np.testing.assert_array_equal(b2.get(key), blob)


# -- remote / hybrid over a real server subprocess ----------------------------

@pytest.mark.parametrize("lmserver_process", ["cpu", "disk"], indirect=True)
def test_remote_put_get(lmserver_process, autorelease):
    config = LMCacheEngineConfig(local_device=None,
                                 remote_url=lmserver_process.url)
    backend = autorelease(LMCRemoteBackend(config, METADATA))
    key, blob = make_key(), blobs(1)[0]
    assert not backend.contains(key)
    backend.put(key, blob)
    assert backend.contains(key)
    np.testing.assert_array_equal(np.asarray(backend.get(key)), blob)


def test_remote_nonblocking_put(lmserver_process, autorelease):
    config = LMCacheEngineConfig(local_device=None,
                                 remote_url=lmserver_process.url)
    backend = autorelease(LMCRemoteBackend(config, METADATA))
    key, blob = make_key(10), blobs(1)[0]
    backend.put(key, blob, blocking=False)
    backend.flush()
    assert backend.contains(key)
    np.testing.assert_array_equal(np.asarray(backend.get(key)), blob)


def test_pipelined_batched_get_order(lmserver_process, autorelease):
    config = LMCacheEngineConfig(local_device=None,
                                 remote_url=lmserver_process.url,
                                 pipelined_backend=True)
    backend = autorelease(LMCPipelinedRemoteBackend(config, METADATA))
    bs = blobs(4, seed=7)
    keys = [make_key(100 + i) for i in range(4)]
    for k, b in zip(keys[:3], bs[:3]):  # leave keys[3] missing
        backend.put(k, b)
    results = list(backend.batched_get(keys))
    for i in range(3):
        np.testing.assert_array_equal(np.asarray(results[i]), bs[i])
    assert results[3] is None


def test_hybrid_write_through_and_fill(lmserver_process, autorelease):
    url = lmserver_process.url
    cfg = LMCacheEngineConfig(local_device="cpu", remote_url=url)
    backend = autorelease(CreateStorageBackend(cfg, METADATA))
    key, blob = make_key(200), blobs(1)[0]
    backend.put(key, blob)
    backend.remote.flush()
    # a fresh hybrid on the same server prefetches the key at startup
    backend2 = autorelease(CreateStorageBackend(cfg, METADATA))
    assert backend2.local.contains(key)
    np.testing.assert_array_equal(np.asarray(backend2.get(key)), blob)


def test_hybrid_batched_get_remote_misses(lmserver_process, autorelease):
    url = lmserver_process.url
    cfg = LMCacheEngineConfig(local_device="cpu", remote_url=url)
    backend = autorelease(CreateStorageBackend(cfg, METADATA))
    key, blob = make_key(300), blobs(1, seed=3)[0]
    # write to the remote only (bypassing local) to force a read-through
    backend.remote.put(key, blob)
    results = list(backend.batched_get([key, make_key(301)]))
    np.testing.assert_array_equal(np.asarray(results[0]), blob)
    assert results[1] is None
    # read-through fill is async; wait for it then verify local has it
    deadline = time.time() + 5
    while not backend.local.contains(key) and time.time() < deadline:
        time.sleep(0.01)
    assert backend.local.contains(key)


# -- redis (fake) --------------------------------------------------------------

def test_redis_backend(autorelease):
    config = LMCacheEngineConfig(local_device=None,
                                 remote_url="redis://localhost:6379")
    backend = autorelease(LMCRemoteBackend(config, METADATA))
    key, blob = make_key(), blobs(1)[0]
    backend.put(key, blob)
    assert backend.contains(key)
    np.testing.assert_array_equal(np.asarray(backend.get(key)), blob)
    assert key in backend.list()
