"""Concurrency + failure recovery (SURVEY §5 notes the reference has no
race tests and no failure handling; these cover ours)."""

import os
import socket
import subprocess
import sys
import threading
import time

import numpy as np
import pytest

from lmcache_tpu.cache_engine import LMCacheEngine
from lmcache_tpu.config import LMCacheEngineConfig, LMCacheEngineMetadata
from tests.conftest import _wait_for_port, pick_free_port


def test_concurrent_store_retrieve(autorelease):
    """Many threads hammering one engine with distinct docs: no lost or
    cross-contaminated chunks."""
    eng = autorelease(
        LMCacheEngine(
            LMCacheEngineConfig.from_defaults(local_device="cpu",
                                              chunk_size=16),
            LMCacheEngineMetadata(model_name="conc", world_size=1,
                                  worker_id=0, fmt="vllm",
                                  dtype="float32")))
    N, TOK = 8, 64
    docs = []
    for i in range(N):
        rng = np.random.default_rng(i)
        docs.append((rng.integers(0, 32000, TOK, dtype=np.int32),
                     rng.standard_normal((2, 2, TOK, 2, 32)).astype(
                         np.float32)))

    errors = []

    def worker(i):
        try:
            tokens, blob = docs[i]
            eng.store(tokens, blob, blocking=False)
            for _ in range(50):
                out, mask = eng.retrieve(tokens, return_tuple=False)
                if mask.all():
                    np.testing.assert_array_equal(np.asarray(out), blob)
                    return
                time.sleep(0.01)
            raise AssertionError(f"doc {i} never became retrievable")
        except Exception as e:  # propagate to the main thread
            errors.append((i, e))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(N)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert not errors, errors

    # cross-check isolation after the dust settles
    for tokens, blob in docs:
        out, mask = eng.retrieve(tokens, return_tuple=False)
        assert mask.all()
        np.testing.assert_array_equal(np.asarray(out), blob)


def test_connector_survives_server_restart(tmp_path):
    """A live connector rides out a server crash + restart (reconnect
    logic in both the Python and C++ transports)."""
    from lmcache_tpu.storage.connector.lm_connector import LMCServerConnector

    port = pick_free_port()
    disk = str(tmp_path / "srv")
    env = dict(os.environ, PYTHONPATH=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))

    def spawn():
        p = subprocess.Popen(
            [sys.executable, "-m", "lmcache_tpu.server", "localhost",
             str(port), disk], env=env)
        assert _wait_for_port("localhost", port)
        return p

    srv = spawn()
    try:
        conn = LMCServerConnector("localhost", port)
        conn.set("k1", b"before-crash")
        assert conn.get("k1") == b"before-crash"

        srv.terminate()
        srv.wait(timeout=10)
        srv = spawn()  # same disk dir -> data survives

        # first op after the crash may need the built-in reconnect
        assert conn.get("k1") == b"before-crash"
        conn.set("k2", b"after-restart")
        assert conn.get("k2") == b"after-restart"
        conn.close()
    finally:
        srv.terminate()
        srv.wait(timeout=10)
