"""Shared fixtures.

Mirrors the reference test strategy (reference tests/conftest.py:9-93):
deterministic fake KV generators, a *real* cache-server subprocess on
localhost, an in-memory fake for redis, and an autorelease teardown hook —
plus TPU-specific setup: tests run on a virtual 8-device CPU platform so
mesh/sharding tests exercise real multi-device paths without TPU hardware.
"""

import os
import socket
import subprocess
import sys
import time

# Must happen before jax initializes a backend. NOTE: in this environment
# the JAX_PLATFORMS env var is overridden by the TPU plugin, so the config
# update below (not the env var) is what actually pins tests to the
# virtual 8-device CPU platform.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# ---------------------------------------------------------------------------
# fake redis (the real package is absent in this environment)
# ---------------------------------------------------------------------------
class FakePipeline:

    def __init__(self, store):
        self.store = store
        self.ops = []

    def exists(self, key):
        self.ops.append(key)
        return self

    def execute(self):
        out = [k in self.store for k in self.ops]
        self.ops = []
        return out


class FakeRedis:
    _stores = {}  # shared per (host, port) so reconnects see the same data

    def __init__(self, host="localhost", port=6379, **kwargs):
        self.store = self._stores.setdefault((host, port), {})

    def exists(self, key):
        return key in self.store

    def pipeline(self, transaction=True):
        return FakePipeline(self.store)

    def get(self, key):
        return self.store.get(key)

    def set(self, key, value):
        self.store[key] = value

    def scan(self, cursor=0, count=1000, match=None):
        return 0, [k.encode() for k in self.store.keys()]

    def close(self):
        pass


class FakeSentinel:

    def __init__(self, hosts_and_ports, socket_timeout=None):
        self.backend = FakeRedis(*hosts_and_ports[0])

    def master_for(self, service_name, socket_timeout=None):
        return self.backend

    def slave_for(self, service_name, socket_timeout=None):
        return self.backend


@pytest.fixture(autouse=True, scope="module")
def bounded_xla_jit_cache():
    """Clear JAX's executable caches between test modules.

    The suite compiles thousands of distinct XLA:CPU programs (every
    eager op shape, every jitted engine step across ~37 modules);
    letting them all accumulate in one process segfaults the XLA CPU
    JIT around the ~270th test (reproduced twice at the same spot,
    crash inside backend_compile_and_load on a routine scan — an
    upstream accumulation bug, not a test bug). Per-module eviction
    bounds the live-executable count; modules recompile their own
    programs, which they mostly would anyway.
    """
    yield
    import jax
    jax.clear_caches()


@pytest.fixture(autouse=True)
def mock_redis(monkeypatch):
    """Install a fake `redis` module (reference: conftest.py:9-54)."""
    import types
    fake = types.ModuleType("redis")
    fake.Redis = FakeRedis
    fake.Sentinel = FakeSentinel
    monkeypatch.setitem(sys.modules, "redis", fake)
    yield
    FakeRedis._stores.clear()


# ---------------------------------------------------------------------------
# KV test-data generators
# ---------------------------------------------------------------------------
def generate_kv_tuples(num_tokens,
                       fmt="vllm",
                       num_layers=4,
                       num_heads=2,
                       head_size=64,
                       dtype=np.float32,
                       seed=0):
    """Random nested ((K, V), ...) tuples with the given geometry."""
    rng = np.random.default_rng(seed)
    if fmt == "vllm":
        shape = (num_tokens, num_heads, head_size)
    elif fmt == "huggingface":
        shape = (num_heads, num_tokens, head_size)
    else:
        raise ValueError(fmt)
    return tuple(
        (rng.standard_normal(shape).astype(dtype),
         rng.standard_normal(shape).astype(dtype))
        for _ in range(num_layers))


def generate_tokens(num_tokens, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 32000, size=num_tokens, dtype=np.int32)


def check_kv_equal(left, right, fmt="vllm"):
    """Exact equality of two nested KV tuples (device-agnostic)."""
    assert len(left) == len(right) > 0
    for (lk, lv), (rk, rv) in zip(left, right):
        np.testing.assert_array_equal(np.asarray(lk), np.asarray(rk))
        np.testing.assert_array_equal(np.asarray(lv), np.asarray(rv))


def concat_kv_tuples(a, b, fmt="vllm"):
    axis = 0 if fmt == "vllm" else 1
    return tuple(
        (np.concatenate([np.asarray(ak), np.asarray(bk)], axis=axis),
         np.concatenate([np.asarray(av), np.asarray(bv)], axis=axis))
        for (ak, av), (bk, bv) in zip(a, b))


# make the helpers importable as fixtures-free utilities
@pytest.fixture
def kv_helpers():
    return generate_kv_tuples, generate_tokens, check_kv_equal


# ---------------------------------------------------------------------------
# cache-server subprocess
# ---------------------------------------------------------------------------
def _wait_for_port(host, port, timeout=20.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        try:
            with socket.create_connection((host, port), timeout=0.5):
                return True
        except OSError:
            time.sleep(0.05)
    return False


def pick_free_port():
    with socket.socket() as s:
        s.bind(("", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def lmserver_process(request, tmp_path_factory):
    """Spawn a real `python -m lmcache_tpu.server` subprocess.

    Parameterize indirectly with "cpu" or "disk" (reference:
    conftest.py:57-78).
    """
    device = getattr(request, "param", "cpu")
    if device == "disk":
        device = str(tmp_path_factory.mktemp("lmserver_disk"))
    port = pick_free_port()
    env = dict(os.environ)
    proc = subprocess.Popen(
        [sys.executable, "-m", "lmcache_tpu.server", "localhost",
         str(port), device],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
    )
    assert _wait_for_port("localhost", port), "cache server failed to start"

    class ServerInfo:
        url = f"lm://localhost:{port}"
        host, port_ = "localhost", port
        device_ = device
        process = proc

    yield ServerInfo
    proc.terminate()
    proc.wait(timeout=10)


@pytest.fixture
def autorelease():
    """Register engines/backends for close() at teardown (reference:
    conftest.py:81-93)."""
    objs = []

    def _register(obj):
        objs.append(obj)
        return obj

    yield _register
    for obj in objs:
        try:
            obj.close()
        except Exception:
            pass
