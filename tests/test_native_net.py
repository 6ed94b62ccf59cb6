"""Native C++ transport: parity with the Python client against a real
server subprocess, including large payloads and missing keys."""

import numpy as np
import pytest

from lmcache_tpu.net import NativeSocketClient, native_transport_available
from lmcache_tpu.storage.connector.lm_connector import LMCServerConnector

pytestmark = pytest.mark.skipif(not native_transport_available(),
                                reason="C++ transport unavailable")


def test_native_roundtrip(lmserver_process, autorelease):
    c = autorelease(
        NativeSocketClient(lmserver_process.host, lmserver_process.port_))
    assert not c.exists("nope")
    assert c.get("nope") is None

    small = b"hello world"
    big = np.random.default_rng(0).integers(0, 256, 4 << 20,
                                            dtype=np.uint8).tobytes()
    c.set("k/small", small)
    c.set("k/big", big)
    assert c.exists("k/small") and c.exists("k/big")
    assert c.get("k/small") == small
    assert c.get("k/big") == big


def test_native_python_interop(lmserver_process, autorelease):
    """Data written through the native client must be readable through the
    Python client and vice versa (same wire format)."""
    native = autorelease(
        NativeSocketClient(lmserver_process.host, lmserver_process.port_))
    py = autorelease(
        LMCServerConnector(lmserver_process.host, lmserver_process.port_,
                           use_native=False))
    assert py.native is None

    native.set("interop/a", b"from-native")
    assert py.get("interop/a") == b"from-native"
    py.set("interop/b", b"from-python")
    assert native.get("interop/b") == b"from-python"


def test_connector_prefers_native(lmserver_process, autorelease):
    conn = autorelease(
        LMCServerConnector(lmserver_process.host, lmserver_process.port_))
    assert conn.native is not None
    conn.set("pref/x", b"abc")
    assert conn.get("pref/x") == b"abc"
    assert conn.exists("pref/x")
    assert "pref/x" in conn.list()
