"""Native (C++) framed-TCP client for the cache-server protocol.

Wraps lmcache_tpu/net/csrc/lmtc_net.cc via ctypes. The connector layer
(storage/connector/lm_connector.py) prefers this transport and falls
back to the pure-Python socket client when the toolchain is missing
(reference aspiration: lm_connector.py:13 "consider using C/C++ ...").
"""

import ctypes
import os
import threading
from typing import Optional

import numpy as np

from lmcache_tpu.native import load_native

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "csrc",
                    "lmtc_net.cc")


def _lib():
    lib = load_native(_SRC)
    if lib is not None and not getattr(lib, "_lmtc_net_ready", False):
        lib.lmtc_connect.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.lmtc_connect.restype = ctypes.c_int
        lib.lmtc_disconnect.argtypes = [ctypes.c_int]
        lib.lmtc_put.argtypes = [
            ctypes.c_int, ctypes.c_char_p, ctypes.c_int, ctypes.c_void_p,
            ctypes.c_int64
        ]
        lib.lmtc_put.restype = ctypes.c_int
        lib.lmtc_get_begin.argtypes = [
            ctypes.c_int, ctypes.c_char_p, ctypes.c_int
        ]
        lib.lmtc_get_begin.restype = ctypes.c_int64
        lib.lmtc_read_payload.argtypes = [
            ctypes.c_int, ctypes.c_void_p, ctypes.c_int64
        ]
        lib.lmtc_read_payload.restype = ctypes.c_int
        lib.lmtc_exists.argtypes = [
            ctypes.c_int, ctypes.c_char_p, ctypes.c_int
        ]
        lib.lmtc_exists.restype = ctypes.c_int
        lib._lmtc_net_ready = True
    return lib


def native_transport_available() -> bool:
    return _lib() is not None


class NativeSocketClient:
    """Blocking framed-protocol client over the C++ transport.

    Thread-safe via a per-connection lock (one in-flight request per
    connection, as in the reference). GETs land directly in a
    caller-visible numpy buffer — no intermediate Python bytes copy.
    """

    def __init__(self, host: str, port: int):
        self._l = _lib()
        if self._l is None:
            raise RuntimeError("native transport unavailable")
        self.host, self.port = host, port
        self.lock = threading.Lock()
        self.fd = -1
        self._connect()

    def _connect(self):
        self.fd = self._l.lmtc_connect(self.host.encode(), self.port)
        if self.fd < 0:
            raise ConnectionError(f"connect {self.host}:{self.port} failed")

    def _reconnect(self):
        self._l.lmtc_disconnect(self.fd)
        self._connect()

    def set(self, key: str, obj: bytes) -> None:
        kb = key.encode("utf-8")
        buf = np.frombuffer(obj, np.uint8) if obj else None
        ptr = buf.ctypes.data if buf is not None else None
        with self.lock:
            code = self._l.lmtc_put(self.fd, kb, len(kb), ptr,
                                    len(obj))
            if code == -1:
                self._reconnect()
                code = self._l.lmtc_put(self.fd, kb, len(kb), ptr, len(obj))
        if code != 200:
            raise RuntimeError(f"Remote PUT failed ({code}) for {key}")

    def get(self, key: str) -> Optional[bytes]:
        kb = key.encode("utf-8")
        with self.lock:
            n = self._l.lmtc_get_begin(self.fd, kb, len(kb))
            if n == -1:
                self._reconnect()
                n = self._l.lmtc_get_begin(self.fd, kb, len(kb))
            if n == -404:
                return None
            if n < 0:
                raise ConnectionError(f"GET transport error for {key}")
            out = np.empty(int(n), np.uint8)
            if n and self._l.lmtc_read_payload(self.fd, out.ctypes.data,
                                               int(n)) != 0:
                raise ConnectionError(f"GET payload error for {key}")
        return out.tobytes()

    def exists(self, key: str) -> bool:
        kb = key.encode("utf-8")
        with self.lock:
            r = self._l.lmtc_exists(self.fd, kb, len(kb))
            if r == -1:
                self._reconnect()
                r = self._l.lmtc_exists(self.fd, kb, len(kb))
        if r < 0:
            raise ConnectionError(f"EXIST transport error for {key}")
        return bool(r)

    def close(self) -> None:
        if self.fd >= 0:
            self._l.lmtc_disconnect(self.fd)
            self.fd = -1
