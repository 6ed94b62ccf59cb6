"""ctypes bindings + on-demand build of the C++ range coder.

The shared library is compiled once (g++ -O3 -fopenmp) into
``lmcache_tpu/codec/_lib/`` and memoized; pybind11 is unavailable in this
environment so the ABI is a plain C interface.
"""

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

from lmcache_tpu.logging_utils import init_logger

logger = init_logger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "csrc", "lmtc_codec.cc")
_LIBDIR = os.path.join(_HERE, "_lib")
_LIBPATH = os.path.join(_LIBDIR, "liblmtc_codec.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    os.makedirs(_LIBDIR, exist_ok=True)
    if (not os.path.exists(_LIBPATH)
            or os.path.getmtime(_LIBPATH) < os.path.getmtime(_SRC)):
        base = ["g++", "-O3", "-std=c++17", "-fPIC", "-shared",
                "-fopenmp", _SRC, "-o", _LIBPATH + ".tmp"]
        # -march=native vectorizes the branchless symbol search (packed
        # uint16 compares); the lib is built on the deployment host, so
        # native is the right target — fall back for exotic toolchains
        for cmd in ([base[0], "-march=native"] + base[1:], base):
            logger.info("Building range coder: %s", " ".join(cmd))
            try:
                subprocess.run(cmd, check=True, capture_output=True)
                break
            except subprocess.CalledProcessError:
                if cmd is base:
                    raise
        os.replace(_LIBPATH + ".tmp", _LIBPATH)
    lib = ctypes.CDLL(_LIBPATH)
    lib.lmtc_encode_streams.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p
    ]
    lib.lmtc_decode_streams.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p
    ]
    lib.lmtc_num_threads.restype = ctypes.c_int
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is None and not _build_failed:
            try:
                _lib = _build()
            except Exception as e:  # no toolchain — codec degrades to raw
                logger.warning("range coder build failed: %s", e)
                _build_failed = True
    return _lib


def codec_available() -> bool:
    return _get_lib() is not None


def encode_streams(symbols: np.ndarray,
                   cdf: np.ndarray) -> Tuple[bytes, np.ndarray]:
    """Entropy-encode independent symbol streams.

    Args:
        symbols: uint8 [n_streams, n_symbols].
        cdf: uint16 [n_streams, n_bins + 1]; cdf[:, 0] == 0, strictly
            increasing, implied upper bound 65536 at index n_bins.

    Returns:
        (concatenated bytestream, int64 lengths [n_streams]).
    """
    lib = _get_lib()
    symbols = np.ascontiguousarray(symbols, dtype=np.uint8)
    cdf = np.ascontiguousarray(cdf, dtype=np.uint16)
    n_streams, n_symbols = symbols.shape
    n_bins = cdf.shape[1] - 1
    # worst case ~2 bytes/symbol + flush
    out_stride = 2 * n_symbols + 16
    out = np.empty((n_streams, out_stride), np.uint8)
    lens = np.empty(n_streams, np.int32)
    lib.lmtc_encode_streams(symbols.ctypes.data, n_streams, n_symbols,
                            cdf.ctypes.data, n_bins, out.ctypes.data,
                            out_stride, lens.ctypes.data)
    if (lens < 0).any():
        raise RuntimeError("range coder overflow (corrupt CDF?)")
    lens64 = lens.astype(np.int64)
    # compact the ragged buffer (reference: collect_bytes,
    # cachegen_encoder.py:225-238)
    payload = b"".join(
        out[i, :lens[i]].tobytes() for i in range(n_streams))
    return payload, lens64


def decode_streams(payload: bytes, lens: np.ndarray, n_symbols: int,
                   cdf: np.ndarray) -> np.ndarray:
    """Inverse of :func:`encode_streams` -> uint8 [n_streams, n_symbols]."""
    lib = _get_lib()
    cdf = np.ascontiguousarray(cdf, dtype=np.uint16)
    n_streams = cdf.shape[0]
    n_bins = cdf.shape[1] - 1
    offsets = np.zeros(n_streams + 1, np.int64)
    np.cumsum(np.asarray(lens, np.int64), out=offsets[1:])
    buf = np.frombuffer(payload, np.uint8)
    out = np.empty((n_streams, n_symbols), np.uint8)
    lib.lmtc_decode_streams(buf.ctypes.data, offsets.ctypes.data, n_streams,
                            n_symbols, cdf.ctypes.data, n_bins,
                            out.ctypes.data)
    return out
