"""ctypes bindings + on-demand build of the C++ range coder.

The shared library is compiled once (g++ -O3 -fopenmp) into
``lmcache_tpu/codec/_lib/`` and memoized; pybind11 is unavailable in this
environment so the ABI is a plain C interface.
"""

import ctypes
import hashlib
import os
import platform
import subprocess
import sys
import threading
from typing import Optional, Tuple

import numpy as np

from lmcache_tpu.logging_utils import init_logger

logger = init_logger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "csrc", "lmtc_codec.cc")
_LIBDIR = os.path.join(_HERE, "_lib")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _isa_tag() -> str:
    """Host-ISA fingerprint baked into the cached lib filename.

    -march=native output is only valid on hosts with the same CPU
    features; if the package dir is shared (NFS, baked image), a lib
    built on a newer-ISA host would SIGILL on an older one. Keying the
    cache on machine + cpu flags forces a rebuild per ISA instead.
    """
    feat = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feat += " " + " ".join(sorted(line.split()[2:]))
                    break
    except OSError:
        pass
    return hashlib.sha1(feat.encode()).hexdigest()[:12]


def _lib_path() -> str:
    return os.path.join(_LIBDIR, f"liblmtc_codec-{_isa_tag()}.so")


def _smoke_ok(libpath: str) -> bool:
    """Run a tiny decode in a THROWAWAY subprocess: an ISA mismatch the
    filename tag missed dies with SIGILL there instead of killing us."""
    code = (
        "import ctypes, numpy as np\n"
        f"lib = ctypes.CDLL({libpath!r})\n"
        "P, I = ctypes.c_void_p, ctypes.c_int\n"
        "lib.lmtc_encode_streams.argtypes = [P, I, I, P, I, P, I, P]\n"
        "lib.lmtc_decode_streams.argtypes = [P, P, I, I, P, I, P]\n"
        "sym = np.arange(8, dtype=np.uint8).reshape(1, 8) % 2\n"
        "cdf = np.array([[0, 32768] + [65535] * 31], np.uint16)\n"
        "out = np.empty((1, 32), np.uint8)\n"
        "lens = np.empty(1, np.int32)\n"
        "lib.lmtc_encode_streams(sym.ctypes.data, 1, 8, cdf.ctypes.data,"
        " 32, out.ctypes.data, 32, lens.ctypes.data)\n"
        "offs = np.array([0, lens[0]], np.int64)\n"
        "dec = np.empty((1, 8), np.uint8)\n"
        "lib.lmtc_decode_streams(out.ctypes.data, offs.ctypes.data, 1, 8,"
        " cdf.ctypes.data, 32, dec.ctypes.data)\n"
        "assert (dec == sym).all()\n")
    try:
        subprocess.run([sys.executable, "-c", code], check=True,
                       capture_output=True, timeout=60)
        return True
    except (subprocess.SubprocessError, OSError):
        return False


def _lib_digest(libpath: str) -> str:
    h = hashlib.sha256()
    with open(libpath, "rb") as f:
        for blk in iter(lambda: f.read(1 << 20), b""):
            h.update(blk)
    return h.hexdigest()


def _write_marker(okpath: str, libpath: str) -> None:
    try:
        with open(okpath + ".tmp", "w") as f:
            f.write(_lib_digest(libpath))
        os.replace(okpath + ".tmp", okpath)
    except OSError:  # read-only cache dir: probe again next process
        pass


def _marker_valid(okpath: str, libpath: str) -> bool:
    try:
        with open(okpath) as f:
            return f.read().strip() == _lib_digest(libpath)
    except OSError:
        return False


def _build() -> Optional[ctypes.CDLL]:
    os.makedirs(_LIBDIR, exist_ok=True)
    libpath = _lib_path()
    fresh = False
    if (not os.path.exists(libpath)
            or os.path.getmtime(libpath) < os.path.getmtime(_SRC)):
        base = ["g++", "-O3", "-std=c++17", "-fPIC", "-shared",
                "-fopenmp", _SRC, "-o", libpath + ".tmp"]
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
        os.replace(libpath + ".tmp", libpath)
        fresh = True
    # the smoke probe (a throwaway subprocess) runs once per cached
    # artifact, not once per process: a sibling .ok marker keyed by the
    # lib's content hash records a past success on this host (ADVICE r4:
    # the probe added ~0.5-1 s to every worker's first codec use)
    okpath = libpath + ".ok"
    if fresh:
        # probe even the fresh build before writing the marker: a bad
        # -march=native output (or an NFS sibling whose ISA tag
        # collides) must keep the generic-rebuild recovery reachable —
        # an unearned marker would disable it forever
        if _smoke_ok(libpath):
            _write_marker(okpath, libpath)
        else:
            logger.warning("Fresh range coder failed smoke test; "
                           "rebuilding without -march=native")
            generic = ["g++", "-O3", "-std=c++17", "-fPIC", "-shared",
                       "-fopenmp", _SRC, "-o", libpath + ".tmp"]
            subprocess.run(generic, check=True, capture_output=True)
            os.replace(libpath + ".tmp", libpath)
            _write_marker(okpath, libpath)
    elif not _marker_valid(okpath, libpath):
        if _smoke_ok(libpath):
            _write_marker(okpath, libpath)
        else:
            # cached lib crashes on this host (e.g. stale pre-ISA-tag
            # cache on NFS): rebuild with generic flags, which run
            # anywhere
            logger.warning("Cached range coder failed smoke test; "
                           "rebuilding without -march=native")
            generic = ["g++", "-O3", "-std=c++17", "-fPIC", "-shared",
                       "-fopenmp", _SRC, "-o", libpath + ".tmp"]
            subprocess.run(generic, check=True, capture_output=True)
            os.replace(libpath + ".tmp", libpath)
            _write_marker(okpath, libpath)
    lib = ctypes.CDLL(libpath)
    lib.lmtc_encode_streams.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p
    ]
    lib.lmtc_decode_streams.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p
    ]
    lib.lmtc_pad_streams.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p
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


def pad_streams(payload, lens: np.ndarray, stride: int) -> np.ndarray:
    """Re-lay concatenated streams as zero-padded uint8
    [n_streams, stride] — the transfer layout of the on-device decoder
    (ops/range_decode.py). C++ when available, vectorized numpy
    fallback otherwise."""
    lens = np.asarray(lens, np.int64)
    n_streams = len(lens)
    offsets = np.zeros(n_streams + 1, np.int64)
    np.cumsum(lens, out=offsets[1:])
    buf = np.frombuffer(payload, np.uint8, count=int(offsets[-1]))
    out = np.empty((n_streams, stride), np.uint8)
    if buf.size == 0:
        out[:] = 0
        return out
    lib = _get_lib()
    if lib is not None:
        lib.lmtc_pad_streams(buf.ctypes.data, offsets.ctypes.data,
                             n_streams, stride, out.ctypes.data)
        return out
    idx = offsets[:-1, None] + np.arange(stride, dtype=np.int64)[None]
    valid = np.arange(stride)[None] < lens[:, None]
    np.take(buf, np.minimum(idx, max(len(buf) - 1, 0)), out=out)
    out[~valid] = 0
    return out


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
