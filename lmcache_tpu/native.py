"""On-demand build + load of the C++ native components.

pybind11 is not available in this environment, so native pieces expose a
plain C ABI loaded with ctypes. Shared objects are compiled once into
``<module dir>/_lib`` and rebuilt when their source is newer.
"""

import ctypes
import os
import subprocess
import threading
from typing import Dict, Optional, Sequence

from lmcache_tpu.logging_utils import init_logger

logger = init_logger(__name__)

_lock = threading.Lock()
_cache: Dict[str, Optional[ctypes.CDLL]] = {}


def load_native(src_path: str,
                extra_flags: Sequence[str] = ()) -> Optional[ctypes.CDLL]:
    """Compile ``src_path`` (if stale) and dlopen it; None if the
    toolchain is unavailable (callers degrade to their Python path)."""
    src_path = os.path.abspath(src_path)
    with _lock:
        if src_path in _cache:
            return _cache[src_path]
        lib = None
        try:
            libdir = os.path.join(
                os.path.dirname(os.path.dirname(src_path)), "_lib")
            os.makedirs(libdir, exist_ok=True)
            name = os.path.splitext(os.path.basename(src_path))[0]
            libpath = os.path.join(libdir, f"lib{name}.so")
            if (not os.path.exists(libpath)
                    or os.path.getmtime(libpath) < os.path.getmtime(src_path)):
                cmd = [
                    "g++", "-O3", "-std=c++17", "-fPIC", "-shared",
                    *extra_flags, src_path, "-o", libpath + ".tmp"
                ]
                logger.info("Building native lib: %s", " ".join(cmd))
                subprocess.run(cmd, check=True, capture_output=True)
                os.replace(libpath + ".tmp", libpath)
            lib = ctypes.CDLL(libpath)
        except Exception as e:
            logger.warning("native build failed for %s: %s", src_path, e)
        _cache[src_path] = lib
        return lib
