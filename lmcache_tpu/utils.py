"""Shared types: cache keys, tracing annotations, timing helpers.

Capability parity with reference lmcache/utils.py:12-60 (CacheEngineKey,
NVTX-style hot-path annotation). On TPU the profiler annotation is
``jax.profiler.TraceAnnotation`` feeding XProf/Perfetto instead of NVTX.
"""

import functools
import time
from dataclasses import dataclass
from typing import Any, Callable

from lmcache_tpu.logging_utils import init_logger

logger = init_logger(__name__)


@dataclass(frozen=True)
class CacheEngineKey:
    """Globally-unique address of one KV chunk.

    The fields bake the deployment identity into the key so that only
    compatible deployments share chunks (reference: lmcache/utils.py:12-39).
    ``world_size``/``worker_id`` address the head-shard: on TPU this is the
    (shard count, shard index) along the mesh axis the KV heads are split
    over.
    """

    fmt: str
    model_name: str
    world_size: int
    worker_id: int
    chunk_hash: str

    def __hash__(self):
        return hash((self.fmt, self.model_name, self.world_size,
                     self.worker_id, self.chunk_hash))

    def to_string(self) -> str:
        return (f"{self.fmt}@{self.model_name}@{self.world_size}"
                f"@{self.worker_id}@{self.chunk_hash}")

    @staticmethod
    def from_string(s: str) -> "CacheEngineKey":
        parts = s.split("@")
        if len(parts) != 5:
            raise ValueError(f"Invalid key string: {s!r}")
        return CacheEngineKey(parts[0], parts[1], int(parts[2]),
                              int(parts[3]), parts[4])


def _get_trace_annotation():
    """Lazily resolve jax.profiler.TraceAnnotation (jax import is not free)."""
    try:
        import jax.profiler
        return jax.profiler.TraceAnnotation
    except Exception:  # pragma: no cover - jax always present in this env
        return None


def _lmcache_trace_annotate(func: Callable) -> Callable:
    """Annotate a hot function with a named profiler range.

    TPU-native replacement for the reference's NVTX decorator
    (lmcache/utils.py:42-60): ranges show up in XProf / Perfetto traces
    captured with ``jax.profiler.trace``.
    """
    annotation_cls = _get_trace_annotation()
    if annotation_cls is None:  # pragma: no cover
        return func

    name = f"lmcache_tpu::{func.__qualname__}"

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        with annotation_cls(name):
            return func(*args, **kwargs)

    return wrapper


class Timer:
    """Tiny context timer used by debug wrappers and metrics."""

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.start
        return False

    @property
    def ms(self) -> float:
        return self.elapsed * 1e3


def human_bytes(n: int) -> str:
    for unit in ("B", "KiB", "MiB", "GiB", "TiB"):
        if abs(n) < 1024 or unit == "TiB":
            return f"{n:.1f}{unit}" if unit != "B" else f"{n}B"
        n /= 1024
    return f"{n}B"  # pragma: no cover


def nbytes_of(obj: Any) -> int:
    """Byte size of a numpy / jax array (0 for anything else)."""
    nbytes = getattr(obj, "nbytes", None)
    if nbytes is not None:
        return int(nbytes)
    return 0
