"""Local cache tiers: TPU HBM, host DRAM, and local disk.

Capability parity with reference lmcache/storage_backend/local_backend.py
(LMCLocalBackend :22-153, LMCLocalDiskBackend :163-310), redesigned for TPU:

- The HBM tier holds committed ``jax.Array``s placed with ``jax.device_put``
  (no torch device strings); the DRAM tier holds numpy arrays. Cross-tier
  movement is an async host<->device transfer that overlaps with decode
  compute because JAX dispatch is asynchronous — we only block in
  ``blocking=True`` puts.
- Background writes use a single-worker executor (replacing the reference's
  hand-rolled queue + daemon thread + end-signal protocol) so exceptions
  propagate and close() is a clean shutdown.
- Both in-memory tiers support LRU eviction under an optional byte budget
  (the reference is unbounded).
- The disk tier writes one self-describing LMTC container per chunk
  (replacing safetensors-per-chunk files) and rebuilds its key index from
  the directory on restart.
"""

import os
import re
import threading
import time
from collections import OrderedDict
from concurrent.futures import Future, ThreadPoolExecutor
from typing import List, Optional

import numpy as np

from lmcache_tpu import metrics
from lmcache_tpu.logging_utils import init_logger
from lmcache_tpu.storage.abstract_backend import LMCBackendInterface
from lmcache_tpu.storage.serde.raw_serde import decode_array, encode_array
from lmcache_tpu.utils import (CacheEngineKey, _lmcache_trace_annotate,
                               nbytes_of)

logger = init_logger(__name__)


class LMCLocalBackend(LMCBackendInterface):
    """In-process KV chunk store on TPU HBM ("tpu") or host DRAM ("cpu")."""

    def __init__(self, device: str = "tpu",
                 capacity_bytes: Optional[int] = None):
        if device not in ("tpu", "cpu"):
            raise ValueError(f"Invalid local device: {device}")
        self.device = device
        self.tier = "hbm" if device == "tpu" else "dram"
        self.capacity_bytes = capacity_bytes
        self.dict: "OrderedDict[CacheEngineKey, object]" = OrderedDict()
        self.lock = threading.Lock()
        self.total_bytes = 0
        self.evictions = 0
        self._executor = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="lmc-local-put")
        self._pending: List[Future] = []
        self._pending_lock = threading.Lock()
        self._closed = False

    # -- placement ---------------------------------------------------------

    def _place(self, blob):
        if self.device == "cpu":
            # np.asarray on a jax.Array performs the device->host transfer.
            return np.ascontiguousarray(np.asarray(blob))
        import jax
        dev = jax.local_devices()[0]
        return jax.device_put(blob, dev)

    # -- interface ---------------------------------------------------------

    def contains(self, key: CacheEngineKey) -> bool:
        with self.lock:
            return key in self.dict

    @_lmcache_trace_annotate
    def put(self, key: CacheEngineKey, blob, blocking: bool = True) -> None:
        if blocking:
            self._put_blocking(key, blob)
        else:
            with self._pending_lock:
                self._pending = [f for f in self._pending if not f.done()]
                self._pending.append(
                    self._executor.submit(self._put_blocking, key, blob))

    def _put_blocking(self, key: CacheEngineKey, blob) -> None:
        t0 = time.perf_counter()
        placed = self._place(blob)
        size = nbytes_of(placed)
        with self.lock:
            old = self.dict.pop(key, None)
            if old is not None:
                self.total_bytes -= nbytes_of(old)
            self.dict[key] = placed
            self.total_bytes += size
            self._evict_locked()
        metrics.observe("lmcache_tier_put_seconds",
                        time.perf_counter() - t0,
                        labels={"tier": self.tier})

    def _evict_locked(self) -> None:
        if self.capacity_bytes is None:
            return
        while self.total_bytes > self.capacity_bytes and len(self.dict) > 1:
            _, victim = self.dict.popitem(last=False)
            self.total_bytes -= nbytes_of(victim)
            self.evictions += 1
        if self.total_bytes > self.capacity_bytes and self.dict:
            # a single chunk larger than the tier budget: enforce the
            # budget strictly (on HBM, exceeding it risks an OOM that
            # kills serving — worse than one lost cache entry)
            key, victim = self.dict.popitem(last=False)
            self.total_bytes -= nbytes_of(victim)
            self.evictions += 1
            logger.warning(
                "Evicted just-stored %s: chunk (%d B) exceeds the %s "
                "tier budget (%d B)", key.to_string(), nbytes_of(victim),
                self.tier, self.capacity_bytes)

    @_lmcache_trace_annotate
    def get(self, key: CacheEngineKey):
        t0 = time.perf_counter()
        with self.lock:
            blob = self.dict.get(key)
            if blob is not None:
                self.dict.move_to_end(key)  # LRU touch
        if blob is not None:
            metrics.observe("lmcache_tier_get_seconds",
                            time.perf_counter() - t0,
                            labels={"tier": self.tier})
        return blob

    def flush(self) -> None:
        """Wait for all in-flight non-blocking puts."""
        with self._pending_lock:
            pending, self._pending = self._pending, []
        for f in pending:
            f.result()

    def close(self) -> None:
        if self._closed:
            return
        self._closed = True
        self.flush()
        self._executor.shutdown(wait=True)


class LMCLocalDiskBackend(LMCBackendInterface):
    """Disk tier: one LMTC container file per chunk.

    The directory itself is the persistent artifact; restart recovery replays
    the append-only key index to rebuild the in-memory key set (reference
    restart semantics, validated by tests/test_backends.py:181-203 in the
    reference). Files are named by a digest of the exact key string so model
    names with arbitrary characters can never collide.
    """

    _INDEX = "keys.idx"

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)
        self.lock = threading.Lock()
        self.existing_keys = set()
        self._executor = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="lmc-disk-put")
        self._pending: List[Future] = []
        self._pending_lock = threading.Lock()
        self._closed = False
        # restart recovery: replay the key index, keeping live entries only
        index_path = os.path.join(path, self._INDEX)
        if os.path.exists(index_path):
            with open(index_path, "r") as f:
                for line in f:
                    key_str = line.strip()
                    if not key_str:
                        continue
                    try:
                        key = CacheEngineKey.from_string(key_str)
                    except ValueError:
                        logger.warning("Skipping bad index line %r", key_str)
                        continue
                    if os.path.exists(self._key_to_path(key)):
                        self.existing_keys.add(key)

    def _key_to_path(self, key: CacheEngineKey) -> str:
        import hashlib
        digest = hashlib.sha256(
            key.to_string().encode("utf-8")).hexdigest()[:40]
        return os.path.join(self.path, digest + ".lmtc")

    def contains(self, key: CacheEngineKey) -> bool:
        with self.lock:
            return key in self.existing_keys

    @_lmcache_trace_annotate
    def put(self, key: CacheEngineKey, blob, blocking: bool = True) -> None:
        if blocking:
            self._put_blocking(key, blob)
        else:
            with self._pending_lock:
                self._pending = [f for f in self._pending if not f.done()]
                self._pending.append(
                    self._executor.submit(self._put_blocking, key, blob))

    def _put_blocking(self, key: CacheEngineKey, blob) -> None:
        t0 = time.perf_counter()
        data = encode_array(blob)
        path = self._key_to_path(key)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)  # atomic publish
        with self.lock:
            if key not in self.existing_keys:
                with open(os.path.join(self.path, self._INDEX), "a") as f:
                    f.write(key.to_string() + "\n")
            self.existing_keys.add(key)
        metrics.observe("lmcache_tier_put_seconds",
                        time.perf_counter() - t0, labels={"tier": "disk"})

    @_lmcache_trace_annotate
    def get(self, key: CacheEngineKey):
        if not self.contains(key):
            return None
        t0 = time.perf_counter()
        with open(self._key_to_path(key), "rb") as f:
            blob = decode_array(f.read())
        metrics.observe("lmcache_tier_get_seconds",
                        time.perf_counter() - t0, labels={"tier": "disk"})
        return blob

    def flush(self) -> None:
        with self._pending_lock:
            pending, self._pending = self._pending, []
        for f in pending:
            f.result()

    def close(self) -> None:
        if self._closed:
            return
        self._closed = True
        self.flush()
        self._executor.shutdown(wait=True)
