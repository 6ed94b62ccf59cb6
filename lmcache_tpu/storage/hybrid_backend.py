"""Hybrid (local + remote) backend.

Capability parity with reference
lmcache/storage_backend/hybrid_backend.py:26-116: write-through puts,
read-through gets that fill the local tier, a startup prefetch that warms
the local tier with compatible remote chunks, and a batched_get that
only queries the remote store for local misses.

The prefetch improves on the reference, which synchronously pulls EVERY
matching chunk at construction (reference hybrid_backend.py:39-62) —
against a production-sized shared store that is a full-keyspace transfer
whose tail the local LRU immediately evicts. Here the prefetch is
bounded by ``hybrid_prefetch_chunks`` / ``hybrid_prefetch_bytes`` /
``local_capacity_bytes`` (most-recently-stored chunks first) and can be
moved off the constructor with ``hybrid_prefetch_async``; chunks not
prefetched fill lazily through the read-through path.
"""

import threading
from typing import Iterable, Iterator, List, Optional, Tuple

from lmcache_tpu import kv
from lmcache_tpu.config import LMCacheEngineConfig, LMCacheEngineMetadata
from lmcache_tpu.logging_utils import init_logger
from lmcache_tpu.storage.abstract_backend import LMCBackendInterface
from lmcache_tpu.storage.remote_backend import LMCRemoteBackend
from lmcache_tpu.utils import CacheEngineKey, _lmcache_trace_annotate

logger = init_logger(__name__)


class LMCHybridBackend(LMCBackendInterface):

    def __init__(self, local: LMCBackendInterface, remote: LMCRemoteBackend,
                 metadata: LMCacheEngineMetadata,
                 config: Optional[LMCacheEngineConfig] = None):
        self.local = local
        self.remote = remote
        self.metadata = metadata
        self._prefetch_chunks = (config.hybrid_prefetch_chunks
                                 if config is not None else 1024)
        self._prefetch_bytes = (config.hybrid_prefetch_bytes
                                if config is not None else None)
        cap = (config.local_capacity_bytes if config is not None else None)
        if cap is not None:
            self._prefetch_bytes = min(self._prefetch_bytes or cap, cap)
        self._prefetch_thread: Optional[threading.Thread] = None
        if config is not None and config.hybrid_prefetch_async:
            self._prefetch_thread = threading.Thread(
                target=self._prefetch, args=(metadata,),
                name="lmc-hybrid-prefetch", daemon=True)
            self._prefetch_thread.start()
        else:
            self._prefetch(metadata)

    def wait_prefetch(self) -> None:
        """Join an async startup prefetch (no-op when synchronous)."""
        if self._prefetch_thread is not None:
            self._prefetch_thread.join()
            self._prefetch_thread = None

    def _prefetch(self, metadata: LMCacheEngineMetadata) -> None:
        """Warm the local tier with compatible chunks already on the
        remote store, newest first, within the configured budget
        (reference hybrid_backend.py:39-62 — unbounded there)."""
        if self._prefetch_chunks == 0:
            return
        keys = self.remote.list()
        matched = [
            key for key in keys
            if key.model_name == metadata.model_name
            and key.worker_id == metadata.worker_id
            and key.world_size == metadata.world_size
        ]
        if not matched:
            return
        total = len(matched)
        # the server lists keys in insertion order; fetch newest-first so
        # both budgets spend themselves on the most recently stored
        # chunks — the best reuse candidates
        matched = matched[::-1]
        if self._prefetch_chunks is not None:
            matched = matched[:self._prefetch_chunks]
        logger.info("Prefetching %d/%d chunks from the remote store",
                    len(matched), total)
        budget = self._prefetch_bytes
        fetched_bytes = 0
        for key, blob in zip(matched, self.remote.batched_get(matched)):
            if blob is None:
                continue
            # remote batched_get may yield undecoded host chunks;
            # the local tier stores real arrays
            blob = kv.ensure_blob(blob, self.metadata.fmt)
            self.local.put(key, blob, blocking=True)
            # numpy and jax arrays both expose nbytes without a copy
            fetched_bytes += getattr(blob, "nbytes", 0)
            if budget is not None and fetched_bytes >= budget:
                logger.info(
                    "Prefetch byte budget reached (%d bytes); remaining "
                    "chunks fill lazily on first use", fetched_bytes)
                break

    def contains(self, key: CacheEngineKey) -> bool:
        return self.local.contains(key) or self.remote.contains(key)

    def batched_contains(self, keys) -> List[bool]:
        key_list = list(keys)
        out = self.local.batched_contains(key_list)
        miss_idx = [i for i, hit in enumerate(out) if not hit]
        if miss_idx:
            remote_hits = self.remote.batched_contains(
                [key_list[i] for i in miss_idx])
            for i, hit in zip(miss_idx, remote_hits):
                out[i] = hit
        return out

    @_lmcache_trace_annotate
    def put(self, key: CacheEngineKey, blob, blocking: bool = True) -> None:
        # write-through: local synchronously (it is the serving tier),
        # remote asynchronously unless the caller demands durability.
        self.local.put(key, blob, blocking=True)
        self.remote.put(key, blob, blocking=blocking)

    def batched_put(self, keys_and_blobs, blocking: bool = True) -> int:
        # write-through with the remote side batched (one serde batch
        # for all chunks — see LMCRemoteBackend.batched_put)
        pairs = list(keys_and_blobs)
        for key, blob in pairs:
            self.local.put(key, blob, blocking=True)
        self.remote.batched_put(pairs, blocking=blocking)
        return len(pairs)

    @_lmcache_trace_annotate
    def get(self, key: CacheEngineKey):
        blob = self.local.get(key)
        if blob is not None:
            return blob
        blob = self.remote.get(key)
        if blob is not None:
            self.local.put(key, blob, blocking=False)  # read-through fill
        return blob

    def batched_get(
        self,
        keys: Iterable[CacheEngineKey],
    ) -> Iterator[Optional[object]]:
        key_list = list(keys)
        results: List[Optional[object]] = [None] * len(key_list)
        misses: List[Tuple[int, CacheEngineKey]] = []
        for idx, key in enumerate(key_list):
            blob = self.local.get(key)
            if blob is None:
                misses.append((idx, key))
            else:
                results[idx] = blob
        if misses:
            miss_keys = [key for _, key in misses]
            for (idx, key), blob in zip(misses,
                                        self.remote.batched_get(miss_keys)):
                if blob is not None:
                    blob = kv.ensure_blob(blob, self.metadata.fmt)
                    results[idx] = blob
                    self.local.put(key, blob, blocking=False)
        yield from results

    def flush(self) -> None:
        self.wait_prefetch()
        self.local.flush()
        self.remote.flush()

    def close(self) -> None:
        self.wait_prefetch()
        self.local.close()
        self.remote.close()
