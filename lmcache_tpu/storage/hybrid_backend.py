"""Hybrid (local + remote) backend.

Capability parity with reference
lmcache/storage_backend/hybrid_backend.py:26-116: write-through puts,
read-through gets that fill the local tier, a startup prefetch that warms
the local tier with every compatible remote chunk, and a batched_get that
only queries the remote store for local misses.
"""

from typing import Iterable, Iterator, List, Optional, Tuple

from lmcache_tpu.config import LMCacheEngineConfig, LMCacheEngineMetadata
from lmcache_tpu.logging_utils import init_logger
from lmcache_tpu.storage.abstract_backend import LMCBackendInterface
from lmcache_tpu.storage.remote_backend import LMCRemoteBackend
from lmcache_tpu.utils import CacheEngineKey, _lmcache_trace_annotate

logger = init_logger(__name__)


class LMCHybridBackend(LMCBackendInterface):

    def __init__(self, local: LMCBackendInterface, remote: LMCRemoteBackend,
                 metadata: LMCacheEngineMetadata):
        self.local = local
        self.remote = remote
        self.metadata = metadata
        self._prefetch(metadata)

    def _prefetch(self, metadata: LMCacheEngineMetadata) -> None:
        """Warm the local tier with every compatible chunk already on the
        remote store (reference: hybrid_backend.py:39-62)."""
        keys = self.remote.list()
        matched = [
            key for key in keys
            if key.model_name == metadata.model_name
            and key.worker_id == metadata.worker_id
            and key.world_size == metadata.world_size
        ]
        if not matched:
            return
        logger.info("Prefetching %d chunks from the remote store",
                    len(matched))
        for key, blob in zip(matched, self.remote.batched_get(matched)):
            if blob is not None:
                self.local.put(key, blob, blocking=True)

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
                    results[idx] = blob
                    self.local.put(key, blob, blocking=False)
        yield from results

    def flush(self) -> None:
        self.local.flush()
        self.remote.flush()

    def close(self) -> None:
        self.local.close()
        self.remote.close()
