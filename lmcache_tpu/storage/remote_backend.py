"""Remote storage backend (+ pipelined variant).

Capability parity with reference
lmcache/storage_backend/remote_backend.py:24-275: serde + connector
composition, a client-side cache of the remote key set, async puts, and a
two-stage fetch pipeline that overlaps network transfer with deserialization
(which for the cachegen serde is where entropy-decode happens).

Fixes vs the reference:
- pipelined ``batched_get`` places results by index instead of append-in-
  completion-order (reference bug noted in SURVEY.md §5).
- background put failures are logged with the key instead of silently
  dying with the worker thread.
"""

import queue
import threading
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Iterable, Iterator, List, Optional, Tuple

from lmcache_tpu.config import LMCacheEngineConfig, LMCacheEngineMetadata
from lmcache_tpu.logging_utils import init_logger
from lmcache_tpu.storage.abstract_backend import LMCBackendInterface
from lmcache_tpu.storage.connector import CreateConnector
from lmcache_tpu.storage.serde import CreateSerde
from lmcache_tpu.utils import CacheEngineKey, _lmcache_trace_annotate

logger = init_logger(__name__)


class LMCRemoteBackend(LMCBackendInterface):

    def __init__(self, config: LMCacheEngineConfig,
                 metadata: LMCacheEngineMetadata):
        self.config = config
        self.metadata = metadata
        self.connection = CreateConnector(config.remote_url)
        serde_type = config.remote_serde or "raw"
        self.serializer, self.deserializer = CreateSerde(
            serde_type, config, metadata)
        self.existing_keys = set()
        self.lock = threading.Lock()
        self._executor = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="lmc-remote-put")
        self._pending: List[Future] = []
        self._closed = False
        # warm the key index from the remote store (restart recovery)
        for key in self.list():
            self.existing_keys.add(key)

    def list(self) -> List[CacheEngineKey]:
        keys = []
        for key_str in self.connection.list():
            try:
                keys.append(CacheEngineKey.from_string(key_str))
            except ValueError:
                logger.warning("Ignoring malformed remote key %r", key_str)
        return keys

    def contains(self, key: CacheEngineKey) -> bool:
        with self.lock:
            if key in self.existing_keys:
                return True
        if self.connection.exists(key.to_string()):
            with self.lock:
                self.existing_keys.add(key)
            return True
        return False

    @_lmcache_trace_annotate
    def put(self, key: CacheEngineKey, blob, blocking: bool = True) -> None:
        if blocking:
            self._put_blocking(key, blob)
        else:
            self._pending = [f for f in self._pending if not f.done()]
            self._pending.append(
                self._executor.submit(self._put_safe, key, blob))

    def _put_safe(self, key: CacheEngineKey, blob) -> None:
        try:
            self._put_blocking(key, blob)
        except Exception:
            logger.exception("Background remote put failed for %s",
                             key.to_string())

    def _put_blocking(self, key: CacheEngineKey, blob) -> None:
        bs = self.serializer.to_bytes(blob)
        self.connection.set(key.to_string(), bs)
        with self.lock:
            self.existing_keys.add(key)

    @_lmcache_trace_annotate
    def get(self, key: CacheEngineKey):
        bs = self.connection.get(key.to_string())
        if bs is None or len(bs) == 0:
            return None
        return self.deserializer.from_bytes(bs)

    def flush(self) -> None:
        for f in list(self._pending):
            f.result()
        self._pending.clear()

    def close(self) -> None:
        if self._closed:
            return
        self._closed = True
        self.flush()
        self._executor.shutdown(wait=True)
        self.connection.close()


class LMCPipelinedRemoteBackend(LMCRemoteBackend):
    """Overlaps network fetch with deserialization for batched gets.

    Stage 1 (network thread) streams raw bytes per key in order; stage 2
    (deserialize thread) decodes them. For the cachegen serde stage 2 is the
    entropy decode + dequant, so a chunk is decompressing while the next one
    is on the wire (reference: remote_backend.py:183-275).
    """

    _SENTINEL = object()

    def __init__(self, config: LMCacheEngineConfig,
                 metadata: LMCacheEngineMetadata):
        super().__init__(config, metadata)

    def batched_get(
        self,
        keys: Iterable[CacheEngineKey],
    ) -> Iterator[Optional[object]]:
        key_list = list(keys)
        results: List[Optional[object]] = [None] * len(key_list)
        bytes_q: "queue.Queue" = queue.Queue(maxsize=8)

        def network_worker():
            try:
                for idx, key in enumerate(key_list):
                    if not self.contains(key):
                        bytes_q.put((idx, None))
                        continue
                    bs = self.connection.get(key.to_string())
                    bytes_q.put((idx, bs if bs else None))
            finally:
                bytes_q.put(self._SENTINEL)

        t = threading.Thread(target=network_worker, daemon=True)
        t.start()
        while True:
            item = bytes_q.get()
            if item is self._SENTINEL:
                break
            idx, bs = item
            if bs is not None:
                results[idx] = self.deserializer.from_bytes(bs)
        t.join()
        yield from results
