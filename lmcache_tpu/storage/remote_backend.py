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
import time
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Iterable, Iterator, List, Optional, Tuple

from lmcache_tpu import metrics
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
        # host-phase deserializers (cachegen) let batched_get yield
        # undecoded host chunks: the consumer batches entropy-decode +
        # dequant of MANY chunks into one accelerator program instead
        # of ~10 device dispatches per chunk (kv.ensure_blob
        # materializes them for callers that need plain arrays)
        self._host_phase = hasattr(self.deserializer, "from_bytes_host")
        self.existing_keys = set()
        self.lock = threading.Lock()
        self._executor = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="lmc-remote-put")
        self._pending: List[Future] = []
        self._pending_lock = threading.Lock()
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

    def batched_contains(self, keys) -> List[bool]:
        """All keys in ONE metadata round trip: client key-cache hits are
        answered locally, the rest ride a single MEXIST frame (vs one
        33 ms-class EXIST RTT per chunk — reference flaw,
        remote_backend.py:98-117)."""
        key_list = list(keys)
        out = [False] * len(key_list)
        ask, ask_idx = [], []
        with self.lock:
            for i, key in enumerate(key_list):
                if key in self.existing_keys:
                    out[i] = True
                else:
                    ask.append(key)
                    ask_idx.append(i)
        if ask:
            hits = self.connection.batched_exists(
                [k.to_string() for k in ask])
            with self.lock:
                for key, i, hit in zip(ask, ask_idx, hits):
                    if hit:
                        out[i] = True
                        self.existing_keys.add(key)
        return out

    @_lmcache_trace_annotate
    def put(self, key: CacheEngineKey, blob, blocking: bool = True) -> None:
        if blocking:
            self._put_blocking(key, blob)
        else:
            with self._pending_lock:
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
        t0 = time.perf_counter()
        bs = self.serializer.to_bytes(blob)
        self._send(key, bs)
        metrics.observe("lmcache_tier_put_seconds",
                        time.perf_counter() - t0, labels={"tier": "remote"})

    def _send(self, key: CacheEngineKey, bs: bytes) -> None:
        self.connection.set(key.to_string(), bs)
        with self.lock:
            self.existing_keys.add(key)

    def batched_put(self, keys_and_blobs, blocking: bool = True) -> int:
        """Serialize a whole store in ONE batch when the serde supports
        it (cachegen ``to_bytes_batch``: one device program + one
        parallel coder pass for all same-shape chunks, instead of ~5
        dispatches and 3 device->host fetches per chunk), then send.
        """
        pairs = list(keys_and_blobs)
        if len(pairs) > 1 and hasattr(self.serializer, "to_bytes_batch"):

            def job():
                t0 = time.perf_counter()
                bss = self.serializer.to_bytes_batch(
                    [b for _, b in pairs])
                for (key, _), bs in zip(pairs, bss):
                    self._send(key, bs)
                metrics.observe("lmcache_tier_put_seconds",
                                time.perf_counter() - t0,
                                labels={"tier": "remote"})

            if blocking:
                job()
            else:
                # the whole serialize+send batch runs on the put
                # worker — a serving loop calling store(blocking=False)
                # must not pay encode time in its step
                def job_safe():
                    try:
                        job()
                    except Exception:
                        logger.exception("Background batched put failed")

                with self._pending_lock:
                    self._pending = [f for f in self._pending
                                     if not f.done()]
                    self._pending.append(self._executor.submit(job_safe))
            return len(pairs)
        return super().batched_put(pairs, blocking=blocking)


    @_lmcache_trace_annotate
    def get(self, key: CacheEngineKey):
        t0 = time.perf_counter()
        bs = self.connection.get(key.to_string())
        if bs is None or len(bs) == 0:
            return None
        blob = self.deserializer.from_bytes(bs)
        metrics.observe("lmcache_tier_get_seconds",
                        time.perf_counter() - t0, labels={"tier": "remote"})
        return blob

    def _deserialize(self, bs):
        """Decode for the batched paths: a host chunk when the serde
        supports the host phase (decode/dequant batched downstream), a
        plain blob otherwise."""
        if self._host_phase:
            return self.deserializer.from_bytes_host(bs)
        return self.deserializer.from_bytes(bs)

    def batched_get(
        self,
        keys: Iterable[CacheEngineKey],
    ) -> Iterator[Optional[object]]:
        """One MEXIST round trip, then fetch+decode the hit prefix.

        Yields host chunks when the serde has a host phase (see
        ``_deserialize``); the abstract default would pay one EXIST
        round trip per key and decode chunk-by-chunk."""
        key_list = list(keys)
        hits = self.batched_contains(key_list)
        for key, hit in zip(key_list, hits):
            if not hit:
                yield None
                continue
            bs = self.connection.get(key.to_string())
            yield self._deserialize(bs) if bs else None

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
        self.connection.close()


class LMCPipelinedRemoteBackend(LMCRemoteBackend):
    """Streaming three-stage retrieval pipeline.

    Stage 1 (network thread) fetches raw bytes for the *hit prefix only*
    (one MEXIST round trip decides it — no fetches past the first miss);
    stage 2 (deserialize thread) decodes them — for the cachegen serde
    that is the entropy decode + dequant; stage 3 is the consumer, which
    receives chunk ``i`` the moment it is decoded, while chunk ``i+1``
    decodes and chunk ``i+2`` is on the wire. First-chunk availability is
    therefore ≈ one-chunk RTT, not whole-batch latency, and the caller
    can overlap device upload / prefill with the rest of the stream.

    Matches-and-beats reference remote_backend.py:183-275, whose queue
    pipeline still fetched every key regardless of misses; breaking out
    of this generator cancels the remaining fetches.
    """

    _SENTINEL = object()
    PREFETCH_DEPTH = 4  # bounded buffering between stages

    def __init__(self, config: LMCacheEngineConfig,
                 metadata: LMCacheEngineMetadata):
        super().__init__(config, metadata)

    def batched_get(
        self,
        keys: Iterable[CacheEngineKey],
    ) -> Iterator[Optional[object]]:
        key_list = list(keys)
        if not key_list:
            return
        # hit-prefix length in ONE metadata round trip; the retrieval
        # contract is longest-contiguous-prefix, so nothing past the
        # first miss is ever fetched
        hits = self.batched_contains(key_list)
        n_fetch = 0
        for hit in hits:
            if not hit:
                break
            n_fetch += 1

        stop = threading.Event()
        bytes_q: "queue.Queue" = queue.Queue(maxsize=self.PREFETCH_DEPTH)
        blob_q: "queue.Queue" = queue.Queue(maxsize=2)

        def network_worker():
            try:
                for idx in range(n_fetch):
                    if stop.is_set():
                        break
                    bs = self.connection.get(key_list[idx].to_string())
                    bytes_q.put((idx, bs if bs else None))
            finally:
                bytes_q.put(self._SENTINEL)

        def deserialize_worker():
            try:
                while not stop.is_set():
                    item = bytes_q.get()
                    if item is self._SENTINEL:
                        break
                    idx, bs = item
                    blob = (self._deserialize(bs)
                            if bs is not None else None)
                    blob_q.put(blob)
            finally:
                blob_q.put(self._SENTINEL)

        t_net = threading.Thread(target=network_worker, daemon=True)
        t_de = threading.Thread(target=deserialize_worker, daemon=True)
        t_net.start()
        t_de.start()
        try:
            served = 0
            while served < n_fetch:
                blob = blob_q.get()
                if blob is self._SENTINEL or blob is None:
                    break  # evicted between MEXIST and GET
                yield blob
                served += 1
            for _ in range(served, len(key_list)):
                yield None
        finally:
            # cancel in-flight stages (the consumer may have broken out
            # early); drain both queues so neither worker deadlocks on a
            # full put, and re-inject a sentinel in case the drain stole
            # the one the deserialize worker is blocked waiting for
            stop.set()

            def _drain(q):
                try:
                    while True:
                        q.get_nowait()
                except queue.Empty:
                    pass

            _drain(blob_q)
            _drain(bytes_q)
            bytes_q.put(self._SENTINEL)
            t_net.join(timeout=30)
            t_de.join(timeout=30)
