"""Configuration for the lmcache-tpu engine.

Capability parity with the reference config system (reference:
lmcache/config.py:8-139): an immutable *engine config* (how to cache) kept
deliberately separate from the *engine metadata* (identity of the serving
deployment: model, sharding, kv layout), three constructors
(defaults / legacy string / YAML file), and a process-global debug switch.

TPU-native differences:
- ``local_device`` accepts ``"tpu"`` (KV chunks pinned in HBM as committed
  ``jax.Array``s) and ``"cpu"`` (host DRAM as numpy), or a ``file://`` path
  for the local disk tier.
- metadata carries the KV *sharding identity* (mesh axis name + shard count +
  shard index) instead of only a flat worker id, so caches are addressable
  per head-shard on a ``jax.sharding.Mesh``. ``world_size``/``worker_id``
  remain as the flat view for cross-deployment compatibility.
"""

import re
from dataclasses import dataclass, field
from typing import Optional

import yaml

_URL_RE = re.compile(r"(.*)://(.*):(\d+)")
_FILE_RE = re.compile(r"file://(.*)")


@dataclass(frozen=True)
class LMCacheEngineMetadata:
    """Identity of the serving deployment this cache belongs to.

    KV chunks are only shareable between deployments with identical metadata
    (same model, same sharding, same kv layout) — the metadata fields are
    baked into every cache key.
    """

    model_name: str
    world_size: int
    worker_id: int
    fmt: str  # "vllm" ([L,2,T,H,D]) or "huggingface" ([L,2,H,T,D])
    dtype: str = "bf16"
    # TPU sharding identity: which mesh axis the KV heads are sharded over.
    kv_shard_axis: str = "model"

    def __post_init__(self):
        if self.fmt not in ("vllm", "huggingface"):
            raise ValueError(f"Invalid KV format: {self.fmt}")


@dataclass(frozen=True)
class LMCacheEngineConfig:
    chunk_size: int = 256
    local_device: Optional[str] = "tpu"  # "tpu" | "cpu" | disk path | None
    remote_url: Optional[str] = None  # "<proto>://host:port"
    remote_serde: Optional[str] = "raw"  # raw | safetensors | cachegen
    pipelined_backend: bool = False
    save_decode_cache: bool = False
    # Max bytes held by the in-memory local tier before LRU eviction
    # (None = unbounded, matching reference behavior).
    local_capacity_bytes: Optional[int] = None
    # CacheBlend: fraction of tokens to re-compute when blending non-prefix
    # chunks (see lmcache_tpu/blend.py).
    blend_recompute_ratio: float = 0.15
    # Hybrid startup prefetch budget. The reference pulls EVERY matching
    # remote chunk into the local tier at construction (reference
    # hybrid_backend.py:39-62) — against a production-sized shared store
    # that turns startup into a full-keyspace transfer the local LRU then
    # throws away. Here the prefetch takes at most this many chunks
    # (most-recently-stored first; None = unbounded, 0 = disabled) and at
    # most ``hybrid_prefetch_bytes`` bytes; everything else fills lazily
    # through the read-through path on first use.
    hybrid_prefetch_chunks: Optional[int] = 1024
    hybrid_prefetch_bytes: Optional[int] = None
    # Run the startup prefetch on a background thread (construction
    # returns immediately; reads fall back to the remote tier until the
    # warm-up lands). Call ``backend.wait_prefetch()`` to join it.
    hybrid_prefetch_async: bool = False
    # Where CacheGen containers entropy-decode on retrieval:
    #   "auto" — on the accelerator when it is a TPU (only the coded
    #            payload crosses host->device), else host C++;
    #   "on" / "off" — force device / host decode.
    # Exactness is identical either way (ops/range_decode.py is
    # bit-exact with the C++ coder and falls back on its overflow
    # guard).
    cachegen_device_decode: str = "auto"
    # Where CacheGen containers entropy-ENCODE on store (the mirror
    # knob): "auto" runs the Pallas range encoder on TPU so only coded
    # bits (~2-4 bits/value) cross device->host instead of 8-bit
    # symbols; "on"/"off" force device/host. Byte-identical containers
    # either way (ops/range_encode.py; stride or renormalization
    # overflow falls back to the C++ coder).
    cachegen_device_encode: str = "auto"

    @staticmethod
    def from_defaults(**kwargs) -> "LMCacheEngineConfig":
        return LMCacheEngineConfig(**kwargs)

    @staticmethod
    def from_legacy(
        chunk_size: int = 256,
        backend: str = "tpu",
        remote_serde: Optional[str] = "raw",
        pipelined_backend: bool = False,
        save_decode_cache: bool = False,
    ) -> "LMCacheEngineConfig":
        """Single-string backend spec: device name, file:// path, or URL."""
        local_device: Optional[str] = None
        remote_url: Optional[str] = None
        if backend in ("cpu", "tpu"):
            local_device = backend
        elif _FILE_RE.match(backend):
            local_device = backend[len("file://"):]
        elif _URL_RE.match(backend):
            remote_url = backend
        else:
            raise ValueError(f"Invalid backend spec: {backend}")
        return LMCacheEngineConfig(
            chunk_size=chunk_size,
            local_device=local_device,
            remote_url=remote_url,
            remote_serde=remote_serde,
            pipelined_backend=pipelined_backend,
            save_decode_cache=save_decode_cache,
        )

    @staticmethod
    def from_file(file_path: str) -> "LMCacheEngineConfig":
        """Load the config from a YAML file (same schema as the reference's
        example configs, reference: examples/storage_backends/README.md)."""
        with open(file_path, "r") as fin:
            raw = yaml.safe_load(fin) or {}

        local_device = raw.get("local_device", None)
        if local_device is not None:
            if local_device in ("cpu", "tpu", "cuda"):
                # accept "cuda" in legacy configs and map it to the
                # accelerator tier
                if local_device == "cuda":
                    local_device = "tpu"
            elif _FILE_RE.match(local_device):
                local_device = local_device[len("file://"):]
            else:
                raise ValueError(
                    f"Invalid local storage device: {local_device}")

        remote_url = raw.get("remote_url", None)
        if remote_url is not None and not _URL_RE.match(remote_url):
            raise ValueError(f"Invalid remote storage url: {remote_url}")

        return LMCacheEngineConfig(
            chunk_size=raw.get("chunk_size", 256),
            local_device=local_device,
            remote_url=remote_url,
            remote_serde=raw.get("remote_serde", "raw"),
            pipelined_backend=raw.get("pipelined_backend", False),
            save_decode_cache=raw.get("save_decode_cache", False),
            local_capacity_bytes=raw.get("local_capacity_bytes", None),
            blend_recompute_ratio=raw.get("blend_recompute_ratio", 0.15),
            hybrid_prefetch_chunks=raw.get("hybrid_prefetch_chunks", 1024),
            hybrid_prefetch_bytes=raw.get("hybrid_prefetch_bytes", None),
            hybrid_prefetch_async=raw.get("hybrid_prefetch_async", False),
            cachegen_device_decode=raw.get("cachegen_device_decode",
                                           "auto"),
            cachegen_device_encode=raw.get("cachegen_device_encode",
                                           "auto"),
        )


class GlobalConfig:
    """Process-global switches (reference: lmcache/config.py:130-139)."""

    enable_debug: bool = False

    @classmethod
    def set_debug(cls, enable: bool) -> None:
        cls.enable_debug = enable

    @classmethod
    def is_debug(cls) -> bool:
        return cls.enable_debug
