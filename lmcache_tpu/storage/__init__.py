"""Storage backend factory.

Capability parity with reference lmcache/storage_backend/__init__.py:13-44:
config pattern-match -> local / remote / hybrid backend.
"""

from lmcache_tpu.config import LMCacheEngineConfig, LMCacheEngineMetadata
from lmcache_tpu.logging_utils import init_logger
from lmcache_tpu.storage.abstract_backend import LMCBackendInterface
from lmcache_tpu.storage.hybrid_backend import LMCHybridBackend
from lmcache_tpu.storage.local_backend import (LMCLocalBackend,
                                               LMCLocalDiskBackend)
from lmcache_tpu.storage.remote_backend import (LMCPipelinedRemoteBackend,
                                                LMCRemoteBackend)

logger = init_logger(__name__)

__all__ = [
    "LMCBackendInterface",
    "CreateStorageBackend",
]


def _create_local(config: LMCacheEngineConfig) -> LMCBackendInterface:
    device = config.local_device
    if device in ("tpu", "cpu"):
        return LMCLocalBackend(device,
                               capacity_bytes=config.local_capacity_bytes)
    return LMCLocalDiskBackend(device)


def CreateStorageBackend(
    config: LMCacheEngineConfig,
    metadata: LMCacheEngineMetadata,
) -> LMCBackendInterface:
    match (config.local_device, config.remote_url):
        case (None, None):
            raise ValueError(
                "Invalid configuration: need at least one of local_device "
                "and remote_url")
        case (_, None):
            logger.info("Creating local-only backend on %s",
                        config.local_device)
            return _create_local(config)
        case (None, _):
            cls = (LMCPipelinedRemoteBackend
                   if config.pipelined_backend else LMCRemoteBackend)
            logger.info("Creating %s for %s", cls.__name__, config.remote_url)
            return cls(config, metadata)
        case (_, _):
            cls = (LMCPipelinedRemoteBackend
                   if config.pipelined_backend else LMCRemoteBackend)
            logger.info("Creating hybrid backend: local %s + %s",
                        config.local_device, config.remote_url)
            return LMCHybridBackend(_create_local(config),
                                    cls(config, metadata), metadata,
                                    config=config)
