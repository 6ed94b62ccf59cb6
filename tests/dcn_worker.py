"""Worker process for the two-process jax.distributed DCN test
(tests/test_distributed_dcn.py). Each process is one 'host' of a
world_size=2 deployment: it initializes the jax coordination service
(the DCN-style control plane), computes the SAME model KV locally,
stores its OWN TP head-shard to the shared cache server under its
worker_id namespace, then retrieves the PEER's shard over the wire and
verifies it equals the locally-computed slice — cross-host KV sharing
through one cache server.

Usage: python dcn_worker.py <coordinator_port> <server_url> <pid> <dir>
"""

import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    coord_port, server_url, pid, workdir = sys.argv[1:5]
    pid = int(pid)

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{coord_port}",
        num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()

    import jax.numpy as jnp

    from lmcache_tpu.cache_engine import LMCacheEngine
    from lmcache_tpu.config import (LMCacheEngineConfig,
                                    LMCacheEngineMetadata)
    from lmcache_tpu.models import llama
    from lmcache_tpu.parallel import shard_blob_slice

    # identical weights + prompt on both hosts (deterministic init)
    cfg = llama.LlamaConfig.tiny(n_layers=2)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    T = 48
    tokens = (np.arange(1, T + 1, dtype=np.int32) * 7) % cfg.vocab_size
    cache = llama.new_kv_cache(cfg, 1, T)
    _, cache = llama.forward(params, cfg, jnp.asarray(tokens)[None],
                             jnp.zeros(1, jnp.int32), cache,
                             use_pallas=False)
    blob = np.asarray(llama.cache_to_blob(cache)).astype(np.float32)

    def engine_for(worker_id):
        return LMCacheEngine(
            LMCacheEngineConfig.from_defaults(local_device=None,
                                              remote_url=server_url,
                                              chunk_size=16),
            LMCacheEngineMetadata(model_name="dcn", world_size=2,
                                  worker_id=worker_id, fmt="vllm",
                                  dtype="float32"))

    mine = engine_for(pid)
    mine.store(tokens, shard_blob_slice(blob, "vllm", pid, 2),
               blocking=True)
    mine.close()

    # file barrier: both shards durable on the server before cross-reads
    open(os.path.join(workdir, f"done{pid}"), "w").close()
    deadline = time.time() + 60
    peer = 1 - pid
    while not os.path.exists(os.path.join(workdir, f"done{peer}")):
        if time.time() > deadline:
            raise TimeoutError("peer never stored its shard")
        time.sleep(0.05)

    theirs = engine_for(peer)
    out, mask = theirs.retrieve(tokens, return_tuple=False)
    theirs.close()
    assert mask.all()
    np.testing.assert_array_equal(
        np.asarray(out), shard_blob_slice(blob, "vllm", peer, 2))
    print(f"DCN WORKER {pid} OK")


if __name__ == "__main__":
    main()
