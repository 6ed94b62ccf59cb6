"""Serving engine over a real (virtual 8-device) mesh: TP-sharded
params + KV pool, batched decode with XLA collectives."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from lmcache_tpu.models import llama  # noqa: E402
from lmcache_tpu.parallel import MeshConfig, make_mesh, shard_params  # noqa: E402
from lmcache_tpu.serving import SamplingParams, ServingEngine  # noqa: E402


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 devices")
def test_generate_on_mesh():
    mesh = make_mesh(MeshConfig(data=1, model=4))
    # 8 heads / 4 kv heads so the head axes split across 4 model shards
    cfg = llama.LlamaConfig.tiny(n_layers=2, n_heads=8, n_kv_heads=4,
                                 dim=512, hidden_dim=512)
    params = shard_params(
        llama.init_params(jax.random.PRNGKey(7), cfg), mesh)

    prompt = np.random.default_rng(0).integers(0, cfg.vocab_size, 21,
                                               dtype=np.int32)
    # unsharded single-device golden
    golden_eng = ServingEngine(cfg,
                               llama.init_params(jax.random.PRNGKey(7),
                                                 cfg), max_batch=2,
                               max_seq=128, use_pallas=False)
    [golden] = golden_eng.generate([prompt],
                                   SamplingParams(max_new_tokens=6))

    eng = ServingEngine(cfg, params, max_batch=2, max_seq=128,
                        use_pallas=False, mesh=mesh)
    [req] = eng.generate([prompt], SamplingParams(max_new_tokens=6))
    assert req.output_tokens == golden.output_tokens


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 devices")
def test_paged_generate_on_mesh():
    """Paged engine with the arena's kv heads sharded over "model"."""
    from lmcache_tpu.serving.paged_engine import PagedServingEngine

    mesh = make_mesh(MeshConfig(data=1, model=4))
    cfg = llama.LlamaConfig.tiny(n_layers=2, n_heads=8, n_kv_heads=4,
                                 dim=512, hidden_dim=512)
    params = shard_params(
        llama.init_params(jax.random.PRNGKey(7), cfg), mesh)

    prompt = np.random.default_rng(1).integers(0, cfg.vocab_size, 21,
                                               dtype=np.int32)
    golden_eng = ServingEngine(cfg,
                               llama.init_params(jax.random.PRNGKey(7),
                                                 cfg), max_batch=2,
                               max_seq=128, use_pallas=False)
    [golden] = golden_eng.generate([prompt],
                                   SamplingParams(max_new_tokens=6))

    eng = PagedServingEngine(cfg, params, max_batch=2, max_seq=128,
                             num_pages=16, page_size=16, use_pallas=False,
                             mesh=mesh)
    assert len(eng.kv_pool.sharding.device_set) == 4
    [req] = eng.generate([prompt], SamplingParams(max_new_tokens=6))
    assert req.output_tokens == golden.output_tokens
