"""Serving engine over a real (virtual 8-device) mesh: TP-sharded
params + KV pool, batched decode with XLA collectives."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from lmcache_tpu.models import llama  # noqa: E402
from lmcache_tpu.parallel import (MeshConfig, make_mesh,  # noqa: E402
                                  shard_params)
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


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs >= 8 devices")
def test_paged_pallas_shard_map_parity():
    """The pallas paged kernels run under shard_map with the arena's kv
    heads on "model" (models/paged._shard_paged_attend): the sharded
    arena is consumed in place — no GSPMD gather — and the result
    matches the unsharded reference path."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from lmcache_tpu.models.paged import forward_paged, new_paged_kv_pool

    mesh = make_mesh(MeshConfig(data=2, model=4))
    cfg = llama.LlamaConfig.tiny(n_layers=2, n_heads=8, n_kv_heads=4,
                                 dim=512, hidden_dim=512)  # head_dim 64
    params = llama.init_params(jax.random.PRNGKey(3), cfg)
    sparams = shard_params(params, mesh)

    B, T, page, num_pages = 4, 16, 16, 32
    pool = new_paged_kv_pool(cfg, num_pages, page)
    pool_sh = jax.device_put(
        pool, NamedSharding(mesh, P(None, None, None, "model", None, None)))
    table = np.zeros((B, 8), np.int32)
    for b in range(B):
        table[b, 0] = 1 + b  # one live page per sequence
    tokens = np.random.default_rng(5).integers(
        0, cfg.vocab_size, (B, T), dtype=np.int32)
    start = jnp.zeros((B,), jnp.int32)

    ref_logits, ref_pool = forward_paged(
        params, cfg, jnp.asarray(tokens), start, pool, jnp.asarray(table),
        use_pallas=False)
    sh_logits, sh_pool = forward_paged(
        sparams, cfg, jnp.asarray(tokens), start, pool_sh,
        jnp.asarray(table), use_pallas=True, mesh=mesh)
    np.testing.assert_allclose(np.asarray(sh_logits),
                               np.asarray(ref_logits), atol=2e-3,
                               rtol=2e-3)
    np.testing.assert_allclose(np.asarray(sh_pool), np.asarray(ref_pool),
                               atol=2e-3, rtol=2e-3)
    # the arena's head sharding survived the step (it was not gathered)
    assert "model" in str(sh_pool.sharding.spec)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 devices")
def test_paged_pallas_shard_map_parity_int8():
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from lmcache_tpu.models.paged import (forward_paged_quantized,
                                          new_quantized_paged_pool)

    mesh = make_mesh(MeshConfig(data=1, model=4))
    cfg = llama.LlamaConfig.tiny(n_layers=2, n_heads=8, n_kv_heads=4,
                                 dim=512, hidden_dim=512)
    params = llama.init_params(jax.random.PRNGKey(3), cfg)
    sparams = shard_params(params, mesh)

    B, T, page, num_pages = 2, 16, 16, 16
    pool = new_quantized_paged_pool(cfg, num_pages, page)
    pool_sh = {
        "sym": jax.device_put(
            pool["sym"],
            NamedSharding(mesh, P(None, None, None, "model", None, None))),
        "scale": jax.device_put(pool["scale"], NamedSharding(mesh, P())),
    }
    table = np.zeros((B, 8), np.int32)
    for b in range(B):
        table[b, 0] = 1 + b
    tokens = np.random.default_rng(6).integers(
        0, cfg.vocab_size, (B, T), dtype=np.int32)
    start = jnp.zeros((B,), jnp.int32)

    ref_logits, _ = forward_paged_quantized(
        params, cfg, jnp.asarray(tokens), start, pool, jnp.asarray(table),
        use_pallas=False)
    sh_logits, _ = forward_paged_quantized(
        sparams, cfg, jnp.asarray(tokens), start, pool_sh,
        jnp.asarray(table), use_pallas=True, mesh=mesh)
    np.testing.assert_allclose(np.asarray(sh_logits),
                               np.asarray(ref_logits), atol=5e-3,
                               rtol=5e-3)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 devices")
def test_paged_generate_on_mesh_pallas():
    """End-to-end paged engine on a mesh with the pallas kernels on:
    greedy output matches the unsharded single-device golden."""
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
                             num_pages=16, page_size=16, use_pallas=True,
                             mesh=mesh)
    [req] = eng.generate([prompt], SamplingParams(max_new_tokens=6))
    assert req.output_tokens == golden.output_tokens


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 devices")
def test_moe_generate_on_mesh():
    """MoE family on a TP mesh: expert weights column/row-parallel on
    "model" (parallel/mesh.spec_for handles the [L, E, in, out] rank);
    greedy output matches the unsharded golden."""
    mesh = make_mesh(MeshConfig(data=1, model=4))
    cfg = llama.LlamaConfig.tiny(n_layers=2, n_heads=8, n_kv_heads=4,
                                 dim=512, hidden_dim=512, n_experts=4,
                                 n_experts_per_tok=2, moe_hidden_dim=256)
    params = llama.init_params(jax.random.PRNGKey(11), cfg)
    sparams = shard_params(params, mesh)
    # expert weights actually sharded
    assert "model" in str(sparams["layers"]["e_gate"].sharding.spec)
    assert "model" in str(sparams["layers"]["e_down"].sharding.spec)

    prompt = np.random.default_rng(3).integers(0, cfg.vocab_size, 19,
                                               dtype=np.int32)
    golden_eng = ServingEngine(cfg, params, max_batch=2, max_seq=128,
                               use_pallas=False)
    [golden] = golden_eng.generate([prompt],
                                   SamplingParams(max_new_tokens=5))
    eng = ServingEngine(cfg, sparams, max_batch=2, max_seq=128,
                        use_pallas=False, mesh=mesh)
    [req] = eng.generate([prompt], SamplingParams(max_new_tokens=5))
    assert req.output_tokens == golden.output_tokens


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 devices")
def test_mla_generate_on_mesh():
    """MLA on a TP mesh: q/kb/o projections and experts sharded on
    "model", the latent pool REPLICATED across it (no head axis) with
    batch on "data"; greedy output matches the unsharded golden."""
    from lmcache_tpu.models import mla
    from lmcache_tpu.serving import MLAServingEngine

    mesh = make_mesh(MeshConfig(data=1, model=4))
    cfg = mla.MLAConfig.tiny(n_layers=2, n_routed_experts=4,
                             n_shared_experts=1, n_experts_per_tok=2,
                             moe_hidden_dim=64, first_k_dense_replace=1,
                             q_lora_rank=32)
    params = mla.init_params(jax.random.PRNGKey(13), cfg)
    sparams = shard_params(params, mesh)
    assert "model" in str(sparams["moe_layers"]["w_kb_k"].sharding.spec)
    assert "model" in str(sparams["moe_layers"]["wq_b"].sharding.spec)
    assert "model" in str(sparams["moe_layers"]["s_down"].sharding.spec)
    # the latent path stays replicated
    assert "model" not in str(sparams["moe_layers"]["wkv_a"].sharding.spec)

    prompt = np.random.default_rng(5).integers(0, cfg.vocab_size, 19,
                                               dtype=np.int32)
    golden_eng = MLAServingEngine(cfg, params, max_batch=2, max_seq=128)
    [golden] = golden_eng.generate([prompt],
                                   SamplingParams(max_new_tokens=5))
    eng = MLAServingEngine(cfg, sparams, max_batch=2, max_seq=128,
                           mesh=mesh)
    assert len(eng.kv_pool.sharding.device_set) == 4
    [req] = eng.generate([prompt], SamplingParams(max_new_tokens=5))
    assert req.output_tokens == golden.output_tokens


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs >= 8 devices")
def test_dense_pallas_shard_map_parity():
    """The dense flash kernel runs under shard_map with the live pool's
    kv heads on "model" (models/llama._shard_dense_attend): the sharded
    pool is consumed in place — no GSPMD gather — and logits match the
    unsharded reference path."""
    import jax.numpy as jnp
    from lmcache_tpu.parallel import kv_cache_sharding

    mesh = make_mesh(MeshConfig(data=2, model=4))
    cfg = llama.LlamaConfig.tiny(n_layers=2, n_heads=8, n_kv_heads=4,
                                 dim=512, hidden_dim=512)
    params = llama.init_params(jax.random.PRNGKey(3), cfg)
    sparams = shard_params(params, mesh)

    B, T, S = 4, 16, 64
    pool = llama.new_kv_cache(cfg, B, S)
    pool_sh = jax.device_put(pool, kv_cache_sharding(mesh))
    tokens = np.random.default_rng(5).integers(
        0, cfg.vocab_size, (B, T), dtype=np.int32)
    start = jnp.zeros((B,), jnp.int32)

    ref_logits, ref_pool = llama.forward(
        params, cfg, jnp.asarray(tokens), start, pool, use_pallas=False)
    sh_logits, sh_pool = llama.forward(
        sparams, cfg, jnp.asarray(tokens), start, pool_sh,
        use_pallas=True, mesh=mesh)
    np.testing.assert_allclose(np.asarray(sh_logits),
                               np.asarray(ref_logits), atol=2e-3,
                               rtol=2e-3)
    np.testing.assert_allclose(np.asarray(sh_pool), np.asarray(ref_pool),
                               atol=2e-3, rtol=2e-3)
    # the pool's head sharding survived the step (it was not gathered)
    assert "model" in str(sh_pool.sharding.spec)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 devices")
def test_dense_int8_pallas_shard_map_parity():
    """forward_quantized on a mesh: int8 sym pools shard on "model"
    kv heads, per-token scales are head-free (batch/"data" only)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from lmcache_tpu.parallel import kv_cache_sharding

    mesh = make_mesh(MeshConfig(data=1, model=4))
    cfg = llama.LlamaConfig.tiny(n_layers=2, n_heads=8, n_kv_heads=4,
                                 dim=512, hidden_dim=512)
    params = llama.init_params(jax.random.PRNGKey(3), cfg)
    sparams = shard_params(params, mesh)

    B, T, S = 2, 16, 64
    pool = llama.new_quantized_kv_cache(cfg, B, S)
    pool_sh = {
        "sym": jax.device_put(pool["sym"], kv_cache_sharding(mesh)),
        "scale": jax.device_put(
            pool["scale"],
            NamedSharding(mesh, P(None, None, "data", None))),
    }
    tokens = np.random.default_rng(6).integers(
        0, cfg.vocab_size, (B, T), dtype=np.int32)
    start = jnp.zeros((B,), jnp.int32)

    ref_logits, _ = llama.forward_quantized(
        params, cfg, jnp.asarray(tokens), start, pool, use_pallas=False)
    sh_logits, _ = llama.forward_quantized(
        sparams, cfg, jnp.asarray(tokens), start, pool_sh,
        use_pallas=True, mesh=mesh)
    np.testing.assert_allclose(np.asarray(sh_logits),
                               np.asarray(ref_logits), atol=5e-3,
                               rtol=5e-3)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 devices")
def test_dense_generate_on_mesh_pallas():
    """End-to-end dense engine on a mesh with the pallas kernels on:
    greedy output matches the unsharded single-device golden."""
    mesh = make_mesh(MeshConfig(data=1, model=4))
    cfg = llama.LlamaConfig.tiny(n_layers=2, n_heads=8, n_kv_heads=4,
                                 dim=512, hidden_dim=512)
    params = shard_params(
        llama.init_params(jax.random.PRNGKey(7), cfg), mesh)

    prompt = np.random.default_rng(0).integers(0, cfg.vocab_size, 21,
                                               dtype=np.int32)
    golden_eng = ServingEngine(cfg,
                               llama.init_params(jax.random.PRNGKey(7),
                                                 cfg), max_batch=2,
                               max_seq=128, use_pallas=False)
    [golden] = golden_eng.generate([prompt],
                                   SamplingParams(max_new_tokens=6))

    eng = ServingEngine(cfg, params, max_batch=2, max_seq=128,
                        use_pallas=True, mesh=mesh)
    [req] = eng.generate([prompt], SamplingParams(max_new_tokens=6))
    assert req.output_tokens == golden.output_tokens


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 devices")
def test_mla_pallas_shard_map_parity():
    """The latent MQA kernel runs under shard_map with query heads on
    "model" and the latent pool replicated (mla._shard_latent_attend);
    logits match the einsum reference path."""
    import jax.numpy as jnp
    from lmcache_tpu.models import mla

    mesh = make_mesh(MeshConfig(data=1, model=4))
    cfg = mla.MLAConfig.tiny()
    assert cfg.n_heads % 4 == 0
    params = mla.init_params(jax.random.PRNGKey(13), cfg)
    sparams = shard_params(params, mesh)

    B, T, S = 2, 16, 64
    cache = mla.new_latent_cache(cfg, B, S)
    from lmcache_tpu.parallel.mesh import latent_cache_sharding
    cache_sh = jax.device_put(cache, latent_cache_sharding(mesh))
    tokens = np.random.default_rng(9).integers(
        0, cfg.vocab_size, (B, T), dtype=np.int32)
    start = jnp.zeros((B,), jnp.int32)

    ref_logits, ref_cache = mla.forward(
        params, cfg, jnp.asarray(tokens), start, cache, use_pallas=False)
    sh_logits, sh_cache = mla.forward(
        sparams, cfg, jnp.asarray(tokens), start, cache_sh,
        use_pallas=True, mesh=mesh)
    np.testing.assert_allclose(np.asarray(sh_logits),
                               np.asarray(ref_logits), atol=2e-2,
                               rtol=2e-2)
    np.testing.assert_allclose(np.asarray(sh_cache),
                               np.asarray(ref_cache), atol=2e-2,
                               rtol=2e-2)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 devices")
def test_mla_generate_on_mesh_pallas():
    """MLA engine on a mesh with the latent pallas kernel on; greedy
    parity with the unsharded golden, and indivisible head counts fail
    loudly instead of hitting an unwrapped pallas call under GSPMD."""
    from lmcache_tpu.models import mla
    from lmcache_tpu.serving import MLAServingEngine

    mesh = make_mesh(MeshConfig(data=1, model=4))
    cfg = mla.MLAConfig.tiny()
    params = mla.init_params(jax.random.PRNGKey(13), cfg)
    sparams = shard_params(params, mesh)

    prompt = np.random.default_rng(5).integers(0, cfg.vocab_size, 19,
                                               dtype=np.int32)
    golden_eng = MLAServingEngine(cfg, params, max_batch=2, max_seq=128,
                                  use_pallas=False)
    [golden] = golden_eng.generate([prompt],
                                   SamplingParams(max_new_tokens=5))
    eng = MLAServingEngine(cfg, sparams, max_batch=2, max_seq=128,
                           use_pallas=True, mesh=mesh)
    [req] = eng.generate([prompt], SamplingParams(max_new_tokens=5))
    assert req.output_tokens == golden.output_tokens

    bad = mla.MLAConfig.tiny(n_heads=6)
    with pytest.raises(ValueError, match="divide the mesh"):
        MLAServingEngine(bad, mla.init_params(jax.random.PRNGKey(1), bad),
                         max_batch=2, max_seq=128, use_pallas=True,
                         mesh=mesh)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 devices")
def test_gemma3_style_generate_on_mesh():
    """Dual-theta rope + alternating windows + qk-norm (Gemma-3 traits)
    on a TP mesh: the per-layer frequency select rides the layer scan
    under shard_map; greedy output matches the unsharded golden."""
    mesh = make_mesh(MeshConfig(data=1, model=4))
    cfg = llama.LlamaConfig.tiny(n_layers=4, n_heads=8, n_kv_heads=4,
                                 dim=512, hidden_dim=512,
                                 sliding_window=16,
                                 global_layer_map=(False, False, False,
                                                   True),
                                 rope_theta=1e6, rope_local_theta=1e4,
                                 qk_norm=True, norm_one_offset=True,
                                 post_norms=True, mlp_act="gelu_tanh",
                                 embed_scale=True)
    params = llama.init_params(jax.random.PRNGKey(21), cfg)
    sparams = shard_params(params, mesh)
    prompt = np.random.default_rng(22).integers(0, cfg.vocab_size, 23,
                                                dtype=np.int32)
    golden_eng = ServingEngine(cfg, params, max_batch=2, max_seq=128,
                               use_pallas=False)
    [golden] = golden_eng.generate([prompt],
                                   SamplingParams(max_new_tokens=5))
    eng = ServingEngine(cfg, sparams, max_batch=2, max_seq=128,
                        use_pallas=False, mesh=mesh)
    [req] = eng.generate([prompt], SamplingParams(max_new_tokens=5))
    assert req.output_tokens == golden.output_tokens


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 devices")
def test_llama4_style_generate_on_mesh():
    """Llama-4 traits (iRoPE: chunked attention, NoPE global layers,
    post-rope L2 norm, query temperature, sigmoid MoE + shared expert)
    on a TP mesh; greedy output matches the unsharded golden."""
    mesh = make_mesh(MeshConfig(data=1, model=4))
    cfg = llama.LlamaConfig.tiny(n_layers=4, n_heads=8, n_kv_heads=4,
                                 dim=512, hidden_dim=512,
                                 rope_interleaved=True, sliding_window=16,
                                 sliding_window_pattern=4,
                                 local_attention_kind="chunked",
                                 nope_on_global_layers=True,
                                 qk_l2_norm=True,
                                 attn_temperature_tuning=True,
                                 attn_floor_scale=16.0,
                                 n_experts=4, n_experts_per_tok=1,
                                 moe_hidden_dim=256, moe_style="llama4")
    params = llama.init_params(jax.random.PRNGKey(23), cfg)
    sparams = shard_params(params, mesh)
    # routed AND shared expert weights sharded on "model"
    assert "model" in str(sparams["layers"]["e_gate"].sharding.spec)
    assert "model" in str(sparams["layers"]["w_gate"].sharding.spec)
    prompt = np.random.default_rng(24).integers(0, cfg.vocab_size, 23,
                                                dtype=np.int32)
    golden_eng = ServingEngine(cfg, params, max_batch=2, max_seq=128,
                               use_pallas=False)
    [golden] = golden_eng.generate([prompt],
                                   SamplingParams(max_new_tokens=5))
    eng = ServingEngine(cfg, sparams, max_batch=2, max_seq=128,
                        use_pallas=False, mesh=mesh)
    [req] = eng.generate([prompt], SamplingParams(max_new_tokens=5))
    assert req.output_tokens == golden.output_tokens


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 devices")
def test_gpt_oss_style_generate_on_mesh():
    """GPT-OSS traits (attention sinks sharded per head on "model",
    alternating windows, biased clamped-GLU MoE) on a TP mesh with the
    pallas kernels on (interpret under the CPU mesh): greedy output
    matches the unsharded golden."""
    mesh = make_mesh(MeshConfig(data=1, model=4))
    cfg = llama.LlamaConfig.tiny(n_layers=4, n_heads=8, n_kv_heads=4,
                                 dim=512, hidden_dim=512,
                                 attention_bias=True, attn_sinks=True,
                                 sliding_window=16,
                                 sliding_window_pattern=2,
                                 n_experts=4, n_experts_per_tok=2,
                                 moe_hidden_dim=256,
                                 moe_style="gpt_oss")
    params = llama.init_params(jax.random.PRNGKey(31), cfg)
    # nonzero sinks so the trait is load-bearing
    import jax.numpy as jnp
    params["layers"]["sinks"] = jnp.asarray(
        np.random.default_rng(32).standard_normal((4, 8)), jnp.float32)
    sparams = shard_params(params, mesh)
    prompt = np.random.default_rng(33).integers(0, cfg.vocab_size, 23,
                                                dtype=np.int32)
    golden_eng = ServingEngine(cfg, params, max_batch=2, max_seq=128,
                               use_pallas=False)
    [golden] = golden_eng.generate([prompt],
                                   SamplingParams(max_new_tokens=5))
    # pallas path (interpret on CPU) under shard_map with the sinks spec
    eng = ServingEngine(cfg, sparams, max_batch=2, max_seq=128,
                        use_pallas=True, mesh=mesh)
    [req] = eng.generate([prompt], SamplingParams(max_new_tokens=5))
    assert req.output_tokens == golden.output_tokens
