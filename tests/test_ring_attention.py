"""Ring (context-parallel) attention on the virtual 8-device mesh.

The reference has no sequence parallelism; SURVEY §2 names chunked KV
as the natural unit for a ring-attention design ("no Ulysses/ring code
exists to port"). These tests pin the op against the dense reference
and the full ring prefill against the single-device forward.
"""

import numpy as np
import pytest

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from lmcache_tpu.models import llama  # noqa: E402
from lmcache_tpu.ops.attention import mha_reference  # noqa: E402
from lmcache_tpu.parallel.ring_attention import ring_attention  # noqa: E402


def _mesh(data, model):
    devs = np.asarray(jax.devices()[:data * model]).reshape(data, model)
    return Mesh(devs, ("data", "model"))


@pytest.mark.parametrize("data,model", [(8, 1), (4, 2)])
def test_ring_matches_reference(data, model):
    """Op-level parity incl. GQA, ragged kv_len, and TP x CP meshes."""
    mesh = _mesh(data, model)
    rng = np.random.default_rng(data)
    B, T, Hkv, G, D = 2, 256, 4, 2, 32
    q = jnp.asarray(rng.standard_normal((B, T, Hkv * G, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, Hkv, D)), jnp.float32)
    o = jnp.asarray([0, 0], jnp.int32)
    kvl = jnp.asarray([256, 200], jnp.int32)
    out = ring_attention(q, k, v, o, kvl, mesh)
    ref = mha_reference(q, k, v, o, kvl)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_ring_softcap_and_scale():
    """Family traits (Gemma-2 softcap + sm_scale) through the ring."""
    mesh = _mesh(8, 1)
    rng = np.random.default_rng(3)
    B, T, H, D = 1, 128, 4, 32
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    o = jnp.zeros((1,), jnp.int32)
    kvl = jnp.full((1,), T, jnp.int32)
    out = ring_attention(q, k, v, o, kvl, mesh, sm_scale=0.2,
                         logit_softcap=30.0)
    ref = mha_reference(q, k, v, o, kvl, sm_scale=0.2, logit_softcap=30.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("data,model", [(8, 1), (4, 2)])
def test_forward_ring_matches_dense(data, model):
    """Full sequence-parallel prefill == the single-device forward:
    logits and the produced KV cache (the artifact the cache engine
    stores), with tokens/params actually placed sharded."""
    from lmcache_tpu.parallel.mesh import shard_params

    mesh = _mesh(data, model)
    cfg = llama.LlamaConfig.tiny(n_layers=2, n_heads=4, n_kv_heads=2,
                                 qk_norm=True)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    B, T = 2, 256
    rng = np.random.default_rng(7)
    ids = rng.integers(0, cfg.vocab_size, (B, T))

    # golden: single-device forward
    cache = llama.new_kv_cache(cfg, B, T)
    g_logits, g_cache = llama.forward(params, cfg,
                                      jnp.asarray(ids, jnp.int32),
                                      jnp.zeros(B, jnp.int32), cache,
                                      use_pallas=False)

    sp = shard_params(params, mesh)
    tok = jax.device_put(jnp.asarray(ids, jnp.int32),
                         NamedSharding(mesh, P(None, "data")))
    r_logits, r_cache = jax.jit(
        lambda p, t: llama.forward_ring(p, cfg, t, mesh))(sp, tok)
    np.testing.assert_allclose(np.asarray(r_logits), np.asarray(g_logits),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(r_cache), np.asarray(g_cache),
                               atol=2e-5, rtol=2e-5)
    assert r_cache.shape == (cfg.n_layers, 2, B, cfg.n_kv_heads, T,
                             cfg.head_dim)


@pytest.mark.parametrize("kind,W", [("sliding", 40), ("sliding", 96),
                                    ("chunked", 64), ("chunked", 100)])
def test_ring_windowed_matches_reference(kind, W):
    """Trailing and chunked windows through the ring (blocks outside
    the window skip compute but the result is exact)."""
    mesh = _mesh(8, 1)
    rng = np.random.default_rng(W)
    B, T, Hkv, G, D = 2, 256, 2, 2, 32
    q = jnp.asarray(rng.standard_normal((B, T, Hkv * G, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, Hkv, D)), jnp.float32)
    o = jnp.zeros((B,), jnp.int32)
    kvl = jnp.asarray([256, 230], jnp.int32)
    out = ring_attention(q, k, v, o, kvl, mesh, sliding_window=W,
                         window_kind=kind)
    ref = mha_reference(q, k, v, o, kvl, sliding_window=W,
                        window_kind=kind)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    # a traced is_global=True overrides the window (full causal)
    out_g = ring_attention(q, k, v, o, kvl, mesh, sliding_window=W,
                           window_kind=kind,
                           is_global=jnp.asarray(True))
    ref_g = mha_reference(q, k, v, o, kvl)
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(ref_g),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("kind,W", [("chunked", 64), ("chunked", 100),
                                    ("sliding", 64)])
def test_ring_windowed_ragged_offsets(kind, W):
    """Regression (ADVICE r2, medium): the chunked-window compute skip
    used min(q_offset) to locate the chunk start, but chunk boundaries
    are nonlinear in each row's ABSOLUTE positions — with ragged
    q_offset a KV block needed by a higher-offset row was skipped,
    silently corrupting its output. The skip must be decided per row."""
    mesh = _mesh(8, 1)
    rng = np.random.default_rng(W + 1)
    B, T, Hkv, G, D = 3, 256, 2, 2, 32
    q = jnp.asarray(rng.standard_normal((B, T, Hkv * G, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, Hkv, D)), jnp.float32)
    # ragged offsets that straddle chunk boundaries differently per row
    o = jnp.asarray([0, W - 1, 3 * W + 7], jnp.int32)
    kvl = o + jnp.asarray([256, 256, 224], jnp.int32)  # absolute bound
    out = ring_attention(q, k, v, o, kvl, mesh, sliding_window=W,
                         window_kind=kind)
    ref = mha_reference_offsets(q, k, v, o, kvl, W, kind)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def mha_reference_offsets(q, k, v, o, kvl, W, kind):
    """Dense reference for the RING's position convention: in the ring,
    key block r of row b holds absolute positions q_offset[b] + r*Tl +
    [0, Tl) — i.e. kpos is offset per row like qpos (the local KV is the
    row's own context tail). mha_reference uses absolute kpos from 0, so
    rebuild the mask here with per-row-offset key positions."""
    B, T, H, D = q.shape
    Hkv = k.shape[2]
    G = H // Hkv
    qh = q.reshape(B, T, Hkv, G, D).transpose(0, 2, 3, 1, 4)
    kh = k.transpose(0, 2, 1, 3)
    vh = v.transpose(0, 2, 1, 3)
    s = jnp.einsum("bhgtd,bhsd->bhgts", qh.astype(jnp.float32),
                   kh.astype(jnp.float32)) / (D**0.5)
    qpos = o[:, None] + jnp.arange(T)[None, :]  # [B, T]
    kpos = o[:, None] + jnp.arange(T)[None, :]  # [B, S]: ring convention
    mask = (kpos[:, None, :] <= qpos[:, :, None]) & (
        kpos[:, None, :] < kvl[:, None, None])  # kv_len is absolute
    if kind == "chunked":
        mask &= kpos[:, None, :] // W == qpos[:, :, None] // W
    else:
        mask &= kpos[:, None, :] > qpos[:, :, None] - W
    s = jnp.where(mask[:, None, None, :, :], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhgts,bhsd->bhgtd", p, vh.astype(jnp.float32))
    # fully-masked (padding) rows emit exact zeros, as the ring does
    empty = ~mask.any(axis=-1)  # [B, T]
    out = jnp.where(empty[:, None, None, :, None], 0.0, out)
    return out.transpose(0, 3, 1, 2, 4).reshape(B, T, H, D).astype(q.dtype)


@pytest.mark.parametrize("family_kw", [
    dict(sliding_window=48),                           # Mistral-style
    dict(sliding_window=48, global_layer_map=(False, True),
         rope_theta=1e6, rope_local_theta=1e4, qk_norm=True,
         norm_one_offset=True, post_norms=True, mlp_act="gelu_tanh",
         embed_scale=True),                            # Gemma-3-style
    dict(rope_interleaved=True, sliding_window=48,
         global_layer_map=(False, True), local_attention_kind="chunked",
         nope_on_global_layers=True, qk_l2_norm=True,
         attn_temperature_tuning=True, attn_floor_scale=48.0,
         n_experts=4, n_experts_per_tok=1, moe_hidden_dim=64,
         moe_style="llama4"),                          # Llama-4 iRoPE
])
def test_forward_ring_families(family_kw):
    """Windowed / per-layer-trait families through the full ring
    prefill: logits + cache match the single-device forward."""
    from lmcache_tpu.parallel.mesh import shard_params

    mesh = _mesh(8, 1)
    cfg = llama.LlamaConfig.tiny(n_layers=2, n_heads=4, n_kv_heads=2,
                                 **family_kw)
    params = llama.init_params(jax.random.PRNGKey(2), cfg)
    B, T = 2, 256
    ids = np.random.default_rng(8).integers(0, cfg.vocab_size, (B, T))

    cache = llama.new_kv_cache(cfg, B, T)
    g_logits, g_cache = llama.forward(params, cfg,
                                      jnp.asarray(ids, jnp.int32),
                                      jnp.zeros(B, jnp.int32), cache,
                                      use_pallas=False)
    sp = shard_params(params, mesh)
    tok = jax.device_put(jnp.asarray(ids, jnp.int32),
                         NamedSharding(mesh, P(None, "data")))
    r_logits, r_cache = jax.jit(
        lambda p, t: llama.forward_ring(p, cfg, t, mesh))(sp, tok)
    np.testing.assert_allclose(np.asarray(r_logits), np.asarray(g_logits),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(r_cache), np.asarray(g_cache),
                               atol=2e-5, rtol=2e-5)


def test_ring_sinks_matches_reference():
    """Attention sinks through the ring (TP x CP: the sink vector
    shards per head on "model")."""
    mesh = _mesh(4, 2)
    rng = np.random.default_rng(9)
    B, T, Hkv, G, D = 2, 128, 2, 2, 32
    q = jnp.asarray(rng.standard_normal((B, T, Hkv * G, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, Hkv, D)), jnp.float32)
    sinks = jnp.asarray(rng.standard_normal(Hkv * G), jnp.float32)
    o = jnp.zeros((B,), jnp.int32)
    kvl = jnp.full((B,), T, jnp.int32)
    out = ring_attention(q, k, v, o, kvl, mesh, sinks=sinks)
    ref = mha_reference(q, k, v, o, kvl, sinks=sinks)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
