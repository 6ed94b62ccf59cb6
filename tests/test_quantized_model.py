"""forward_quantized: int8-KV serving path vs full-precision forward."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from lmcache_tpu.models import llama  # noqa: E402


@pytest.fixture(scope="module")
def setup():
    cfg = llama.LlamaConfig.tiny(n_layers=2)
    params = llama.init_params(jax.random.PRNGKey(3), cfg)
    return cfg, params


def test_tracks_full_precision(setup):
    cfg, params = setup
    B, T, S = 1, 48, 64
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, cfg.vocab_size, (B, T)),
        jnp.int32)
    zero = jnp.zeros(B, jnp.int32)

    fp_logits, _ = llama.forward(params, cfg, tokens, zero,
                                 llama.new_kv_cache(cfg, B, S),
                                 use_pallas=False)
    q_logits, q_cache = llama.forward_quantized(
        params, cfg, tokens, zero,
        llama.new_quantized_kv_cache(cfg, B, S), use_pallas=False)

    assert q_cache["sym"].dtype == jnp.int8
    a = np.asarray(fp_logits[0, -1])
    b = np.asarray(q_logits[0, -1])
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.99
    # greedy next token unchanged by int8 KV on this model
    assert int(a.argmax()) == int(b.argmax())


def test_prefill_decode_consistency_quantized(setup):
    """Within the int8 representation, prefill(T)+decode == prefill(T+1):
    both paths write identical quantized KV and read it back."""
    cfg, params = setup
    B, S = 2, 64
    tokens = jnp.asarray(
        np.random.default_rng(1).integers(0, cfg.vocab_size, (B, 33)),
        jnp.int32)
    zero = jnp.zeros(B, jnp.int32)

    full, _ = llama.forward_quantized(
        params, cfg, tokens, zero,
        llama.new_quantized_kv_cache(cfg, B, S), use_pallas=False)

    _, cache = llama.forward_quantized(
        params, cfg, tokens[:, :32], zero,
        llama.new_quantized_kv_cache(cfg, B, S), use_pallas=False)
    step, _ = llama.forward_quantized(params, cfg, tokens[:, 32:],
                                      jnp.full((B,), 32, jnp.int32), cache,
                                      use_pallas=False)
    np.testing.assert_allclose(np.asarray(step[:, 0]),
                               np.asarray(full[:, -1]), atol=3e-3,
                               rtol=3e-3)
