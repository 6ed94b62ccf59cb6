"""Integration-hook contract tests (reference LLM_Engine.rst semantics)."""

import numpy as np
import pytest

from lmcache_tpu import integration as itg
from lmcache_tpu.config import LMCacheEngineConfig


@pytest.fixture(autouse=True)
def clean_engine():
    itg.close_lmcache_engine()
    yield
    itg.close_lmcache_engine()


def _blob(T, L=2, H=2, D=64, seed=0):
    return np.random.default_rng(seed).standard_normal(
        (L, 2, T, H, D)).astype(np.float32)


def test_lifecycle_and_hooks():
    cfg = LMCacheEngineConfig.from_defaults(local_device="cpu",
                                            chunk_size=16)
    eng = itg.init_lmcache_engine("m", config=cfg)
    assert eng is not None
    assert itg.init_lmcache_engine("m", config=cfg) is None  # already up

    tokens = np.arange(48, dtype=np.int32)
    prefill = itg.StepInput(tokens=tokens, is_prefill=True)
    decode = itg.StepInput(tokens=tokens, is_prefill=False)
    profile = itg.StepInput(tokens=tokens, is_prefill=True,
                            is_profile_run=True)

    assert itg.lmcache_should_retrieve(prefill)
    assert not itg.lmcache_should_retrieve(decode)
    assert not itg.lmcache_should_retrieve(profile)
    assert itg.lmcache_should_store(prefill)
    assert not itg.lmcache_should_store(decode)  # save_decode_cache off

    # store, then a second identical prompt prefill retrieves the prefix
    blob = _blob(48)
    itg.lmcache_store_kv(prefill, blob)
    eng.engine_.flush()

    step2 = itg.lmcache_retrieve_kv(prefill)
    assert step2.num_computed_tokens == 47  # >=1 token recomputed
    np.testing.assert_array_equal(np.asarray(step2.retrieved_kv),
                                  blob[:, :, :47])
    suffix = itg.build_partial_prefill_input(step2)
    np.testing.assert_array_equal(suffix, tokens[47:])


def test_save_decode_cache_gates_store():
    cfg = LMCacheEngineConfig.from_defaults(local_device="cpu",
                                            save_decode_cache=True)
    itg.init_lmcache_engine("m", config=cfg)
    decode = itg.StepInput(tokens=np.arange(8, dtype=np.int32),
                           is_prefill=False)
    assert itg.lmcache_should_store(decode)


def test_retrieve_kv_stream_pieces_and_early_close():
    cfg = LMCacheEngineConfig.from_defaults(local_device="cpu",
                                            chunk_size=16)
    eng = itg.init_lmcache_engine("m", config=cfg)
    tokens = np.arange(48, dtype=np.int32)
    prefill = itg.StepInput(tokens=tokens, is_prefill=True)
    blob = _blob(48)
    itg.lmcache_store_kv(prefill, blob)
    eng.engine_.flush()

    # pieces are contiguous, cover exactly num_computed_tokens of the
    # non-streaming hook, and the last piece is cut to leave >= 1 token
    pieces = list(itg.lmcache_retrieve_kv_stream(prefill))
    starts = [s for s, _ in pieces]
    lens = [c.shape[2] for _, c in pieces]
    assert starts == [0, 16, 32]
    assert lens == [16, 16, 15]
    rebuilt = np.concatenate([np.asarray(c) for _, c in pieces], axis=2)
    np.testing.assert_array_equal(rebuilt, blob[:, :, :47])

    # closing early cancels cleanly (no error, no further pieces)
    gen = itg.lmcache_retrieve_kv_stream(prefill)
    assert next(gen)[0] == 0
    gen.close()
