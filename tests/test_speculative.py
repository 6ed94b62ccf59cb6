"""Prompt-lookup speculative decoding: exact-greedy multi-token decode
via n-gram proposals verified in one forward (dense + paged engines)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from lmcache_tpu.models import llama  # noqa: E402
from lmcache_tpu.serving import (Request, SamplingParams,  # noqa: E402
                                 ServingEngine)
from lmcache_tpu.serving import engine as engine_mod  # noqa: E402
from lmcache_tpu.serving.engine import _ngram_propose  # noqa: E402
from lmcache_tpu.serving.paged_engine import PagedServingEngine  # noqa: E402


@pytest.fixture(scope="module")
def setup():
    cfg = llama.LlamaConfig.tiny(n_layers=2)
    params = llama.init_params(jax.random.PRNGKey(7), cfg)
    return cfg, params


def _prompt(cfg, n, seed):
    return np.random.default_rng(seed).integers(0, cfg.vocab_size, n,
                                                dtype=np.int32)


def test_ngram_propose_unit():
    t = np.asarray([5, 6, 7, 9, 1, 5, 6, 7], np.int32)
    # last 3 tokens [5,6,7] occurred at the start; propose what followed
    np.testing.assert_array_equal(_ngram_propose(t, 3, 2), [9, 1])
    # no earlier occurrence -> nothing
    assert len(_ngram_propose(np.arange(8, dtype=np.int32), 3, 4)) == 0
    # proposal truncated at the sequence end
    t2 = np.asarray([1, 2, 3, 1, 2], np.int32)
    np.testing.assert_array_equal(_ngram_propose(t2, 2, 4), [3, 1, 2])
    # most RECENT occurrence wins
    t3 = np.asarray([1, 2, 8, 1, 2, 9, 1, 2], np.int32)
    np.testing.assert_array_equal(_ngram_propose(t3, 2, 1), [9])


@pytest.mark.parametrize("engine_cls,kw", [
    (ServingEngine, {}),
    (PagedServingEngine, {"num_pages": 32, "page_size": 16}),
])
def test_speculative_exact_greedy(setup, engine_cls, kw):
    """Speculation must never change greedy output (random weights make
    most proposals miss — the machinery still has to stay exact)."""
    cfg, params = setup
    rng = np.random.default_rng(1)
    # repetitive prompt so the n-gram proposer actually fires
    base = rng.integers(0, cfg.vocab_size, 12, dtype=np.int32)
    prompt = np.concatenate([base, base, base[:5]])
    golden = engine_cls(cfg, params, max_batch=2, max_seq=256,
                        use_pallas=False, **kw).generate(
                            [prompt], SamplingParams(max_new_tokens=12))[0]
    eng = engine_cls(cfg, params, max_batch=2, max_seq=256,
                     use_pallas=False, spec_lookahead=4, **kw)
    [r] = eng.generate([prompt], SamplingParams(max_new_tokens=12))
    assert r.output_tokens == golden.output_tokens
    assert r.spec_proposed >= 0  # counter exists and is consistent
    assert 0 <= r.spec_accepted <= r.spec_proposed


def test_speculative_oracle_acceptance(setup, monkeypatch):
    """With an oracle proposer (the known greedy continuation), every
    proposal is accepted: far fewer verification steps, same output."""
    cfg, params = setup
    prompt = _prompt(cfg, 20, 3)
    N = 16
    golden = ServingEngine(cfg, params, max_batch=1, max_seq=256,
                           use_pallas=False).generate(
                               [prompt],
                               SamplingParams(max_new_tokens=N))[0]
    gold = np.asarray(golden.output_tokens, np.int32)

    def oracle(tokens, ngram, k):
        m = len(tokens) - len(prompt)
        return gold[m:m + k]

    monkeypatch.setattr(engine_mod, "_ngram_propose", oracle)
    eng = ServingEngine(cfg, params, max_batch=1, max_seq=256,
                        use_pallas=False, spec_lookahead=3)
    calls = {"n": 0}
    orig = eng._spec_forward

    def counting(inp, start):
        calls["n"] += 1
        return orig(inp, start)

    eng._spec_forward = counting
    [r] = eng.generate([prompt], SamplingParams(max_new_tokens=N))
    assert r.output_tokens == golden.output_tokens
    assert r.spec_accepted == r.spec_proposed > 0
    # 16 tokens: 1 at admission + 15 via spec steps of up to 4 each
    assert calls["n"] <= 5, calls["n"]


def test_speculative_mixed_batch_keeps_seeded_stream(setup):
    """A sampled (seeded) request sharing the batch with a speculating
    greedy request keeps its exact token stream."""
    cfg, params = setup
    p_greedy = np.tile(_prompt(cfg, 8, 5), 3)
    p_sampled = _prompt(cfg, 15, 6)
    sp_sampled = SamplingParams(max_new_tokens=10, temperature=1.2, seed=99)

    solo = ServingEngine(cfg, params, max_batch=2, max_seq=256,
                         use_pallas=False)
    [ref] = solo.generate([p_sampled], sp_sampled)

    eng = ServingEngine(cfg, params, max_batch=2, max_seq=256,
                        use_pallas=False, spec_lookahead=4)
    a = Request(p_greedy, SamplingParams(max_new_tokens=20))
    b = Request(p_sampled, sp_sampled)
    eng.add_request(a)
    eng.add_request(b)
    eng.run()
    assert b.output_tokens == ref.output_tokens
