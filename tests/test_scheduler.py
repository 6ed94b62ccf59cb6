"""Round-2 continuous-batching scheduler: multi-admission, decode
progress during long prefills, incremental page allocation, and
preemption to the cache tiers with exact resume (VERDICT r1 next #2)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from lmcache_tpu.cache_engine import LMCacheEngine  # noqa: E402
from lmcache_tpu.config import (LMCacheEngineConfig,  # noqa: E402
                                LMCacheEngineMetadata)
from lmcache_tpu.models import llama  # noqa: E402
from lmcache_tpu.serving import (Request, SamplingParams,  # noqa: E402
                                 ServingEngine)
from lmcache_tpu.serving.paged_engine import PagedServingEngine  # noqa: E402


@pytest.fixture(scope="module")
def setup():
    cfg = llama.LlamaConfig.tiny(n_layers=2)
    params = llama.init_params(jax.random.PRNGKey(7), cfg)
    return cfg, params


def _prompt(cfg, n, seed):
    return np.random.default_rng(seed).integers(0, cfg.vocab_size, n,
                                                dtype=np.int32)


def test_multi_admission(setup):
    """One scheduler step admits every waiting request a slot can take
    (the r1 scheduler admitted one per step)."""
    cfg, params = setup
    eng = ServingEngine(cfg, params, max_batch=4, max_seq=128,
                        use_pallas=False)
    for i in range(4):
        eng.add_request(Request(_prompt(cfg, 12, i),
                                SamplingParams(max_new_tokens=4)))
    eng.step()
    assert not eng.waiting
    assert not eng.free_slots
    eng.run()
    assert len(eng.finished) == 4


def test_decode_progress_during_long_prefill(setup):
    """A long-prompt admission must not starve running decodes: every
    scheduler step advances one prefill segment AND one decode step."""
    cfg, params = setup
    eng = ServingEngine(cfg, params, max_batch=2, max_seq=256,
                        use_pallas=False, prefill_chunk=8)
    a = Request(_prompt(cfg, 10, 1), SamplingParams(max_new_tokens=40))
    eng.add_request(a)
    while not a.output_tokens:
        eng.step()

    b = Request(_prompt(cfg, 64, 2), SamplingParams(max_new_tokens=4))
    eng.add_request(b)
    got_before = len(a.output_tokens)
    steps_while_prefilling = 0
    while b in eng.prefilling or b in eng.waiting:
        eng.step()
        steps_while_prefilling += 1
        if steps_while_prefilling > 64:
            pytest.fail("prefill never completed")
    # 64-token prompt at prefill_chunk=8 = 8 segments; a decoded a token
    # in every one of those steps
    assert steps_while_prefilling >= 8
    assert len(a.output_tokens) - got_before >= steps_while_prefilling - 1

    eng.run()
    # outputs equal the solo greedy runs (mixed scheduling is transparent)
    solo = ServingEngine(cfg, params, max_batch=2, max_seq=256,
                         use_pallas=False)
    [ga] = solo.generate([a.prompt_tokens], SamplingParams(max_new_tokens=40))
    [gb] = solo.generate([b.prompt_tokens], SamplingParams(max_new_tokens=4))
    assert a.output_tokens == ga.output_tokens
    assert b.output_tokens == gb.output_tokens


def test_incremental_pages_admit_on_prompt_only(setup):
    """Admission reserves pages for the prompt, not prompt+max_new —
    requests that could not co-reside under worst-case reservation now
    run concurrently."""
    cfg, params = setup
    # prompts of 32 tokens = 2 pages each; max_new=64 would have demanded
    # 6 pages each under r1's upfront reservation (13 > 11 usable for 2)
    eng = PagedServingEngine(cfg, params, max_batch=2, max_seq=128,
                             num_pages=12, page_size=16, use_pallas=False)
    p1, p2 = _prompt(cfg, 32, 3), _prompt(cfg, 32, 4)
    eng.add_request(Request(p1, SamplingParams(max_new_tokens=8)))
    eng.add_request(Request(p2, SamplingParams(max_new_tokens=8)))
    eng.step()
    # both admitted together on prompt-only pages
    assert len(eng.prefilling) + len(eng.running) == 2
    eng.run()
    assert eng.allocator.num_free == 11


def test_preemption_exact_resume(setup):
    """When decode growth exhausts the arena, the newest request is
    evicted to the cache tiers and later resumes with identical greedy
    output (VERDICT r1 next #2 'Done' criterion)."""
    cfg, params = setup
    ce = LMCacheEngine(
        LMCacheEngineConfig.from_defaults(local_device="cpu",
                                          chunk_size=16),
        LMCacheEngineMetadata(model_name="tiny-preempt", world_size=1,
                              worker_id=0, fmt="vllm", dtype=cfg.dtype))
    eng = PagedServingEngine(cfg, params, max_batch=2, max_seq=128,
                             num_pages=8, page_size=16, cache_engine=ce,
                             use_pallas=False)
    pa, pb = _prompt(cfg, 40, 5), _prompt(cfg, 40, 6)
    a = Request(pa, SamplingParams(max_new_tokens=40))
    b = Request(pb, SamplingParams(max_new_tokens=40))
    eng.add_request(a)
    eng.add_request(b)
    eng.run()

    assert b.num_preemptions >= 1  # the arena cannot hold both at 80 tok
    assert a.num_preemptions == 0
    assert len(a.output_tokens) == 40 and len(b.output_tokens) == 40
    assert eng.allocator.num_free == 7  # all pages returned

    solo = ServingEngine(cfg, params, max_batch=1, max_seq=128,
                         use_pallas=False)
    [ga] = solo.generate([pa], SamplingParams(max_new_tokens=40))
    [gb] = solo.generate([pb], SamplingParams(max_new_tokens=40))
    assert a.output_tokens == ga.output_tokens
    assert b.output_tokens == gb.output_tokens  # exact across preemption
    ce.close()


def test_no_cache_engine_backpressure_and_hard_limit(setup):
    """Without a cache tier, worst-case reservation makes concurrent
    over-commit BACKPRESSURE (sequential completion), and only a request
    that can never fit raises MemoryError."""
    cfg, params = setup
    eng = PagedServingEngine(cfg, params, max_batch=2, max_seq=128,
                             num_pages=8, page_size=16, use_pallas=False)
    reqs = eng.generate([_prompt(cfg, 40, 7), _prompt(cfg, 40, 8)],
                        SamplingParams(max_new_tokens=40))
    assert all(len(r.output_tokens) == 40 for r in reqs)

    eng2 = PagedServingEngine(cfg, params, max_batch=2, max_seq=128,
                              num_pages=8, page_size=16, use_pallas=False)
    eng2.add_request(Request(_prompt(cfg, 80, 9),
                             SamplingParams(max_new_tokens=40)))  # 8 > 7
    with pytest.raises(MemoryError):
        eng2.run()


def test_prefix_sharing_pages(setup):
    """Two concurrent requests with a common prompt prefix occupy the
    SAME physical pages until divergence; pages are refcounted and only
    freed by the last referent (VERDICT r1 next #3)."""
    cfg, params = setup
    eng = PagedServingEngine(cfg, params, max_batch=2, max_seq=256,
                             num_pages=32, page_size=16, use_pallas=False)
    common = _prompt(cfg, 64, 10)  # 4 pages
    pa = np.concatenate([common, _prompt(cfg, 16, 11)])  # 80 tokens
    pb = np.concatenate([common, _prompt(cfg, 16, 12)])
    a = Request(pa, SamplingParams(max_new_tokens=30))
    eng.add_request(a)
    while not a.output_tokens:
        eng.step()
    pages_a = list(eng._req_pages[a.request_id])

    b = Request(pb, SamplingParams(max_new_tokens=4))
    eng.add_request(b)
    eng.step()  # admits b
    pages_b = eng._req_pages[b.request_id]
    assert pages_b[:4] == pages_a[:4]  # shared physical pages
    assert pages_b[4] not in pages_a  # divergent suffix gets fresh pages
    assert eng._req_shared[b.request_id] == 64
    assert b.cached_prefix_len == 64  # zero-copy reuse, no cache tier
    for p in pages_a[:4]:
        assert eng.allocator.refcount(p) == 2

    eng.run()
    assert eng.allocator.num_free == 31  # everything freed exactly once

    solo = ServingEngine(cfg, params, max_batch=1, max_seq=256,
                         use_pallas=False)
    [ga] = solo.generate([pa], SamplingParams(max_new_tokens=30))
    [gb] = solo.generate([pb], SamplingParams(max_new_tokens=4))
    assert a.output_tokens == ga.output_tokens
    assert b.output_tokens == gb.output_tokens


def test_prefix_sharing_survives_owner_release(setup):
    """The first owner finishing must not free pages a sharer still
    references; the index entry survives until the last referent."""
    cfg, params = setup
    eng = PagedServingEngine(cfg, params, max_batch=2, max_seq=256,
                             num_pages=32, page_size=16, use_pallas=False)
    common = _prompt(cfg, 48, 13)  # 3 pages
    a = Request(common.copy(), SamplingParams(max_new_tokens=6))
    eng.add_request(a)
    while not a.output_tokens:
        eng.step()
    b = Request(np.concatenate([common, _prompt(cfg, 16, 14)]),
                SamplingParams(max_new_tokens=30))
    eng.add_request(b)
    eng.step()
    shared = eng._req_pages[b.request_id][:3]
    assert eng._req_shared[b.request_id] == 48  # all 3 common pages
    # drive a to completion while b still runs
    while a.state.value != "finished":
        eng.step()
    for p in shared:
        assert eng.allocator.refcount(p) == 1  # b still holds them
    eng.run()
    assert eng.allocator.num_free == 31

    solo = ServingEngine(cfg, params, max_batch=1, max_seq=256,
                         use_pallas=False)
    [gb] = solo.generate([b.prompt_tokens],
                         SamplingParams(max_new_tokens=30))
    assert b.output_tokens == gb.output_tokens


def test_arena_as_cache_sequential_reuse(setup):
    """Freed pages keep their prefix registrations until reallocation: a
    SECOND same-prompt request (after the first finished) reclaims them
    zero-copy, with no cache tier configured at all."""
    cfg, params = setup
    eng = PagedServingEngine(cfg, params, max_batch=2, max_seq=256,
                             num_pages=32, page_size=16, use_pallas=False)
    prompt = _prompt(cfg, 70, 20)
    [a] = eng.generate([prompt], SamplingParams(max_new_tokens=5))
    assert a.cached_prefix_len == 0
    free_after = eng.allocator.num_free

    [b] = eng.generate([prompt], SamplingParams(max_new_tokens=5))
    assert b.cached_prefix_len == 64  # 4 reclaimed pages, zero-copy
    assert b.output_tokens == a.output_tokens
    assert eng.allocator.num_free == free_after  # all returned again

    # a third request with a DIFFERENT prompt long enough to recycle the
    # arena evicts the stale registrations safely
    big = _prompt(cfg, 200, 21)
    [c] = eng.generate([big], SamplingParams(max_new_tokens=4))
    assert len(c.output_tokens) == 4
    solo = ServingEngine(cfg, params, max_batch=1, max_seq=256,
                         use_pallas=False)
    [gc] = solo.generate([big], SamplingParams(max_new_tokens=4))
    assert c.output_tokens == gc.output_tokens


def test_arena_cache_eviction_on_realloc(setup):
    """Registrations die when their page is reallocated — a same-prefix
    request after arena churn must NOT reclaim overwritten pages."""
    cfg, params = setup
    eng = PagedServingEngine(cfg, params, max_batch=1, max_seq=128,
                             num_pages=8, page_size=16, use_pallas=False)
    p1 = _prompt(cfg, 48, 22)
    [a] = eng.generate([p1], SamplingParams(max_new_tokens=4))
    # churn: a different prompt large enough to recycle every free page
    churn = _prompt(cfg, 96, 23)
    eng.generate([churn], SamplingParams(max_new_tokens=4))
    # p1's pages were recycled; the index must not serve stale content
    [b] = eng.generate([p1], SamplingParams(max_new_tokens=4))
    assert b.cached_prefix_len == 0  # no stale reclaim
    assert b.output_tokens == a.output_tokens


def test_no_cache_engine_reserves_worst_case(setup):
    """Without a cache engine, preemption is impossible — admission must
    reserve prompt+max_new so the arena backpressures instead of
    hard-failing mid-decode (review r2 finding)."""
    cfg, params = setup
    eng = PagedServingEngine(cfg, params, max_batch=2, max_seq=160,
                             num_pages=11, page_size=16, use_pallas=False)
    prompts = [_prompt(cfg, 80, 30 + i) for i in range(2)]
    reqs = eng.generate(prompts, SamplingParams(max_new_tokens=64))
    assert all(len(r.output_tokens) == 64 for r in reqs)
    assert eng.allocator.num_free == 10

    solo = ServingEngine(cfg, params, max_batch=1, max_seq=160,
                         use_pallas=False)
    for r, p in zip(reqs, prompts):
        [g] = solo.generate([p], SamplingParams(max_new_tokens=64))
        assert r.output_tokens == g.output_tokens


def test_blend_admission_near_full_arena(setup):
    """_can_admit must not credit resident-prefix sharing to blend
    requests (their admission takes no shared pages) — a blend request
    whose chunks share a resident prefix must backpressure, not crash
    (review r2 finding)."""
    cfg, params = setup
    ce = LMCacheEngine(
        LMCacheEngineConfig.from_defaults(local_device="cpu",
                                          chunk_size=16),
        LMCacheEngineMetadata(model_name="tiny-blendadm", world_size=1,
                              worker_id=0, fmt="vllm", dtype=cfg.dtype))
    eng = PagedServingEngine(cfg, params, max_batch=2, max_seq=128,
                             num_pages=7, page_size=16, cache_engine=ce,
                             use_pallas=False)
    eng._blend_ratio = 1.0
    common = _prompt(cfg, 48, 33)  # 3 pages once resident
    a = Request(common.copy(), SamplingParams(max_new_tokens=30))
    eng.add_request(a)
    while not a.output_tokens:
        eng.step()  # a RUNNING: its 3 prompt pages are registered

    # blend request whose first chunk IS the resident prefix: 64 tokens
    # = 4 pages, arena has 3 free. _can_admit used to count the 3
    # resident pages as shared and admit -> allocator MemoryError.
    b = Request(np.empty(0, np.int32), SamplingParams(max_new_tokens=4),
                context_chunks=[common.copy(), _prompt(cfg, 16, 34)])
    eng.add_request(b)
    eng.run()  # must backpressure until a finishes, then admit b
    assert len(a.output_tokens) == 30
    assert len(b.output_tokens) == 4
    ce.close()


# -- round-3 token-budget scheduler (VERDICT r2 next #5) --------------------


def test_window_admission_bypasses_blocked_head(setup):
    """A huge head request must not block admissible small requests
    behind it: they admit from the window, run, and free pages until
    the head fits."""
    cfg, params = setup
    # head needs 9 pages (128 prompt + 2 new); small ones need 1 each
    eng = PagedServingEngine(cfg, params, max_batch=3, max_seq=192,
                             num_pages=10, page_size=16,  # 9 usable
                             use_pallas=False)
    first = Request(_prompt(cfg, 14, 19), SamplingParams(max_new_tokens=30))
    eng.add_request(first)
    while not first.output_tokens:
        eng.step()  # one page occupied: the arena can no longer hold big
    big = Request(_prompt(cfg, 128, 10), SamplingParams(max_new_tokens=2))
    smalls = [Request(_prompt(cfg, 14, 20 + i),
                      SamplingParams(max_new_tokens=2)) for i in range(3)]
    eng.add_request(big)
    for s in smalls:
        eng.add_request(s)
    eng.step()
    # the head (9 pages) cannot fit alongside anything; smalls bypassed it
    assert big in eng.waiting
    assert sum(s not in eng.waiting for s in smalls) == 2  # 2 free slots
    eng.run()
    assert len(eng.finished) == 5
    assert len(big.output_tokens) == 2


def test_admission_bypass_bound_prevents_starvation(setup):
    """After max_admission_bypass consecutive bypasses the window
    collapses to FIFO: later small requests WAIT even though they fit,
    the arena drains, and the head admits."""
    cfg, params = setup
    eng = PagedServingEngine(cfg, params, max_batch=2, max_seq=192,
                             num_pages=10, page_size=16,
                             use_pallas=False, max_admission_bypass=2)
    big = Request(_prompt(cfg, 128, 11), SamplingParams(max_new_tokens=2))
    smalls = [Request(_prompt(cfg, 14, 30 + i),
                      SamplingParams(max_new_tokens=2)) for i in range(6)]
    eng.add_request(big)
    for s in smalls:
        eng.add_request(s)
    eng.run()
    assert len(eng.finished) == 7
    # only 2 smalls may have been admitted before the FIFO freeze, so the
    # big request finished BEFORE at least the last 4 smalls
    order = [r.request_id for r in eng.finished]
    assert order.index(big.request_id) < order.index(
        smalls[-1].request_id)


def test_prefill_token_budget_spreads_across_requests(setup):
    """With budget > prefill_chunk, several prefilling requests advance
    in ONE scheduler step (the r2 scheduler advanced only the head);
    greedy outputs stay identical to the single-segment engine."""
    cfg, params = setup
    prompts = [_prompt(cfg, 48, 40 + i) for i in range(3)]

    eng = ServingEngine(cfg, params, max_batch=3, max_seq=128,
                        use_pallas=False, prefill_chunk=16,
                        prefill_token_budget=48)
    for p in prompts:
        eng.add_request(Request(p, SamplingParams(max_new_tokens=3)))
    eng.step()  # admits all three, then spends 48 tokens over 3 segments
    assert [r.prefill_pos for r in eng.prefilling] == [16, 16, 16]
    eng.run()

    golden = ServingEngine(cfg, params, max_batch=3, max_seq=128,
                           use_pallas=False, prefill_chunk=16)
    gold = golden.generate(prompts, SamplingParams(max_new_tokens=3))
    for r, g in zip(eng.finished, gold):
        assert r.output_tokens == g.output_tokens


def test_decode_jitter_bounded_under_mixed_load(setup):
    """8 decoding requests + one long prefill share steps: every
    scheduler step during the long prefill still produces one decode
    token per running request (bounded decode-latency jitter)."""
    cfg, params = setup
    eng = ServingEngine(cfg, params, max_batch=9, max_seq=256,
                        use_pallas=False, prefill_chunk=16)
    decoders = [Request(_prompt(cfg, 8, 50 + i),
                        SamplingParams(max_new_tokens=64))
                for i in range(8)]
    for d in decoders:
        eng.add_request(d)
    while not all(d.output_tokens for d in decoders):
        eng.step()

    long_req = Request(_prompt(cfg, 160, 59),
                       SamplingParams(max_new_tokens=1))
    eng.add_request(long_req)
    before = [len(d.output_tokens) for d in decoders]
    steps = 0
    while long_req not in eng.running and not long_req.state.name == \
            "FINISHED" and steps < 32:
        eng.step()
        steps += 1
        # every step with the prefill in flight advanced EVERY decode
        for d, b in zip(decoders, before):
            if not d.is_finished(eng.eos_token_id):
                assert len(d.output_tokens) == b + steps
    assert steps >= 160 // 16 - 1  # the prefill really was sliced
