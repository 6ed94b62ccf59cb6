"""Serving engine: continuous batching, greedy correctness vs a naive
full-recompute loop, and KV reuse through the cache engine."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from lmcache_tpu.cache_engine import LMCacheEngine  # noqa: E402
from lmcache_tpu.config import (LMCacheEngineConfig,  # noqa: E402
                                LMCacheEngineMetadata)
from lmcache_tpu.models import llama  # noqa: E402
from lmcache_tpu.serving import (Request, SamplingParams,  # noqa: E402
                                 ServingEngine)


@pytest.fixture(scope="module")
def setup():
    cfg = llama.LlamaConfig.tiny(n_layers=2)
    params = llama.init_params(jax.random.PRNGKey(7), cfg)
    return cfg, params


def naive_greedy(cfg, params, prompt, n_new):
    """Golden: full recompute of the whole sequence for every token."""
    toks = list(prompt)
    for _ in range(n_new):
        cache = llama.new_kv_cache(cfg, 1, 256)
        logits, _ = llama.forward(
            params, cfg,
            jnp.asarray(np.asarray(toks, np.int32))[None, :],
            jnp.zeros(1, jnp.int32), cache, use_pallas=False)
        toks.append(int(jnp.argmax(logits[0, -1])))
    return toks[len(prompt):]


def test_greedy_matches_naive(setup):
    cfg, params = setup
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, cfg.vocab_size, 21, dtype=np.int32)
    golden = naive_greedy(cfg, params, prompt, 8)

    eng = ServingEngine(cfg, params, max_batch=2, max_seq=256,
                        use_pallas=False)
    [req] = eng.generate([prompt], SamplingParams(max_new_tokens=8))
    assert req.output_tokens == golden
    assert req.ttft_s is not None


def test_continuous_batching_many_requests(setup):
    cfg, params = setup
    rng = np.random.default_rng(1)
    prompts = [
        rng.integers(0, cfg.vocab_size, n, dtype=np.int32)
        for n in (5, 17, 33, 9, 26)
    ]
    goldens = [naive_greedy(cfg, params, p, 6) for p in prompts]

    eng = ServingEngine(cfg, params, max_batch=2, max_seq=256,
                        use_pallas=False)  # fewer slots than requests
    reqs = eng.generate(prompts, SamplingParams(max_new_tokens=6))
    for req, golden in zip(reqs, goldens):
        assert req.output_tokens == golden
    assert len(eng.free_slots) == 2 and not eng.running


def test_cache_reuse_same_output(setup):
    cfg, params = setup
    rng = np.random.default_rng(2)
    prompt = rng.integers(0, cfg.vocab_size, 70, dtype=np.int32)

    ce = LMCacheEngine(
        LMCacheEngineConfig.from_defaults(local_device="cpu", chunk_size=16),
        LMCacheEngineMetadata(model_name="tiny", world_size=1, worker_id=0,
                              fmt="vllm", dtype=cfg.dtype))
    eng = ServingEngine(cfg, params, max_batch=2, max_seq=256,
                        cache_engine=ce, use_pallas=False)

    [first] = eng.generate([prompt], SamplingParams(max_new_tokens=5))
    assert first.cached_prefix_len == 0
    ce.engine_.flush() if hasattr(ce.engine_, "flush") else None

    [second] = eng.generate([prompt], SamplingParams(max_new_tokens=5))
    # all 70 prompt tokens are cached (incl. the partial trailing chunk);
    # the engine always recomputes >= 1 token for the next-token logits
    assert second.cached_prefix_len == 69
    assert second.output_tokens == first.output_tokens
    ce.close()


def test_eos_and_stop_tokens(setup):
    cfg, params = setup
    rng = np.random.default_rng(3)
    prompt = rng.integers(0, cfg.vocab_size, 12, dtype=np.int32)
    golden = naive_greedy(cfg, params, prompt, 10)

    # force a stop at the 3rd generated token
    eng = ServingEngine(cfg, params, max_batch=1, max_seq=256,
                        use_pallas=False)
    [req] = eng.generate(
        [prompt],
        SamplingParams(max_new_tokens=10,
                       stop_token_ids=(golden[2],)))
    assert req.output_tokens == golden[:3]


def test_blend_request(setup):
    """context_chunks requests admit via CacheBlend and keep decoding."""
    cfg, params = setup
    rng = np.random.default_rng(9)
    ce = LMCacheEngine(
        LMCacheEngineConfig.from_defaults(local_device="cpu"),
        LMCacheEngineMetadata(model_name="tiny-blend", world_size=1,
                              worker_id=0, fmt="vllm", dtype=cfg.dtype))
    eng = ServingEngine(cfg, params, max_batch=2, max_seq=256,
                        cache_engine=ce, use_pallas=False,
                        blend_recompute_ratio=1.0)  # exact blend

    docs = [rng.integers(0, cfg.vocab_size, 24, dtype=np.int32)
            for _ in range(3)]
    req = Request(np.empty(0, np.int32),
                  SamplingParams(max_new_tokens=5),
                  context_chunks=docs)
    eng.add_request(req)
    eng.run()

    # ratio=1.0 blending is an exact prefill, so greedy output must match
    # the plain path
    golden = naive_greedy(cfg, params, np.concatenate(docs), 5)
    assert req.output_tokens == golden
    assert req.blended_tokens_recomputed == 72
    assert req.num_prompt_tokens == 72
    ce.close()


def test_decode_block_matches_single_step(setup):
    """decode_block>1 (on-device multi-step decode) must produce the same
    greedy tokens as step-by-step decode, including mid-block stops."""
    cfg, params = setup
    rng = np.random.default_rng(4)
    prompts = [rng.integers(0, cfg.vocab_size, n, dtype=np.int32)
               for n in (15, 23)]
    single = ServingEngine(cfg, params, max_batch=2, max_seq=128,
                           use_pallas=False)
    golden = single.generate(prompts, SamplingParams(max_new_tokens=7))

    blocked = ServingEngine(cfg, params, max_batch=2, max_seq=128,
                            use_pallas=False, decode_block=4)
    out = blocked.generate(prompts, SamplingParams(max_new_tokens=7))
    for g, o in zip(golden, out):
        assert o.output_tokens == g.output_tokens  # 7 = not a multiple of 4

    # stop token mid-block
    stop = golden[0].output_tokens[2]
    [r] = blocked.generate([prompts[0]],
                           SamplingParams(max_new_tokens=7,
                                          stop_token_ids=(stop,)))
    assert r.output_tokens == golden[0].output_tokens[:3]


def test_chunked_prefill_matches(setup):
    """Small prefill_chunk (multiple segments) = same greedy output."""
    cfg, params = setup
    prompt = np.random.default_rng(6).integers(0, cfg.vocab_size, 75,
                                               dtype=np.int32)
    golden = ServingEngine(cfg, params, max_batch=1, max_seq=256,
                           use_pallas=False).generate(
                               [prompt], SamplingParams(max_new_tokens=5))
    chunked = ServingEngine(cfg, params, max_batch=1, max_seq=256,
                            use_pallas=False, prefill_chunk=32)
    out = chunked.generate([prompt], SamplingParams(max_new_tokens=5))
    assert out[0].output_tokens == golden[0].output_tokens


def test_top_k_sampling(setup):
    """top_k=1 must equal greedy even at high temperature; top_k>1 stays
    within the top-k set of the step distribution."""
    cfg, params = setup
    prompt = np.random.default_rng(8).integers(0, cfg.vocab_size, 14,
                                               dtype=np.int32)
    greedy = ServingEngine(cfg, params, max_batch=1, max_seq=128,
                           use_pallas=False).generate(
                               [prompt],
                               SamplingParams(max_new_tokens=6))[0]

    eng = ServingEngine(cfg, params, max_batch=1, max_seq=128,
                        use_pallas=False)
    [r] = eng.generate([prompt],
                       SamplingParams(max_new_tokens=6, temperature=5.0,
                                      top_k=1))
    assert r.output_tokens == greedy.output_tokens

    # with unrestricted high temperature sampling, output should differ
    # from greedy with overwhelming probability (vocab 512, temp 5)
    eng2 = ServingEngine(cfg, params, max_batch=1, max_seq=128,
                         use_pallas=False)
    [r2] = eng2.generate([prompt],
                         SamplingParams(max_new_tokens=6, temperature=5.0))
    assert r2.output_tokens != greedy.output_tokens


def test_eager_store_publishes_at_prefill_complete(setup):
    """eager_store=True stores the prompt KV the moment prefill
    completes — while the request is still decoding — so disaggregated
    decode instances can retrieve without waiting for completion. The
    finish-time store-back then skip-existing-s past the chunks."""
    from lmcache_tpu.serving.request import RequestState

    tiny_cfg, tiny_params = setup
    ce = LMCacheEngine(
        LMCacheEngineConfig.from_defaults(local_device="cpu",
                                          chunk_size=16),
        LMCacheEngineMetadata(model_name="eager", world_size=1,
                              worker_id=0, fmt="vllm",
                              dtype=tiny_cfg.dtype))
    eng = ServingEngine(tiny_cfg, tiny_params, max_batch=2, max_seq=128,
                        use_pallas=False, cache_engine=ce,
                        eager_store=True, prefill_chunk=32)
    prompt = np.random.default_rng(31).integers(
        0, tiny_cfg.vocab_size, 48, dtype=np.int32)
    req = Request(list(prompt), SamplingParams(max_new_tokens=12))
    eng.add_request(req)
    # drive until prefill completes but the request is still decoding
    for _ in range(50):
        eng.step()
        if req in eng.running:
            break
    assert req in eng.running and req.state != RequestState.FINISHED
    ce.engine_.flush()
    # the full-chunk prefix of the PROMPT is already retrievable
    assert ce.lookup(prompt) >= 48 - 16
    golden = list(req.output_tokens)
    eng.run()
    assert req.state == RequestState.FINISHED
    assert req.output_tokens[:len(golden)] == golden

    # a fresh request over the same prompt reuses the eager-stored KV
    [r2] = eng.generate([list(prompt)], SamplingParams(max_new_tokens=12))
    assert r2.cached_prefix_len > 0
    assert r2.output_tokens == req.output_tokens
    ce.close()


def test_remote_cachegen_grouped_inject_matches_retrieve(
        setup, lmserver_process):
    """The grouped host-chunk injection path (_stream_inject batching
    many still-entropy-coded chunks into one device program) must put
    EXACTLY the same KV into the pool as the plain retrieve() path —
    byte-parity between the two decode routes is the whole exactness
    contract of the on-device decoder."""
    import dataclasses

    cfg, params = setup
    rng = np.random.default_rng(11)
    prompt = rng.integers(0, cfg.vocab_size, 70, dtype=np.int32)

    def make_ce(pipelined):
        c = LMCacheEngineConfig.from_defaults(
            local_device=None, remote_url=lmserver_process.url,
            remote_serde="cachegen", chunk_size=16,
            pipelined_backend=pipelined)
        c = dataclasses.replace(c, cachegen_device_decode="on")
        return LMCacheEngine(
            c, LMCacheEngineMetadata(model_name="tiny-grouped",
                                     world_size=1, worker_id=0,
                                     fmt="vllm", dtype=cfg.dtype))

    # seed the remote store with the prompt's KV
    seed = make_ce(False)
    cache = llama.new_kv_cache(cfg, 1, 128)
    _, cache = llama.forward(params, cfg, jnp.asarray(prompt)[None],
                             jnp.zeros(1, jnp.int32), cache,
                             use_pallas=False)
    seed.store(prompt, llama.cache_to_blob(cache, 0, len(prompt)),
               blocking=True)
    seed.close()

    ce = make_ce(True)
    try:
        eng = ServingEngine(cfg, params, max_batch=2, max_seq=256,
                            cache_engine=ce, use_pallas=False)
        # force several small groups so flush-boundary logic runs
        eng.inject_group_chunks = 2
        req = Request(prompt, SamplingParams(max_new_tokens=1))
        eng.add_request(req)
        # drive steps to trigger admission + grouped stream inject
        while not (eng.running or req.output_tokens):
            eng.step()
        # all 70 tokens are stored (incl. the partial trailing chunk);
        # the engine always recomputes >= 1 token
        assert req.cached_prefix_len == 69

        # reference route: retrieve() -> one manual inject on a fresh
        # pool position (slot 1 is free)
        blob, mask = ce.retrieve(prompt, return_tuple=False)
        assert int(mask.sum()) == 70
        pool2 = eng._inject(eng.kv_pool, jnp.asarray(blob),
                            jnp.asarray(1, jnp.int32),
                            jnp.asarray(0, jnp.int32))
        got = np.asarray(pool2[:, :, req.slot, :, :69])
        ref = np.asarray(pool2[:, :, 1, :, :69])
        assert np.array_equal(got, ref)
        eng.run()
    finally:
        ce.close()


def test_stream_inject_overlaps_decode_with_injection(
        setup, lmserver_process, monkeypatch):
    """Pipelining contract of _stream_inject: the decode of group k+1
    must be DISPATCHED before group k is injected, so device decode
    overlaps injection instead of serializing behind it (VERDICT r4
    next-step #2). Asserted on the actual call order of _finish_group
    vs _inject."""
    import dataclasses

    cfg, params = setup
    rng = np.random.default_rng(23)
    prompt = rng.integers(0, cfg.vocab_size, 70, dtype=np.int32)

    c = LMCacheEngineConfig.from_defaults(
        local_device=None, remote_url=lmserver_process.url,
        remote_serde="cachegen", chunk_size=16)
    c = dataclasses.replace(c, cachegen_device_decode="on")
    meta = LMCacheEngineMetadata(model_name="tiny-overlap", world_size=1,
                                 worker_id=0, fmt="vllm", dtype=cfg.dtype)
    seed = LMCacheEngine(c, meta)
    cache = llama.new_kv_cache(cfg, 1, 128)
    _, cache = llama.forward(params, cfg, jnp.asarray(prompt)[None],
                             jnp.zeros(1, jnp.int32), cache,
                             use_pallas=False)
    seed.store(prompt, llama.cache_to_blob(cache, 0, len(prompt)),
               blocking=True)
    seed.close()

    ce = LMCacheEngine(c, meta)
    try:
        eng = ServingEngine(cfg, params, max_batch=2, max_seq=256,
                            cache_engine=ce, use_pallas=False)
        eng.inject_group_chunks = 2  # 70 tokens / 16 -> 3 groups
        events = []
        real_finish = type(eng)._finish_group
        real_inject = eng._inject

        def spy_finish(self, group):
            events.append(("decode", len(events)))
            return real_finish(self, group)

        def spy_inject(pool, blob, slot, pos):
            events.append(("inject", len(events)))
            return real_inject(pool, blob, slot, pos)

        monkeypatch.setattr(type(eng), "_finish_group", spy_finish)
        eng._inject = spy_inject
        req = Request(prompt, SamplingParams(max_new_tokens=1))
        eng.add_request(req)
        while not (eng.running or req.output_tokens):
            eng.step()
        assert req.cached_prefix_len == 69
        kinds = [k for k, _ in events]
        assert kinds.count("decode") >= 3
        # the FIRST inject must come after the SECOND decode dispatch:
        # group 1's injection waited for group 2's decode to be in
        # flight
        first_inject = kinds.index("inject")
        assert kinds[:first_inject].count("decode") >= 2, kinds
        # and every decode (except the first) is dispatched before the
        # previous group's inject
        assert kinds.count("inject") == kinds.count("decode")
    finally:
        ce.close()
