"""OpenAI-compatible API server tests (aiohttp test client, driven via
asyncio.run — pytest-asyncio is not available in this environment)."""

import asyncio

import numpy as np
import pytest

jax = pytest.importorskip("jax")
aiohttp = pytest.importorskip("aiohttp")

from lmcache_tpu.models import llama  # noqa: E402
from lmcache_tpu.serving import ServingEngine  # noqa: E402
from lmcache_tpu.serving.api import APIServer  # noqa: E402


@pytest.fixture()
def server():
    cfg = llama.LlamaConfig.tiny(n_layers=2)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    eng = ServingEngine(cfg, params, max_batch=2, max_seq=128,
                        use_pallas=False)
    srv = APIServer(eng, model_name="tiny-test")
    srv.start()
    yield srv
    srv.stop()


async def _with_client(server, coro):
    from aiohttp.test_utils import TestClient, TestServer
    client = TestClient(TestServer(server.build_app()))
    await client.start_server()
    try:
        return await coro(client)
    finally:
        await client.close()


def test_health_and_models(server):

    async def body(client):
        r = await client.get("/health")
        assert r.status == 200
        r = await client.get("/v1/models")
        assert (await r.json())["data"][0]["id"] == "tiny-test"

    asyncio.run(_with_client(server, body))


def test_completions(server):

    async def body(client):
        prompt = np.random.default_rng(0).integers(0, 512, 9).tolist()
        r = await client.post("/v1/completions",
                              json={"prompt": prompt, "max_tokens": 4})
        assert r.status == 200
        out = await r.json()
        assert len(out["choices"][0]["tokens"]) == 4
        assert out["usage"]["prompt_tokens"] == 9
        assert out["usage"]["ttft_ms"] is not None

        # string prompt without tokenizer -> 400
        r = await client.post("/v1/completions",
                              json={"prompt": "hello", "max_tokens": 2})
        assert r.status == 400

    asyncio.run(_with_client(server, body))


def test_streaming(server):

    async def body(client):
        prompt = np.random.default_rng(1).integers(0, 512, 7).tolist()
        r = await client.post("/v1/completions",
                              json={"prompt": prompt, "max_tokens": 3,
                                    "stream": True})
        assert r.status == 200
        raw = (await r.read()).decode()
        events = [ln for ln in raw.split("\n\n") if ln.startswith("data: ")]
        assert events[-1] == "data: [DONE]"
        # 3 tokens + terminal finish_reason chunk + DONE
        assert len(events) == 5
        import json as _json
        # bounded by max_tokens -> "length" (OpenAI semantics)
        assert _json.loads(events[-2][6:])["choices"][0][
            "finish_reason"] == "length"

    asyncio.run(_with_client(server, body))


def test_sampling_params_over_http(server):
    """top_k/top_p/seed accepted over HTTP and equal to engine-level
    sampling (VERDICT r1 next #9 'Done' criterion)."""
    from lmcache_tpu.serving import SamplingParams

    prompt = np.random.default_rng(2).integers(0, 512, 11).tolist()
    sp = SamplingParams(max_new_tokens=6, temperature=1.3, top_k=40,
                        top_p=0.9, seed=123)
    eng_ref = ServingEngine(server.engine.cfg, server.engine.params,
                            max_batch=2, max_seq=128, use_pallas=False)
    [golden] = eng_ref.generate([np.asarray(prompt, np.int32)], sp)

    async def body(client):
        r = await client.post("/v1/completions",
                              json={"prompt": prompt, "max_tokens": 6,
                                    "temperature": 1.3, "top_k": 40,
                                    "top_p": 0.9, "seed": 123})
        assert r.status == 200
        out = await r.json()
        assert out["choices"][0]["tokens"] == golden.output_tokens

    asyncio.run(_with_client(server, body))


def test_api_on_paged_engine():
    """The HTTP front drives the paged engine identically."""
    from lmcache_tpu.serving.paged_engine import PagedServingEngine

    cfg = llama.LlamaConfig.tiny(n_layers=2)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    eng = PagedServingEngine(cfg, params, max_batch=2, max_seq=128,
                             num_pages=16, page_size=16, use_pallas=False)
    srv = APIServer(eng, model_name="tiny-paged")
    srv.start()
    try:
        prompt = np.random.default_rng(3).integers(0, 512, 10).tolist()

        async def body(client):
            r = await client.post("/v1/completions",
                                  json={"prompt": prompt, "max_tokens": 5})
            assert r.status == 200
            out = await r.json()
            assert len(out["choices"][0]["tokens"]) == 5

        asyncio.run(_with_client(srv, body))
    finally:
        srv.stop()


def test_chat_completions():
    """/v1/chat/completions renders messages through the chat template
    (token ids here), serves via the same engine path, and the
    multi-turn prefix hits the KV cache on the follow-up request."""
    from lmcache_tpu.cache_engine import LMCacheEngine
    from lmcache_tpu.config import (LMCacheEngineConfig,
                                    LMCacheEngineMetadata)

    cfg = llama.LlamaConfig.tiny(n_layers=2)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    ce = LMCacheEngine(
        LMCacheEngineConfig.from_defaults(local_device="cpu",
                                          chunk_size=16),
        LMCacheEngineMetadata(model_name="tiny-chat", world_size=1,
                              worker_id=0, fmt="vllm", dtype=cfg.dtype))
    eng = ServingEngine(cfg, params, max_batch=2, max_seq=256,
                        use_pallas=False, cache_engine=ce)

    def template(messages):
        # toy id-level template: hash role+content into stable tokens
        out = []
        for m in messages:
            out.extend((7 + sum(map(ord, m["role"]))) % 512
                       for _ in range(2))
            out.extend((3 * ord(c) + 11) % 512 for c in m["content"])
        return out

    srv = APIServer(eng, model_name="tiny-chat", chat_template=template)
    srv.start()
    try:

        async def body(client):
            msgs = [{"role": "system", "content": "be brief"},
                    {"role": "user", "content": "hello there, long "
                                                "context " * 4}]
            r = await client.post("/v1/chat/completions",
                                  json={"messages": msgs,
                                        "max_tokens": 4})
            assert r.status == 200
            out = await r.json()
            assert out["object"] == "chat.completion"
            msg = out["choices"][0]["message"]
            assert msg["role"] == "assistant" and msg["content"]
            first_toks = out["choices"][0]["tokens"]

            # follow-up turn: same conversation + the assistant turn —
            # the shared prefix must come from the cache
            ce.engine_.flush()
            msgs2 = msgs + [{"role": "assistant", "content": "ok"},
                            {"role": "user", "content": "more?"}]
            r = await client.post("/v1/chat/completions",
                                  json={"messages": msgs2,
                                        "max_tokens": 4})
            out2 = await r.json()
            assert out2["usage"]["cached_prefix_tokens"] >= 16
            # the OpenAI prompt-caching shape (prompt_tokens_details)
            assert (out2["usage"]["prompt_tokens_details"]["cached_tokens"]
                    == out2["usage"]["cached_prefix_tokens"])
            assert len(out2["choices"][0]["tokens"]) == 4

            # streaming chat: deltas then [DONE]
            r = await client.post("/v1/chat/completions",
                                  json={"messages": msgs, "stream": True,
                                        "max_tokens": 3})
            assert r.status == 200
            text = (await r.read()).decode()
            # 3 token deltas + the terminal finish_reason chunk
            assert text.count("chat.completion.chunk") == 4
            assert '"finish_reason": "length"' in text
            assert text.strip().endswith("data: [DONE]")
            assert '"role": "assistant"' in text

            # greedy determinism across the two identical requests
            r = await client.post("/v1/chat/completions",
                                  json={"messages": msgs,
                                        "max_tokens": 4})
            out3 = await r.json()
            assert out3["choices"][0]["tokens"] == first_toks

            # malformed messages -> 400
            r = await client.post("/v1/chat/completions",
                                  json={"messages": "hi"})
            assert r.status == 400
            r = await client.post("/v1/chat/completions",
                                  json={"messages": [{"role": "user"}]})
            assert r.status == 400

        asyncio.run(_with_client(srv, body))
    finally:
        srv.stop()
        ce.close()


def test_n_choices_and_streamed_usage(server):
    """n > 1 returns independent indexed choices; streaming with
    stream_options.include_usage ends with a usage chunk (VERDICT r2
    weak #8)."""

    async def body(client):
        prompt = np.random.default_rng(4).integers(0, 512, 8).tolist()
        r = await client.post("/v1/completions",
                              json={"prompt": prompt, "max_tokens": 3,
                                    "n": 2})
        assert r.status == 200
        out = await r.json()
        assert [c["index"] for c in out["choices"]] == [0, 1]
        # greedy choices coincide; usage counts both completions
        assert out["usage"]["completion_tokens"] == 6
        assert out["usage"]["prompt_tokens"] == 8

        # seeded sampling: choice seeds differ so streams diverge but
        # stay reproducible per index
        r = await client.post("/v1/completions",
                              json={"prompt": prompt, "max_tokens": 6,
                                    "temperature": 1.5, "seed": 9, "n": 2})
        out = await r.json()
        assert out["choices"][0]["tokens"] != out["choices"][1]["tokens"]

        # streamed usage chunk before [DONE]
        import json as _json
        r = await client.post("/v1/completions",
                              json={"prompt": prompt, "max_tokens": 3,
                                    "stream": True,
                                    "stream_options": {
                                        "include_usage": True}})
        raw = (await r.read()).decode()
        events = [ln[6:] for ln in raw.split("\n\n")
                  if ln.startswith("data: ") and ln != "data: [DONE]"]
        usage_chunk = _json.loads(events[-1])
        assert usage_chunk["choices"] == []
        assert usage_chunk["usage"]["completion_tokens"] == 3

    asyncio.run(_with_client(server, body))


def test_stop_strings(server):
    """OpenAI ``stop`` strings: generation ends when the output text
    contains a stop string, the matched text is excluded, finish_reason
    is "stop", and streaming never emits a partial stop string."""

    async def body(client):
        prompt = np.random.default_rng(5).integers(0, 512, 9).tolist()
        # discover the greedy continuation (default detokenizer renders
        # tokens as space-joined decimal ids)
        r = await client.post("/v1/completions",
                              json={"prompt": prompt, "max_tokens": 6})
        toks = (await r.json())["choices"][0]["tokens"]
        assert len(toks) == 6
        stop = str(toks[2])  # text of the 3rd token

        r = await client.post("/v1/completions",
                              json={"prompt": prompt, "max_tokens": 6,
                                    "stop": stop})
        out = await r.json()
        c = out["choices"][0]
        assert c["finish_reason"] == "stop"
        assert stop not in c["text"]
        # generation actually stopped early (within detokenizer slack)
        assert len(c["tokens"]) <= 4

        # streamed: concatenated deltas must equal the truncated text
        r = await client.post("/v1/completions",
                              json={"prompt": prompt, "max_tokens": 6,
                                    "stop": stop, "stream": True})
        raw = (await r.read()).decode()
        import json as _json
        parts, finish = [], None
        for ln in raw.split("\n\n"):
            if not ln.startswith("data: ") or ln == "data: [DONE]":
                continue
            ch = _json.loads(ln[6:])["choices"][0]
            parts.append(ch["text"])
            if ch["finish_reason"]:
                finish = ch["finish_reason"]
        assert finish == "stop"
        assert "".join(parts) == c["text"]

        # list form + >4 stops rejected
        r = await client.post("/v1/completions",
                              json={"prompt": prompt, "max_tokens": 2,
                                    "stop": [stop, "zzz"]})
        assert r.status == 200
        r = await client.post("/v1/completions",
                              json={"prompt": prompt, "max_tokens": 2,
                                    "stop": ["a", "b", "c", "d", "e"]})
        assert r.status == 400

    asyncio.run(_with_client(server, body))


def test_finish_reason_stop_at_length_boundary(server):
    """ADVICE r2 #3: a stop hit exactly at the max_tokens boundary must
    report "stop", not "length"."""

    async def body(client):
        prompt = np.random.default_rng(6).integers(0, 512, 7).tolist()
        r = await client.post("/v1/completions",
                              json={"prompt": prompt, "max_tokens": 4})
        toks = (await r.json())["choices"][0]["tokens"]

        r = await client.post("/v1/completions",
                              json={"prompt": prompt, "max_tokens": 4,
                                    "stop_token_ids": [toks[3]]})
        out = await r.json()
        assert out["choices"][0]["tokens"] == toks
        assert out["choices"][0]["finish_reason"] == "stop"

    asyncio.run(_with_client(server, body))


def test_logprobs(server):
    """``logprobs: N`` returns per-token chosen logprob + top-N
    alternatives; greedy chosen token is the top-1 alternative."""

    async def body(client):
        import math
        prompt = np.random.default_rng(7).integers(0, 512, 10).tolist()
        r = await client.post("/v1/completions",
                              json={"prompt": prompt, "max_tokens": 3,
                                    "logprobs": 2})
        out = await r.json()
        c = out["choices"][0]
        lp = c["logprobs"]
        assert len(lp["tokens"]) == 3
        assert len(lp["token_logprobs"]) == 3
        for i, (tok_text, tok_lp, top) in enumerate(zip(
                lp["tokens"], lp["token_logprobs"], lp["top_logprobs"])):
            assert len(top) == 2
            assert all(v <= 0.0 for v in top.values())
            # greedy decode: the chosen token IS the most likely one
            best = max(top, key=top.get)
            assert best == tok_text
            assert math.isclose(top[best], tok_lp, rel_tol=1e-5,
                                abs_tol=1e-5)

        # chat shape: logprobs: true + top_logprobs
        msgs = [{"role": "user", "content": "hi"}]
        srv_tok = APIServer(server.engine, model_name="x",
                            tokenizer=lambda s: [ord(ch) % 512
                                                 for ch in s])
        from aiohttp.test_utils import TestClient, TestServer
        client2 = TestClient(TestServer(srv_tok.build_app()))
        await client2.start_server()
        try:
            r = await client2.post("/v1/chat/completions",
                                   json={"messages": msgs,
                                         "max_tokens": 2,
                                         "logprobs": True,
                                         "top_logprobs": 3})
            out = await r.json()
            content = out["choices"][0]["logprobs"]["content"]
            assert len(content) == 2
            assert len(content[0]["top_logprobs"]) == 3
        finally:
            await client2.close()

    asyncio.run(_with_client(server, body))


def test_chat_default_template_needs_tokenizer():
    """Without a chat template the generic text template feeds the
    tokenizer; with neither, a clear 400."""
    cfg = llama.LlamaConfig.tiny(n_layers=2)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    eng = ServingEngine(cfg, params, max_batch=2, max_seq=64,
                        use_pallas=False)
    srv = APIServer(eng, model_name="tiny-chat2",
                    tokenizer=lambda s: [ord(c) % 512 for c in s])
    srv.start()
    try:

        async def body(client):
            r = await client.post("/v1/chat/completions",
                                  json={"messages": [{"role": "user",
                                                      "content": "hi"}],
                                        "max_tokens": 2})
            assert r.status == 200
            out = await r.json()
            assert len(out["choices"][0]["tokens"]) == 2

        asyncio.run(_with_client(srv, body))
    finally:
        srv.stop()

    srv2 = APIServer(eng, model_name="no-tok")
    srv2.start()
    try:

        async def body2(client):
            r = await client.post("/v1/chat/completions",
                                  json={"messages": [{"role": "user",
                                                      "content": "hi"}]})
            assert r.status == 400

        asyncio.run(_with_client(srv2, body2))
    finally:
        srv2.stop()


def test_multiturn_real_text_cached_tokens_climb():
    """A real multi-turn TEXT conversation over HTTP (byte-level BPE
    tokenizer trained offline, examples/demo_tokenizer.py): the OpenAI
    ``prompt_tokens_details.cached_tokens`` usage field must climb
    every round as the growing prefix is served from the KV cache
    (VERDICT r3 next #8; reference anchor: examples/frontend)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "examples"))
    from demo_tokenizer import get_tokenizer

    from lmcache_tpu.cache_engine import LMCacheEngine
    from lmcache_tpu.config import (LMCacheEngineConfig,
                                    LMCacheEngineMetadata)

    cfg = llama.LlamaConfig.tiny(n_layers=2)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    tok = get_tokenizer(cfg.vocab_size)
    assert tok.kind == "bpe"  # transformers/tokenizers is a test dep
    # real round trip: encode(decode(ids)) stabilizes on text
    ids = tok.encode("the quick brown fox jumps over the lazy dog")
    assert tok.decode(ids).strip() == ("the quick brown fox jumps over "
                                       "the lazy dog")

    ce = LMCacheEngine(
        LMCacheEngineConfig.from_defaults(local_device="cpu",
                                          chunk_size=16),
        LMCacheEngineMetadata(model_name="tiny-text", world_size=1,
                              worker_id=0, fmt="vllm", dtype=cfg.dtype))
    eng = ServingEngine(cfg, params, max_batch=2, max_seq=512,
                        cache_engine=ce, use_pallas=False,
                        save_decode_cache=True)
    srv = APIServer(eng, model_name="tiny-text",
                    tokenizer=tok.encode, detokenizer=tok.decode)
    srv.start()
    try:

        turns = [
            "the quick brown fox jumps over the lazy dog and the "
            "cache holds the keys and values of every token seen",
            "a journey of a thousand miles begins with a single "
            "step and pages hold the cache chunks hash the tokens",
            "ask not what your country can do for you reuse the "
            "prefix compute only the suffix and the first token",
        ]

        async def body(client):
            history = ""
            cached_seen = []
            for turn in turns:
                # each round the USER adds text; the growing prefix was
                # prefilled (and cached) by the previous round
                history += ("\n" if history else "") + turn
                r = await client.post(
                    "/v1/completions",
                    json={"prompt": history, "max_tokens": 8})
                assert r.status == 200
                out = await r.json()
                usage = out["usage"]
                cached_seen.append(
                    usage["prompt_tokens_details"]["cached_tokens"])
                assert isinstance(out["choices"][0]["text"], str)
            return cached_seen

        cached = asyncio.run(_with_client(srv, body))
        assert cached[0] == 0  # first round: cold cache
        # later rounds reuse the growing prefix — strictly climbing
        assert cached[1] > 0 and cached[2] > cached[1]
    finally:
        srv.stop()
        ce.close()
