"""OpenAI-compatible HTTP front for the serving engine.

The reference points users at vLLM's HTTP server (reference:
examples/online_session); here the front is in-repo: aiohttp server with
``/v1/completions`` and ``/v1/chat/completions`` (both optionally
SSE-streamed), ``/v1/models`` and ``/health``. The scheduler runs on a
dedicated thread; HTTP handlers submit requests thread-safely and await
completion.

Prompts are accepted as token-id lists (the framework is
tokenizer-agnostic); pass ``tokenizer``/``detokenizer`` callables to
serve plain strings.
"""

import asyncio
import json
import threading
import time
from typing import Callable, Optional

from lmcache_tpu.logging_utils import init_logger
from lmcache_tpu.serving.engine import ServingEngine
from lmcache_tpu.serving.request import (Request, RequestState,
                                         SamplingParams)

logger = init_logger(__name__)


class APIServer:

    def __init__(
        self,
        engine: ServingEngine,
        model_name: str = "lmcache-tpu",
        tokenizer: Optional[Callable[[str], list]] = None,
        detokenizer: Optional[Callable[[list], str]] = None,
        chat_template: Optional[Callable[[list], object]] = None,
    ):
        self.engine = engine
        self.model_name = model_name
        self.tokenizer = tokenizer
        self.detokenizer = detokenizer or (
            lambda toks: " ".join(map(str, toks)))
        # renders /v1/chat/completions ``messages`` into a prompt
        # (string or token ids) — e.g. HF's
        # ``tokenizer.apply_chat_template``; without one a generic
        # role-tagged text template feeds the plain tokenizer
        self.chat_template = chat_template
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    # -- scheduler thread ---------------------------------------------------

    def _loop(self):
        while not self._stop.is_set():
            with self._lock:
                busy = self.engine.has_work()
                if busy:
                    self.engine.step()
            if not busy:
                time.sleep(0.002)

    def start(self):
        self._thread = threading.Thread(target=self._loop,
                                        name="lmc-scheduler", daemon=True)
        self._thread.start()

    def stop(self):
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=10)

    # -- request handling ---------------------------------------------------

    def _submit(self, prompt, sampling: SamplingParams,
                context_chunks=None) -> Request:
        if isinstance(prompt, str):
            if self.tokenizer is None:
                raise ValueError(
                    "string prompts need a tokenizer; pass token ids")
            prompt = self.tokenizer(prompt)
        req = Request(prompt, sampling, context_chunks=context_chunks)
        with self._lock:
            self.engine.add_request(req)
        return req

    async def _await_done(self, req: Request):
        while req.state != RequestState.FINISHED:
            await asyncio.sleep(0.005)

    @staticmethod
    def _finish_reason(req, sampling) -> str:
        """OpenAI semantics: "length" when truncated by max_tokens,
        "stop" when generation ended on a stop condition."""
        return ("length" if len(req.output_tokens)
                >= sampling.max_new_tokens else "stop")

    def _render_chat(self, messages):
        """Render chat ``messages`` to a prompt (string or token ids).

        Each message must be ``{"role": ..., "content": ...}``. With no
        ``chat_template``, a generic role-tagged text template is used
        (model-correct templates — llama/gemma/chatml formats — belong
        to the tokenizer layer; pass ``apply_chat_template`` there)."""
        for m in messages:
            if not isinstance(m, dict) or "content" not in m:
                raise ValueError(
                    "each message needs 'role' and 'content'")
        if self.chat_template is not None:
            return self.chat_template(messages)
        text = "".join(
            f"{m.get('role', 'user')}: {m['content']}\n" for m in messages
        ) + "assistant:"
        return text

    # -- aiohttp app --------------------------------------------------------

    def build_app(self):
        from aiohttp import web

        async def health(_):
            return web.json_response({"status": "ok"})

        async def metrics_endpoint(_):
            from lmcache_tpu import metrics
            return web.Response(text=metrics.prometheus_text(),
                                content_type="text/plain")

        async def models(_):
            return web.json_response({
                "object": "list",
                "data": [{
                    "id": self.model_name,
                    "object": "model",
                    "owned_by": "lmcache-tpu",
                }],
            })

        async def completions(request):
            try:
                body = await request.json()
            except json.JSONDecodeError:
                return web.json_response({"error": "invalid JSON"},
                                         status=400)
            try:
                sampling = SamplingParams(
                    max_new_tokens=int(body.get("max_tokens", 16)),
                    temperature=float(body.get("temperature", 0.0)),
                    top_k=int(body.get("top_k", 0)),
                    top_p=float(body.get("top_p", 1.0)),
                    seed=int(body.get("seed", 0)),
                    stop_token_ids=tuple(body.get("stop_token_ids", ())),
                )
                req = self._submit(
                    body.get("prompt", []), sampling,
                    context_chunks=body.get("context_chunks"))
            except ValueError as e:
                return web.json_response({"error": str(e)}, status=400)

            if body.get("stream", False):
                resp = web.StreamResponse(headers={
                    "Content-Type": "text/event-stream",
                    "Cache-Control": "no-cache",
                })
                await resp.prepare(request)
                sent = 0
                while True:
                    toks = list(req.output_tokens)
                    for tok in toks[sent:]:
                        chunk = {
                            "id": f"cmpl-{req.request_id}",
                            "object": "text_completion",
                            "model": self.model_name,
                            "choices": [{
                                "index": 0,
                                "text": self.detokenizer([tok]),
                                "token": tok,
                                "finish_reason": None,
                            }],
                        }
                        await resp.write(
                            f"data: {json.dumps(chunk)}\n\n".encode())
                    sent = len(toks)
                    if req.state == RequestState.FINISHED and sent == len(
                            req.output_tokens):
                        break
                    await asyncio.sleep(0.005)
                # terminal chunk: clients that stop on finish_reason
                # (common SDK pattern) must see one before [DONE]
                await resp.write(("data: " + json.dumps({
                    "id": f"cmpl-{req.request_id}",
                    "object": "text_completion",
                    "model": self.model_name,
                    "choices": [{
                        "index": 0, "text": "",
                        "finish_reason": self._finish_reason(
                            req, sampling),
                    }],
                }) + "\n\n").encode())
                await resp.write(b"data: [DONE]\n\n")
                await resp.write_eof()
                return resp

            await self._await_done(req)
            return web.json_response({
                "id": f"cmpl-{req.request_id}",
                "object": "text_completion",
                "created": int(time.time()),
                "model": self.model_name,
                "choices": [{
                    "index": 0,
                    "text": self.detokenizer(req.output_tokens),
                    "tokens": req.output_tokens,
                    "finish_reason": self._finish_reason(req, sampling),
                }],
                "usage": {
                    "prompt_tokens": req.num_prompt_tokens,
                    "completion_tokens": len(req.output_tokens),
                    "total_tokens": req.total_len,
                    "cached_prefix_tokens": req.cached_prefix_len,
                    "ttft_ms": (round(req.ttft_s * 1e3, 2)
                                if req.ttft_s else None),
                },
            })

        async def chat_completions(request):
            """OpenAI-style chat endpoint: ``messages`` are rendered to
            a prompt by ``chat_template`` (or a generic role-tagged
            fallback through the tokenizer) and served by the same
            engine path as /v1/completions. The multi-turn prefix is
            exactly what the cache engine reuses: every follow-up turn
            hits the stored KV of the conversation so far."""
            try:
                body = await request.json()
            except json.JSONDecodeError:
                return web.json_response({"error": "invalid JSON"},
                                         status=400)
            messages = body.get("messages")
            if not isinstance(messages, list) or not messages:
                return web.json_response(
                    {"error": "messages must be a non-empty list"},
                    status=400)
            try:
                prompt = self._render_chat(messages)
                sampling = SamplingParams(
                    max_new_tokens=int(body.get("max_tokens", 16)),
                    temperature=float(body.get("temperature", 0.0)),
                    top_k=int(body.get("top_k", 0)),
                    top_p=float(body.get("top_p", 1.0)),
                    seed=int(body.get("seed", 0)),
                    stop_token_ids=tuple(body.get("stop_token_ids", ())),
                )
                req = self._submit(prompt, sampling,
                                   context_chunks=body.get(
                                       "context_chunks"))
            except ValueError as e:
                return web.json_response({"error": str(e)}, status=400)

            if body.get("stream", False):
                resp = web.StreamResponse(headers={
                    "Content-Type": "text/event-stream",
                    "Cache-Control": "no-cache",
                })
                await resp.prepare(request)
                sent = 0
                first = True
                while True:
                    toks = list(req.output_tokens)
                    for tok in toks[sent:]:
                        delta = {"content": self.detokenizer([tok])}
                        if first:
                            delta["role"] = "assistant"
                            first = False
                        chunk = {
                            "id": f"chatcmpl-{req.request_id}",
                            "object": "chat.completion.chunk",
                            "model": self.model_name,
                            "choices": [{
                                "index": 0,
                                "delta": delta,
                                "token": tok,
                                "finish_reason": None,
                            }],
                        }
                        await resp.write(
                            f"data: {json.dumps(chunk)}\n\n".encode())
                    sent = len(toks)
                    if (req.state == RequestState.FINISHED
                            and sent == len(req.output_tokens)):
                        break
                    await asyncio.sleep(0.005)
                await resp.write(("data: " + json.dumps({
                    "id": f"chatcmpl-{req.request_id}",
                    "object": "chat.completion.chunk",
                    "model": self.model_name,
                    "choices": [{
                        "index": 0, "delta": {},
                        "finish_reason": self._finish_reason(
                            req, sampling),
                    }],
                }) + "\n\n").encode())
                await resp.write(b"data: [DONE]\n\n")
                await resp.write_eof()
                return resp

            await self._await_done(req)
            return web.json_response({
                "id": f"chatcmpl-{req.request_id}",
                "object": "chat.completion",
                "created": int(time.time()),
                "model": self.model_name,
                "choices": [{
                    "index": 0,
                    "message": {
                        "role": "assistant",
                        "content": self.detokenizer(req.output_tokens),
                    },
                    "tokens": req.output_tokens,
                    "finish_reason": self._finish_reason(req, sampling),
                }],
                "usage": {
                    "prompt_tokens": req.num_prompt_tokens,
                    "completion_tokens": len(req.output_tokens),
                    "total_tokens": req.total_len,
                    "cached_prefix_tokens": req.cached_prefix_len,
                    "ttft_ms": (round(req.ttft_s * 1e3, 2)
                                if req.ttft_s else None),
                },
            })

        app = web.Application()
        app.router.add_get("/health", health)
        app.router.add_get("/metrics", metrics_endpoint)
        app.router.add_get("/v1/models", models)
        app.router.add_post("/v1/completions", completions)
        app.router.add_post("/v1/chat/completions", chat_completions)
        return app

    def run(self, host: str = "localhost", port: int = 8000):
        import threading

        from aiohttp import web
        self.start()
        try:
            web.run_app(
                self.build_app(), host=host, port=port,
                # signal handlers can only be installed on the main
                # thread; embedding callers run the server on a worker
                handle_signals=threading.current_thread()
                is threading.main_thread(),
                print=lambda *_: logger.info(
                    "API server on %s:%d", host, port))
        finally:
            self.stop()
