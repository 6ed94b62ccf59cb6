"""Minimal chat-style client for the API server (reference analogue:
examples/frontend streamlit app — here a terminal REPL).

Start a server first (examples/online_session.py serves one), then:

    python examples/chat_client.py --port 8377

Each line you type is appended to the running conversation as TEXT —
the server tokenizes with its real (byte-level BPE) tokenizer, completes
with streaming output, and reports how many prompt tokens were served
from the KV cache via the OpenAI ``prompt_tokens_details.cached_tokens``
usage field. Watch that number climb every round: the growing prefix is
prefilled exactly once.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))


import argparse
import json

import httpx


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="localhost")
    ap.add_argument("--port", type=int, default=8377)
    ap.add_argument("--max-tokens", type=int, default=24)
    args = ap.parse_args()
    base = f"http://{args.host}:{args.port}"

    history = ""
    print("chat client — empty line to quit")
    while True:
        try:
            line = input("> ").strip()
        except EOFError:
            break
        if not line:
            break
        history += ("\n" if history else "") + line
        with httpx.stream("POST", f"{base}/v1/completions",
                          json={"prompt": history,
                                "max_tokens": args.max_tokens,
                                "stream": True,
                                "stream_options": {
                                    "include_usage": True}},
                          timeout=300) as r:
            reply = ""
            usage = None
            for raw in r.iter_lines():
                if not raw.startswith("data: ") or raw == "data: [DONE]":
                    continue
                ev = json.loads(raw[len("data: "):])
                if ev.get("usage"):
                    usage = ev["usage"]
                    continue
                if not ev["choices"]:
                    continue
                piece = ev["choices"][0].get("text", "")
                reply += piece
                print(piece, end="", flush=True)
            print()
            if usage:
                cached = usage.get("prompt_tokens_details", {}).get(
                    "cached_tokens", 0)
                print(f"  [cached {cached}/{usage['prompt_tokens']} "
                      f"prompt tokens; ttft {usage.get('ttft_ms')} ms]")
            history += reply


if __name__ == "__main__":
    main()
