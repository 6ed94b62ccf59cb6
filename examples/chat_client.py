"""Minimal chat-style client for the API server (reference analogue:
examples/frontend streamlit app — here a terminal REPL, tokenizer-free).

Start a server first (examples/online_session.py serves one), then:

    python examples/chat_client.py --port 8377

Each line you type is hashed to token ids (demo stand-in for a real
tokenizer), appended to the running conversation, and completed with
streaming output; the growing prefix hits the KV cache every round.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))


import argparse
import hashlib
import json

import httpx


def fake_tokenize(text: str, vocab: int = 512):
    """Deterministic text -> token ids (demo only; bring a tokenizer)."""
    out = []
    for word in text.split():
        h = hashlib.sha256(word.encode()).digest()
        out.append(int.from_bytes(h[:2], "little") % vocab)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="localhost")
    ap.add_argument("--port", type=int, default=8377)
    ap.add_argument("--max-tokens", type=int, default=24)
    args = ap.parse_args()
    base = f"http://{args.host}:{args.port}"

    history = []
    print("chat client — empty line to quit")
    while True:
        try:
            line = input("> ").strip()
        except EOFError:
            break
        if not line:
            break
        history += fake_tokenize(line)
        with httpx.stream("POST", f"{base}/v1/completions",
                          json={"prompt": history,
                                "max_tokens": args.max_tokens,
                                "stream": True},
                          timeout=300) as r:
            toks = []
            for raw in r.iter_lines():
                if not raw.startswith("data: ") or raw == "data: [DONE]":
                    continue
                ev = json.loads(raw[len("data: "):])
                tok = ev["choices"][0]["token"]
                toks.append(tok)
                print(tok, end=" ", flush=True)
            print()
            history += toks


if __name__ == "__main__":
    main()
