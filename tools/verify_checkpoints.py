"""Verify the in-tree quality-gate checkpoints against their pinned
hashes (checkpoints/SHA256SUMS). Run by CI before the test job so a
corrupt or silently-swapped checkpoint fails loudly instead of skewing
a binding quality gate. See checkpoints/README.md for why the binaries
are in-tree at all.

    python tools/verify_checkpoints.py
"""

import hashlib
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.path.join(ROOT, "checkpoints")


def main() -> int:
    pins = {}
    with open(os.path.join(CKPT, "SHA256SUMS")) as f:
        for line in f:
            digest, name = line.split()
            pins[name] = digest
    rc = 0
    for name, want in sorted(pins.items()):
        path = os.path.join(CKPT, name)
        if not os.path.exists(path):
            print(f"MISSING  {name}")
            rc = 1
            continue
        h = hashlib.sha256()
        with open(path, "rb") as f:
            for blk in iter(lambda: f.read(1 << 20), b""):
                h.update(blk)
        got = h.hexdigest()
        ok = got == want
        print(f"{'OK      ' if ok else 'MISMATCH'} {name}")
        if not ok:
            rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
