"""Dependency-free source format check, enforced in CI.

The reference repo enforces a formatter in CI (yapf,
reference .github/workflows/yapf.yml); this is our equivalent gate,
implemented in-repo so it runs identically in CI and on machines
without the lint toolchain. Rules match the [tool.ruff] config
(line-length 79) plus whitespace hygiene:

    python tools/format_check.py            # check, exit 1 on violation
"""

import sys
from pathlib import Path

MAX_LEN = 79
ROOTS = ["lmcache_tpu", "tools", "tests", "examples",
         "bench.py", "__graft_entry__.py"]


def check_file(path: Path) -> list:
    errors = []
    raw = path.read_bytes()
    if b"\r" in raw:
        errors.append(f"{path}: CRLF line endings")
    if raw and not raw.endswith(b"\n"):
        errors.append(f"{path}: missing trailing newline")
    if raw.endswith(b"\n\n\n"):
        errors.append(f"{path}: multiple blank lines at EOF")
    for i, line in enumerate(raw.decode("utf-8").split("\n"), 1):
        if line != line.rstrip():
            errors.append(f"{path}:{i}: trailing whitespace")
        if "\t" in line:
            errors.append(f"{path}:{i}: tab character")
        if len(line) > MAX_LEN:
            errors.append(f"{path}:{i}: line too long "
                          f"({len(line)} > {MAX_LEN})")
    return errors


def main() -> int:
    repo = Path(__file__).resolve().parent.parent
    errors = []
    for root in ROOTS:
        p = repo / root
        files = [p] if p.is_file() else sorted(p.rglob("*.py"))
        for f in files:
            errors.extend(check_file(f))
    for e in errors:
        print(e)
    if errors:
        print(f"\n{len(errors)} format violation(s)")
        return 1
    print("format check: clean")
    return 0


if __name__ == "__main__":
    sys.exit(main())
