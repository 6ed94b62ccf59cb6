"""Two real OS processes + jax.distributed coordination sharing one
cache server (VERDICT r1 next #6: 'a two-process jax.distributed CPU
test sharing one cache server over DCN-style TCP'). Each process plays
one host of a world_size=2 TP deployment: stores its own head-shard,
retrieves the peer's, verifies bit-exact."""

import os
import subprocess
import sys

import pytest

from tests.conftest import pick_free_port

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_shared_cache(lmserver_process, tmp_path):
    coord_port = pick_free_port()
    worker = os.path.join(_REPO, "tests", "dcn_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # single local device per process
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(coord_port),
             lmserver_process.url, str(pid), str(tmp_path)],
            cwd=_REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=150)
        outs.append(out.decode(errors="replace"))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"DCN WORKER {pid} OK" in out
