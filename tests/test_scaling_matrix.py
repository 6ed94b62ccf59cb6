"""The scaling-matrix dryrun rows hold their memory/collective claims."""

import pytest

jax = pytest.importorskip("jax")

from tools.scaling_matrix import run_row  # noqa: E402


def test_tp_halves_memory_and_inserts_allreduce():
    r1 = run_row(1, 1)
    r2 = run_row(1, 2)
    assert r1["step_ok"] and r2["step_ok"]
    assert r1["collectives"]["all_reduce"] == 0
    assert r2["collectives"]["all_reduce"] > 0
    # TP=2 params/device ~ half of TP=1 (embeddings replicate, so not
    # exactly half)
    assert r2["param_bytes_per_device"] < 0.62 * r1["param_bytes_per_device"]
    assert r2["kv_bytes_per_device"] == r1["kv_bytes_per_device"] // 2


def test_dp_ring_prefill_rides_collective_permute():
    r = run_row(2, 2)
    assert r["step_ok"] and r["ring_ok"]
    assert r["ring_collectives"]["collective_permute"] > 0
