"""Token chunking and rolling prefix-hash properties."""

import numpy as np
import pytest

from lmcache_tpu.chunks import num_chunks, prefix_chunk_hashes


def test_hash_deterministic():
    tokens = np.arange(100, dtype=np.int32)
    a = prefix_chunk_hashes(tokens, 16)
    b = prefix_chunk_hashes(tokens, 16)
    assert a == b
    assert len(a) == num_chunks(100, 16) == 7


def test_hash_commits_to_prefix():
    t1 = np.arange(64, dtype=np.int32)
    t2 = t1.copy()
    t2[0] = 999  # change in the first chunk changes every later hash
    h1 = prefix_chunk_hashes(t1, 16)
    h2 = prefix_chunk_hashes(t2, 16)
    assert all(a != b for a, b in zip(h1, h2))


def test_shared_prefix_shares_hashes():
    t1 = np.arange(64, dtype=np.int32)
    t2 = np.concatenate([t1[:32], np.array([7, 8, 9] * 11,
                                            dtype=np.int32)[:32]])
    h1 = prefix_chunk_hashes(t1, 16)
    h2 = prefix_chunk_hashes(t2, 16)
    assert h1[:2] == h2[:2]
    assert h1[2:] != h2[2:]


def test_num_skip_chunk():
    tokens = np.arange(64, dtype=np.int32)
    full = prefix_chunk_hashes(tokens, 16)
    assert prefix_chunk_hashes(tokens, 16, num_skip_chunk=2) == full[2:]


def test_dtype_invariance():
    """Same ids as different int dtypes must hash identically."""
    t32 = np.arange(40, dtype=np.int32)
    t64 = np.arange(40, dtype=np.int64)
    assert prefix_chunk_hashes(t32, 16) == prefix_chunk_hashes(t64, 16)
    assert prefix_chunk_hashes(list(range(40)), 16) == \
        prefix_chunk_hashes(t32, 16)


def test_rejects_2d():
    with pytest.raises(ValueError):
        prefix_chunk_hashes(np.zeros((2, 2), dtype=np.int32), 16)
