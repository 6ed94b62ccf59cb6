"""Cache-engine store/retrieve matrix (reference: tests/test_cache_engine.py).

Geometry is scaled down (4 layers x 2 heads x 64) so the full matrix runs
fast on CPU; the logic (chunk boundaries, masks, skip-existing) is identical
at any geometry.
"""

import numpy as np
import pytest

from lmcache_tpu.cache_engine import LMCacheEngine, LMCacheEngineBuilder
from lmcache_tpu.config import LMCacheEngineConfig, LMCacheEngineMetadata
from tests.conftest import (check_kv_equal, concat_kv_tuples,
                            generate_kv_tuples, generate_tokens)

CHUNK = 16


def make_engine(backend, fmt="vllm", chunk_size=CHUNK, remote_url=None,
                tmp_path=None):
    if backend == "disk":
        backend = f"file://{tmp_path}/cache/"
    config = LMCacheEngineConfig.from_legacy(chunk_size=chunk_size,
                                             backend=backend)
    if remote_url is not None:
        config = LMCacheEngineConfig(chunk_size=chunk_size,
                                     local_device=None if backend is None
                                     else config.local_device,
                                     remote_url=remote_url)
    metadata = LMCacheEngineMetadata("test-model", 3, 123, fmt)
    return LMCacheEngine(config, metadata)


@pytest.mark.parametrize("fmt", ["vllm", "huggingface"])
@pytest.mark.parametrize("backend", ["cpu", "tpu", "disk"])
def test_store_retrieve_roundtrip(fmt, backend, tmp_path, autorelease):
    engine = autorelease(make_engine(backend, fmt, tmp_path=tmp_path))
    tokens = generate_tokens(3 * CHUNK)
    kv = generate_kv_tuples(3 * CHUNK, fmt)
    engine.store(tokens, kv)
    out, mask = engine.retrieve(tokens)
    assert mask.all()
    check_kv_equal(out, kv, fmt)


@pytest.mark.parametrize("fmt", ["vllm", "huggingface"])
def test_retrieve_prefix_partial_chunk(fmt, autorelease):
    """Storing N tokens then querying a longer sequence returns the full
    stored chunks only (partial trailing chunk semantics)."""
    engine = autorelease(make_engine("cpu", fmt))
    n_stored = 2 * CHUNK + 7  # trailing partial chunk
    tokens = generate_tokens(4 * CHUNK)
    kv = generate_kv_tuples(n_stored, fmt)
    engine.store(tokens[:n_stored], kv)

    out, mask = engine.retrieve(tokens)
    # full chunks are retrievable; the trailing partial chunk also got its
    # own hash when stored, but the query hashes chunk 3 with 16 tokens so
    # it cannot match the 7-token stored chunk
    n_expected = 2 * CHUNK
    assert mask.sum() == n_expected
    assert mask[:n_expected].all() and not mask[n_expected:].any()
    expected = tuple(
        (np.asarray(k)[:n_expected] if fmt == "vllm" else
         np.asarray(k)[:, :n_expected],
         np.asarray(v)[:n_expected] if fmt == "vllm" else
         np.asarray(v)[:, :n_expected]) for k, v in kv)
    check_kv_equal(out, expected, fmt)


def test_retrieve_miss(autorelease):
    engine = autorelease(make_engine("cpu"))
    tokens = generate_tokens(2 * CHUNK)
    out, mask = engine.retrieve(tokens)
    assert out == ()
    assert not mask.any()


@pytest.mark.parametrize("fmt", ["vllm", "huggingface"])
def test_suffix_mask_skips_known_prefix(fmt, autorelease):
    engine = autorelease(make_engine("cpu", fmt))
    n = 4 * CHUNK
    tokens = generate_tokens(n)
    kv = generate_kv_tuples(n, fmt)
    engine.store(tokens, kv)

    # caller already has KV for the first 2.5 chunks
    num_have = 2 * CHUNK + CHUNK // 2
    mask = np.ones(n, dtype=bool)
    mask[:num_have] = False
    out, ret_mask = engine.retrieve(tokens, mask=mask)

    assert not ret_mask[:num_have].any()
    assert ret_mask[num_have:].all()
    token_axis = 0 if fmt == "vllm" else 1
    assert out[0][0].shape[token_axis] == n - num_have
    expected = tuple(
        (np.asarray(k)[num_have:] if fmt == "vllm" else
         np.asarray(k)[:, num_have:],
         np.asarray(v)[num_have:] if fmt == "vllm" else
         np.asarray(v)[:, num_have:]) for k, v in kv)
    check_kv_equal(out, expected, fmt)


def test_mixed_retrieve_and_overwrite(autorelease):
    """Store two different docs; retrieval keeps them separate. Re-storing
    the same tokens is a no-op with skip_existing."""
    engine = autorelease(make_engine("cpu"))
    t1, t2 = generate_tokens(2 * CHUNK, seed=1), generate_tokens(
        2 * CHUNK, seed=2)
    kv1 = generate_kv_tuples(2 * CHUNK, seed=1)
    kv2 = generate_kv_tuples(2 * CHUNK, seed=2)
    engine.store(t1, kv1)
    engine.store(t2, kv2)

    out1, m1 = engine.retrieve(t1)
    out2, m2 = engine.retrieve(t2)
    assert m1.all() and m2.all()
    check_kv_equal(out1, kv1)
    check_kv_equal(out2, kv2)

    # extending doc1 stores only the new chunks
    t1_ext = np.concatenate([t1, generate_tokens(CHUNK, seed=3)])
    kv_ext = concat_kv_tuples(kv1, generate_kv_tuples(CHUNK, seed=3))
    n_written = engine.store(t1_ext, kv_ext)
    assert n_written == 1

    out, mask = engine.retrieve(t1_ext)
    assert mask.all()
    check_kv_equal(out, kv_ext)


def test_store_skip_existing_counts(autorelease):
    engine = autorelease(make_engine("cpu"))
    tokens = generate_tokens(4 * CHUNK)
    kv = generate_kv_tuples(4 * CHUNK)
    assert engine.store(tokens, kv) == 4
    assert engine.store(tokens, kv) == 0  # all chunks already cached
    assert engine.store(tokens, kv, skip_existing=False) == 4


def test_lookup(autorelease):
    engine = autorelease(make_engine("cpu"))
    tokens = generate_tokens(4 * CHUNK)
    kv = generate_kv_tuples(2 * CHUNK)
    engine.store(tokens[:2 * CHUNK], kv)
    assert engine.lookup(tokens) == 2 * CHUNK
    assert engine.lookup(tokens[:CHUNK]) == CHUNK
    assert engine.lookup(generate_tokens(CHUNK, seed=9)) == 0


def test_blob_roundtrip_jax(autorelease):
    """Store from a jax.Array blob into the HBM tier, retrieve as blob."""
    import jax.numpy as jnp
    from lmcache_tpu import kv as kvmod
    engine = autorelease(make_engine("tpu"))
    tokens = generate_tokens(2 * CHUNK)
    kv = generate_kv_tuples(2 * CHUNK)
    blob = jnp.asarray(kvmod.tuple_to_blob(kv))
    engine.store(tokens, blob)
    out, mask = engine.retrieve(tokens, return_tuple=False)
    assert mask.all()
    np.testing.assert_array_equal(np.asarray(out), np.asarray(blob))


def test_builder_singleton():
    config = LMCacheEngineConfig.from_legacy(backend="cpu")
    metadata = LMCacheEngineMetadata("m", 1, 0, "vllm")
    try:
        e1 = LMCacheEngineBuilder.get_or_create("inst", config, metadata)
        e2 = LMCacheEngineBuilder.get_or_create("inst", config, metadata)
        assert e1 is e2
        assert LMCacheEngineBuilder.get("inst") is e1
        other = LMCacheEngineConfig.from_legacy(backend="cpu", chunk_size=512)
        with pytest.raises(ValueError):
            LMCacheEngineBuilder.get_or_create("inst", other, metadata)
    finally:
        LMCacheEngineBuilder.destroy("inst")
    assert LMCacheEngineBuilder.get("inst") is None


def test_token_kv_length_mismatch(autorelease):
    engine = autorelease(make_engine("cpu"))
    with pytest.raises(ValueError):
        engine.store(generate_tokens(10), generate_kv_tuples(12))


def test_retrieve_stream_chunks(autorelease):
    """retrieve_stream yields contiguous chunks equal to the one-shot
    retrieve blob, and respects the suffix mask."""
    from lmcache_tpu import kv as kvmod
    engine = autorelease(
        LMCacheEngine(
            LMCacheEngineConfig.from_defaults(local_device="cpu",
                                              chunk_size=CHUNK),
            LMCacheEngineMetadata("stream-model", 1, 0, "vllm")))
    n = 3 * CHUNK + 7
    tokens = generate_tokens(n, seed=30)
    kv = generate_kv_tuples(n, seed=30)
    engine.store(tokens, kv)

    chunks = list(engine.retrieve_stream(tokens))
    assert [p for _, p, _ in chunks] == [0, CHUNK, 2 * CHUNK, 3 * CHUNK]
    assert [t for _, _, t in chunks] == [CHUNK, CHUNK, CHUNK, 7]
    blob = kvmod.concat_blobs([c for c, _, _ in chunks], "vllm")
    one_shot, mask = engine.retrieve(tokens, return_tuple=False)
    assert mask.all()
    np.testing.assert_array_equal(np.asarray(blob), np.asarray(one_shot))

    # suffix mask: caller already has the first 1.5 chunks
    mask = np.ones(n, bool)
    mask[:CHUNK + CHUNK // 2] = False
    chunks = list(engine.retrieve_stream(tokens, mask=mask))
    assert chunks[0][1] == CHUNK + CHUNK // 2
    assert chunks[0][2] == CHUNK // 2
