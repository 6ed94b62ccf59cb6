"""On-device range decoder + host-phase CacheGen pipeline tests.

The XLA decoder (ops/range_decode.py) must be BIT-EXACT with the C++
range coder for any valid container — KV reuse silently corrupts
generation otherwise (same bar as the retrieval-contract tests,
reference tests/test_cache_engine.py equality matrix).
"""

import numpy as np
import pytest

from lmcache_tpu.codec import range_coder as rc
from lmcache_tpu.config import LMCacheEngineConfig, LMCacheEngineMetadata
from lmcache_tpu.ops.range_decode import decode_streams_device
from lmcache_tpu.storage.serde.cachegen_serde import (
    CacheGenDeserializer, CacheGenSerializer, finish_host_chunks,
    finish_mixed_chunks)

pytestmark = pytest.mark.skipif(not rc.codec_available(),
                                reason="C++ range coder unavailable")


def _cdf_for(sym, T):
    """Empirical container-style CDF (matches ops/quant.compute_cdf)."""
    S = sym.shape[0]
    counts = np.stack([(sym == b).sum(1) for b in range(32)],
                      -1).astype(np.float64)
    cdf_f = np.concatenate([np.zeros((S, 1)),
                            np.cumsum(counts / T, 1)], 1)
    cdf_i = np.round(cdf_f * (2**16 - 32)).astype(np.int64) + np.arange(33)
    return (cdf_i % 65536).astype(np.uint16)


def _encode_and_pad(sym):
    S, T = sym.shape
    cdf = _cdf_for(sym, T)
    payload, lens = rc.encode_streams(sym, cdf)
    stride = max(16, (int(lens.max()) + 4 + 15) // 16 * 16)
    padded = rc.pad_streams(payload, lens, stride)
    return payload, lens, cdf, padded


@pytest.mark.parametrize("kind", ["uniform", "skewed", "binary",
                                  "extreme", "gauss"])
def test_device_decode_bit_exact(kind):
    rng = np.random.default_rng(hash(kind) % 2**31)
    S, T = 96, 256
    if kind == "uniform":
        sym = rng.integers(0, 31, (S, T)).astype(np.uint8)
    elif kind == "skewed":
        sym = np.minimum(rng.geometric(0.5, (S, T)) - 1, 30).astype(
            np.uint8)
    elif kind == "binary":
        sym = ((rng.random((S, T)) < 0.01) * 30).astype(np.uint8)
    elif kind == "extreme":
        sym = np.zeros((S, T), np.uint8)
        sym[:, ::97] = 30
    else:
        sym = np.clip(np.round(rng.normal(15, 2, (S, T))), 0,
                      30).astype(np.uint8)
    payload, lens, cdf, padded = _encode_and_pad(sym)
    ref = rc.decode_streams(payload, lens, T, cdf)
    out, ovf = decode_streams_device(padded, lens.astype(np.int32),
                                     cdf, T)
    assert not bool(np.asarray(ovf))
    assert np.array_equal(np.asarray(out), ref)
    assert np.array_equal(ref, sym)


def test_overflow_flag_trips_when_bound_too_small():
    """With renorm_iters=1 real streams need more iterations — the
    guard must report it rather than return wrong symbols silently."""
    rng = np.random.default_rng(0)
    sym = rng.integers(0, 31, (32, 256)).astype(np.uint8)
    _, lens, cdf, padded = _encode_and_pad(sym)
    _, ovf = decode_streams_device(padded, lens.astype(np.int32), cdf,
                                   256, renorm_iters=1)
    assert bool(np.asarray(ovf))


def test_pad_streams_cpp_matches_numpy_fallback(monkeypatch):
    rng = np.random.default_rng(3)
    lens = rng.integers(0, 40, 257)
    payload = rng.integers(0, 255, int(lens.sum()),
                           dtype=np.uint8).tobytes()
    a = rc.pad_streams(payload, lens, 48)
    monkeypatch.setattr(rc, "_get_lib", lambda: None)
    b = rc.pad_streams(payload, lens, 48)
    assert np.array_equal(a, b)


# ---------------------------------------------------------------------------
# host-phase serde
# ---------------------------------------------------------------------------

def _serde(fmt="vllm", mode="auto"):
    import dataclasses
    cfg = LMCacheEngineConfig.from_defaults(remote_serde="cachegen")
    cfg = dataclasses.replace(cfg, cachegen_device_decode=mode)
    meta = LMCacheEngineMetadata(model_name="lmsys/longchat-7b-16k",
                                 world_size=1, worker_id=0, fmt=fmt,
                                 dtype="float32")
    return CacheGenSerializer(cfg, meta), CacheGenDeserializer(cfg, meta)


def test_device_finish_matches_host_finish():
    ser, de = _serde()
    rng = np.random.default_rng(0)
    blob = rng.standard_normal((4, 2, 256, 2, 16)).astype(np.float32)
    bs = ser.to_bytes(blob)
    host = np.asarray(finish_host_chunks([de.from_bytes_host(bs)],
                                         mode="off"))
    dev = np.asarray(finish_host_chunks([de.from_bytes_host(bs)],
                                        mode="on"))
    assert np.array_equal(host, dev)
    # and from_bytes (single-chunk compat API) agrees
    assert np.array_equal(np.asarray(de.from_bytes(bs)), host)


@pytest.mark.parametrize("fmt", ["vllm", "huggingface"])
def test_batched_finish_equals_per_chunk_concat(fmt):
    ser, de = _serde(fmt)
    rng = np.random.default_rng(1)
    if fmt == "vllm":
        shapes = [(4, 2, 128, 2, 16)] * 3 + [(4, 2, 50, 2, 16)]
        axis = 2
    else:
        shapes = [(4, 2, 2, 128, 16)] * 3 + [(4, 2, 2, 50, 16)]
        axis = 3
    blobs = [rng.standard_normal(s).astype(np.float32) for s in shapes]
    bss = [ser.to_bytes(b) for b in blobs]
    batched = np.asarray(finish_mixed_chunks(
        [de.from_bytes_host(b) for b in bss], mode="on"))
    singles = np.concatenate([np.asarray(de.from_bytes(b)) for b in bss],
                             axis=axis)
    assert np.array_equal(batched, singles)


def test_slice_tokens_lazy():
    ser, de = _serde()
    rng = np.random.default_rng(2)
    blob = rng.standard_normal((4, 2, 128, 2, 16)).astype(np.float32)
    bs = ser.to_bytes(blob)
    full = np.asarray(de.from_bytes(bs))
    hc = de.from_bytes_host(bs)
    assert hc.num_tokens == 128
    sl = hc.slice_tokens(37, 101)
    assert sl.num_tokens == 64
    assert np.array_equal(np.asarray(sl.to_blob()), full[:, :, 37:101])


def test_latent_single_stream_container():
    ser, de = _serde()
    rng = np.random.default_rng(4)
    lat = rng.standard_normal((4, 1, 128, 1, 64)).astype(np.float32)
    bs = ser.to_bytes(lat)
    host = np.asarray(finish_host_chunks([de.from_bytes_host(bs)],
                                         mode="off"))
    dev = np.asarray(finish_host_chunks([de.from_bytes_host(bs)],
                                        mode="on"))
    assert host.shape == lat.shape
    assert np.array_equal(host, dev)


def test_overflow_falls_back_to_host_decoder(monkeypatch):
    """A tripped overflow flag must transparently re-decode on host —
    wrong symbols can never be served."""
    import lmcache_tpu.ops.range_decode as rd
    ser, de = _serde()
    rng = np.random.default_rng(5)
    blob = rng.standard_normal((4, 2, 64, 2, 16)).astype(np.float32)
    bs = ser.to_bytes(blob)
    truth = np.asarray(finish_host_chunks([de.from_bytes_host(bs)],
                                          mode="off"))

    real = rd.decode_streams_device

    def broken(payload, lens, cdf, n_symbols, renorm_iters=4):
        sym, _ = real(payload, lens, cdf, n_symbols, renorm_iters)
        import jax.numpy as jnp
        return jnp.zeros_like(sym), jnp.asarray(True)

    import lmcache_tpu.storage.serde.cachegen_serde as cs
    monkeypatch.setattr(rd, "decode_streams_device", broken)
    monkeypatch.setattr(cs, "decode_streams_device", broken,
                        raising=False)
    out = np.asarray(finish_host_chunks([de.from_bytes_host(bs)],
                                        mode="on"))
    assert np.array_equal(out, truth)


@pytest.mark.parametrize("kind", ["gauss", "skewed"])
def test_pallas_decoder_bit_exact(kind):
    """The Pallas tile kernel (lane-packed transposed layout) must be
    bit-exact with the C++ coder, like the lax.scan version."""
    from lmcache_tpu.ops.range_decode import decode_streams_pallas
    rng = np.random.default_rng(hash(kind) % 2**31)
    S, T = 200, 192  # non-multiple of the tile: exercises padding
    if kind == "gauss":
        sym = np.clip(np.round(rng.normal(15, 2, (S, T))), 0,
                      30).astype(np.uint8)
    else:
        sym = np.minimum(rng.geometric(0.4, (S, T)) - 1, 30).astype(
            np.uint8)
    payload, lens, cdf, padded = _encode_and_pad(sym)
    out, ovf = decode_streams_pallas(padded, lens.astype(np.int32),
                                     cdf, T, interpret=True)
    assert not bool(np.asarray(ovf))
    assert np.array_equal(np.asarray(out), sym)


@pytest.mark.parametrize("mode,expect_device", [("on", True),
                                                ("off", False)])
def test_config_mode_is_stamped_and_honored(mode, expect_device,
                                            monkeypatch):
    """cachegen_device_decode from the engine CONFIG must control the
    grouped finisher path (serving _stream_inject -> finish_host_chunks
    with no explicit mode), not just the single-chunk from_bytes —
    'off' is the documented escape hatch if the device decoder
    misbehaves (ADVICE r4 medium)."""
    import lmcache_tpu.ops.range_decode as rd
    calls = {"n": 0}
    real = rd.decode_streams_best

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(rd, "decode_streams_best", counting)
    ser, de = _serde(mode=mode)
    rng = np.random.default_rng(11)
    blobs = [rng.standard_normal((4, 2, 128, 2, 16)).astype(np.float32)
             for _ in range(3)]
    chunks = [de.from_bytes_host(ser.to_bytes(b)) for b in blobs]
    assert all(c.decode_mode == mode for c in chunks)
    assert chunks[0].slice_tokens(5, 100).decode_mode == mode
    # no explicit mode: the grouped path must pick up the stamp
    out = np.asarray(finish_host_chunks(chunks))
    assert (calls["n"] > 0) == expect_device
    truth = np.concatenate([np.asarray(de.from_bytes(ser.to_bytes(b)))
                            for b in blobs], axis=2)
    assert np.array_equal(out, truth)


def test_to_bytes_batch_byte_identical():
    """Batched store-path encoding must produce byte-identical
    containers to per-chunk to_bytes (same quant, same CDFs, same
    coder), including the odd-shaped trailing chunk."""
    ser, de = _serde()
    rng = np.random.default_rng(8)
    blobs = ([rng.standard_normal((4, 2, 128, 2, 16)).astype(np.float32)
              for _ in range(5)]
             + [rng.standard_normal((4, 2, 50, 2, 16)).astype(
                 np.float32)])
    batch = ser.to_bytes_batch(blobs)
    singles = [ser.to_bytes(b) for b in blobs]
    for i, (a, b) in enumerate(zip(batch, singles)):
        assert a == b, f"chunk {i} differs"


def test_to_bytes_batch_latent_and_hf():
    rng = np.random.default_rng(9)
    ser, _ = _serde()
    lats = [rng.standard_normal((4, 1, 128, 1, 64)).astype(np.float32)
            for _ in range(3)]
    assert ser.to_bytes_batch(lats) == [ser.to_bytes(b) for b in lats]
    ser_hf, _ = _serde("huggingface")
    hfs = [rng.standard_normal((4, 2, 2, 128, 16)).astype(np.float32)
           for _ in range(3)]
    assert ser_hf.to_bytes_batch(hfs) == [ser_hf.to_bytes(b)
                                          for b in hfs]
