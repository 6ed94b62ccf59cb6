"""On-device range ENCODER tests: the Pallas store-path kernel must be
BYTE-IDENTICAL with the C++ range coder — containers built on device
and on host must be indistinguishable (same bar as the decoder,
tests/test_range_decode.py)."""

import numpy as np
import pytest

from lmcache_tpu.codec import range_coder as rc
from lmcache_tpu.ops.range_encode import (encode_streams_pallas,
                                          estimate_stride,
                                          words_to_payload)

pytestmark = pytest.mark.skipif(not rc.codec_available(),
                                reason="C++ range coder unavailable")


def _cdf_for(sym, T):
    S = sym.shape[0]
    counts = np.stack([(sym == b).sum(1) for b in range(32)],
                      -1).astype(np.float64)
    cdf_f = np.concatenate([np.zeros((S, 1)),
                            np.cumsum(counts / T, 1)], 1)
    cdf_i = np.round(cdf_f * (2**16 - 32)).astype(np.int64) + np.arange(33)
    return (cdf_i % 65536).astype(np.uint16)


def _mk(kind, S, T, seed=None):
    rng = np.random.default_rng(seed if seed is not None
                                else hash(kind) % 2**31)
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
    return sym, _cdf_for(sym, T)


@pytest.mark.parametrize("kind", ["uniform", "skewed", "binary",
                                  "extreme", "gauss"])
def test_device_encode_byte_identical(kind):
    S, T = 96, 256
    sym, cdf = _mk(kind, S, T)
    ref_payload, ref_lens = rc.encode_streams(sym, cdf)
    stride = estimate_stride(cdf, T)
    words, lens, ovf = encode_streams_pallas(sym, cdf, stride,
                                             interpret=True)
    assert not bool(np.asarray(ovf)), f"stride {stride} overflowed"
    payload, lens64 = words_to_payload(np.asarray(words),
                                       np.asarray(lens), S)
    assert np.array_equal(lens64, ref_lens)
    assert payload == ref_payload


def test_non_multiple_tile_and_odd_symbols():
    """Stream counts off the tile and symbol counts off the 4-pack."""
    S, T = 200, 190
    sym, cdf = _mk("gauss", S, T, seed=5)
    ref_payload, ref_lens = rc.encode_streams(sym, cdf)
    stride = estimate_stride(cdf, T)
    words, lens, ovf = encode_streams_pallas(sym, cdf, stride,
                                             interpret=True)
    assert not bool(np.asarray(ovf))
    payload, lens64 = words_to_payload(np.asarray(words),
                                       np.asarray(lens), S)
    assert np.array_equal(lens64, ref_lens)
    assert payload == ref_payload


def test_overflow_flag_trips_on_small_stride():
    S, T = 32, 256
    sym, cdf = _mk("uniform", S, T, seed=7)
    _, _, ovf = encode_streams_pallas(sym, cdf, 16, interpret=True)
    assert bool(np.asarray(ovf))


def test_serde_device_encode_container_byte_identical():
    """A container built with the device encoder must be
    indistinguishable from a host-coded one — any consumer (including
    the reference-parity retrieval path) sees identical bytes."""
    import dataclasses

    from lmcache_tpu.config import (LMCacheEngineConfig,
                                    LMCacheEngineMetadata)
    from lmcache_tpu.storage.serde.cachegen_serde import CacheGenSerializer

    def mk(mode):
        cfg = LMCacheEngineConfig.from_defaults(remote_serde="cachegen")
        cfg = dataclasses.replace(cfg, cachegen_device_encode=mode)
        meta = LMCacheEngineMetadata(model_name="lmsys/longchat-7b-16k",
                                     world_size=1, worker_id=0,
                                     fmt="vllm", dtype="float32")
        return CacheGenSerializer(cfg, meta)

    rng = np.random.default_rng(13)
    blob = rng.standard_normal((4, 2, 64, 2, 16)).astype(np.float32)
    lat = rng.standard_normal((4, 1, 64, 1, 32)).astype(np.float32)
    host_ser, dev_ser = mk("off"), mk("on")
    assert dev_ser.to_bytes(blob) == host_ser.to_bytes(blob)
    assert dev_ser.to_bytes(lat) == host_ser.to_bytes(lat)
    # batched store path too (one kernel launch for all chunks)
    blobs = [rng.standard_normal((4, 2, 64, 2, 16)).astype(np.float32)
             for _ in range(3)]
    assert dev_ser.to_bytes_batch(blobs) == host_ser.to_bytes_batch(blobs)


def test_estimate_stride_covers_actual():
    """The entropy-based stride must cover the real coded sizes for
    every distribution family (the device path depends on this holding
    in the common case; the flag only guards the tail)."""
    for kind in ["uniform", "skewed", "binary", "extreme", "gauss"]:
        sym, cdf = _mk(kind, 64, 256, seed=11)
        _, lens = rc.encode_streams(sym, cdf)
        stride = estimate_stride(cdf, 256)
        assert int(lens.max()) <= stride, (kind, int(lens.max()), stride)


def test_vmem_guard_routes_oversized_launches():
    """Giant single-chunk containers must not OOM Mosaic's scoped VMEM:
    the feasibility guards route them to scan/host without tripping the
    Pallas broken-lowering demotion (a capacity miss is not a bug)."""
    from lmcache_tpu.ops import range_decode as rd
    from lmcache_tpu.ops import range_encode as re_

    # serving-size launches fit
    assert rd.pallas_vmem_ok(720896, 160, 256)
    assert re_.pallas_vmem_ok(720896, 160, 256)
    # an 8k-token context serialized as ONE chunk does not
    assert not rd.pallas_vmem_ok(160, 22032, 8256)
    assert not re_.pallas_vmem_ok(160, 22032, 8256)

    # decode_streams_best on an oversized launch must still decode
    # correctly (scan path) and must NOT set _pallas_broken
    sym, cdf = _mk("gauss", 8, 256, seed=21)
    import numpy as np
    from lmcache_tpu.codec import range_coder as rc
    payload, lens = rc.encode_streams(sym, cdf)
    stride = 22032  # absurd stride: trips the guard, not the kernel
    padded = rc.pad_streams(payload, lens, stride)
    was_broken = rd._pallas_broken
    out, ovf = rd.decode_streams_best(padded, lens.astype(np.int32),
                                      cdf, 256)
    assert not bool(np.asarray(ovf))
    assert np.array_equal(np.asarray(out), sym)
    assert rd._pallas_broken == was_broken


def test_stride_classes_decision_is_padding_aware():
    """The split decision must compare TILE-PADDED download sizes (what
    crosses the wire), not raw stream counts: a 2x256-stream split each
    padding to 1024 streams downloads MORE than one 512-stream launch,
    so it must refuse; at >= tile-scale counts the same entropy split
    is a real ~45% saving and must engage."""
    from lmcache_tpu.ops.range_encode import stride_classes

    bimodal_small = np.array([16] * 300 + [160] * 100)
    assert len(stride_classes(bimodal_small)) == 1  # padding would win
    bimodal_big = np.array([16] * 3000 + [160] * 3000)
    cls = stride_classes(bimodal_big)
    assert len(cls) > 1
    assert sum(len(ix) for _, ix in cls) == 6000
    assert all(st % 16 == 0 for st, _ in cls)
    # generic (non-bucketed) rows still yield kernel-legal strides
    assert all(st % 16 == 0
               for st, _ in stride_classes(
                   np.array([10] * 3000 + [99] * 3000)))
    assert len(stride_classes(np.full(4000, 64))) == 1
    assert len(stride_classes(bimodal_small[:100])) == 1  # too few


def test_stride_class_reassembly_byte_identity(monkeypatch):
    """The multi-class reassembly path (padded gathers, per-class
    kernels, offset scatter back into original stream order) must be
    byte-identical with the host coder. The split is FORCED via
    monkeypatch so the test stays small enough for interpret mode —
    the padding-aware decision itself is unit-tested above."""
    import dataclasses

    from lmcache_tpu.config import (LMCacheEngineConfig,
                                    LMCacheEngineMetadata)
    from lmcache_tpu.storage.serde.cachegen_serde import CacheGenSerializer

    def mk(mode):
        cfg = LMCacheEngineConfig.from_defaults(remote_serde="cachegen")
        cfg = dataclasses.replace(cfg, cachegen_device_encode=mode)
        meta = LMCacheEngineMetadata(model_name="lmsys/longchat-7b-16k",
                                     world_size=1, worker_id=0,
                                     fmt="vllm", dtype="float32")
        return CacheGenSerializer(cfg, meta)

    rng = np.random.default_rng(31)
    blob = rng.standard_normal((8, 2, 64, 8, 32)).astype(np.float32)
    blob[:4] = np.sign(blob[:4]) * 0.01  # near-binary: low entropy
    host_ser, dev_ser = mk("off"), mk("on")

    import lmcache_tpu.ops.range_encode as renc
    import lmcache_tpu.storage.serde.cachegen_serde as cgs
    real = renc.stride_classes
    n_classes = []

    def force_split(rows, *a, **k):
        rows = np.asarray(rows, np.int64)
        med = int(np.median(rows))
        lo = np.nonzero(rows <= med)[0]
        hi = np.nonzero(rows > med)[0]
        out = [(int(-(-rows[ix].max() // 16) * 16), ix)
               for ix in (lo, hi) if len(ix)]
        out = out or real(rows, *a, **k)
        n_classes.append(len(out))
        return out

    monkeypatch.setattr(renc, "stride_classes", force_split)
    dev_bytes = dev_ser.to_bytes(blob)
    # the device reassembly path must have actually produced the bytes
    # — a crash there silently falls back to the host coder and would
    # make the equality below vacuous
    assert not cgs._device_encode_broken
    assert dev_bytes == host_ser.to_bytes(blob)
    assert max(n_classes) > 1, "class split never engaged"
