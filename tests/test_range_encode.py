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


def test_stride_classes_split_and_byte_identity():
    """Per-entropy-class strides must leave the PAYLOAD byte-identical
    with the host coder (padding layout is transfer-internal), and the
    class split must actually engage on heterogeneous entropies."""
    import dataclasses

    from lmcache_tpu.config import (LMCacheEngineConfig,
                                    LMCacheEngineMetadata)
    from lmcache_tpu.ops.range_encode import (estimate_stride_rows,
                                              stride_classes)
    from lmcache_tpu.storage.serde.cachegen_serde import CacheGenSerializer

    # unit: bimodal stride rows split into >1 class; uniform rows don't
    rows = np.array([16] * 300 + [160] * 100)
    cls = stride_classes(rows)
    assert len(cls) > 1
    assert sum(len(ix) for _, ix in cls) == 400
    assert len(stride_classes(np.full(400, 64))) == 1
    assert len(stride_classes(rows[:100])) == 1  # too few streams

    # serde: half the layers near-constant (low entropy), half gaussian
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

    import lmcache_tpu.storage.serde.cachegen_serde as cgs
    n_classes = []
    real = stride_classes

    def spy(rows, *a, **k):
        out = real(rows, *a, **k)
        n_classes.append(len(out))
        return out

    import lmcache_tpu.ops.range_encode as renc
    old = renc.stride_classes
    renc.stride_classes = spy
    try:
        dev_bytes = dev_ser.to_bytes(blob)
    finally:
        renc.stride_classes = old
    assert dev_bytes == host_ser.to_bytes(blob)
    assert max(n_classes) > 1, "class split never engaged"
