"""Range-ENCODER performance: C++ host coder vs the Pallas device
encoder, at serving stream counts (mirror of bench_range_decode.py).

    python tools/bench_range_encode.py            # real TPU
    JAX_PLATFORMS=cpu python tools/bench_range_encode.py --tiny

Every device encode is verified byte-identical against the C++ coder
before timing. Also reports the device->host transfer sizes that decide
the store path's economics: coded words (device encode) vs uint8
symbols (host encode).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_case(S, T, seed=7):
    rng = np.random.default_rng(seed)
    sym = np.clip(np.round(rng.normal(15, 3, (S, T))), 0,
                  30).astype(np.uint8)
    counts = np.stack([(sym == b).sum(1) for b in range(32)],
                      -1).astype(np.float64)
    cdf_f = np.concatenate([np.zeros((S, 1)),
                            np.cumsum(counts / T, 1)], 1)
    cdf_i = (np.round(cdf_f * (2**16 - 32)).astype(np.int64)
             + np.arange(33))
    return sym, (cdf_i % 65536).astype(np.uint16)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    import jax

    from lmcache_tpu.codec import range_coder as rc
    from lmcache_tpu.ops.range_encode import (encode_streams_pallas,
                                              estimate_stride,
                                              words_to_payload)

    print(f"backend: {jax.default_backend()}  "
          f"host threads: {rc._get_lib().lmtc_num_threads()}")
    cases = ([(11264, 256)] if args.tiny else
             [(11264, 256), (45056, 256), (180224, 256), (720896, 256)])
    for S, T in cases:
        sym, cdf = make_case(S, T)
        msym = S * T / 1e6

        t0 = time.perf_counter()
        ref_payload, ref_lens = rc.encode_streams(sym, cdf)
        t_cpp = time.perf_counter() - t0

        stride = estimate_stride(cdf, T)
        d_sym = jax.device_put(sym)
        d_cdf = jax.device_put(cdf)
        words, lens, ovf = encode_streams_pallas(d_sym, d_cdf, stride)
        jax.block_until_ready(words)
        assert not bool(np.asarray(ovf))
        payload, lens64 = words_to_payload(np.asarray(words),
                                           np.asarray(lens), S)
        assert np.array_equal(lens64, ref_lens)
        assert payload == ref_payload
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            words, lens, ovf = encode_streams_pallas(d_sym, d_cdf, stride)
            jax.block_until_ready(words)
            best = min(best, time.perf_counter() - t0)
        coded_mb = len(ref_payload) / 1e6
        print(f"S={S:7d} T={T} ({msym:6.1f} MSym, stride {stride}):"
              f"  c++ {t_cpp * 1e3:7.1f} ms"
              f" ({msym / 1e3 / t_cpp:5.2f} GSym/s)"
              f"  pallas {best * 1e3:7.1f} ms"
              f" ({msym / 1e3 / best:5.2f} GSym/s)"
              f"  dl: {S * stride / 1e6:6.1f} MB words vs"
              f" {msym:6.1f} MB symbols (payload {coded_mb:6.1f} MB)",
              flush=True)


if __name__ == "__main__":
    main()
