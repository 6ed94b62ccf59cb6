"""Range-decoder performance table: C++ host coder vs the XLA scan
decoder vs the Pallas tile kernel, at serving stream counts.

    python tools/bench_range_decode.py            # real TPU
    JAX_PLATFORMS=cpu python tools/bench_range_decode.py --tiny

Feeds docs/kernels.md (round-4 table). Symbols are gaussian-quantized
(the KV profile); every decode is verified bit-exact against the
encoder input before timing.
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
    ap.add_argument("--tiny", action="store_true",
                    help="small cases only (CPU-friendly)")
    args = ap.parse_args()

    import jax

    from lmcache_tpu.codec import range_coder as rc
    from lmcache_tpu.ops.range_decode import (decode_streams_device,
                                              decode_streams_pallas)

    print(f"backend: {jax.default_backend()}  "
          f"host threads: {rc._get_lib().lmtc_num_threads()}")
    cases = ([(11264, 256), (45056, 256)] if args.tiny else
             [(11264, 256), (45056, 256), (180224, 256), (720896, 256)])
    for S, T in cases:
        sym, cdf = make_case(S, T)
        payload, lens = rc.encode_streams(sym, cdf)
        stride = max(16, (int(lens.max()) + 4 + 15) // 16 * 16)
        padded = rc.pad_streams(payload, lens, stride)
        msym = S * T / 1e6

        t0 = time.perf_counter()
        ref = rc.decode_streams(payload, lens, T, cdf)
        t_cpp = time.perf_counter() - t0
        assert np.array_equal(ref, sym)

        rows = [("c++", t_cpp)]
        d_pay = jax.device_put(padded)
        d_lens = jax.device_put(lens.astype(np.int32))
        d_cdf = jax.device_put(cdf)
        for name, fn in (("xla-scan", decode_streams_device),
                         ("pallas", decode_streams_pallas)):
            try:
                out, ovf = fn(d_pay, d_lens, d_cdf, T)
                jax.block_until_ready(out)
                assert not bool(np.asarray(ovf))
                assert np.array_equal(np.asarray(out), sym), name
                best = 1e9
                for _ in range(3):
                    t0 = time.perf_counter()
                    out, _ = fn(d_pay, d_lens, d_cdf, T)
                    jax.block_until_ready(out)
                    best = min(best, time.perf_counter() - t0)
                rows.append((name, best))
            except Exception as e:
                rows.append((name, None))
                print(f"  {name}: FAILED {type(e).__name__}: {e}")
        line = f"S={S:7d} T={T} ({msym:6.1f} MSym, stride {stride}):"
        for name, t in rows:
            if t is not None:
                line += (f"  {name} {t * 1e3:7.1f} ms "
                         f"({msym / 1e3 / t:5.2f} GSym/s)")
        print(line, flush=True)


if __name__ == "__main__":
    main()
