"""Codec quality harness: perplexity delta, logit-KL and top-1
agreement from a CacheGen KV round-trip.

BASELINE.json target: <0.1 perplexity delta at CacheGen bit-widths
(reference claim: /root/reference/README.md:76, the CacheGen paper).
Two model sources:

- ``--model trained`` (the BINDING quality gate): the in-repo trained
  checkpoint (checkpoints/quality_8l.npz, tools/train_quality_model.py)
  whose logits are PEAKED and whose next-token predictions depend on
  retrieving KV from ~ctx/2 positions away (tools/quality_common.py) —
  exactly the path codec loss damages. The ppl-delta gate is real here.
- ``--model tiny|tinyllama`` (random-init): ppl delta is tie-breaking
  noise on flat logits, so the binding gates are logit-KL (direct
  distributional distortion) and *confident* top-1 agreement
  (positions where the exact model's top-2 margin exceeds 0.3 nats
  must keep their argmax).

``--sweep`` reduces the quantization bins stepwise and reports the
bins -> (compression, ppl delta) curve — evidence that the gate
actually measures codec damage (the delta must move).

    python tools/eval_quality.py --model trained --ctx 2048
    python tools/eval_quality.py --model trained --sweep
    python tools/eval_quality.py --json   # machine-readable (bench.py)
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# gates: the distribution shift must be small and greedy decoding
# stable. On RANDOM weights logits are nearly flat (the flatter the
# vocabulary distribution, the more near-ties), so RAW top-1 agreement
# measures tie-breaking noise, not codec damage — it is reported but
# advisory. The binding gates are KL (the direct distributional
# distortion) and *confident* agreement: positions where the exact
# model's top-2 margin exceeds 0.3 nats must keep their argmax.
# On TRAINED weights (peaked logits) the BASELINE ppl-delta gate binds.
KL_GATE = 0.05
CONFIDENT_TOP1_GATE = 0.99
PPL_DELTA_GATE = 0.1  # BASELINE.md: "<0.1 perplexity delta"
# calibration (tiny/random, ctx=256): codec logit perturbation is
# ~0.1-0.2 nats, so near-ties below that margin flip by construction;
# above 0.3 nats agreement is 100% at the default bit-widths
CONFIDENT_MARGIN = 0.3  # nats


def _build_model(model: str, ctx: int, cont: int, seed: int):
    """Returns (cfg, params, tokens[ctx+cont], model_name)."""
    import jax

    from lmcache_tpu.models import llama

    total = ctx + cont
    if model == "trained":
        from tools import quality_common as qc
        cfg = qc.quality_config(dtype="float32")
        params = qc.load_params(dtype="float32")
        tokens = qc.make_eval_tokens(np.random.default_rng(seed), total)
        return cfg, params, tokens, "lmcache-tpu/quality-8l"
    cfg = (llama.LlamaConfig.tiny() if model == "tiny" else
           llama.LlamaConfig.tinyllama_1_1b())
    params = llama.init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(seed)
    tokens = rng.integers(0, cfg.vocab_size, total, dtype=np.int32)
    return cfg, params, tokens, "lmsys/longchat-7b-16k"


def evaluate(model: str = "tiny", ctx: int = 256, cont: int = 64,
             seed: int = 0, cachegen_config=None) -> dict:
    """Run the codec-quality evaluation; returns the result dict
    (imported by bench.py for the driver-captured metrics)."""
    import jax
    import jax.numpy as jnp

    from lmcache_tpu.config import (LMCacheEngineConfig,
                                    LMCacheEngineMetadata)
    from lmcache_tpu.models import llama
    from lmcache_tpu.storage.serde.cachegen_serde import (
        CacheGenDeserializer, CacheGenSerializer)

    cfg, params, tokens, model_name = _build_model(model, ctx, cont, seed)
    total = ctx + cont

    use_pallas = jax.default_backend() != "cpu"

    def continuation_logp(ctx_blob):
        """Per-position log-probs of the continuation given a context KV
        blob: [cont-1, V]."""
        cache = llama.new_kv_cache(cfg, 1, total)
        cache = llama.blob_into_cache(cache, jnp.asarray(ctx_blob))
        logits, _ = llama.forward(
            params, cfg, jnp.asarray(tokens[ctx:])[None, :],
            jnp.asarray([ctx], jnp.int32), cache,
            use_pallas=use_pallas)
        # token t of the continuation is predicted by position t-1
        return jax.nn.log_softmax(logits[0, :-1].astype(jnp.float32),
                                  axis=-1)

    def nll_of(logp) -> float:
        tgt = jnp.asarray(tokens[ctx + 1:])
        return float(-jnp.take_along_axis(logp, tgt[:, None],
                                          axis=1).mean())

    # exact context KV
    cache = llama.new_kv_cache(cfg, 1, total)
    _, cache = llama.forward(params, cfg,
                             jnp.asarray(tokens[:ctx])[None, :],
                             jnp.zeros(1, jnp.int32), cache,
                             use_pallas=use_pallas)
    exact_blob = llama.cache_to_blob(cache, 0, ctx)

    # codec round-trip
    ecfg = LMCacheEngineConfig.from_defaults(remote_serde="cachegen")
    meta = LMCacheEngineMetadata(model_name=model_name,
                                 world_size=1, worker_id=0, fmt="vllm",
                                 dtype=cfg.dtype)
    ser = CacheGenSerializer(ecfg, meta, cachegen_config=cachegen_config)
    de = CacheGenDeserializer(ecfg, meta)
    bs = ser.to_bytes(exact_blob)
    codec_blob = de.from_bytes(bs)

    lp_exact = continuation_logp(exact_blob)
    lp_codec = continuation_logp(codec_blob)

    # distributional distortion: mean KL(P_exact || P_codec)
    p = jnp.exp(lp_exact)
    kl = float((p * (lp_exact - lp_codec)).sum(axis=-1).mean())
    # greedy stability: fraction of unchanged argmax tokens, overall and
    # on positions where exact's top-2 margin is decisive. The margin is
    # capped at the 90th percentile of observed margins so at least the
    # most-confident decile always qualifies — otherwise a flat-logit
    # run could have ZERO confident positions and the gate would pass
    # vacuously on KL alone
    agree = jnp.argmax(lp_exact, -1) == jnp.argmax(lp_codec, -1)
    top1 = float(agree.mean())
    top2 = jnp.sort(lp_exact, axis=-1)[:, -2:]
    margins = top2[:, 1] - top2[:, 0]
    margin_eff = float(min(CONFIDENT_MARGIN,
                           jnp.quantile(margins, 0.9)))
    confident = margins >= margin_eff
    n_conf = int(confident.sum())
    conf_top1 = float(agree[confident].sum() / max(n_conf, 1))

    nll_exact, nll_codec = nll_of(lp_exact), nll_of(lp_codec)
    # cap the exponent: a destroyed cache can push nll past float range
    # (or to nan via overflowed activations); report a finite, still
    # obviously-failing perplexity instead of nan
    def _ppl(nll: float) -> float:
        if not np.isfinite(nll):
            nll = 700.0
        return float(np.exp(min(nll, 700.0)))
    ppl_exact, ppl_codec = _ppl(nll_exact), _ppl(nll_codec)
    ratio = exact_blob.size * np.dtype(cfg.dtype).itemsize / len(bs)
    delta = ppl_codec - ppl_exact

    ok = kl <= KL_GATE and conf_top1 >= CONFIDENT_TOP1_GATE
    if model == "trained":
        # peaked logits: the BASELINE ppl-delta criterion binds for real
        ok = ok and delta < PPL_DELTA_GATE
    return {
        "model": model,
        "ctx": ctx,
        "cont": cont,
        "compression_x": round(float(ratio), 3),
        "logit_kl": round(kl, 5),
        "top1_agreement": round(top1, 4),
        "confident_top1_agreement": round(conf_top1, 4),
        "confident_positions": n_conf,
        "confident_margin_nats": round(margin_eff, 4),
        "ppl_exact": round(float(ppl_exact), 4),
        "ppl_codec": round(float(ppl_codec), 4),
        "ppl_delta": round(float(delta), 4),
        "ppl_gate_binding": model == "trained",
        "pass": bool(ok),
    }


def evaluate_mla(ctx: int = 256, cont: int = 64, seed: int = 0,
                 cachegen_config=None, trained: bool = False) -> dict:
    """Codec quality for MLA LATENT wire blobs (VERDICT r3 next #3).

    The latent stream is the joint K/V bottleneck — one row feeds every
    head — so this measures the same KL / confident-top-1 gates as
    :func:`evaluate` but through ``models.mla`` with the cachegen
    serde's latent path (single-stream v3 containers, latent-aware
    all-32 bins schedule). With ``trained=True`` the in-repo MLA
    retrieval checkpoint makes the ppl-delta gate binding, like the
    dense one."""
    import jax
    import jax.numpy as jnp

    from lmcache_tpu.config import (LMCacheEngineConfig,
                                    LMCacheEngineMetadata)
    from lmcache_tpu.models import mla
    from lmcache_tpu.storage.serde.cachegen_serde import (
        CacheGenDeserializer, CacheGenSerializer)

    total = ctx + cont
    if trained:
        import quality_common as qc
        cfg, params, tokens = qc.load_mla_checkpoint(ctx, cont, seed)
        model_name = "trained-mla"
    else:
        cfg = mla.MLAConfig(
            vocab_size=8000, dim=512, n_layers=4, n_heads=8,
            hidden_dim=1024, max_seq_len=max(1024, total),
            q_lora_rank=None, kv_lora_rank=256, qk_nope_head_dim=64,
            qk_rope_head_dim=32, v_head_dim=64, dtype="float32")
        params = mla.init_params(jax.random.PRNGKey(seed + 3), cfg)
        tokens = np.random.default_rng(seed).integers(
            0, cfg.vocab_size, total, dtype=np.int32)
        model_name = "mla-random"

    use_pallas = jax.default_backend() != "cpu"

    def continuation_logp(ctx_blob):
        cache = mla.new_latent_cache(cfg, 1, total)
        cache = mla.blob_into_cache(cache, jnp.asarray(ctx_blob))
        logits, _ = mla.forward(
            params, cfg, jnp.asarray(tokens[ctx:])[None, :],
            jnp.asarray([ctx], jnp.int32), cache,
            use_pallas=use_pallas)
        return jax.nn.log_softmax(logits[0, :-1].astype(jnp.float32),
                                  axis=-1)

    cache = mla.new_latent_cache(cfg, 1, total)
    _, cache = mla.forward(params, cfg,
                           jnp.asarray(tokens[:ctx])[None, :],
                           jnp.zeros(1, jnp.int32), cache,
                           use_pallas=use_pallas)
    exact_blob = mla.cache_to_blob(cache, 0, ctx)

    ecfg = LMCacheEngineConfig.from_defaults(remote_serde="cachegen")
    meta = LMCacheEngineMetadata(model_name=model_name, world_size=1,
                                 worker_id=0, fmt="vllm",
                                 dtype=cfg.dtype)
    ser = CacheGenSerializer(ecfg, meta, cachegen_config=cachegen_config)
    de = CacheGenDeserializer(ecfg, meta)
    bs = ser.to_bytes(exact_blob)
    codec_blob = de.from_bytes(bs)

    lp_exact = continuation_logp(exact_blob)
    lp_codec = continuation_logp(codec_blob)
    p = jnp.exp(lp_exact)
    kl = float((p * (lp_exact - lp_codec)).sum(axis=-1).mean())
    agree = jnp.argmax(lp_exact, -1) == jnp.argmax(lp_codec, -1)
    top1 = float(agree.mean())
    top2 = jnp.sort(lp_exact, axis=-1)[:, -2:]
    margins = top2[:, 1] - top2[:, 0]
    margin_eff = float(min(CONFIDENT_MARGIN, jnp.quantile(margins, 0.9)))
    confident = margins >= margin_eff
    conf_top1 = float(agree[confident].sum() /
                      max(int(confident.sum()), 1))

    tgt = jnp.asarray(tokens[ctx + 1:])

    def _nll(lp):
        return float(-jnp.take_along_axis(lp, tgt[:, None],
                                          axis=1).mean())

    def _ppl(nll):
        if not np.isfinite(nll):
            nll = 700.0
        return float(np.exp(min(nll, 700.0)))

    ppl_exact = _ppl(_nll(lp_exact))
    ppl_codec = _ppl(_nll(lp_codec))
    delta = ppl_codec - ppl_exact
    # wire economics vs the bf16 latents MLA reuse shipped before r4
    bf16_bytes = exact_blob.size * 2
    ok = kl <= KL_GATE and conf_top1 >= CONFIDENT_TOP1_GATE
    if trained:
        ok = ok and delta < PPL_DELTA_GATE
    return {
        "model": model_name,
        "ctx": ctx,
        "cont": cont,
        "latent_dim": cfg.latent_dim,
        "compression_vs_bf16_x": round(bf16_bytes / len(bs), 3),
        "logit_kl": round(kl, 5),
        "top1_agreement": round(top1, 4),
        "confident_top1_agreement": round(conf_top1, 4),
        "ppl_exact": round(ppl_exact, 4),
        "ppl_codec": round(ppl_codec, 4),
        "ppl_delta": round(float(delta), 4),
        "ppl_gate_binding": bool(trained),
        "pass": bool(ok),
    }


def sweep(model: str, ctx: int, cont: int, seed: int) -> list:
    """Bins -> quality curve: uniform key/value bin widths from the
    default schedule down to 2 bits. The ppl delta must grow as bins
    shrink — evidence the gate measures codec damage, not noise."""
    from lmcache_tpu.codec import CacheGenConfig
    from tools import quality_common as qc
    L = qc.quality_config().n_layers if model == "trained" else None
    rows = []
    for bins in (None, 16, 8, 4, 2):
        cg = None
        if bins is not None:
            if L is None:
                from lmcache_tpu.models import llama
                L = (llama.LlamaConfig.tiny().n_layers if model == "tiny"
                     else llama.LlamaConfig.tinyllama_1_1b().n_layers)
            cg = CacheGenConfig(key_bins=(bins,) * L,
                                value_bins=(bins,) * L)
        r = evaluate(model, ctx, cont, seed, cachegen_config=cg)
        r["bins"] = bins or "default"
        rows.append(r)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tiny",
                    choices=["tiny", "tinyllama", "trained", "mla",
                             "trained-mla"])
    ap.add_argument("--ctx", type=int, default=None)
    ap.add_argument("--cont", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--sweep", action="store_true",
                    help="bins -> quality curve instead of one gate run")
    args = ap.parse_args()
    if args.ctx is None:
        # trained-model retrieval spans ~ctx/2; make it a real distance
        args.ctx = (2048 if args.model in ("trained", "trained-mla")
                    else 256)

    if args.model in ("mla", "trained-mla"):
        result = evaluate_mla(args.ctx, args.cont, args.seed,
                              trained=args.model == "trained-mla")
        if args.json:
            print(json.dumps(result))
        else:
            print(f"model={result['model']} ctx={result['ctx']} "
                  f"compression(bf16)={result['compression_vs_bf16_x']}x "
                  f"kl={result['logit_kl']} "
                  f"conf_top1={result['confident_top1_agreement']} "
                  f"ppl_delta={result['ppl_delta']} "
                  f"pass={result['pass']}")
        return 0 if result["pass"] else 1

    if args.sweep:
        rows = sweep(args.model, args.ctx, args.cont, args.seed)
        if args.json:
            print(json.dumps(rows))
        else:
            print(f"model={args.model} ctx={args.ctx} (gate: ppl delta "
                  f"< {PPL_DELTA_GATE} at default bins)")
            print(f"{'bins':>8} {'compression':>12} {'ppl_exact':>10} "
                  f"{'ppl_codec':>10} {'ppl_delta':>10} {'logit_kl':>9}")
            for r in rows:
                print(f"{str(r['bins']):>8} {r['compression_x']:>11.2f}x "
                      f"{r['ppl_exact']:>10.4g} {r['ppl_codec']:>10.4g} "
                      f"{r['ppl_delta']:>+10.4g} {r['logit_kl']:>9.4g}")
        return 0

    result = evaluate(args.model, args.ctx, args.cont, args.seed)
    if args.json:
        print(json.dumps(result))
    else:
        print(f"model={result['model']} ctx={result['ctx']} "
              f"cont={result['cont']}")
        print(f"compression   : {result['compression_x']:.2f}x")
        print(f"logit KL      : {result['logit_kl']:.5f}  "
              f"(gate <= {KL_GATE})")
        print(f"top-1 agree   : {result['top1_agreement']*100:.2f}%  "
              f"(advisory — tie noise on flat logits)")
        print(f"confident t1  : "
              f"{result['confident_top1_agreement']*100:.2f}% over "
              f"{result['confident_positions']} pos "
              f"(gate >= {CONFIDENT_TOP1_GATE*100}%)")
        print(f"ppl exact     : {result['ppl_exact']:.4f}")
        print(f"ppl codec     : {result['ppl_codec']:.4f}")
        print(f"ppl delta     : {result['ppl_delta']:+.4f}"
              + (f"  (gate < {PPL_DELTA_GATE}, BINDING)"
                 if result["ppl_gate_binding"] else "  (advisory)"))
        print("PASS" if result["pass"] else "FAIL")
    return 0 if result["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
