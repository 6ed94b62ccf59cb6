"""Scaling matrix in dryrun form: 1 chip → 1 host (TP) → 2 hosts (DP×TP).

Real multi-host hardware is unavailable in this environment (one
tunneled chip), so the scaling story is validated the way the driver's
``dryrun_multichip`` does: virtual device meshes, REAL shardings, one
executed step per mesh shape — plus the facts that make a scaling
matrix useful and that do not need wall-clock to be meaningful:

- per-device parameter and KV-cache bytes (the memory scaling claim);
- the collectives XLA inserted into the compiled step (the ICI/DCN
  traffic structure: TP → all-reduce per layer, ring CP →
  collective-permute, DP → none in forward);
- that prefill + decode actually execute under each sharding.

Rows: (data, model) mesh shapes, data = DP across hosts, model = TP
within a host. Run under the virtual CPU platform:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        JAX_PLATFORMS=cpu python tools/scaling_matrix.py [--json]

Emits one JSON document (list of rows); MULTICHIP artifacts and
docs/architecture.md cite it.
"""

import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPES = ((1, 1), (1, 2), (1, 4), (1, 8), (2, 2), (2, 4))


def _per_device_bytes(tree) -> int:
    """Max over devices of the addressable shard bytes of ``tree``."""
    import jax

    per = {}
    for leaf in jax.tree_util.tree_leaves(tree):
        for s in leaf.addressable_shards:
            per[s.device] = per.get(s.device, 0) + s.data.nbytes
    return max(per.values())


def _collective_counts(compiled_text: str) -> dict:
    return {
        "all_reduce": compiled_text.count("all-reduce"),
        "all_gather": compiled_text.count("all-gather"),
        "reduce_scatter": compiled_text.count("reduce-scatter"),
        "collective_permute": compiled_text.count("collective-permute"),
    }


def run_row(data: int, model: int) -> dict:
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from lmcache_tpu.models import llama
    from lmcache_tpu.parallel import (MeshConfig, kv_cache_sharding,
                                      make_mesh, shard_params)

    n = data * model
    devices = jax.devices()[:n]
    mesh = make_mesh(MeshConfig(data=data, model=model), devices=devices)

    # fixed GLOBAL geometry across rows so per-device bytes show the
    # scaling: 8 kv heads / dim 512 divide every model axis up to 8
    cfg = llama.LlamaConfig.tiny(n_heads=8, n_kv_heads=8, dim=512,
                                 hidden_dim=1024)
    params = shard_params(llama.init_params(jax.random.PRNGKey(0), cfg),
                          mesh)
    B, T, S = 2 * data, 16, 64
    tokens = jax.device_put(jnp.zeros((B, T), jnp.int32),
                            NamedSharding(mesh, P("data", None)))
    start = jax.device_put(jnp.zeros((B,), jnp.int32),
                           NamedSharding(mesh, P("data")))
    cache = jax.device_put(llama.new_kv_cache(cfg, B, S),
                           kv_cache_sharding(mesh))

    @functools.partial(jax.jit, donate_argnums=(3,))
    def step(params, tokens, start, cache):
        return llama.forward(params, cfg, tokens, start, cache,
                             use_pallas=False, mesh=mesh)

    compiled = step.lower(params, tokens, start, cache).compile()
    row = {
        "mesh": {"data": data, "model": model},
        "devices": n,
        "param_bytes_per_device": _per_device_bytes(params),
        "kv_bytes_per_device": _per_device_bytes(cache),
        "collectives": _collective_counts(compiled.as_text()),
    }
    logits, cache = step(params, tokens, start, cache)  # prefill
    logits, cache = step(params, tokens[:, :1],
                         jnp.full((B,), T, jnp.int32), cache)  # decode
    jax.block_until_ready(logits)
    row["step_ok"] = True

    if data > 1:
        # ring (context-parallel) prefill over the data axis: the
        # sequence-sharded path a 2-host deployment uses for long
        # prefills (parallel/ring_attention.py); its KV rotation is the
        # collective-permute traffic
        ring_tokens = jax.device_put(
            jnp.zeros((2, 16 * data), jnp.int32),
            NamedSharding(mesh, P(None, "data")))
        ring = jax.jit(lambda p, t: llama.forward_ring(p, cfg, t, mesh))
        rc = ring.lower(params, ring_tokens).compile()
        row["ring_collectives"] = _collective_counts(rc.as_text())
        r_logits, _ = ring(params, ring_tokens)
        jax.block_until_ready(r_logits)
        row["ring_ok"] = True
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    # honor a virtual-CPU request before backend init (the axon plugin
    # overrides the env var)
    import jax
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        jax.config.update("jax_platforms", "cpu")

    avail = len(jax.devices())
    rows = [run_row(d, m) for d, m in SHAPES if d * m <= avail]
    if args.json:
        print(json.dumps(rows))
        return 0
    print(f"{'mesh':>10} {'params/dev':>12} {'kv/dev':>10} "
          f"{'allreduce':>10} {'permute':>8} {'ring-permute':>13}")
    for r in rows:
        m = r["mesh"]
        ring = r.get("ring_collectives", {}).get("collective_permute", "-")
        print(f"{m['data']}x{m['model']:>8} "
              f"{r['param_bytes_per_device']/1e6:>10.2f}MB "
              f"{r['kv_bytes_per_device']/1e3:>8.1f}KB "
              f"{r['collectives']['all_reduce']:>10} "
              f"{r['collectives']['collective_permute']:>8} "
              f"{ring:>13}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
