"""Mesh construction and sharding rules.

The reference (lmcache) delegates all model parallelism to vLLM and only
tracks a flat ``world_size``/``worker_id`` pair inside cache keys
(reference: lmcache/utils.py:12-39). Here parallelism is first-class and
TPU-native: a ``jax.sharding.Mesh`` with two axes,

- ``"data"``  — data parallel (batch dimension / independent replicas),
- ``"model"`` — tensor parallel (attention heads & MLP hidden sharded
  across ICI; the KV cache head axis is sharded on this axis, which is
  what the cache-engine metadata's ``kv_shard_axis`` refers to).

All shardings are expressed as ``NamedSharding(mesh, PartitionSpec(...))``
so XLA inserts the collectives (psum for row-parallel matmuls, all-gather
at the logits) — no hand-written NCCL-style code.
"""

from dataclasses import dataclass
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclass(frozen=True)
class MeshConfig:
    data: int = 1
    model: int = 1

    @property
    def world_size(self) -> int:
        return self.data * self.model


def make_mesh(cfg: Optional[MeshConfig] = None,
              devices=None) -> Mesh:
    """Build a 2-D ("data", "model") mesh over ``devices``.

    Defaults to all local devices on the model axis (TP-first: KV chunks
    shard by head so the cache tiers hold per-shard slices, mirroring the
    reference's per-worker key namespace, lmcache/cache_engine.py:37-44).
    """
    if devices is None:
        devices = jax.devices()
    if cfg is None:
        cfg = MeshConfig(data=1, model=len(devices))
    n = cfg.world_size
    if n > len(devices):
        raise ValueError(
            f"mesh needs {n} devices, only {len(devices)} available")
    grid = np.asarray(devices[:n]).reshape(cfg.data, cfg.model)
    return Mesh(grid, axis_names=("data", "model"))


def shard_params(params, mesh: Mesh):
    """Apply tensor-parallel sharding rules to a parameter pytree (by
    leaf path name).

    Convention (see models/llama.py param tree): stacked ``[L, in, out]``
    weights named ``wq/wk/wv`` and ``w_gate/w_up`` are column-parallel on
    "model" (last axis); ``wo`` and ``w_down`` are row-parallel
    (second-to-last axis); everything else replicated.

    MLA (models/mla.py): ``wq``/``wq_b`` are column-parallel (contiguous
    per-head blocks), the absorbed kv_b factors ``w_kb_k``/``w_kb_v``
    ``[L, H, ., .]`` shard their HEAD axis, ``wo`` and the shared-expert
    MLP follow the row/column rules — while ``wkv_a`` and the latent
    cache stay REPLICATED: the latent has no head axis, which is MLA's
    TP story (the cache is ~57x smaller and identical on every shard, so
    cached latents are shareable across deployments of ANY TP degree —
    per-head KV is only shareable between identically-sharded ones,
    reference lmcache/utils.py:12-39).
    """
    col = {"wq", "wk", "wv", "w_gate", "w_up", "e_gate", "e_up",
           "wq_b", "s_gate", "s_up"}
    row = {"wo", "w_down", "e_down", "s_down"}
    head = {"w_kb_k", "w_kb_v"}  # [L, H, ., .]

    def spec_for(path, ndim) -> P:
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name in col:
            return P(*([None] * (ndim - 1)), "model")
        if name in row:
            return P(*([None] * (ndim - 2)), "model", None)
        if name in head:
            return P(None, "model", *([None] * (ndim - 2)))
        return P()

    def place(path, leaf):
        return jax.device_put(leaf,
                              NamedSharding(mesh, spec_for(path, leaf.ndim)))

    return jax.tree_util.tree_map_with_path(place, params)


def kv_cache_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for the live KV pool [L, 2, B, H_kv, S, D] (head-major):
    batch on "data", kv-heads on "model" (the TP equivalent of the
    reference's per-worker key shards)."""
    return NamedSharding(mesh, P(None, None, "data", "model", None, None))


def latent_cache_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for the MLA latent pool [L, B, S, r+p]: batch on "data",
    REPLICATED over "model" (no head axis — see shard_params)."""
    return NamedSharding(mesh, P(None, "data", None, None))


def kv_blob_sharding(mesh: Mesh, fmt: str = "vllm") -> NamedSharding:
    """Sharding for a cache blob [L, 2, T, H, D] (vllm) / [L, 2, H, T, D]
    (huggingface): heads on "model"."""
    if fmt == "vllm":
        return NamedSharding(mesh, P(None, None, None, "model", None))
    return NamedSharding(mesh, P(None, None, "model", None, None))


def shard_blob_slice(blob, fmt: str, shard_idx: int, num_shards: int):
    """The head-slice of a blob owned by TP shard ``shard_idx``.

    This is the unit each tensor-parallel worker stores/retrieves under
    its own ``worker_id`` key namespace (reference: per-worker keys,
    lmcache/cache_engine.py:37-44; here worker == mesh "model" shard).
    Works on numpy and jax arrays.
    """
    head_axis = 3 if fmt == "vllm" else 2
    H = blob.shape[head_axis]
    if H % num_shards:
        raise ValueError(f"{H} heads not divisible by {num_shards} shards")
    per = H // num_shards
    idx = [slice(None)] * blob.ndim
    idx[head_axis] = slice(shard_idx * per, (shard_idx + 1) * per)
    return blob[tuple(idx)]


def shard_map_unchecked(f, mesh: Mesh, in_specs, out_specs):
    """``shard_map`` with replication checking off, across jax versions
    (0.8 renamed ``check_rep`` to ``check_vma`` and promoted the API out
    of jax.experimental). The pallas attention wrappers use this: their
    outputs are genuinely sharded, but the kernels give the checker
    nothing to infer from."""
    try:
        from jax import shard_map  # jax >= 0.8
        return shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)
    except (ImportError, TypeError):
        from jax.experimental.shard_map import shard_map  # type: ignore
        return shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_rep=False)
