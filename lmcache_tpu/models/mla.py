"""Multi-head Latent Attention (DeepSeek-V2/V3 family) — TPU-native.

MLA compresses each token's entire KV state into a single shared latent
vector ``c`` of ``kv_lora_rank`` dims plus one MQA rope key of
``qk_rope_head_dim`` dims. Per-head keys/values are linear functions of
``c`` (``kv_b_proj``), so attention can be computed entirely in latent
space ("weight absorption"): the latent IS the cache. For DeepSeek-V2
geometry (r=512, p=64) that is 576 floats/token vs the 32768 an
equivalently-sized GQA model stores — a ~57x smaller KV cache, which
transforms the economics of every tier in this framework (HBM residency,
DRAM/disk/remote bandwidth, CacheGen bitstream size).

TPU-first design decisions:

- **The cache holds latents, never expanded K/V.** HuggingFace's
  implementations expand ``c`` to per-head K/V and cache those
  (modeling_deepseek_v2.py:364-379); we keep the pool at
  ``[L, B, S, r+p]`` and run attention absorbed. Both paths are
  algebraically identical (``q·(W_k c) = (W_kᵀ q)·c`` and
  ``Σ aₛ (W_v cₛ) = W_v (Σ aₛ cₛ)``); tests assert numeric parity
  against HF.
- **Absorbed attention is three einsums** (q→latent, scores, context),
  all large dense matmuls that XLA tiles straight onto the MXU — no
  gather, no per-head KV duplication, no pallas needed for the baseline.
  Score/softmax math runs in float32.
- **Heterogeneous layers (dense prefix + MoE tail) are two
  ``lax.scan``s**, not a per-layer Python loop: DeepSeek puts dense MLPs
  at layers ``[0, first_k_dense_replace)`` and MoE after, contiguously,
  so each block scans over its own stacked weights.

Cache-engine integration: :func:`cache_to_blob` emits a wire blob shaped
``[L, 1, T, 1, r+p]`` — the framework's blob plumbing (kv.py) only fixes
the token axis, so latent blobs flow through chunking, serde, every
storage tier and the wire protocol unchanged.

HF contracts matched (the reference repo has no models; SURVEY.md §2
treats model families via the CacheGen table only):
- transformers/models/deepseek_v2/modeling_deepseek_v2.py (attention
  :288-404, gate :45-90, MoE :93-157, complex/interleaved rope :272-285)
- transformers/models/deepseek_v3/modeling_deepseek_v3.py (sigmoid
  noaux_tc router :211-265, mscale² score scale :371-377,
  rope_interleave flag :409-412)
"""

import functools
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lmcache_tpu.models.llama import _rms_norm, _rope

Params = Dict[str, jax.Array]


def _yarn_mscale(scale: float, mscale: float = 1.0) -> float:
    if scale <= 1.0:
        return 1.0
    return 0.1 * mscale * float(np.log(scale)) + 1.0


@dataclass(frozen=True)
class MLAConfig:
    vocab_size: int = 102400
    dim: int = 2048
    n_layers: int = 27
    n_heads: int = 16
    hidden_dim: int = 10944
    norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    max_seq_len: int = 163840
    dtype: str = "bfloat16"
    # --- MLA geometry ---------------------------------------------------
    # low-rank query path; None = direct q_proj (DeepSeek-V2-Lite)
    q_lora_rank: Optional[int] = None
    kv_lora_rank: int = 512
    qk_nope_head_dim: int = 128
    qk_rope_head_dim: int = 64
    v_head_dim: int = 128
    # V2 checkpoints store rope channels as adjacent pairs (complex
    # convention); V3 exposes it as config.rope_interleave
    rope_interleaved: bool = True
    # routing/scale conventions: "v2" (softmax gate, plain qk scale) or
    # "v3" (sigmoid noaux_tc gate, mscale_all_dim² folded into the scale)
    arch: str = "v2"
    # --- MoE ------------------------------------------------------------
    n_routed_experts: Optional[int] = None  # None = all-dense MLPs
    n_shared_experts: Optional[int] = None
    n_experts_per_tok: int = 6
    moe_hidden_dim: Optional[int] = None  # expert width
    first_k_dense_replace: int = 0  # layers [0, k) use dense MLPs
    routed_scaling_factor: float = 1.0
    topk_method: str = "greedy"  # greedy | group_limited_greedy | noaux_tc
    n_group: Optional[int] = None
    topk_group: Optional[int] = None
    norm_topk_prob: bool = False
    # --- yarn context extension (DeepSeek flavor: mscale ratio rides the
    # rope cos/sin; V3 additionally squares mscale_all_dim into the
    # score scale) -------------------------------------------------------
    rope_scaling_type: Optional[str] = None  # only "yarn" is used
    rope_scaling_factor: float = 1.0
    rope_beta_fast: float = 32.0
    rope_beta_slow: float = 1.0
    rope_mscale: float = 1.0
    rope_mscale_all_dim: float = 0.0
    rope_attention_factor: Optional[float] = None
    rope_original_max_seq: Optional[int] = None

    @property
    def qk_head_dim(self) -> int:
        return self.qk_nope_head_dim + self.qk_rope_head_dim

    @property
    def latent_dim(self) -> int:
        """Cached floats per token per layer: the whole point of MLA."""
        return self.kv_lora_rank + self.qk_rope_head_dim

    @property
    def sm_scale(self) -> float:
        s = float(self.qk_head_dim) ** -0.5
        if (self.arch == "v3" and self.rope_scaling_type == "yarn"
                and self.rope_mscale_all_dim):
            m = _yarn_mscale(self.rope_scaling_factor,
                             self.rope_mscale_all_dim)
            s *= m * m
        return s

    @property
    def rope_scaling_spec(self):
        """llama.rope_inv_freq spec tuple with DeepSeek's attention
        factor (mscale ratio) pre-resolved, mirroring HF
        ``_compute_yarn_parameters``."""
        if self.rope_scaling_type is None:
            return None
        af = self.rope_attention_factor
        if af is None and self.rope_mscale and self.rope_mscale_all_dim:
            af = (_yarn_mscale(self.rope_scaling_factor, self.rope_mscale)
                  / _yarn_mscale(self.rope_scaling_factor,
                                 self.rope_mscale_all_dim))
        return ("yarn", self.rope_scaling_factor, 1.0, 4.0,
                self.rope_original_max_seq or self.max_seq_len,
                self.rope_beta_fast, self.rope_beta_slow, af)

    def moe_layer(self, i: int) -> bool:
        return (self.n_routed_experts is not None
                and i >= self.first_k_dense_replace)

    @property
    def n_dense_layers(self) -> int:
        if self.n_routed_experts is None:
            return self.n_layers
        return min(self.first_k_dense_replace, self.n_layers)

    @staticmethod
    def tiny(**over) -> "MLAConfig":
        kw = dict(vocab_size=512, dim=256, n_layers=4, n_heads=4,
                  hidden_dim=512, max_seq_len=1024, dtype="float32",
                  kv_lora_rank=64, qk_nope_head_dim=32,
                  qk_rope_head_dim=16, v_head_dim=32)
        kw.update(over)
        return MLAConfig(**kw)

    @staticmethod
    def deepseek_v2_lite() -> "MLAConfig":
        # deepseek-ai/DeepSeek-V2-Lite: direct q_proj, 64 routed + 2
        # shared experts, first layer dense, softmax greedy gate, yarn 40x
        return MLAConfig(
            vocab_size=102400, dim=2048, n_layers=27, n_heads=16,
            hidden_dim=10944, rope_theta=10000.0, max_seq_len=163840,
            q_lora_rank=None, kv_lora_rank=512, qk_nope_head_dim=128,
            qk_rope_head_dim=64, v_head_dim=128,
            n_routed_experts=64, n_shared_experts=2, n_experts_per_tok=6,
            moe_hidden_dim=1408, first_k_dense_replace=1,
            routed_scaling_factor=1.0, topk_method="greedy",
            norm_topk_prob=False,
            rope_scaling_type="yarn", rope_scaling_factor=40.0,
            rope_beta_fast=32.0, rope_beta_slow=1.0, rope_mscale=0.707,
            rope_mscale_all_dim=0.707, rope_original_max_seq=4096)

    @staticmethod
    def deepseek_v2() -> "MLAConfig":
        # deepseek-ai/DeepSeek-V2: q_lora 1536, 160 routed experts in 8
        # groups (top-3 groups), 2 shared, group_limited_greedy
        return MLAConfig(
            vocab_size=102400, dim=5120, n_layers=60, n_heads=128,
            hidden_dim=12288, rope_theta=10000.0, max_seq_len=163840,
            q_lora_rank=1536, kv_lora_rank=512, qk_nope_head_dim=128,
            qk_rope_head_dim=64, v_head_dim=128,
            n_routed_experts=160, n_shared_experts=2, n_experts_per_tok=6,
            moe_hidden_dim=1536, first_k_dense_replace=1,
            routed_scaling_factor=16.0, topk_method="group_limited_greedy",
            n_group=8, topk_group=3, norm_topk_prob=False,
            rope_scaling_type="yarn", rope_scaling_factor=40.0,
            rope_beta_fast=32.0, rope_beta_slow=1.0, rope_mscale=1.0,
            rope_mscale_all_dim=1.0, rope_original_max_seq=4096)

    @staticmethod
    def deepseek_v3() -> "MLAConfig":
        # deepseek-ai/DeepSeek-V3/R1: sigmoid noaux_tc router with
        # e_score_correction_bias, 256 routed experts in 8 groups
        return MLAConfig(
            vocab_size=129280, dim=7168, n_layers=61, n_heads=128,
            hidden_dim=18432, rope_theta=10000.0, max_seq_len=163840,
            q_lora_rank=1536, kv_lora_rank=512, qk_nope_head_dim=128,
            qk_rope_head_dim=64, v_head_dim=128, arch="v3",
            n_routed_experts=256, n_shared_experts=1, n_experts_per_tok=8,
            moe_hidden_dim=2048, first_k_dense_replace=3,
            routed_scaling_factor=2.5, topk_method="noaux_tc",
            n_group=8, topk_group=4, norm_topk_prob=True,
            rope_scaling_type="yarn", rope_scaling_factor=40.0,
            rope_beta_fast=32.0, rope_beta_slow=1.0, rope_mscale=1.0,
            rope_mscale_all_dim=1.0, rope_original_max_seq=4096)

    @staticmethod
    def from_hf(model_name: str) -> "MLAConfig":
        """Read the architecture from a HuggingFace deepseek_v2/v3
        config."""
        from transformers import AutoConfig
        hc = AutoConfig.from_pretrained(model_name)
        model_type = getattr(hc, "model_type", "")
        if model_type not in ("deepseek_v2", "deepseek_v3"):
            raise ValueError(f"not an MLA architecture: {model_type!r}")
        if getattr(hc, "moe_layer_freq", 1) != 1:
            raise NotImplementedError("moe_layer_freq != 1 not supported")
        arch = "v3" if model_type == "deepseek_v3" else "v2"
        scaling = {}
        rs = getattr(hc, "rope_scaling", None)
        if rs:
            kind = rs.get("rope_type") or rs.get("type")
            if kind not in ("yarn",):
                raise NotImplementedError(
                    f"rope_scaling type {kind!r} not supported for MLA")
            scaling = dict(
                rope_scaling_type="yarn",
                rope_scaling_factor=float(rs.get("factor", 1.0)),
                rope_beta_fast=float(rs.get("beta_fast", 32.0)),
                rope_beta_slow=float(rs.get("beta_slow", 1.0)),
                rope_mscale=float(rs.get("mscale", 1.0)),
                rope_mscale_all_dim=float(rs.get("mscale_all_dim", 0.0)),
                rope_attention_factor=rs.get("attention_factor"),
                rope_original_max_seq=rs.get(
                    "original_max_position_embeddings",
                    hc.max_position_embeddings),
            )
        topk_method = getattr(hc, "topk_method",
                              "noaux_tc" if arch == "v3" else "greedy")
        return MLAConfig(
            **scaling,
            vocab_size=hc.vocab_size,
            dim=hc.hidden_size,
            n_layers=hc.num_hidden_layers,
            n_heads=hc.num_attention_heads,
            hidden_dim=hc.intermediate_size,
            norm_eps=hc.rms_norm_eps,
            rope_theta=getattr(hc, "rope_theta", 10000.0),
            max_seq_len=hc.max_position_embeddings,
            q_lora_rank=getattr(hc, "q_lora_rank", None),
            kv_lora_rank=hc.kv_lora_rank,
            qk_nope_head_dim=hc.qk_nope_head_dim,
            qk_rope_head_dim=hc.qk_rope_head_dim,
            v_head_dim=hc.v_head_dim,
            rope_interleaved=bool(getattr(hc, "rope_interleave", True)),
            arch=arch,
            n_routed_experts=getattr(hc, "n_routed_experts", None),
            n_shared_experts=getattr(hc, "n_shared_experts", None),
            n_experts_per_tok=getattr(hc, "num_experts_per_tok", 6) or 6,
            moe_hidden_dim=getattr(hc, "moe_intermediate_size", None),
            first_k_dense_replace=getattr(hc, "first_k_dense_replace", 0),
            routed_scaling_factor=float(
                getattr(hc, "routed_scaling_factor", 1.0)),
            topk_method=topk_method,
            n_group=getattr(hc, "n_group", None),
            topk_group=getattr(hc, "topk_group", None),
            norm_topk_prob=bool(getattr(hc, "norm_topk_prob", False)),
        )


# ---------------------------------------------------------------------------
# Latent cache pool
# ---------------------------------------------------------------------------


def new_latent_cache(cfg: MLAConfig, batch: int, max_len: int) -> jax.Array:
    """Latent KV pool ``[L, B, S, r+p]``: per (layer, token) one shared
    ``kv_a_layernorm``-ed latent (first r dims) and one roped MQA key
    (last p dims). There is no head axis — that is the compression."""
    return jnp.zeros((cfg.n_layers, batch, max_len, cfg.latent_dim),
                     jnp.dtype(cfg.dtype))


def new_quantized_latent_cache(cfg: MLAConfig, batch: int,
                               max_len: int):
    """Int8 latent pool: ``{"sym" [L, B, S, r+p] int8,
    "scale" [L, B, S] f32}`` (per-token scales over the latent dim).

    The latent is already ~57x smaller than expanded KV at DeepSeek-V2
    geometry; int8 halves the decode-critical HBM stream again (~114x)
    with the dequant fused into the latent MQA kernel
    (ops/latent_attention.quantized_latent_flash_attention)."""
    return {
        "sym": jnp.zeros((cfg.n_layers, batch, max_len, cfg.latent_dim),
                         jnp.int8),
        "scale": jnp.ones((cfg.n_layers, batch, max_len), jnp.float32),
    }


def latent_pad_dim(cfg: MLAConfig) -> int:
    """Latent dim of the PAGED arenas, padded to a lane multiple (128)
    so the manual-DMA kernels can copy whole pages
    (ops/paged_latent_attention DMA family: HBM DMA slices must be
    128-lane aligned). Pad columns are zero; the zero-padded query
    scores them 0, so they never affect attention; wire blobs and the
    dense latent cache stay at the logical ``cfg.latent_dim``."""
    return -(-cfg.latent_dim // 128) * 128


def pad_latents(cfg: MLAConfig, x: jax.Array) -> jax.Array:
    """Zero-pad the trailing latent dim to :func:`latent_pad_dim`."""
    pad = latent_pad_dim(cfg) - x.shape[-1]
    if pad == 0:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])


def new_paged_latent_pool(cfg: MLAConfig, num_pages: int,
                          page_size: int) -> jax.Array:
    """Paged latent arena ``[L, P, page, pad128(r+p)]``. Page 0 is the
    null page (parked writes land there, as in
    models/paged.new_paged_kv_pool). No head axis — one latent page
    holds ~57x the tokens of an expanded-KV page of equal bytes at
    DeepSeek-V2 geometry. The latent dim is lane-padded
    (:func:`latent_pad_dim`)."""
    return jnp.zeros(
        (cfg.n_layers, num_pages, page_size, latent_pad_dim(cfg)),
        jnp.dtype(cfg.dtype))


def new_quantized_paged_latent_pool(cfg: MLAConfig, num_pages: int,
                                    page_size: int):
    """Int8 paged latent arena: ``{"sym" [L, P, page, pad128(r+p)]
    int8, "scale" [L, P, page] f32}`` — :func:`new_quantized_latent_cache`'s
    per-token-scale layout on the page arena, so the same HBM holds
    ~2x the pages (~114x the tokens of an expanded-KV arena at
    DeepSeek-V2 geometry). Dequant is fused into the paged kernels
    (ops/paged_latent_attention)."""
    return {
        "sym": jnp.zeros(
            (cfg.n_layers, num_pages, page_size, latent_pad_dim(cfg)),
            jnp.int8),
        "scale": jnp.ones((cfg.n_layers, num_pages, page_size),
                          jnp.float32),
    }


def cache_to_blob(cache: jax.Array, b: int = 0,
                  n: Optional[int] = None) -> jax.Array:
    """One batch row as a wire blob ``[L, 1, n, 1, r+p]`` — vllm-format
    token axis (2), so the cache engine's chunking/serde/storage
    pipeline handles latent blobs without modification."""
    g = cache[:, b] if n is None else cache[:, b, :n]
    return g[:, None, :, None, :]


def blob_into_cache(cache: jax.Array, blob: jax.Array, b: int = 0,
                    pos=0) -> jax.Array:
    """Write a latent wire blob back into the pool at token ``pos``."""
    upd = blob[:, 0, :, 0, :][:, None]  # [L, 1, t, C]
    return jax.lax.dynamic_update_slice(cache, upd.astype(cache.dtype),
                                        (0, b, pos, 0))


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------


def _attn_param_shapes(cfg: MLAConfig):
    H = cfg.n_heads
    shapes = {
        "attn_norm": (cfg.dim,),
        "mlp_norm": (cfg.dim,),
        "wkv_a": (cfg.dim, cfg.latent_dim),
        "kv_a_norm": (cfg.kv_lora_rank,),
        # absorbed kv_b factors: k half as [H, nope, r] (used as
        # q_nope -> latent), v half as [H, r, v]
        "w_kb_k": (H, cfg.qk_nope_head_dim, cfg.kv_lora_rank),
        "w_kb_v": (H, cfg.kv_lora_rank, cfg.v_head_dim),
        "wo": (H * cfg.v_head_dim, cfg.dim),
    }
    if cfg.q_lora_rank is None:
        shapes["wq"] = (cfg.dim, H * cfg.qk_head_dim)
    else:
        shapes["wq_a"] = (cfg.dim, cfg.q_lora_rank)
        shapes["q_a_norm"] = (cfg.q_lora_rank,)
        shapes["wq_b"] = (cfg.q_lora_rank, H * cfg.qk_head_dim)
    return shapes


def init_params(rng: jax.Array, cfg: MLAConfig) -> Params:
    dt = jnp.dtype(cfg.dtype)
    kd, km = cfg.n_dense_layers, cfg.n_layers - cfg.n_dense_layers
    mh = cfg.moe_hidden_dim or cfg.hidden_dim

    it = iter(jax.random.split(rng, 64))

    def w(shape, fan_in, n_stack):
        return (jax.random.normal(next(it), (n_stack,) + shape,
                                  jnp.float32) * (fan_in**-0.5)).astype(dt)

    def attn_block(n_stack):
        out = {}
        for name, shape in _attn_param_shapes(cfg).items():
            if name.endswith("norm"):
                out[name] = jnp.ones((n_stack,) + shape, dt)
            else:
                out[name] = w(shape, shape[-2] if len(shape) > 1
                              else shape[-1], n_stack)
        return out

    params: Params = {
        "embed": w((cfg.vocab_size, cfg.dim), cfg.dim, 1)[0],
        "final_norm": jnp.ones((cfg.dim,), dt),
        "lm_head": w((cfg.dim, cfg.vocab_size), cfg.dim, 1)[0],
    }
    if kd:
        dense = attn_block(kd)
        dense["w_gate"] = w((cfg.dim, cfg.hidden_dim), cfg.dim, kd)
        dense["w_up"] = w((cfg.dim, cfg.hidden_dim), cfg.dim, kd)
        dense["w_down"] = w((cfg.hidden_dim, cfg.dim), cfg.hidden_dim, kd)
        params["dense_layers"] = dense
    if km:
        E, ns = cfg.n_routed_experts, cfg.n_shared_experts or 0
        moe = attn_block(km)
        moe["router"] = w((cfg.dim, E), cfg.dim, km)
        if cfg.topk_method == "noaux_tc":
            moe["router_bias"] = jnp.zeros((km, E), jnp.float32)
        moe["e_gate"] = w((E, cfg.dim, mh), cfg.dim, km)
        moe["e_up"] = w((E, cfg.dim, mh), cfg.dim, km)
        moe["e_down"] = w((E, mh, cfg.dim), mh, km)
        if ns:
            moe["s_gate"] = w((cfg.dim, mh * ns), cfg.dim, km)
            moe["s_up"] = w((cfg.dim, mh * ns), cfg.dim, km)
            moe["s_down"] = w((mh * ns, cfg.dim), mh * ns, km)
        params["moe_layers"] = moe
    return params


def load_hf(model_name: str,
            cfg: Optional[MLAConfig] = None) -> Tuple[MLAConfig, Params]:
    """Convert HuggingFace DeepSeek-V2/V3 weights into the two-block
    stacked pytree. torch (cpu) is only the weight reader."""
    import torch
    from transformers import AutoModelForCausalLM
    if cfg is None:
        cfg = MLAConfig.from_hf(model_name)
    model = AutoModelForCausalLM.from_pretrained(model_name,
                                                 torch_dtype=torch.float32)
    sd = model.state_dict()
    dt = jnp.dtype(cfg.dtype)
    H, n, r, v = (cfg.n_heads, cfg.qk_nope_head_dim, cfg.kv_lora_rank,
                  cfg.v_head_dim)

    def t(name):  # torch Linear stores [out, in]; we apply x @ W
        return np.asarray(sd[name].numpy().T)

    def vec(name):
        return np.asarray(sd[name].numpy())

    def stack(fn, idxs):
        return jnp.asarray(np.stack([fn(i) for i in idxs]), dt)

    def attn_block(idxs):
        p = "model.layers.{}."
        out = {
            "attn_norm": stack(
                lambda i: vec(p.format(i) + "input_layernorm.weight"), idxs),
            "mlp_norm": stack(
                lambda i: vec(p.format(i)
                              + "post_attention_layernorm.weight"), idxs),
            "wkv_a": stack(
                lambda i: t(p.format(i)
                            + "self_attn.kv_a_proj_with_mqa.weight"), idxs),
            "kv_a_norm": stack(
                lambda i: vec(p.format(i)
                              + "self_attn.kv_a_layernorm.weight"), idxs),
            "wo": stack(
                lambda i: t(p.format(i) + "self_attn.o_proj.weight"), idxs),
        }

        def kb(i):  # kv_b_proj [H*(n+v), r] -> ([H, n, r], [H, r, v])
            wkb = np.asarray(
                sd[p.format(i) + "self_attn.kv_b_proj.weight"].numpy())
            wkb = wkb.reshape(H, n + v, r)
            return wkb[:, :n, :], wkb[:, n:, :].transpose(0, 2, 1)

        pairs = [kb(i) for i in idxs]
        out["w_kb_k"] = jnp.asarray(np.stack([pk for pk, _ in pairs]), dt)
        out["w_kb_v"] = jnp.asarray(np.stack([pv for _, pv in pairs]), dt)
        if cfg.q_lora_rank is None:
            out["wq"] = stack(
                lambda i: t(p.format(i) + "self_attn.q_proj.weight"), idxs)
        else:
            out["wq_a"] = stack(
                lambda i: t(p.format(i) + "self_attn.q_a_proj.weight"), idxs)
            out["q_a_norm"] = stack(
                lambda i: vec(p.format(i)
                              + "self_attn.q_a_layernorm.weight"), idxs)
            out["wq_b"] = stack(
                lambda i: t(p.format(i) + "self_attn.q_b_proj.weight"), idxs)
        return out

    kd = cfg.n_dense_layers
    dense_idx = list(range(kd))
    moe_idx = list(range(kd, cfg.n_layers))
    lm_head = ("lm_head.weight" if "lm_head.weight" in sd else
               "model.embed_tokens.weight")
    params: Params = {
        "embed": jnp.asarray(vec("model.embed_tokens.weight"), dt),
        "final_norm": jnp.asarray(vec("model.norm.weight"), dt),
        "lm_head": jnp.asarray(np.asarray(sd[lm_head].numpy().T), dt),
    }
    if dense_idx:
        dense = attn_block(dense_idx)
        for key, hf in (("w_gate", "gate_proj"), ("w_up", "up_proj"),
                        ("w_down", "down_proj")):
            dense[key] = stack(
                lambda i, hf=hf: t(f"model.layers.{i}.mlp.{hf}.weight"),
                dense_idx)
        params["dense_layers"] = dense
    if moe_idx:
        E = cfg.n_routed_experts
        moe = attn_block(moe_idx)
        moe["router"] = stack(
            lambda i: t(f"model.layers.{i}.mlp.gate.weight"), moe_idx)
        bias_name = "model.layers.{}.mlp.gate.e_score_correction_bias"
        if bias_name.format(moe_idx[0]) in sd:
            moe["router_bias"] = jnp.asarray(
                np.stack([vec(bias_name.format(i)) for i in moe_idx]),
                jnp.float32)
        for key, hf in (("e_gate", "gate_proj"), ("e_up", "up_proj"),
                        ("e_down", "down_proj")):
            moe[key] = jnp.asarray(
                np.stack([
                    np.stack([
                        t(f"model.layers.{i}.mlp.experts.{e}.{hf}.weight")
                        for e in range(E)
                    ]) for i in moe_idx
                ]), dt)
        if cfg.n_shared_experts:
            for key, hf in (("s_gate", "gate_proj"), ("s_up", "up_proj"),
                            ("s_down", "down_proj")):
                moe[key] = stack(
                    lambda i, hf=hf: t(
                        f"model.layers.{i}.mlp.shared_experts.{hf}.weight"),
                    moe_idx)
        params["moe_layers"] = moe
    return cfg, params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _shard_latent_attend(attend, mesh, n_heads: int, batch: int,
                         quantized: bool = False):
    """Wrap the latent MQA kernel in ``shard_map`` over ``mesh``.

    Absorbed MLA is MQA: every query head attends to the SAME latent
    stream, so the kernel is embarrassingly parallel over *query* heads
    — each chip streams the (replicated) latent pool against its own
    query-head slice, collective-free. Batch rides "data" when it
    divides; mirrors :func:`lmcache_tpu.models.llama._shard_dense_attend`.

    Returns ``None`` when the query heads don't divide the "model" axis.
    """
    from jax.sharding import PartitionSpec as P

    from lmcache_tpu.parallel.mesh import shard_map_unchecked

    tp = mesh.shape.get("model", 1)
    dp = mesh.shape.get("data", 1)
    if n_heads % tp:
        return None
    bax = "data" if batch % dp == 0 else None

    qspec = P(bax, None, "model", None)  # [B, T, H, C] q heads
    lat = P(bax, None, None)  # [B, S, r+p] one stream, replicated on tp
    vec = P(bax,)  # [B]
    if quantized:
        scl = P(bax, None)  # [B, S] per-token scales
        in_specs = (qspec, lat, scl, vec, vec)
    else:
        in_specs = (qspec, lat, vec, vec)
    return shard_map_unchecked(attend, mesh, in_specs=in_specs,
                     out_specs=qspec)


def _mla_project(x, lp, cfg: MLAConfig, positions):
    """Shared MLA projections for one layer: returns
    (q_full [B, T, H, r+p] float32 — the absorbed query, new_tok
    [B, T, r+p] — the token's latent row to cache)."""
    B, T = x.shape[:2]
    H, n, p, r = (cfg.n_heads, cfg.qk_nope_head_dim, cfg.qk_rope_head_dim,
                  cfg.kv_lora_rank)

    h = _rms_norm(x, lp["attn_norm"], cfg.norm_eps)
    if cfg.q_lora_rank is None:
        q = h @ lp["wq"]
    else:
        q = _rms_norm(h @ lp["wq_a"], lp["q_a_norm"], cfg.norm_eps)
        q = q @ lp["wq_b"]
    q = q.reshape(B, T, H, cfg.qk_head_dim)
    q_nope, q_pe = q[..., :n], q[..., n:]

    ckv = h @ lp["wkv_a"]  # [B, T, r+p]
    c = _rms_norm(ckv[..., :r], lp["kv_a_norm"], cfg.norm_eps)
    k_pe = ckv[..., None, r:]  # [B, T, 1, p] (MQA: one rope key)

    spec = cfg.rope_scaling_spec
    q_pe = _rope(q_pe, positions, cfg.rope_theta,
                 interleaved=cfg.rope_interleaved, scaling=spec)
    k_pe = _rope(k_pe, positions, cfg.rope_theta,
                 interleaved=cfg.rope_interleaved, scaling=spec)[:, :, 0]

    new_tok = jnp.concatenate([c, k_pe], axis=-1)  # [B, T, r+p]

    # absorb the per-head key factor into the query: q·(W_k c) = (W_kᵀq)·c
    q_lat = jnp.einsum("bthn,hnr->bthr", q_nope.astype(jnp.float32),
                       lp["w_kb_k"].astype(jnp.float32))
    q_full = jnp.concatenate([q_lat, q_pe.astype(jnp.float32)], axis=-1)
    return q_full, new_tok


def _mla_attention(x, lp, cfg: MLAConfig, cache_l, start_pos, positions,
                   use_pallas=False, mesh=None):
    """Absorbed-latent MLA attention for one layer.

    cache_l: ``[B, S, r+p]``. Returns (attn output [B, T, H*v],
    new cache_l). Scores and softmax in float32; with ``use_pallas``
    the streaming single-read kernel (ops/latent_attention.py) replaces
    the two-pass einsum — under a ``mesh`` it runs in ``shard_map``
    with query heads on "model" (see :func:`_shard_latent_attend`)."""
    B, T = x.shape[:2]
    H, r = cfg.n_heads, cfg.kv_lora_rank

    q_full, new_tok = _mla_project(x, lp, cfg, positions)
    from lmcache_tpu.ops.latent_attention import (
        latent_attention_reference, latent_flash_attention,
        quantize_latents, quantized_latent_attention_reference,
        quantized_latent_flash_attention)
    if isinstance(cache_l, dict):
        # int8 latent pool: quantize the new tokens' latents on write,
        # fused dequant on read (per-token scale over the latent dim)
        n_sym, n_sc = quantize_latents(new_tok)
        sym = jax.vmap(
            lambda cb, nb, s: jax.lax.dynamic_update_slice(
                cb, nb, (s, 0)))(cache_l["sym"], n_sym, start_pos)
        scl = jax.vmap(
            lambda cb, nb, s: jax.lax.dynamic_update_slice(
                cb, nb, (s,)))(cache_l["scale"], n_sc, start_pos)
        cache_l = {"sym": sym, "scale": scl}
        if use_pallas:
            impl = functools.partial(quantized_latent_flash_attention,
                                     rank=r, scale=cfg.sm_scale)
            if mesh is not None:
                sharded = _shard_latent_attend(impl, mesh, H, B,
                                               quantized=True)
                if sharded is not None:
                    impl = sharded
            ctx = impl(q_full.astype(jnp.dtype(cfg.dtype)), sym, scl,
                       start_pos, start_pos + T)
        else:
            ctx = quantized_latent_attention_reference(
                q_full, sym, scl, start_pos, start_pos + T, rank=r,
                scale=cfg.sm_scale)
    else:
        cache_l = jax.vmap(
            lambda cb, nb, s: jax.lax.dynamic_update_slice(cb, nb, (s, 0)))(
                cache_l, new_tok.astype(cache_l.dtype), start_pos)
        if use_pallas:
            # stream in the pool's dtype (bf16 x bf16 -> f32 on the MXU)
            impl = functools.partial(latent_flash_attention, rank=r,
                                     scale=cfg.sm_scale)
            if mesh is not None:
                sharded = _shard_latent_attend(impl, mesh, H, B)
                if sharded is not None:
                    impl = sharded
            ctx = impl(q_full.astype(cache_l.dtype), cache_l, start_pos,
                       start_pos + T)
        else:
            ctx = latent_attention_reference(q_full, cache_l, start_pos,
                                             start_pos + T, rank=r,
                                             scale=cfg.sm_scale)
    attn = jnp.einsum("bthr,hrv->bthv", ctx,
                      lp["w_kb_v"].astype(jnp.float32))
    return attn.astype(x.dtype).reshape(B, T, H * cfg.v_head_dim), cache_l


def _gate(h, lp, cfg: MLAConfig):
    """Routing weights [..., E] (zero for unselected experts), matching
    the HF gates: V2 softmax greedy/group_limited_greedy (gate :63-90),
    V3 sigmoid noaux_tc with selection bias (router :225-252)."""
    E, k = cfg.n_routed_experts, cfg.n_experts_per_tok
    logits = (h.astype(jnp.float32)
              @ lp["router"].astype(jnp.float32))  # [..., E]
    if cfg.arch == "v3":
        scores = jax.nn.sigmoid(logits)
    else:
        scores = jax.nn.softmax(logits, axis=-1)

    if cfg.topk_method == "greedy":
        sel = scores
    else:
        # group-limited selection: score each group, keep the top
        # topk_group groups, mask the rest to 0 (scores are >= 0)
        G = cfg.n_group
        sel = scores + lp["router_bias"] if cfg.topk_method == "noaux_tc" \
            else scores
        grouped = sel.reshape(sel.shape[:-1] + (G, E // G))
        if cfg.topk_method == "noaux_tc":
            # V3: group score = sum of its top-2 member scores
            top2, _ = jax.lax.top_k(grouped, 2)
            gscore = jnp.sum(top2, axis=-1)
        else:
            gscore = jnp.max(grouped, axis=-1)
        _, gidx = jax.lax.top_k(gscore, cfg.topk_group)
        gmask = jnp.sum(jax.nn.one_hot(gidx, G, dtype=sel.dtype), axis=-2)
        sel = (grouped * gmask[..., None]).reshape(sel.shape)

    _, topi = jax.lax.top_k(sel, k)
    # weights come from the ORIGINAL scores (V3 gathers scores, not the
    # biased selection values; V2's masked scores equal the originals at
    # selected positions)
    onehot = jax.nn.one_hot(topi, E, dtype=scores.dtype)  # [..., k, E]
    topw = jnp.einsum("...ke,...e->...k", onehot, scores)
    if cfg.norm_topk_prob:
        topw = topw / (jnp.sum(topw, axis=-1, keepdims=True) + 1e-20)
    topw = topw * cfg.routed_scaling_factor
    return jnp.einsum("...ke,...k->...e", onehot, topw)


def _moe_mlp(h, lp, cfg: MLAConfig):
    """Routed experts (dense-compute scan, see llama._moe_mlp for the
    TPU rationale) + always-on shared experts."""
    w = _gate(h, lp, cfg)

    def expert(acc, sc):
        g, u, d, we = sc
        gate = jax.nn.silu((h @ g).astype(jnp.float32))
        up = (h @ u).astype(jnp.float32)
        y = ((gate * up).astype(h.dtype) @ d).astype(jnp.float32)
        return acc + we[..., None] * y, None

    acc0 = jnp.zeros(h.shape[:-1] + (cfg.dim,), jnp.float32)
    out, _ = jax.lax.scan(
        expert, acc0,
        (lp["e_gate"], lp["e_up"], lp["e_down"], jnp.moveaxis(w, -1, 0)))
    out = out.astype(h.dtype)
    if cfg.n_shared_experts:
        gate = jax.nn.silu((h @ lp["s_gate"]).astype(jnp.float32))
        up = (h @ lp["s_up"]).astype(jnp.float32)
        out = out + (gate * up).astype(h.dtype) @ lp["s_down"]
    return out


def _layer_block(cfg: MLAConfig, moe: bool, start_pos, positions,
                 use_pallas=False, mesh=None):
    def layer(x, scanned):
        lp, cache_l = scanned
        attn, cache_l = _mla_attention(x, lp, cfg, cache_l, start_pos,
                                       positions, use_pallas=use_pallas,
                                       mesh=mesh)
        x = x + attn @ lp["wo"]
        h = _rms_norm(x, lp["mlp_norm"], cfg.norm_eps)
        if moe:
            y = _moe_mlp(h, lp, cfg)
        else:
            gate = jax.nn.silu((h @ lp["w_gate"]).astype(jnp.float32))
            up = (h @ lp["w_up"]).astype(jnp.float32)
            y = (gate * up).astype(x.dtype) @ lp["w_down"]
        return x + y, cache_l
    return layer


def forward(
    params: Params,
    cfg: MLAConfig,
    tokens: jax.Array,  # int32 [B, T]
    start_pos: jax.Array,  # int32 [B]
    latent_cache: jax.Array,  # [L, B, S, r+p] (new_latent_cache)
    *,
    use_pallas: bool = False,
    last_logit_only: bool = False,
    mesh=None,
    remat: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """One forward step (prefill when T>1, decode when T==1), with the
    latent cache as the only recurrent state. Same contract as
    llama.forward: new tokens' latents are written at ``start_pos[b]``;
    cached-prefix reuse = blob_into_cache + calling with the suffix.
    With ``mesh``, the latent kernel runs under ``shard_map`` with query
    heads on "model" (see :func:`_shard_latent_attend`). ``remat``
    recomputes each layer in the backward pass so training at long T
    doesn't keep every layer's [B, H, T, T] score intermediates (the
    long-position finetune of the MLA quality checkpoint needs this,
    exactly like llama.forward's flag)."""
    B, T = tokens.shape
    positions = start_pos[:, None] + jnp.arange(T)[None, :]
    x = params["embed"][tokens]

    kd = cfg.n_dense_layers

    def csl(sl):  # layer-slice of the cache (int8 pools are trees)
        return jax.tree.map(lambda a: a[sl], latent_cache)

    def block(moe):
        f = _layer_block(cfg, moe, start_pos, positions, use_pallas,
                         mesh)
        return jax.checkpoint(f) if remat else f

    caches = []
    if kd:
        x, dense_cache = jax.lax.scan(
            block(False), x,
            (params["dense_layers"], csl(slice(None, kd))))
        caches.append(dense_cache)
    if kd < cfg.n_layers:
        x, moe_cache = jax.lax.scan(
            block(True), x,
            (params["moe_layers"], csl(slice(kd, None))))
        caches.append(moe_cache)
    new_cache = (caches[0] if len(caches) == 1 else jax.tree.map(
        lambda *xs: jnp.concatenate(xs), *caches))

    if last_logit_only:
        x = x[:, -1:]
    x = _rms_norm(x, params["final_norm"], cfg.norm_eps)
    logits = (x @ params["lm_head"]).astype(jnp.float32)
    return logits, new_cache


def _shard_paged_latent_attend(attend, mesh, n_heads: int, batch: int,
                               quantized: bool = False):
    """:func:`_shard_latent_attend` for the paged kernel: q heads on
    "model", the latent arena and page tables replicated (pages are the
    cross-request resource — no batch or head axis to shard them on)."""
    from jax.sharding import PartitionSpec as P

    from lmcache_tpu.parallel.mesh import shard_map_unchecked

    tp = mesh.shape.get("model", 1)
    dp = mesh.shape.get("data", 1)
    if n_heads % tp:
        return None
    bax = "data" if batch % dp == 0 else None

    qspec = P(bax, None, "model", None)  # [B, T, H, C] q heads
    pool = P(None, None, None)  # [P, page, C] arena, replicated
    tab = P(bax, None)  # [B, NP]
    vec = P(bax,)  # [B]
    if quantized:
        scl = P(None, None)  # [P, page] scale pages, replicated
        in_specs = (qspec, pool, scl, tab, vec, vec)
    else:
        in_specs = (qspec, pool, tab, vec, vec)
    return shard_map_unchecked(attend, mesh, in_specs=in_specs,
                     out_specs=qspec)


def _mla_attention_paged(x, lp, cfg: MLAConfig, pool_l, page_table, pidx,
                         poff, start_pos, positions, use_pallas=False,
                         mesh=None):
    """:func:`_mla_attention` against one layer of the paged latent
    arena: new tokens' latent rows scatter into the pages named by the
    table; attention gathers pages by DMA inside the kernel
    (ops/paged_latent_attention.py)."""
    B, T = x.shape[:2]
    H, r = cfg.n_heads, cfg.kv_lora_rank

    q_full, new_tok = _mla_project(x, lp, cfg, positions)
    from lmcache_tpu.ops.paged_latent_attention import (
        paged_latent_attention_dma, paged_latent_attention_reference,
        quantized_paged_latent_attention_dma,
        quantized_paged_latent_attention_reference)
    kv_len = start_pos + T
    # the paged arenas are lane-padded (latent_pad_dim); pad the new
    # rows and the query to match — zero columns never affect attention
    new_tok = pad_latents(cfg, new_tok)
    q_pad = pad_latents(cfg, q_full)
    if isinstance(pool_l, dict):
        # int8 arena: quantize the new tokens' latents on write, fused
        # dequant on read (per-token scale over the latent dim; zero
        # pad columns quantize to 0 and leave the absmax scale as-is)
        from lmcache_tpu.ops.latent_attention import quantize_latents
        n_sym, n_sc = quantize_latents(new_tok)
        pool_l = {
            "sym": pool_l["sym"].at[pidx, poff].set(n_sym),
            "scale": pool_l["scale"].at[pidx, poff].set(n_sc),
        }
        if use_pallas:
            impl = functools.partial(quantized_paged_latent_attention_dma,
                                     rank=r, scale=cfg.sm_scale)
            if mesh is not None:
                sharded = _shard_paged_latent_attend(impl, mesh, H, B,
                                                     quantized=True)
                if sharded is not None:
                    impl = sharded
            ctx = impl(q_pad.astype(jnp.dtype(cfg.dtype)), pool_l["sym"],
                       pool_l["scale"], page_table, start_pos, kv_len)
        else:
            ctx = quantized_paged_latent_attention_reference(
                q_pad, pool_l["sym"], pool_l["scale"], page_table,
                start_pos, kv_len, rank=r, scale=cfg.sm_scale)
    else:
        # scatter [B, T, C] latent rows into pages: pool[p, o] = new[b, t]
        pool_l = pool_l.at[pidx, poff].set(new_tok.astype(pool_l.dtype))
        if use_pallas:
            impl = functools.partial(paged_latent_attention_dma, rank=r,
                                     scale=cfg.sm_scale)
            if mesh is not None:
                sharded = _shard_paged_latent_attend(impl, mesh, H, B)
                if sharded is not None:
                    impl = sharded
            ctx = impl(q_pad.astype(pool_l.dtype), pool_l, page_table,
                       start_pos, kv_len)
        else:
            ctx = paged_latent_attention_reference(
                q_pad, pool_l, page_table, start_pos, kv_len, rank=r,
                scale=cfg.sm_scale)
    attn = jnp.einsum("bthr,hrv->bthv", ctx,
                      lp["w_kb_v"].astype(jnp.float32))
    return attn.astype(x.dtype).reshape(B, T, H * cfg.v_head_dim), pool_l


def _layer_block_paged(cfg: MLAConfig, moe: bool, page_table, pidx, poff,
                       start_pos, positions, use_pallas=False, mesh=None):
    def layer(x, scanned):
        lp, pool_l = scanned
        attn, pool_l = _mla_attention_paged(
            x, lp, cfg, pool_l, page_table, pidx, poff, start_pos,
            positions, use_pallas=use_pallas, mesh=mesh)
        x = x + attn @ lp["wo"]
        h = _rms_norm(x, lp["mlp_norm"], cfg.norm_eps)
        if moe:
            y = _moe_mlp(h, lp, cfg)
        else:
            gate = jax.nn.silu((h @ lp["w_gate"]).astype(jnp.float32))
            up = (h @ lp["w_up"]).astype(jnp.float32)
            y = (gate * up).astype(x.dtype) @ lp["w_down"]
        return x + y, pool_l
    return layer


def forward_paged(
    params: Params,
    cfg: MLAConfig,
    tokens: jax.Array,  # int32 [B, T]
    start_pos: jax.Array,  # int32 [B]
    latent_pool: jax.Array,  # [L, P, page, r+p] (new_paged_latent_pool)
    page_table: jax.Array,  # int32 [B, NP]
    *,
    use_pallas: bool = False,
    last_logit_only: bool = False,
    mesh=None,
) -> Tuple[jax.Array, jax.Array]:
    """:func:`forward` against the shared paged latent arena — the MLA
    counterpart of models/paged.forward_paged. New tokens' latent rows
    are scattered into the pages named by ``page_table``; attention
    gathers pages by DMA inside the kernel. Returns (logits, updated
    arena)."""
    B, T = tokens.shape
    page = jax.tree.leaves(latent_pool)[0].shape[2]
    positions = start_pos[:, None] + jnp.arange(T)[None, :]
    # per-(batch, new-token) page id and in-page offset
    pidx = jnp.take_along_axis(page_table, positions // page, axis=1)
    poff = positions % page
    x = params["embed"][tokens]

    kd = cfg.n_dense_layers

    def psl(sl):  # layer-slice of the arena (int8 pools are trees)
        return jax.tree.map(lambda a: a[sl], latent_pool)

    pools = []
    if kd:
        x, dense_pool = jax.lax.scan(
            _layer_block_paged(cfg, False, page_table, pidx, poff,
                               start_pos, positions, use_pallas, mesh), x,
            (params["dense_layers"], psl(slice(None, kd))))
        pools.append(dense_pool)
    if kd < cfg.n_layers:
        x, moe_pool = jax.lax.scan(
            _layer_block_paged(cfg, True, page_table, pidx, poff,
                               start_pos, positions, use_pallas, mesh), x,
            (params["moe_layers"], psl(slice(kd, None))))
        pools.append(moe_pool)
    new_pool = (pools[0] if len(pools) == 1 else jax.tree.map(
        lambda *xs: jnp.concatenate(xs), *pools))

    if last_logit_only:
        x = x[:, -1:]
    x = _rms_norm(x, params["final_norm"], cfg.norm_eps)
    logits = (x @ params["lm_head"]).astype(jnp.float32)
    return logits, new_pool
