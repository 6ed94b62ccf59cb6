"""LLaMA-family transformer, TPU-first.

Covers the reference's served model families (llama/longchat/mistral/
qwen/glm — the CacheGen per-family quantization table, reference
lmcache/serde/cachegen_basics.py:32-78, keys off these names) plus the
newer family traits: Qwen3 per-head qk-norm and decoupled head_dim,
Glm4-0414 sandwich norms, and sparse-MoE MLPs (Mixtral / Qwen3-MoE).

Design (idiomatic JAX, not a torch translation):

- parameters are a plain pytree with all layers **stacked** on a leading
  ``[L, ...]`` axis and the layer loop expressed as ``lax.scan`` — one
  traced layer body regardless of depth, fast XLA compiles;
- the KV cache is a single array ``[L, 2, B, H_kv, S_max, D]`` —
  HEAD-major, consumed by the attention kernel with no per-step relayout;
  ``cache_to_blob``/``blob_into_cache`` convert to/from the token-major
  cache-engine wire blob (lmcache_tpu/kv.py) at chunk granularity;
- per-sequence write offsets (continuous batching: every row of the batch
  is at a different position) via ``vmap``-ed ``dynamic_update_slice``;
- attention is the Pallas flash kernel (ops/attention.py) fed directly
  from the cache buffer — prefill-with-cached-prefix and decode are the
  same code path with different ``T``.
"""

import dataclasses
import functools
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lmcache_tpu.ops.attention import flash_attention, mha_reference

Params = Dict[str, Any]


@dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    dim: int = 4096
    n_layers: int = 32
    n_heads: int = 32
    n_kv_heads: int = 32
    hidden_dim: int = 11008
    norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    max_seq_len: int = 16384
    dtype: str = "bfloat16"
    # qkv projection bias (Qwen family; reference CacheGen family table
    # includes Qwen-7B, cachegen_basics.py:36)
    attention_bias: bool = False
    # sliding-window attention (Mistral family); None = full causal
    sliding_window: "Optional[int]" = None
    # partial rotary (GLM family — the reference CacheGen table includes
    # glm, cachegen_basics.py): rotate only the first rotary_dim of each
    # head; None = full head_dim. GLM also pairs adjacent channels
    # ("interleaved") instead of llama's half-split.
    rotary_dim: "Optional[int]" = None
    rope_interleaved: bool = False
    # RoPE frequency scaling for context extension. "linear" divides
    # every frequency by the factor (longchat's rope condensation);
    # "llama3" rescales only low-frequency channels with a smooth
    # interpolation band (llama-3.1's scheme); "yarn" is NTK-by-parts
    # interpolation with an attention-temperature mscale (Qwen long-
    # context). Flat fields (not a dict) keep the config hashable for
    # jit static args.
    rope_scaling_type: "Optional[str]" = None  # linear|llama3|yarn|longrope
    rope_scaling_factor: float = 1.0
    rope_low_freq_factor: float = 1.0  # llama3
    rope_high_freq_factor: float = 4.0  # llama3
    rope_beta_fast: float = 32.0  # yarn
    rope_beta_slow: float = 1.0  # yarn
    rope_attention_factor: "Optional[float]" = None  # yarn/longrope mscale
    rope_original_max_seq: "Optional[int]" = None
    # longrope (Phi-3 family): per-dim frequency dividers [rd/2], chosen
    # ONCE at config time (long_factor when the deployment context
    # exceeds the pretraining context, else short_factor). HF switches
    # factor sets dynamically on the running seq_len, which silently
    # invalidates every already-cached K the moment a sequence crosses
    # the boundary — a static per-deployment choice is what keeps cached
    # chunks reusable (and is what serving engines do).
    rope_freq_factors: "Optional[Tuple[float, ...]]" = None

    @property
    def rope_scaling_spec(self):
        """Hashable tuple for the rope helpers; None when unscaled."""
        if self.rope_scaling_type is None:
            return None
        return (self.rope_scaling_type, self.rope_scaling_factor,
                self.rope_low_freq_factor, self.rope_high_freq_factor,
                self.rope_original_max_seq, self.rope_beta_fast,
                self.rope_beta_slow, self.rope_attention_factor,
                self.rope_freq_factors)
    # sandwich norms (Glm4-0414 family, HF `glm4` arch): extra RMSNorms
    # on the attention and MLP *outputs* before the residual add
    # (post_self_attn_layernorm / post_mlp_layernorm in modeling_glm4)
    post_norms: bool = False
    # pre-norms on the block INPUTS (llama convention). OLMo-2 norms
    # only the outputs: pre_norms=False + post_norms=True reproduces
    # x + norm(attn(x)) / x + norm(mlp(x)) (modeling_olmo2)
    pre_norms: bool = True
    # RMSNorm over the FULL projected q/k vectors ([H*D]) before the
    # head reshape and rope (OLMo-2) — unlike qk_norm's per-head norm
    qk_norm_flat: bool = False
    # per-head RMSNorm on q and k before RoPE (Qwen3 family)
    qk_norm: bool = False
    # sparse mixture-of-experts MLP (Mixtral / Qwen3-MoE families);
    # None = dense SwiGLU. norm_topk_prob renormalizes the selected
    # experts' probabilities — mathematically identical to Mixtral's
    # softmax-over-top-k-logits (softmax restricted to a subset ==
    # renormalized softmax), so one flag covers both families.
    n_experts: "Optional[int]" = None
    n_experts_per_tok: int = 2
    moe_hidden_dim: "Optional[int]" = None  # expert width; None=hidden_dim
    norm_topk_prob: bool = True
    # decoupled head dim (Qwen3-4B-class: head_dim != dim // n_heads);
    # None = dim // n_heads
    head_dim_override: "Optional[int]" = None
    # --- Gemma-family traits -------------------------------------------
    # MLP activation on the gate projection: "silu" (llama SwiGLU) or
    # "gelu_tanh" (Gemma's GeGLU, HF hidden_activation
    # "gelu_pytorch_tanh")
    mlp_act: str = "silu"
    # RMSNorm multiplies by (1 + weight) in float32 (Gemma convention;
    # weights are deltas around identity)
    norm_one_offset: bool = False
    # embeddings scaled by sqrt(dim) after lookup (Gemma)
    embed_scale: bool = False
    # attention scores bounded to (-cap, cap) via cap*tanh(s/cap)
    # before masking (Gemma-2 attn_logit_softcapping)
    attn_logit_softcap: "Optional[float]" = None
    # final lm_head logits bounded the same way (Gemma-2
    # final_logit_softcapping)
    final_logit_softcap: "Optional[float]" = None
    # attention score scale = query_pre_attn_scalar**-0.5 instead of
    # head_dim**-0.5 (Gemma-2; e.g. 27B uses dim/n_heads != head_dim)
    query_pre_attn_scalar: "Optional[float]" = None
    # alternating local/global attention: with pattern p, layer i uses
    # FULL attention iff (i + 1) % p == 0 and the sliding window
    # otherwise (Gemma-2: p=2; Gemma-3: p=6). None = every layer slides
    # when sliding_window is set (Mistral).
    sliding_window_pattern: "Optional[int]" = None
    # explicit per-layer is-global map [L] (HF `layer_types` lists:
    # True = full_attention). Overrides sliding_window_pattern.
    global_layer_map: "Optional[Tuple[bool, ...]]" = None
    # dual-theta rotary (Gemma-3): sliding layers rope at this base
    # frequency with NO context-extension scaling; global layers keep
    # rope_theta + rope_scaling (HF rope_local_base_freq)
    rope_local_theta: "Optional[float]" = None
    # --- Llama-4 family traits (iRoPE) ---------------------------------
    # local-attention kind for non-global layers: "sliding" (trailing
    # window of sliding_window positions, Mistral/Gemma) or "chunked"
    # (block-diagonal chunks of sliding_window positions, Llama-4
    # attention_chunk_size)
    local_attention_kind: str = "sliding"
    # global (full-attention) layers carry NO positional encoding —
    # identity rotation — while local layers rope normally (Llama-4
    # no_rope_layers; from_hf verifies the HF masks align)
    nope_on_global_layers: bool = False
    # weightless L2 norm on q and k AFTER rope, rope layers only
    # (Llama-4 use_qk_norm — unlike qk_norm's learned RMS before rope)
    qk_l2_norm: bool = False
    # NoPE-layer query temperature (arXiv:2501.19399, Llama-4):
    # q *= 1 + attn_scale * log1p(floor((pos + 1) / attn_floor_scale))
    attn_temperature_tuning: bool = False
    attn_floor_scale: float = 8192.0
    attn_scale: float = 0.1
    # MoE routing style: "softmax_topk" (Mixtral/Qwen3: softmax probs,
    # top-k, optional renorm, output-weighted), "llama4" (top-k on
    # LOGITS, sigmoid gates scaling the expert INPUT, plus an always-on
    # shared expert of width hidden_dim; moe_hidden_dim = routed width),
    # or "gpt_oss" (biased router, softmax over the top-k logits,
    # biased experts with the clamped gated activation
    # (up+1) * gate * sigmoid(1.702 * gate), gate/up clamped at
    # moe_act_limit)
    moe_style: str = "softmax_topk"
    moe_act_limit: float = 7.0  # gpt_oss swiglu clamp
    # --- GPT-OSS family traits -----------------------------------------
    # learned per-head attention-sink logits joined to every softmax
    # normalization and then dropped (params["layers"]["sinks"] [L, H])
    attn_sinks: bool = False
    # bias on the attention OUTPUT projection (GPT-OSS o_proj; HF
    # zero-inits it so random-weight parity can't see a dropped load —
    # released checkpoints carry trained values)
    attention_out_bias: bool = False

    @property
    def head_dim(self) -> int:
        return self.head_dim_override or self.dim // self.n_heads

    @property
    def sm_scale(self) -> "Optional[float]":
        """Attention score scale override; None = 1/sqrt(head_dim)."""
        if self.query_pre_attn_scalar is None:
            return None
        return float(self.query_pre_attn_scalar)**-0.5

    def layer_windows(self) -> np.ndarray:
        """Per-layer bool [L]: True where the layer attends GLOBALLY
        (full causal), False where it uses the sliding window. All-True
        when no window is configured; all-False (every layer windowed)
        for Mistral-style uniform windows."""
        if self.sliding_window is None:
            return np.ones(self.n_layers, bool)
        if self.global_layer_map is not None:
            if len(self.global_layer_map) != self.n_layers:
                raise ValueError(
                    f"global_layer_map has {len(self.global_layer_map)} "
                    f"entries for {self.n_layers} layers")
            return np.asarray(self.global_layer_map, bool)
        if self.sliding_window_pattern is None:
            return np.zeros(self.n_layers, bool)
        p = self.sliding_window_pattern
        return np.asarray(
            [(i + 1) % p == 0 for i in range(self.n_layers)], bool)

    @staticmethod
    def tiny(**over) -> "LlamaConfig":
        """Small config for tests — geometry chosen to still exercise GQA
        and 128-lane tiling."""
        kw = dict(vocab_size=512, dim=256, n_layers=4, n_heads=4,
                  n_kv_heads=2, hidden_dim=512, max_seq_len=1024,
                  dtype="float32")
        kw.update(over)
        return LlamaConfig(**kw)

    @staticmethod
    def tinyllama_1_1b() -> "LlamaConfig":
        return LlamaConfig(vocab_size=32000, dim=2048, n_layers=22,
                           n_heads=32, n_kv_heads=4, hidden_dim=5632,
                           max_seq_len=2048, rope_theta=10000.0)

    @staticmethod
    def llama2_7b() -> "LlamaConfig":
        return LlamaConfig()

    @staticmethod
    def longchat_7b_16k() -> "LlamaConfig":
        # llama-2-7b arch with 16k context via linear rope condensation
        # (factor 8 over the 2k base — the reference's CacheGen eval
        # model, lmcache/serde/cachegen_basics.py:36)
        return LlamaConfig(max_seq_len=16384, rope_theta=10000.0,
                           rope_scaling_type="linear",
                           rope_scaling_factor=8.0,
                           rope_original_max_seq=2048)

    @staticmethod
    def mistral_7b() -> "LlamaConfig":
        return LlamaConfig(vocab_size=32000, dim=4096, n_layers=32,
                           n_heads=32, n_kv_heads=8, hidden_dim=14336,
                           rope_theta=1000000.0, max_seq_len=32768,
                           sliding_window=4096)

    @staticmethod
    def llama3_8b() -> "LlamaConfig":
        return LlamaConfig(vocab_size=128256, dim=4096, n_layers=32,
                           n_heads=32, n_kv_heads=8, hidden_dim=14336,
                           rope_theta=500000.0, max_seq_len=8192)

    @staticmethod
    def llama3_1_8b() -> "LlamaConfig":
        # llama-3.1-8b: llama3 geometry + frequency-dependent rope
        # scaling to 128k (the reference CacheGen family table's
        # llama-3.1 entry)
        return LlamaConfig(vocab_size=128256, dim=4096, n_layers=32,
                           n_heads=32, n_kv_heads=8, hidden_dim=14336,
                           rope_theta=500000.0, max_seq_len=131072,
                           rope_scaling_type="llama3",
                           rope_scaling_factor=8.0,
                           rope_low_freq_factor=1.0,
                           rope_high_freq_factor=4.0,
                           rope_original_max_seq=8192)

    @staticmethod
    def qwen_7b() -> "LlamaConfig":
        # Qwen/Qwen2-7B geometry; attention_bias=True is the family trait
        return LlamaConfig(vocab_size=152064, dim=3584, n_layers=28,
                           n_heads=28, n_kv_heads=4, hidden_dim=18944,
                           rope_theta=1000000.0, max_seq_len=32768,
                           attention_bias=True)

    @staticmethod
    def glm4_9b() -> "LlamaConfig":
        # THUDM/glm-4-9b-chat geometry (HF `glm` arch): multi-query
        # attention (2 kv heads), qkv bias, interleaved partial rotary
        return LlamaConfig(vocab_size=151552, dim=4096, n_layers=40,
                           n_heads=32, n_kv_heads=2, hidden_dim=13696,
                           rope_theta=10000.0, max_seq_len=131072,
                           attention_bias=True, rotary_dim=64,
                           rope_interleaved=True)

    @staticmethod
    def qwen3_8b() -> "LlamaConfig":
        # Qwen/Qwen3-8B: per-head q/k RMSNorm before RoPE, no qkv bias
        return LlamaConfig(vocab_size=151936, dim=4096, n_layers=36,
                           n_heads=32, n_kv_heads=8, hidden_dim=12288,
                           rope_theta=1000000.0, max_seq_len=40960,
                           qk_norm=True)

    @staticmethod
    def qwen3_4b() -> "LlamaConfig":
        # Qwen/Qwen3-4B: head_dim (128) decoupled from dim/n_heads (80)
        return LlamaConfig(vocab_size=151936, dim=2560, n_layers=36,
                           n_heads=32, n_kv_heads=8, hidden_dim=9728,
                           rope_theta=1000000.0, max_seq_len=40960,
                           qk_norm=True, head_dim_override=128)

    @staticmethod
    def mixtral_8x7b() -> "LlamaConfig":
        # mistralai/Mixtral-8x7B: 8 SwiGLU experts, top-2 routing
        return LlamaConfig(vocab_size=32000, dim=4096, n_layers=32,
                           n_heads=32, n_kv_heads=8, hidden_dim=14336,
                           rope_theta=1000000.0, max_seq_len=32768,
                           n_experts=8, n_experts_per_tok=2)

    @staticmethod
    def qwen3_moe_30b_a3b() -> "LlamaConfig":
        # Qwen/Qwen3-30B-A3B: 128 narrow experts, top-8, qk-norm
        return LlamaConfig(vocab_size=151936, dim=2048, n_layers=48,
                           n_heads=32, n_kv_heads=4, hidden_dim=6144,
                           rope_theta=1000000.0, max_seq_len=40960,
                           qk_norm=True, head_dim_override=128,
                           n_experts=128, n_experts_per_tok=8,
                           moe_hidden_dim=768)

    @staticmethod
    def glm4_0414_9b() -> "LlamaConfig":
        # THUDM/GLM-4-9B-0414 (HF `glm4` arch): glm4_9b geometry plus
        # the family's sandwich norms on attention/MLP outputs
        return LlamaConfig(vocab_size=151552, dim=4096, n_layers=40,
                           n_heads=32, n_kv_heads=2, hidden_dim=13696,
                           rope_theta=10000.0, max_seq_len=32768,
                           attention_bias=True, rotary_dim=64,
                           rope_interleaved=True, post_norms=True)

    @staticmethod
    def gemma2_9b() -> "LlamaConfig":
        # google/gemma-2-9b: GeGLU, (1+w) norms, scaled embeddings,
        # sandwich norms, alternating 4k-local/global attention,
        # score + logit softcaps, decoupled head_dim 256
        return LlamaConfig(vocab_size=256000, dim=3584, n_layers=42,
                           n_heads=16, n_kv_heads=8, hidden_dim=14336,
                           rope_theta=10000.0, max_seq_len=8192,
                           norm_eps=1e-6, head_dim_override=256,
                           mlp_act="gelu_tanh", norm_one_offset=True,
                           embed_scale=True, post_norms=True,
                           attn_logit_softcap=50.0,
                           final_logit_softcap=30.0,
                           query_pre_attn_scalar=256.0,
                           sliding_window=4096,
                           sliding_window_pattern=2)

    @staticmethod
    def gemma3_4b() -> "LlamaConfig":
        # google/gemma-3-4b (text stack): gemma-2 traits minus the
        # softcaps, plus per-head qk-norm, 5-local:1-global attention
        # (pattern 6, 1k window), and dual-theta rotary — sliding layers
        # at 10k base, global layers at 1M with linear factor-8 scaling
        return LlamaConfig(vocab_size=262208, dim=2560, n_layers=34,
                           n_heads=8, n_kv_heads=4, hidden_dim=10240,
                           rope_theta=1000000.0, max_seq_len=131072,
                           norm_eps=1e-6, head_dim_override=256,
                           mlp_act="gelu_tanh", norm_one_offset=True,
                           embed_scale=True, post_norms=True,
                           qk_norm=True, query_pre_attn_scalar=256.0,
                           sliding_window=1024,
                           sliding_window_pattern=6,
                           rope_local_theta=10000.0,
                           rope_scaling_type="linear",
                           rope_scaling_factor=8.0,
                           rope_original_max_seq=131072)

    @staticmethod
    def llama4_scout_17b_16e() -> "LlamaConfig":
        # meta-llama/Llama-4-Scout-17B-16E: iRoPE — 3 chunked-attention
        # rope layers then 1 NoPE full-attention layer (pattern 4),
        # 8192-token chunks, post-rope L2 qk-norm, NoPE query
        # temperature, 16-expert sigmoid top-1 MoE with a shared expert
        return LlamaConfig(vocab_size=202048, dim=5120, n_layers=48,
                           n_heads=40, n_kv_heads=8, hidden_dim=8192,
                           rope_theta=500000.0, max_seq_len=10485760,
                           rope_interleaved=True, sliding_window=8192,
                           sliding_window_pattern=4,
                           local_attention_kind="chunked",
                           nope_on_global_layers=True, qk_l2_norm=True,
                           attn_temperature_tuning=True,
                           n_experts=16, n_experts_per_tok=1,
                           moe_hidden_dim=8192, moe_style="llama4",
                           rope_scaling_type="llama3",
                           rope_scaling_factor=8.0,
                           rope_low_freq_factor=1.0,
                           rope_high_freq_factor=4.0,
                           rope_original_max_seq=8192)

    @staticmethod
    def olmo2_7b() -> "LlamaConfig":
        # allenai/OLMo-2-1124-7B: norms on the block OUTPUTS only
        # (x + norm(attn(x))), full-width qk-norms before the head
        # reshape, otherwise llama geometry
        return LlamaConfig(vocab_size=100352, dim=4096, n_layers=32,
                           n_heads=32, n_kv_heads=32, hidden_dim=11008,
                           rope_theta=500000.0, max_seq_len=4096,
                           pre_norms=False, post_norms=True,
                           qk_norm_flat=True)

    @staticmethod
    def gpt_oss_20b() -> "LlamaConfig":
        # openai/gpt-oss-20b: per-head attention SINKS joined to every
        # softmax, alternating 128-token sliding / full layers
        # (pattern 2), biased qkv, yarn rope to 128k, and a 32-expert
        # top-4 MoE with biased clamped-GLU experts
        return LlamaConfig(vocab_size=201088, dim=2880, n_layers=24,
                           n_heads=64, n_kv_heads=8, hidden_dim=2880,
                           head_dim_override=64, rope_theta=150000.0,
                           max_seq_len=131072, attention_bias=True,
                           attention_out_bias=True,
                           attn_sinks=True, sliding_window=128,
                           sliding_window_pattern=2,
                           n_experts=32, n_experts_per_tok=4,
                           moe_hidden_dim=2880, moe_style="gpt_oss",
                           rope_scaling_type="yarn",
                           rope_scaling_factor=32.0,
                           rope_beta_fast=32.0, rope_beta_slow=1.0,
                           rope_original_max_seq=4096)

    @staticmethod
    def phi3_mini_4k() -> "LlamaConfig":
        # microsoft/Phi-3-mini-4k-instruct: MHA (32/32 heads), fused
        # qkv/gate_up checkpoints, 2047-token sliding window. The 128k
        # variants add longrope scaling (load via from_hf — the per-dim
        # factor lists live in the checkpoint config).
        return LlamaConfig(vocab_size=32064, dim=3072, n_layers=32,
                           n_heads=32, n_kv_heads=32, hidden_dim=8192,
                           rope_theta=10000.0, max_seq_len=4096,
                           sliding_window=2047)

    @staticmethod
    def from_hf(model_name: str) -> "LlamaConfig":
        """Read the architecture from a HuggingFace config."""
        from transformers import AutoConfig
        hc = AutoConfig.from_pretrained(model_name)
        # multimodal wrappers (Gemma-3) nest the language model's config;
        # we serve the text stack
        if getattr(hc, "text_config", None) is not None:
            hc = hc.text_config

        def _check_all_sparse(hc):
            n = (getattr(hc, "num_experts", None)
                 or getattr(hc, "num_local_experts", None))
            if n and (getattr(hc, "mlp_only_layers", None)
                      or getattr(hc, "decoder_sparse_step", 1) != 1):
                raise NotImplementedError(
                    "mixed dense/sparse MoE layouts (mlp_only_layers / "
                    "decoder_sparse_step != 1) are not supported; every "
                    "layer is modeled as sparse")
            return n
        model_type = getattr(hc, "model_type", "")
        head_dim = getattr(hc, "head_dim", None) or (
            hc.hidden_size // hc.num_attention_heads)
        # Llama-4 (iRoPE): chunked local attention, NoPE global layers,
        # post-rope L2 qk-norm, NoPE query temperature, sigmoid MoE with
        # a shared expert
        is_llama4 = model_type == "llama4_text"
        is_gpt_oss = model_type == "gpt_oss"
        layer_types = getattr(hc, "layer_types", None)
        chunked = bool(layer_types and "chunked_attention" in layer_types)
        window = getattr(hc, "sliding_window", None)
        if chunked:
            window = int(hc.attention_chunk_size)
        nope_global = False
        no_rope = getattr(hc, "no_rope_layers", None)
        if is_llama4 and no_rope is not None:
            # HF semantics: no_rope_layers[i] == 1 means the layer USES
            # rope; rope-on must coincide with chunked (non-global)
            # layers for the single is-global scan flag to drive both
            want = [t != "full_attention" for t in layer_types]
            if [bool(r) for r in no_rope] != want:
                raise NotImplementedError(
                    "no_rope_layers does not align with layer_types; "
                    "independent NoPE/global masks are not supported")
            nope_global = not all(no_rope)
        if is_llama4:
            step = getattr(hc, "interleave_moe_layer_step", 1)
            moe_layers = getattr(hc, "moe_layers", None)
            if step != 1 or (moe_layers is not None
                             and len(moe_layers) != hc.num_hidden_layers):
                raise NotImplementedError(
                    "mixed dense/MoE llama4 layouts "
                    "(interleave_moe_layer_step != 1) are not supported")
        rotary_dim = None
        factor = getattr(hc, "partial_rotary_factor", 1.0)
        if factor and factor != 1.0:
            rotary_dim = int(head_dim * factor)
        scaling = {}
        rs = getattr(hc, "rope_scaling", None)
        if rs:
            kind = rs.get("rope_type") or rs.get("type")
            if kind == "default":
                pass
            elif kind in ("linear", "llama3", "yarn"):
                scaling = dict(
                    rope_scaling_type=kind,
                    rope_scaling_factor=float(rs.get("factor", 1.0)),
                    rope_low_freq_factor=float(
                        rs.get("low_freq_factor", 1.0)),
                    rope_high_freq_factor=float(
                        rs.get("high_freq_factor", 4.0)),
                    rope_beta_fast=float(rs.get("beta_fast", 32.0)),
                    rope_beta_slow=float(rs.get("beta_slow", 1.0)),
                    rope_attention_factor=rs.get("attention_factor"),
                    rope_original_max_seq=rs.get(
                        "original_max_position_embeddings",
                        hc.max_position_embeddings),
                )
            elif kind == "longrope":
                # Phi-3 keeps original_max_position_embeddings at the
                # config top level and derives factor from the context
                # ratio (HF _compute_longrope_parameters). The factor-set
                # choice is static per deployment: long when the target
                # context exceeds the pretraining context (see the
                # rope_freq_factors field comment).
                orig = int(
                    getattr(hc, "original_max_position_embeddings", None)
                    or rs.get("original_max_position_embeddings")
                    or hc.max_position_embeddings)
                factor = hc.max_position_embeddings / orig
                ext = (rs["long_factor"] if hc.max_position_embeddings
                       > orig else rs["short_factor"])
                scaling = dict(
                    rope_scaling_type="longrope",
                    rope_scaling_factor=float(factor),
                    rope_attention_factor=rs.get("attention_factor"),
                    rope_original_max_seq=orig,
                    rope_freq_factors=tuple(float(f) for f in ext),
                )
            else:
                # silent mispositioning corrupts every cached chunk —
                # fail loudly on schemes we don't implement
                raise NotImplementedError(
                    f"rope_scaling type {kind!r} is not supported")
        return LlamaConfig(
            **scaling,
            vocab_size=hc.vocab_size,
            dim=hc.hidden_size,
            n_layers=hc.num_hidden_layers,
            n_heads=hc.num_attention_heads,
            n_kv_heads=getattr(hc, "num_key_value_heads",
                               hc.num_attention_heads),
            # llama4: both the routed experts AND the shared expert are
            # intermediate_size wide (HF Llama4TextMoe builds
            # shared_expert = Llama4TextMLP(config), which defaults to
            # intermediate_size; intermediate_size_mlp is only for the
            # dense layers this port rejects)
            hidden_dim=hc.intermediate_size,
            norm_eps=hc.rms_norm_eps,
            rope_theta=getattr(hc, "rope_theta", 10000.0),
            max_seq_len=hc.max_position_embeddings,
            attention_bias=bool(
                getattr(hc, "attention_bias", False)
                or model_type == "qwen2"),
            sliding_window=window,
            local_attention_kind="chunked" if chunked else "sliding",
            nope_on_global_layers=nope_global,
            qk_l2_norm=bool(is_llama4 and getattr(hc, "use_qk_norm",
                                                  False)),
            attn_temperature_tuning=bool(
                getattr(hc, "attn_temperature_tuning", False)),
            attn_floor_scale=float(getattr(hc, "floor_scale", 8192.0)),
            attn_scale=float(getattr(hc, "attn_scale", 0.1)),
            moe_style=("llama4" if is_llama4 else
                       "gpt_oss" if is_gpt_oss else "softmax_topk"),
            moe_act_limit=float(getattr(hc, "swiglu_limit", 7.0)),
            attn_sinks=is_gpt_oss,
            attention_out_bias=bool(
                is_gpt_oss and getattr(hc, "attention_bias", False)),
            rotary_dim=rotary_dim,
            # HF's glm/glm4 ports apply cos/sin via repeat_interleave +
            # interleaved rotate_half (modeling_glm.py / modeling_glm4.py)
            rope_interleaved=model_type in ("glm", "glm4",
                                            "llama4_text"),
            post_norms=model_type in ("glm4", "gemma2", "gemma3_text",
                                      "olmo2"),
            pre_norms=model_type != "olmo2",
            qk_norm=model_type in ("qwen3", "qwen3_moe", "gemma3_text"),
            qk_norm_flat=model_type == "olmo2",
            head_dim_override=(
                head_dim if head_dim != hc.hidden_size
                // hc.num_attention_heads else None),
            # MoE families (qwen3_moe: num_experts; mixtral:
            # num_local_experts). We model every layer as sparse —
            # checkpoints that mix dense and MoE layers
            # (qwen3_moe mlp_only_layers / decoder_sparse_step) would be
            # silently mis-modeled, so fail loudly.
            n_experts=_check_all_sparse(hc),
            n_experts_per_tok=getattr(hc, "num_experts_per_tok", 2),
            moe_hidden_dim=(hc.intermediate_size
                            if (is_llama4 or is_gpt_oss) else
                            getattr(hc, "moe_intermediate_size", None)),
            norm_topk_prob=bool(getattr(hc, "norm_topk_prob", True)),
            # Gemma family: GeGLU, (1+w) norms, scaled embeddings;
            # gemma2 adds sandwich norms, alternating local/global
            # attention (pattern 2), score/logit softcaps, and a
            # query_pre_attn_scalar score scale; gemma3 drops the
            # softcaps and adds qk-norm, explicit layer_types, and
            # dual-theta rotary (rope_local_base_freq on sliding layers)
            mlp_act=("gelu_tanh"
                     if model_type in ("gemma", "gemma2", "gemma3_text")
                     else "silu"),
            norm_one_offset=model_type in ("gemma", "gemma2",
                                           "gemma3_text"),
            embed_scale=model_type in ("gemma", "gemma2", "gemma3_text"),
            attn_logit_softcap=getattr(hc, "attn_logit_softcapping", None),
            final_logit_softcap=getattr(hc, "final_logit_softcapping",
                                        None),
            query_pre_attn_scalar=getattr(hc, "query_pre_attn_scalar",
                                          None),
            sliding_window_pattern=(2 if model_type == "gemma2" else
                                    getattr(hc, "sliding_window_pattern",
                                            None)),
            global_layer_map=(tuple(t == "full_attention"
                                    for t in hc.layer_types)
                              if getattr(hc, "layer_types", None)
                              else None),
            rope_local_theta=getattr(hc, "rope_local_base_freq", None),
        )


def init_params(rng: jax.Array, cfg: LlamaConfig) -> Params:
    dt = jnp.dtype(cfg.dtype)
    L, dim, hd = cfg.n_layers, cfg.dim, cfg.head_dim
    nh, nkv, hid = cfg.n_heads, cfg.n_kv_heads, cfg.hidden_dim
    keys = jax.random.split(rng, 9)

    def w(k, shape, fan_in):
        return (jax.random.normal(k, shape, jnp.float32) *
                (fan_in**-0.5)).astype(dt)

    # identity norm weight: 1.0 normally, 0.0 for (1 + w) families
    nw = jnp.zeros if cfg.norm_one_offset else jnp.ones
    layers = {
        "wq": w(keys[1], (L, dim, nh * hd), dim),
        "wk": w(keys[2], (L, dim, nkv * hd), dim),
        "wv": w(keys[3], (L, dim, nkv * hd), dim),
        "wo": w(keys[4], (L, nh * hd, dim), nh * hd),
    }
    if cfg.pre_norms:
        layers["attn_norm"] = nw((L, dim), dt)
        layers["mlp_norm"] = nw((L, dim), dt)
    if cfg.n_experts:
        E = cfg.n_experts
        mh = cfg.moe_hidden_dim or hid
        layers["router"] = w(keys[8], (L, dim, E), dim)
        layers["e_gate"] = w(keys[5], (L, E, dim, mh), dim)
        layers["e_up"] = w(keys[6], (L, E, dim, mh), dim)
        layers["e_down"] = w(keys[7], (L, E, mh, dim), mh)
        if cfg.moe_style == "llama4":
            # always-on shared expert rides the dense MLP weights
            layers["w_gate"] = w(keys[5], (L, dim, hid), dim)
            layers["w_up"] = w(keys[6], (L, dim, hid), dim)
            layers["w_down"] = w(keys[7], (L, hid, dim), hid)
        if cfg.moe_style == "gpt_oss":
            layers["router_b"] = jnp.zeros((L, E), dt)
            layers["e_bg"] = jnp.zeros((L, E, mh), dt)
            layers["e_bu"] = jnp.zeros((L, E, mh), dt)
            layers["e_bd"] = jnp.zeros((L, E, dim), dt)
    else:
        layers["w_gate"] = w(keys[5], (L, dim, hid), dim)
        layers["w_up"] = w(keys[6], (L, dim, hid), dim)
        layers["w_down"] = w(keys[7], (L, hid, dim), hid)
    if cfg.attention_bias:
        layers["bq"] = jnp.zeros((L, nh * hd), dt)
        layers["bk"] = jnp.zeros((L, nkv * hd), dt)
        layers["bv"] = jnp.zeros((L, nkv * hd), dt)
    if cfg.attention_out_bias:
        layers["bo"] = jnp.zeros((L, dim), dt)
    if cfg.post_norms:
        layers["post_attn_norm"] = nw((L, dim), dt)
        layers["post_mlp_norm"] = nw((L, dim), dt)
    if cfg.qk_norm:
        layers["q_norm"] = nw((L, hd), dt)
        layers["k_norm"] = nw((L, hd), dt)
    if cfg.qk_norm_flat:
        layers["q_norm"] = nw((L, nh * hd), dt)
        layers["k_norm"] = nw((L, nkv * hd), dt)
    if cfg.attn_sinks:
        layers["sinks"] = jnp.zeros((L, nh), dt)
    return {
        "embed": w(keys[0], (cfg.vocab_size, dim), dim),
        "layers": layers,
        "final_norm": nw((dim,), dt),
        "lm_head": w(keys[0], (dim, cfg.vocab_size), dim),
    }


def load_hf(model_name: str,
            cfg: Optional[LlamaConfig] = None) -> Tuple[LlamaConfig, Params]:
    """Convert HuggingFace llama/mistral weights into the stacked pytree.

    torch (cpu) is only used as a weight reader; everything downstream is
    numpy/jax.
    """
    import torch
    from transformers import AutoModelForCausalLM
    if cfg is None:
        cfg = LlamaConfig.from_hf(model_name)
    model = AutoModelForCausalLM.from_pretrained(model_name,
                                                 torch_dtype=torch.float32)
    sd = model.state_dict()
    dt = jnp.dtype(cfg.dtype)

    def t(name):  # torch Linear stores [out, in]; we apply x @ W
        return np.asarray(sd[name].numpy().T)

    def stack(fmt):
        return jnp.asarray(
            np.stack([t(fmt.format(i)) for i in range(cfg.n_layers)]), dt)

    def stack_vec(fmt):
        return jnp.asarray(
            np.stack([
                np.asarray(sd[fmt.format(i)].numpy())
                for i in range(cfg.n_layers)
            ]), dt)

    lm_head = ("lm_head.weight" if "lm_head.weight" in sd else
               "model.embed_tokens.weight")  # tied embeddings
    if "model.layers.0.self_attn.qkv_proj.weight" in sd:
        # Phi-3 fuses [q; k; v] into one projection — split the output
        # columns (HF Phi3Attention slices qkv the same way)
        nq = cfg.n_heads * cfg.head_dim
        nkv = cfg.n_kv_heads * cfg.head_dim
        fused = [t("model.layers.{}.self_attn.qkv_proj.weight".format(i))
                 for i in range(cfg.n_layers)]  # [dim, nq+2*nkv] each
        wq = jnp.asarray(np.stack([f[:, :nq] for f in fused]), dt)
        wk = jnp.asarray(
            np.stack([f[:, nq:nq + nkv] for f in fused]), dt)
        wv = jnp.asarray(np.stack([f[:, nq + nkv:] for f in fused]), dt)
    else:
        wq = stack("model.layers.{}.self_attn.q_proj.weight")
        wk = stack("model.layers.{}.self_attn.k_proj.weight")
        wv = stack("model.layers.{}.self_attn.v_proj.weight")
    layers = {
        "wq": wq,
        "wk": wk,
        "wv": wv,
        "wo": stack("model.layers.{}.self_attn.o_proj.weight"),
    }
    if cfg.pre_norms:
        layers["attn_norm"] = stack_vec(
            "model.layers.{}.input_layernorm.weight")
        layers["mlp_norm"] = stack_vec(
            "model.layers.{}.post_attention_layernorm.weight")
    if (cfg.n_experts and
            "model.layers.0.feed_forward.experts.gate_up_proj" in sd):
        # Llama-4: experts are fused 3-D parameters already in x @ W
        # orientation ([E, dim, 2*mh] gate_up / [E, mh, dim] down —
        # Llama4TextExperts does bmm(h, W), no transpose), plus the
        # always-on shared expert and a router Linear
        mh = cfg.moe_hidden_dim
        layers["router"] = stack(
            "model.layers.{}.feed_forward.router.weight")
        gu = np.stack([
            np.asarray(sd["model.layers.{}.feed_forward.experts."
                          "gate_up_proj".format(i)].numpy())
            for i in range(cfg.n_layers)
        ])  # [L, E, dim, 2*mh]
        layers["e_gate"] = jnp.asarray(gu[..., :mh], dt)
        layers["e_up"] = jnp.asarray(gu[..., mh:], dt)
        layers["e_down"] = jnp.asarray(
            np.stack([
                np.asarray(sd["model.layers.{}.feed_forward.experts."
                              "down_proj".format(i)].numpy())
                for i in range(cfg.n_layers)
            ]), dt)  # [L, E, mh, dim]
        for key, hf in (("w_gate", "gate_proj"), ("w_up", "up_proj"),
                        ("w_down", "down_proj")):
            layers[key] = stack(
                "model.layers.{}.feed_forward.shared_expert."
                + hf + ".weight")
    elif (cfg.n_experts and
          "model.layers.0.mlp.experts.gate_up_proj" in sd):
        # GPT-OSS: fused 3-D expert parameters in x @ W orientation with
        # INTERLEAVED gate/up columns (gate = [..., ::2]) and biases,
        # plus a biased router Linear (HF GptOssExperts/GptOssTopKRouter)
        mh = cfg.moe_hidden_dim

        def stack3(fmt):
            return np.stack([np.asarray(sd[fmt.format(i)].numpy())
                             for i in range(cfg.n_layers)])

        layers["router"] = stack("model.layers.{}.mlp.router.weight")
        layers["router_b"] = stack_vec("model.layers.{}.mlp.router.bias")
        gu = stack3("model.layers.{}.mlp.experts.gate_up_proj")
        gub = stack3("model.layers.{}.mlp.experts.gate_up_proj_bias")
        layers["e_gate"] = jnp.asarray(gu[..., 0::2], dt)
        layers["e_up"] = jnp.asarray(gu[..., 1::2], dt)
        layers["e_bg"] = jnp.asarray(gub[..., 0::2], dt)
        layers["e_bu"] = jnp.asarray(gub[..., 1::2], dt)
        layers["e_down"] = jnp.asarray(
            stack3("model.layers.{}.mlp.experts.down_proj"), dt)
        layers["e_bd"] = jnp.asarray(
            stack3("model.layers.{}.mlp.experts.down_proj_bias"), dt)
    elif cfg.n_experts:
        # MoE families. Qwen3-MoE: mlp.gate (router) +
        # mlp.experts.{e}.{gate,up,down}_proj; Mixtral:
        # block_sparse_moe.gate + experts.{e}.{w1,w3,w2}
        if "model.layers.0.block_sparse_moe.gate.weight" in sd:
            router = "model.layers.{}.block_sparse_moe.gate.weight"
            names = ("w1", "w3", "w2")  # gate, up, down
            expert = "model.layers.{}.block_sparse_moe.experts.{}.{}.weight"
        else:
            router = "model.layers.{}.mlp.gate.weight"
            names = ("gate_proj", "up_proj", "down_proj")
            expert = "model.layers.{}.mlp.experts.{}.{}.weight"
        layers["router"] = stack(router)
        for key, hf in zip(("e_gate", "e_up", "e_down"), names):
            layers[key] = jnp.asarray(
                np.stack([
                    np.stack([t(expert.format(i, e, hf))
                              for e in range(cfg.n_experts)])
                    for i in range(cfg.n_layers)
                ]), dt)
    elif "model.layers.0.mlp.gate_up_proj.weight" in sd:
        # GLM family fuses [gate; up] into one projection — split it
        fused = [t("model.layers.{}.mlp.gate_up_proj.weight".format(i))
                 for i in range(cfg.n_layers)]  # [dim, 2*hidden] each
        layers["w_gate"] = jnp.asarray(
            np.stack([f[:, :cfg.hidden_dim] for f in fused]), dt)
        layers["w_up"] = jnp.asarray(
            np.stack([f[:, cfg.hidden_dim:] for f in fused]), dt)
        layers["w_down"] = stack("model.layers.{}.mlp.down_proj.weight")
    else:
        layers["w_gate"] = stack("model.layers.{}.mlp.gate_proj.weight")
        layers["w_up"] = stack("model.layers.{}.mlp.up_proj.weight")
        layers["w_down"] = stack("model.layers.{}.mlp.down_proj.weight")
    if cfg.attention_bias:
        layers["bq"] = stack_vec("model.layers.{}.self_attn.q_proj.bias")
        layers["bk"] = stack_vec("model.layers.{}.self_attn.k_proj.bias")
        layers["bv"] = stack_vec("model.layers.{}.self_attn.v_proj.bias")
    if cfg.attention_out_bias:
        layers["bo"] = stack_vec("model.layers.{}.self_attn.o_proj.bias")
    if cfg.post_norms and not cfg.pre_norms:
        # OLMo-2: the ONLY norms are on the block outputs
        layers["post_attn_norm"] = stack_vec(
            "model.layers.{}.post_attention_layernorm.weight")
        layers["post_mlp_norm"] = stack_vec(
            "model.layers.{}.post_feedforward_layernorm.weight")
    elif cfg.post_norms:
        if "model.layers.0.pre_feedforward_layernorm.weight" in sd:
            # Gemma-2 sandwich naming: the pre-MLP norm is
            # pre_feedforward_layernorm and post_attention_layernorm is
            # the attention OUTPUT norm (not the pre-MLP norm as in
            # llama) — HF modeling_gemma2.Gemma2DecoderLayer
            layers["mlp_norm"] = stack_vec(
                "model.layers.{}.pre_feedforward_layernorm.weight")
            layers["post_attn_norm"] = stack_vec(
                "model.layers.{}.post_attention_layernorm.weight")
            layers["post_mlp_norm"] = stack_vec(
                "model.layers.{}.post_feedforward_layernorm.weight")
        else:
            layers["post_attn_norm"] = stack_vec(
                "model.layers.{}.post_self_attn_layernorm.weight")
            layers["post_mlp_norm"] = stack_vec(
                "model.layers.{}.post_mlp_layernorm.weight")
    if cfg.qk_norm or cfg.qk_norm_flat:
        layers["q_norm"] = stack_vec("model.layers.{}.self_attn.q_norm.weight")
        layers["k_norm"] = stack_vec("model.layers.{}.self_attn.k_norm.weight")
    if cfg.attn_sinks:
        layers["sinks"] = stack_vec("model.layers.{}.self_attn.sinks")
    params = {
        "embed": jnp.asarray(sd["model.embed_tokens.weight"].numpy(), dt),
        "layers": layers,
        "final_norm": jnp.asarray(sd["model.norm.weight"].numpy(), dt),
        "lm_head": jnp.asarray(sd[lm_head].numpy().T, dt),
    }
    return cfg, params


def new_kv_cache(cfg: LlamaConfig, batch: int, max_len: int) -> jax.Array:
    """Fresh KV cache [L, 2, B, H_kv, S, D] — HEAD-major.

    The live pool is head-major so the attention kernel consumes it
    directly: a token-major pool would force a full-KV relayout per
    layer per decode step (at S = 16k that transpose moves 2x the
    attention's own HBM bytes). The cache-blob wire format stays
    token-major ([L, 2, T, H, D], the reference's vllm fmt) — the
    transpose happens once per chunk at the inject/read boundary, not
    per step.
    """
    return jnp.zeros(
        (cfg.n_layers, 2, batch, cfg.n_kv_heads, max_len, cfg.head_dim),
        jnp.dtype(cfg.dtype))


def cache_to_blob(cache: jax.Array, b: int = 0, n: "Optional[int]" = None
                  ) -> jax.Array:
    """One batch row of the head-major pool as a wire-format cache blob
    [L, 2, n, H, D] (the reference's vllm fmt)."""
    g = cache[:, :, b] if n is None else cache[:, :, b, :, :n]
    return jnp.transpose(g, (0, 1, 3, 2, 4))


def blob_into_cache(cache: jax.Array, blob: jax.Array, b: int = 0,
                    pos=0) -> jax.Array:
    """Write a wire blob [L, 2, t, H, D] into the head-major pool at
    token offset ``pos`` of batch row ``b``."""
    hm = jnp.transpose(blob, (0, 1, 3, 2, 4))[:, :, None]
    return jax.lax.dynamic_update_slice(cache, hm.astype(cache.dtype),
                                        (0, 0, b, 0, pos, 0))


def new_quantized_kv_cache(cfg: LlamaConfig, batch: int,
                           max_len: int) -> Dict[str, jax.Array]:
    """Int8 KV pool: {"sym" [L,2,B,H_kv,S,D] i8, "scale" [L,2,B,S] f32}.

    Halves KV HBM footprint and decode-attention bandwidth; consumed by
    the fused dequant kernel (ops/quantized_attention.py). Per-(layer,
    token) symmetric scales — the CacheGen quantization granularity
    (reference cachegen_encoder.py:39-61) applied to the live pool.
    Head-major sym for the same reason as :func:`new_kv_cache`.
    """
    L, Hkv, D = cfg.n_layers, cfg.n_kv_heads, cfg.head_dim
    return {
        "sym": jnp.zeros((L, 2, batch, Hkv, max_len, D), jnp.int8),
        "scale": jnp.ones((L, 2, batch, max_len), jnp.float32),
    }


def _rms_norm(x, weight, eps, one_offset=False):
    x32 = x.astype(jnp.float32)
    rms = jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps)
    if one_offset:
        # Gemma convention: (1 + w), multiplied in float32 before the
        # cast back (HF GemmaRMSNorm)
        return (x32 * rms * (1.0 + weight.astype(jnp.float32))).astype(
            x.dtype)
    return (x32 * rms).astype(x.dtype) * weight


def _act(x, kind):
    """Gate activation: llama SwiGLU's silu or Gemma GeGLU's tanh-gelu."""
    if kind == "silu":
        return jax.nn.silu(x)
    if kind == "gelu_tanh":
        return jax.nn.gelu(x, approximate=True)
    raise ValueError(f"unknown mlp_act {kind!r}")


def _attn_input(x, lp, cfg):
    """Block input to the attention projections: pre-normed (llama
    convention) or raw (OLMo-2 norms outputs only)."""
    if not cfg.pre_norms:
        return x
    return _rms_norm(x, lp["attn_norm"], cfg.norm_eps, cfg.norm_one_offset)


def _attn_residual(x, attn_flat, lp, cfg):
    """Residual add of the attention block's output (``attn_flat``
    [B, T, H*D]), with the Glm4-0414 sandwich norm on the o_proj output
    when the family has one."""
    y = attn_flat.astype(x.dtype) @ lp["wo"]
    if cfg.attention_out_bias:
        y = y + lp["bo"]
    if cfg.post_norms:
        y = _rms_norm(y, lp["post_attn_norm"], cfg.norm_eps,
                      cfg.norm_one_offset)
    return x + y


def _moe_mlp(h, lp, cfg):
    """Sparse-MoE SwiGLU: softmax router, top-k experts per token.

    Exact formulation: every expert runs on every token, weighted by
    its (zero for unselected) routing probability — a scan over the
    stacked expert weights, which XLA turns into E large batched
    matmuls with no gathers or dynamic shapes. At decode batch sizes
    the step is expert-weight-bandwidth-bound either way; for long
    prefill a capacity-based dispatch (GShard-style) would cut FLOPs
    by E/k and is the noted optimization. HF contract:
    modeling_qwen3_moe.Qwen3MoeSparseMoeBlock / Mixtral's
    block_sparse_moe (see LlamaConfig.norm_topk_prob)."""
    E, k = cfg.n_experts, cfg.n_experts_per_tok
    logits = (h @ lp["router"]).astype(jnp.float32)  # [..., E]
    if cfg.moe_style == "gpt_oss":
        # GPT-OSS: biased router, softmax over the TOP-K logits (==
        # renormalized-softmax restricted to the selected set), biased
        # experts with interleaved gate/up and the clamped gated
        # activation (up+1) * gate * sigmoid(1.702 * gate) — HF
        # GptOssExperts/GptOssTopKRouter.
        logits = logits + lp["router_b"].astype(jnp.float32)
        topv, topi = jax.lax.top_k(logits, k)
        gates = jax.nn.softmax(topv, axis=-1)
        w = jnp.sum(jax.nn.one_hot(topi, E, dtype=gates.dtype)
                    * gates[..., None], axis=-2)
        limit = cfg.moe_act_limit

        def expert(acc, sc):
            g_, u_, d_, bg, bu, bd, we = sc
            gate = (h @ g_).astype(jnp.float32) + bg
            up = (h @ u_).astype(jnp.float32) + bu
            gate = jnp.minimum(gate, limit)
            up = jnp.clip(up, -limit, limit)
            glu = gate * jax.nn.sigmoid(gate * 1.702)
            y = (((up + 1.0) * glu).astype(h.dtype)
                 @ d_).astype(jnp.float32) + bd
            return acc + we[..., None] * y, None

        acc0 = jnp.zeros(h.shape[:-1] + (cfg.dim,), jnp.float32)
        out, _ = jax.lax.scan(
            expert, acc0,
            (lp["e_gate"], lp["e_up"], lp["e_down"], lp["e_bg"],
             lp["e_bu"], lp["e_bd"], jnp.moveaxis(w, -1, 0)))
        return out.astype(h.dtype)
    if cfg.moe_style == "llama4":
        # Llama-4: top-k on the raw LOGITS, sigmoid gates, and the gate
        # scales the expert INPUT (HF Llama4TextMoe: routed_in =
        # h * sigmoid(score); unselected experts get sigmoid(-inf) = 0
        # input and silu(0)*0 = 0 output, so summing over all experts
        # with a zeroed weight reproduces the routing exactly, including
        # the nonlinearity-of-scaled-input subtlety), plus an always-on
        # shared expert (the dense w_gate/w_up/w_down weights).
        topv, topi = jax.lax.top_k(logits, k)
        gates = jax.nn.sigmoid(topv)
        w = jnp.sum(jax.nn.one_hot(topi, E, dtype=gates.dtype)
                    * gates[..., None], axis=-2)  # [..., E]

        def expert(acc, sc):
            g, u, d, we = sc
            hin = (h.astype(jnp.float32)
                   * we[..., None]).astype(h.dtype)
            gate = _act((hin @ g).astype(jnp.float32), cfg.mlp_act)
            up = (hin @ u).astype(jnp.float32)
            y = ((gate * up).astype(h.dtype) @ d).astype(jnp.float32)
            return acc + y, None

        shared_gate = _act((h @ lp["w_gate"]).astype(jnp.float32),
                           cfg.mlp_act)
        shared_up = (h @ lp["w_up"]).astype(jnp.float32)
        acc0 = ((shared_gate * shared_up).astype(h.dtype)
                @ lp["w_down"]).astype(jnp.float32)
        out, _ = jax.lax.scan(
            expert, acc0,
            (lp["e_gate"], lp["e_up"], lp["e_down"],
             jnp.moveaxis(w, -1, 0)))
        return out.astype(h.dtype)
    probs = jax.nn.softmax(logits, axis=-1)
    topv, topi = jax.lax.top_k(probs, k)
    if cfg.norm_topk_prob:
        topv = topv / jnp.sum(topv, axis=-1, keepdims=True)
    # combine weights [..., E]: routing prob where selected, else 0
    w = jnp.sum(jax.nn.one_hot(topi, E, dtype=topv.dtype)
                * topv[..., None], axis=-2)

    def expert(acc, sc):
        g, u, d, we = sc  # per-expert weights + [...] combine weight
        gate = _act((h @ g).astype(jnp.float32), cfg.mlp_act)
        up = (h @ u).astype(jnp.float32)
        y = ((gate * up).astype(h.dtype) @ d).astype(jnp.float32)
        return acc + we[..., None] * y, None

    acc0 = jnp.zeros(h.shape[:-1] + (cfg.dim,), jnp.float32)
    out, _ = jax.lax.scan(
        expert, acc0,
        (lp["e_gate"], lp["e_up"], lp["e_down"], jnp.moveaxis(w, -1, 0)))
    return out.astype(h.dtype)


def _mlp_residual(x, lp, cfg):
    """MLP + residual: dense SwiGLU or sparse MoE (cfg.n_experts), with
    the Glm4-0414 sandwich norm on the output when the family has
    one."""
    h = (_rms_norm(x, lp["mlp_norm"], cfg.norm_eps, cfg.norm_one_offset)
         if cfg.pre_norms else x)
    if cfg.n_experts:
        y = _moe_mlp(h, lp, cfg)
    else:
        gate = _act((h @ lp["w_gate"]).astype(jnp.float32), cfg.mlp_act)
        up = (h @ lp["w_up"]).astype(jnp.float32)
        y = (gate * up).astype(x.dtype) @ lp["w_down"]
    if cfg.post_norms:
        y = _rms_norm(y, lp["post_mlp_norm"], cfg.norm_eps,
                      cfg.norm_one_offset)
    return x + y


def _qkv(h, lp, cfg):
    """QKV projections with the family's optional bias (Qwen)."""
    q = h @ lp["wq"]
    k = h @ lp["wk"]
    v = h @ lp["wv"]
    if cfg.attention_bias:
        q, k, v = q + lp["bq"], k + lp["bk"], v + lp["bv"]
    return q, k, v


def _layer_rope_freqs(cfg, g):
    """Per-layer rotary ``(inv_freq, mscale)`` for families whose rope
    differs by layer type:

    - dual theta (Gemma-3): sliding layers rope at ``rope_local_theta``
      with no context-extension scaling; global layers at ``rope_theta``
      with the configured scaling (HF modeling_gemma3
      position_embeddings_local / _global);
    - iRoPE (Llama-4, ``nope_on_global_layers``): global layers carry NO
      positional encoding — zero frequencies make the rotation the
      identity — while local (chunked) layers rope normally.

    ``g`` is the layer's is-global flag: a python bool selects
    statically, a traced bool (riding the layer scan) selects with
    ``jnp.where`` on the [rd/2] constants."""
    rd = cfg.rotary_dim or cfg.head_dim
    inv, ms = rope_inv_freq(cfg.rope_theta, rd, cfg.rope_scaling_spec)
    if cfg.nope_on_global_layers:
        inv_glb, ms_glb = jnp.zeros_like(inv), 1.0
        inv_loc, ms_loc = inv, ms
    else:
        inv_glb, ms_glb = inv, ms
        inv_loc, _ = rope_inv_freq(cfg.rope_local_theta, rd, None)
        ms_loc = 1.0
    if isinstance(g, (bool, np.bool_)):
        return (inv_glb, ms_glb) if g else (inv_loc, ms_loc)
    g = jnp.asarray(g)
    return (jnp.where(g, inv_glb, inv_loc),
            jnp.where(g, jnp.float32(ms_glb), jnp.float32(ms_loc)))


def _l2_norm(x, eps):
    """Weightless L2 (RMS without scale) norm in f32 (Llama4TextL2Norm)."""
    x32 = x.astype(jnp.float32)
    n = x32 * jax.lax.rsqrt(
        jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps)
    return n.astype(x.dtype)


def _qkv_heads(h, lp, cfg, positions, g=None):
    """QKV as per-head tensors [B, T, H, D], with the family's optional
    qk-norm (Qwen3: per-head RMSNorm on q and k before RoPE,
    modeling_qwen3.py) and rotary applied. ``g`` (the layer's is-global
    flag from the layer scan) selects the frequency set for dual-theta
    families (Gemma-3)."""
    B, T = h.shape[:2]
    q, k, v = _qkv(h, lp, cfg)
    if cfg.qk_norm_flat:
        # OLMo-2: full-width RMSNorm before the head reshape and rope
        q = _rms_norm(q, lp["q_norm"], cfg.norm_eps, cfg.norm_one_offset)
        k = _rms_norm(k, lp["k_norm"], cfg.norm_eps, cfg.norm_one_offset)
    q = q.reshape(B, T, cfg.n_heads, cfg.head_dim)
    k = k.reshape(B, T, cfg.n_kv_heads, cfg.head_dim)
    v = v.reshape(B, T, cfg.n_kv_heads, cfg.head_dim)
    if cfg.qk_norm:
        q = _rms_norm(q, lp["q_norm"], cfg.norm_eps, cfg.norm_one_offset)
        k = _rms_norm(k, lp["k_norm"], cfg.norm_eps, cfg.norm_one_offset)
    freqs = None
    per_layer = (cfg.rope_local_theta is not None
                 or cfg.nope_on_global_layers)
    if ((per_layer or cfg.qk_l2_norm or cfg.attn_temperature_tuning)
            and g is None):
        raise ValueError(
            "per-layer attention traits (rope_local_theta / "
            "nope_on_global_layers / qk_l2_norm / "
            "attn_temperature_tuning) need the layer's is-global flag")
    if per_layer:
        freqs = _layer_rope_freqs(cfg, g)
    q = _rope(q, positions, cfg.rope_theta, cfg.rotary_dim,
              cfg.rope_interleaved, cfg.rope_scaling_spec, freqs=freqs)
    k = _rope(k, positions, cfg.rope_theta, cfg.rotary_dim,
              cfg.rope_interleaved, cfg.rope_scaling_spec, freqs=freqs)
    if cfg.qk_l2_norm:
        # Llama-4: weightless L2 norm AFTER rope, on ROPE layers only
        # (HF instantiates qk_norm iff use_rope); g True = global = NoPE
        qn, kn = _l2_norm(q, cfg.norm_eps), _l2_norm(k, cfg.norm_eps)
        if isinstance(g, (bool, np.bool_)):
            q, k = (q, k) if g else (qn, kn)
        else:
            q = jnp.where(g, q, qn)
            k = jnp.where(g, k, kn)
    if cfg.attn_temperature_tuning:
        # NoPE-layer query temperature (arXiv:2501.19399):
        # 1 + attn_scale * log1p(floor((pos + 1) / floor_scale))
        scales = 1.0 + cfg.attn_scale * jnp.log1p(jnp.floor(
            (positions.astype(jnp.float32) + 1.0) / cfg.attn_floor_scale))
        scaled = (q.astype(jnp.float32)
                  * scales[:, :, None, None]).astype(q.dtype)
        if isinstance(g, (bool, np.bool_)):
            q = scaled if g else q
        else:
            q = jnp.where(g, scaled, q)
    return q, k, v


def rope_inv_freq(theta, rd, scaling=None):
    """Rotary inverse frequencies [rd/2] and the attention-temperature
    scale, with optional context-extension scaling
    (LlamaConfig.rope_scaling_spec):

    - ``linear``: every frequency divided by the factor (longchat-style
      position condensation; HF ``rope_type: linear``);
    - ``llama3``: frequencies whose wavelength exceeds
      ``orig_max / low_freq`` are divided by the factor, ones below
      ``orig_max / high_freq`` stay, and the band between interpolates
      smoothly (HF ``_compute_llama3_parameters``);
    - ``yarn``: NTK-by-parts — a beta_fast..beta_slow correction ramp
      blends interpolated (1/factor) and extrapolated frequencies, and
      cos/sin are tempered by mscale = 0.1·ln(factor) + 1 (HF
      ``_compute_yarn_parameters``);
    - ``longrope``: every frequency divided by its own per-dim factor
      (Phi-3's evolutionary-searched dividers), cos/sin tempered by
      ``sqrt(1 + ln(factor)/ln(orig_max))`` (HF
      ``_compute_longrope_parameters``; the long/short factor-set choice
      is already baked into the config's ``rope_freq_factors``).

    Returns ``(inv_freq [rd/2], mscale scalar)`` — mscale is 1.0 for
    every scheme but yarn and longrope.
    """
    inv_freq = 1.0 / (theta**(jnp.arange(0, rd, 2, dtype=jnp.float32) / rd))
    if scaling is None:
        return inv_freq, 1.0
    kind, factor, low, high, orig_max = scaling[:5]
    if kind == "linear":
        return inv_freq / factor, 1.0
    if kind == "llama3":
        wavelen = 2.0 * jnp.pi / inv_freq
        scaled = jnp.where(wavelen > orig_max / low, inv_freq / factor,
                           inv_freq)
        smooth = (orig_max / wavelen - low) / (high - low)
        interp = (1.0 - smooth) / factor * inv_freq + smooth * inv_freq
        mid = (wavelen <= orig_max / low) & (wavelen >= orig_max / high)
        return jnp.where(mid, interp, scaled), 1.0
    if kind == "yarn":
        beta_fast, beta_slow, attn_factor = scaling[5:8]
        if attn_factor is not None:
            mscale = attn_factor
        elif factor > 1.0:
            mscale = 0.1 * float(np.log(factor)) + 1.0
        else:
            mscale = 1.0

        def correction_dim(beta):
            return (rd * np.log(orig_max / (beta * 2.0 * np.pi))
                    / (2.0 * np.log(theta)))

        lo = max(int(np.floor(correction_dim(beta_fast))), 0)
        hi = min(int(np.ceil(correction_dim(beta_slow))), rd - 1)
        ramp = jnp.clip(
            (jnp.arange(rd // 2, dtype=jnp.float32) - lo)
            / max(hi - lo, 1e-3), 0.0, 1.0)
        extrap_w = 1.0 - ramp  # 1 where extrapolated (high freq)
        return (inv_freq / factor * (1.0 - extrap_w)
                + inv_freq * extrap_w), mscale
    if kind == "longrope":
        attn_factor, freq_factors = scaling[7:9]
        if attn_factor is not None:
            mscale = attn_factor
        elif factor > 1.0:
            mscale = float(np.sqrt(
                1.0 + np.log(factor) / np.log(orig_max)))
        else:
            mscale = 1.0
        ext = jnp.asarray(freq_factors, jnp.float32)
        if ext.shape != inv_freq.shape:
            raise ValueError(
                f"longrope needs {inv_freq.shape[0]} per-dim factors, "
                f"got {ext.shape[0]}")
        return inv_freq / ext, mscale
    raise ValueError(f"unknown rope scaling type {kind!r}")


def _rope(x, positions, theta, rotary_dim=None, interleaved=False,
          scaling=None, freqs=None):
    """HF-convention rotary embedding. x: [B, T, H, D]; positions: [B, T].

    ``rotary_dim`` rotates only the leading channels (GLM partial
    rotary); ``interleaved`` pairs channels (2i, 2i+1) instead of the
    llama half-split (i, i + D/2) — matching HF modeling_glm.py's
    ``repeat_interleave`` cos/sin and interleaved ``rotate_half``.
    ``freqs=(inv_freq, mscale)`` overrides the theta/scaling-derived
    frequencies (dual-theta layers, :func:`_layer_rope_freqs`)."""
    D = x.shape[-1]
    rd = rotary_dim or D
    xr = x[..., :rd].astype(jnp.float32)
    if freqs is not None:
        inv_freq, mscale = freqs
    else:
        inv_freq, mscale = rope_inv_freq(theta, rd, scaling)
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # [B,T,rd/2]
    if interleaved:
        cos = jnp.repeat(jnp.cos(angles), 2, axis=-1)[:, :, None, :]
        sin = jnp.repeat(jnp.sin(angles), 2, axis=-1)[:, :, None, :]
        x1, x2 = xr[..., 0::2], xr[..., 1::2]
        rotated = jnp.stack([-x2, x1], axis=-1).reshape(xr.shape)
    else:
        cos = jnp.concatenate([jnp.cos(angles)] * 2, axis=-1)[:, :, None, :]
        sin = jnp.concatenate([jnp.sin(angles)] * 2, axis=-1)[:, :, None, :]
        x1, x2 = jnp.split(xr, 2, axis=-1)
        rotated = jnp.concatenate([-x2, x1], axis=-1)
    # yarn attention temperature rides the cos/sin (HF convention:
    # both q and k are tempered, so scores scale by mscale^2)
    out = (xr * (cos * mscale) + rotated * (sin * mscale)).astype(x.dtype)
    if rd == D:
        return out
    return jnp.concatenate([out, x[..., rd:]], axis=-1)


def _shard_dense_attend(attend, mesh, n_kv_heads: int, batch: int, *,
                        quantized: bool, sinks: bool = False):
    """Wrap a dense flash-attention kernel in ``shard_map`` over ``mesh``.

    Pallas calls have no GSPMD partitioning rule, so under plain ``jit``
    the mesh-sharded live pool would be all-gathered onto every chip
    before each call. Flash attention is embarrassingly parallel over kv
    heads (GQA groups never mix kv heads), so the manual-sharding
    formulation is exact and collective-free: each chip streams its own
    head slice of the pool against its own query-group slice. Batch
    rides "data" when it divides; otherwise it is replicated (the head
    sharding still avoids the pool gather, which is the cost that
    matters). Mirrors :func:`lmcache_tpu.models.paged._shard_paged_attend`.

    Returns ``None`` (caller keeps the unwrapped kernel) when the kv
    heads don't divide the "model" axis.
    """
    from jax.sharding import PartitionSpec as P

    from lmcache_tpu.parallel.mesh import shard_map_unchecked

    tp = mesh.shape.get("model", 1)
    dp = mesh.shape.get("data", 1)
    if n_kv_heads % tp:
        return None
    bax = "data" if batch % dp == 0 else None

    qspec = P(bax, None, "model", None)  # [B, T, H, D] heads grouped
    kv = P(bax, "model", None, None)  # [B, H_kv, S, D] head-major pool
    vec = P(bax,)  # [B]
    if quantized:
        scl = P(bax, None)  # [B, S] per-token scales, head-free
        in_specs = (qspec, kv, kv, scl, scl, vec, vec)
    else:
        in_specs = (qspec, kv, kv, vec, vec)
    if sinks:
        in_specs = in_specs + (P("model"),)  # [H] per-head sink logits

    return shard_map_unchecked(attend, mesh, in_specs=in_specs,
                     out_specs=qspec)


def _attend_dispatch(cfg, make):
    """Build the per-layer attention dispatcher for a family's attention
    pattern. ``make(window)`` returns an attend callable with that
    STATIC sliding window (None = full causal). Returns
    ``(attend, layer_globals)``: ``attend(g, *args)`` runs the right
    variant for a layer whose is-global flag is ``g``, and
    ``layer_globals`` is the per-layer bool [L] to ride the layer scan.
    Uniform patterns (all-full / all-windowed) skip the ``lax.cond``
    entirely; alternating families (Gemma-2/3) branch per layer between
    two separately-compiled kernels, each keeping its static window (the
    windowed one keeps its shrunk KV grid)."""
    wins = cfg.layer_windows()
    dummy = jnp.zeros(cfg.n_layers, bool)
    if wins.all():
        full = make(None)
        return (lambda g, *a: full(*a)), dummy
    if not wins.any():
        win = make(cfg.sliding_window)
        return (lambda g, *a: win(*a)), dummy
    full, win = make(None), make(cfg.sliding_window)

    def attend(g, *args):
        return jax.lax.cond(g, lambda a: full(*a), lambda a: win(*a), args)

    return attend, jnp.asarray(wins)


def _embed(params, cfg, tokens):
    """Token embedding lookup, with Gemma's sqrt(dim) scaling."""
    x = params["embed"][tokens]
    if cfg.embed_scale:
        x = x * jnp.asarray(np.sqrt(cfg.dim), x.dtype)
    return x


def _lm_logits(x, params, cfg):
    """Final-norm + lm_head, with Gemma-2's logit softcap."""
    x = _rms_norm(x, params["final_norm"], cfg.norm_eps,
                  cfg.norm_one_offset)
    logits = (x @ params["lm_head"]).astype(jnp.float32)
    if cfg.final_logit_softcap is not None:
        c = cfg.final_logit_softcap
        logits = c * jnp.tanh(logits / c)
    return logits


def forward(
    params: Params,
    cfg: LlamaConfig,
    tokens: jax.Array,  # int32 [B, T]
    start_pos: jax.Array,  # int32 [B] — write offset / #cached tokens
    kv_cache: jax.Array,  # [L, 2, B, H_kv, S, D] (head-major pool)
    *,
    use_pallas: bool = True,
    last_logit_only: bool = False,
    mesh=None,
    remat: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """One forward step (prefill when T>1, decode when T==1).

    The tokens' KV is written into ``kv_cache`` at ``start_pos[b]`` and the
    queries attend to everything up to ``start_pos[b] + T``. Cached-prefix
    reuse = writing retrieved chunks into the cache and calling this with
    only the suffix tokens. Returns (logits [B, T, vocab], new_kv_cache);
    with ``last_logit_only`` the lm_head runs on the final position only
    (logits [B, 1, vocab]) — the serving prefill path.

    With ``mesh``, the pallas kernel runs under ``shard_map`` with the
    pool's kv heads on "model" (see :func:`_shard_dense_attend`) — the
    sharded pool is consumed in place, never gathered.
    """
    B, T = tokens.shape
    positions = start_pos[:, None] + jnp.arange(T)[None, :]  # [B, T]
    kv_len = start_pos + T
    if use_pallas:
        def make(w):
            base = functools.partial(
                flash_attention, sliding_window=w, kv_head_major=True,
                sm_scale=cfg.sm_scale,
                logit_softcap=cfg.attn_logit_softcap,
                window_kind=cfg.local_attention_kind)
            if cfg.attn_sinks:
                def a(q, kh, vh, q_off, kvl, snk, base=base):
                    return base(q, kh, vh, q_off, kvl, sinks=snk)
            else:
                a = base
            if mesh is not None:
                sharded = _shard_dense_attend(a, mesh, cfg.n_kv_heads, B,
                                              quantized=False,
                                              sinks=cfg.attn_sinks)
                if sharded is not None:
                    a = sharded
            return a
    else:
        def make(w):
            def attend(q, kh, vh, q_off, kvl, snk=None):
                # CPU fallback: the reference impl is token-major
                return mha_reference(
                    q, kh.transpose(0, 2, 1, 3), vh.transpose(0, 2, 1, 3),
                    q_off, kvl, sliding_window=w, sm_scale=cfg.sm_scale,
                    logit_softcap=cfg.attn_logit_softcap,
                    window_kind=cfg.local_attention_kind, sinks=snk)
            return attend
    attend, layer_globals = _attend_dispatch(cfg, make)

    x = _embed(params, cfg, tokens)  # [B, T, dim]

    def write_at(cache_bt, new_bt, offsets):
        # cache_bt [B, H, S, D], new_bt [B, T, H, D], offsets int32 [B]
        # — only the T-token update is transposed (tiny), never the pool
        new_hm = new_bt.transpose(0, 2, 1, 3)  # [B, H, T, D]
        return jax.vmap(
            lambda c, n, s: jax.lax.dynamic_update_slice(c, n, (0, s, 0)))(
                cache_bt, new_hm, offsets)

    def layer(x, scanned):
        lp, cache_l, g = scanned  # cache_l: [2, B, H_kv, S, D]
        h = _attn_input(x, lp, cfg)
        q, k, v = _qkv_heads(h, lp, cfg, positions, g)

        new_k = write_at(cache_l[0], k.astype(cache_l.dtype), start_pos)
        new_v = write_at(cache_l[1], v.astype(cache_l.dtype), start_pos)

        extra = (lp["sinks"],) if cfg.attn_sinks else ()
        attn = attend(g, q, new_k, new_v, start_pos, kv_len, *extra)
        x = _attn_residual(x, attn.reshape(B, T, -1), lp, cfg)
        x = _mlp_residual(x, lp, cfg)
        return x, jnp.stack((new_k, new_v))

    # remat: recompute each layer's activations in the backward pass
    # instead of keeping them alive across the scan — training through
    # the reference attention materializes [B, H, T, T] scores, which at
    # long T only fits when one layer is live at a time (used by
    # tools/train_quality_model.py; inference never differentiates)
    x, new_cache = jax.lax.scan(
        jax.checkpoint(layer) if remat else layer, x,
        (params["layers"], kv_cache, layer_globals))
    if last_logit_only:
        x = x[:, -1:]
    return _lm_logits(x, params, cfg), new_cache


def forward_ring(
    params: Params,
    cfg: LlamaConfig,
    tokens: jax.Array,  # int32 [B, T], T sharded on seq_axis
    mesh,
    *,
    seq_axis: str = "data",
    head_axis: "Optional[str]" = "model",
    last_logit_only: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Context-parallel FULL prefill (sequence parallelism).

    The token axis is sharded over ``mesh``'s ``seq_axis``: embeddings,
    norms, and matmuls are per-token so XLA keeps them local, and
    attention runs as ring attention
    (:mod:`lmcache_tpu.parallel.ring_attention`) with KV blocks rotating
    on ICI — no device materializes more than ``2T/P`` tokens of KV, so
    a long prefill's memory AND attention FLOPs scale down with the
    mesh. Composes with tensor parallelism on ``head_axis``.

    Returns ``(logits [B, T, vocab], kv_cache [L, 2, B, H_kv, T, D])``
    — the head-major pool, sequence-sharded; feed chunks of it to the
    cache engine per shard, or ``device_put`` to resharded layouts.

    T must divide the ``seq_axis`` size (pad to the cache-engine chunk
    size). Every family trait rides the ring: sliding/chunked windows
    (blocks outside a layer's window skip compute), alternating
    local/global patterns and per-layer rope (dual theta, NoPE) via the
    layer scan's is-global flag, qk-norms, softcaps, MoE.
    """
    from lmcache_tpu.parallel.ring_attention import ring_attention
    B, T = tokens.shape
    positions = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
    q_off = jnp.zeros((B,), jnp.int32)
    kv_len = jnp.full((B,), T, jnp.int32)
    layer_globals = jnp.asarray(cfg.layer_windows())

    x = _embed(params, cfg, tokens)

    def layer(x, scanned):
        lp, g = scanned
        h = _attn_input(x, lp, cfg)
        q, k, v = _qkv_heads(h, lp, cfg, positions, g)
        attn = ring_attention(
            q, k, v, q_off, kv_len, mesh,
            seq_axis=seq_axis, head_axis=head_axis,
            sm_scale=cfg.sm_scale,
            logit_softcap=cfg.attn_logit_softcap,
            sliding_window=cfg.sliding_window,
            window_kind=cfg.local_attention_kind,
            is_global=(g if cfg.sliding_window is not None else None),
            sinks=(lp["sinks"] if cfg.attn_sinks else None))
        x = _attn_residual(x, attn.reshape(B, T, -1), lp, cfg)
        x = _mlp_residual(x, lp, cfg)
        # head-major cache block [2, B, H_kv, T, D]
        return x, jnp.stack((k.transpose(0, 2, 1, 3),
                             v.transpose(0, 2, 1, 3)))

    x, cache = jax.lax.scan(layer, x, (params["layers"], layer_globals))
    if last_logit_only:
        x = x[:, -1:]
    return _lm_logits(x, params, cfg), cache


def forward_quantized(
    params: Params,
    cfg: LlamaConfig,
    tokens: jax.Array,  # int32 [B, T]
    start_pos: jax.Array,  # int32 [B]
    kv_cache: Dict[str, jax.Array],  # new_quantized_kv_cache()
    *,
    use_pallas: bool = True,
    last_logit_only: bool = False,
    mesh=None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """:func:`forward` with an int8 KV pool and fused dequant attention.

    New tokens' K/V are quantized per (layer, token) before the write;
    attention reads int8 directly from HBM via the fused kernel
    (ops/quantized_attention.py) — KV bandwidth and footprint are halved
    vs bf16 at CacheGen-INT8-equivalent accuracy. ``mesh`` as in
    :func:`forward` (scales are head-free, so they shard on batch only).
    """
    from lmcache_tpu.ops.quantized_attention import (
        quantized_attention_reference, quantized_flash_attention)

    B, T = tokens.shape
    positions = start_pos[:, None] + jnp.arange(T)[None, :]
    kv_len = start_pos + T
    if use_pallas:
        def make(w):
            base = functools.partial(
                quantized_flash_attention, kv_head_major=True,
                sliding_window=w, sm_scale=cfg.sm_scale,
                logit_softcap=cfg.attn_logit_softcap,
                window_kind=cfg.local_attention_kind)
            if cfg.attn_sinks:
                def a(q, ks, vs, ksc, vsc, q_off, kvl, snk, base=base):
                    return base(q, ks, vs, ksc, vsc, q_off, kvl,
                                sinks=snk)
            else:
                a = base
            if mesh is not None:
                sharded = _shard_dense_attend(a, mesh, cfg.n_kv_heads, B,
                                              quantized=True,
                                              sinks=cfg.attn_sinks)
                if sharded is not None:
                    a = sharded
            return a
    else:
        def make(w):
            def attend(q, ks, vs, ksc, vsc, q_off, kvl, snk=None):
                return quantized_attention_reference(
                    q, ks.transpose(0, 2, 1, 3), vs.transpose(0, 2, 1, 3),
                    ksc, vsc, q_off, kvl, sliding_window=w,
                    sm_scale=cfg.sm_scale,
                    logit_softcap=cfg.attn_logit_softcap,
                    window_kind=cfg.local_attention_kind, sinks=snk)
            return attend
    attend, layer_globals = _attend_dispatch(cfg, make)

    x = _embed(params, cfg, tokens)

    def quant_tokens(t):  # [B, T, H_kv, D] -> int8 sym + f32 [B, T] scale
        t32 = t.astype(jnp.float32)
        absmax = jnp.max(jnp.abs(t32), axis=(2, 3))
        scale = jnp.where(absmax == 0.0, 1.0, absmax) / 127.0
        sym = jnp.round(t32 / scale[:, :, None, None])
        return jnp.clip(sym, -127, 127).astype(jnp.int8), scale

    def write_at(cache_bt, new_bt, offsets):
        # [B, H, S, D] <- [B, T, H, D] at token offset (head-major pool)
        new_hm = new_bt.transpose(0, 2, 1, 3)
        return jax.vmap(
            lambda c, n, s: jax.lax.dynamic_update_slice(c, n, (0, s, 0)))(
                cache_bt, new_hm, offsets)

    def write_scale(scale_bt, new_bt, offsets):  # [B, S] <- [B, T]
        return jax.vmap(
            lambda c, n, s: jax.lax.dynamic_update_slice(c, n, (s,)))(
                scale_bt, new_bt, offsets)

    def layer(x, scanned):
        lp, cache_l, g = scanned  # {"sym" [2,B,H,S,D], "scale" [2,B,S]}
        h = _attn_input(x, lp, cfg)
        q, k, v = _qkv_heads(h, lp, cfg, positions, g)

        k_sym, k_scale = quant_tokens(k)
        v_sym, v_scale = quant_tokens(v)
        sym = jnp.stack([
            write_at(cache_l["sym"][0], k_sym, start_pos),
            write_at(cache_l["sym"][1], v_sym, start_pos),
        ])
        scale = jnp.stack([
            write_scale(cache_l["scale"][0], k_scale, start_pos),
            write_scale(cache_l["scale"][1], v_scale, start_pos),
        ])

        extra = (lp["sinks"],) if cfg.attn_sinks else ()
        attn = attend(g, q, sym[0], sym[1], scale[0], scale[1], start_pos,
                      kv_len, *extra)
        x = _attn_residual(x, attn.reshape(B, T, -1), lp, cfg)
        x = _mlp_residual(x, lp, cfg)
        return x, {"sym": sym, "scale": scale}

    x, new_cache = jax.lax.scan(
        layer, x, (params["layers"], kv_cache, layer_globals))
    if last_logit_only:
        x = x[:, -1:]
    return _lm_logits(x, params, cfg), new_cache

