"""Shared definitions for the in-repo trained quality checkpoint.

The BASELINE.md codec criterion is "<0.1 perplexity delta" (the
CacheGen claim, reference README.md:76) — a statement about PEAKED
logits on a model whose predictions depend on long-range KV retrieval.
Random-init logits are flat, so the delta there is tie-breaking noise.
This module defines a small llama-config model plus a synthetic corpus
with exactly the property the gate needs:

**Copy-with-offset corpus.** Each sequence is ``s[t] = s[t - R]`` for
``t >= R`` where the base segment ``s[0:R]`` is a random *permutation
slice* of the vocabulary (every base token unique). Base tokens are
iid-uniform-incompressible, so the ONLY way to predict position
``t >= R`` is content-based retrieval of the KV written ~R positions
earlier — the induction-head mechanism. A trained model reaches ~100%
copy accuracy (ppl ~1 on determined positions), and any corruption of
the cached K/V directly breaks the retrieval match, so the perplexity
delta measures codec damage for real.

``make_eval_tokens`` uses ``R = total // 2``: with the evaluation
context of ``ctx`` tokens cached and the continuation scored, every
scored position retrieves from ~ctx/2 away — deep inside the
codec-round-tripped blob.

Checkpoint: ``checkpoints/quality_8l.npz`` (float16 storage, ~13 MB),
produced by ``tools/train_quality_model.py`` and committed so the gate
is reproducible without retraining.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lmcache_tpu.models import llama  # noqa: E402

CKPT_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "checkpoints", "quality_8l.npz")
MLA_CKPT_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "checkpoints", "quality_mla_4l.npz")

# >= the largest eval R (ctx 8192 + cont 64 -> R 4128): base tokens
# must be unique so retrieval is the only signal (round 4 raised the
# north-star eval geometry to ctx >= 8192, VERDICT r3 next #2)
VOCAB = 8192


def quality_config(dtype: str = "float32") -> "llama.LlamaConfig":
    """8-layer llama-config model (GQA 4q/2kv, D=64) for the gate."""
    return llama.LlamaConfig(
        vocab_size=VOCAB, dim=256, n_layers=8, n_heads=4, n_kv_heads=2,
        hidden_dim=512, max_seq_len=16384, dtype=dtype)


def quality_mla_config(dtype: str = "float32"):
    """4-layer MLA model for the LATENT codec gate (same copy corpus;
    the latent stream is the only recurrent state, so codec damage to
    it breaks retrieval exactly like K/V damage does for GQA)."""
    from lmcache_tpu.models import mla
    return mla.MLAConfig(
        vocab_size=VOCAB, dim=256, n_layers=4, n_heads=4,
        hidden_dim=512, max_seq_len=16384, q_lora_rank=None,
        kv_lora_rank=128, qk_nope_head_dim=64, qk_rope_head_dim=32,
        v_head_dim=64, dtype=dtype)


def load_mla_checkpoint(ctx: int, cont: int, seed: int):
    """(cfg, params, tokens) for the trained-MLA codec gate."""
    cfg = quality_mla_config()
    params = load_params("float32", MLA_CKPT_PATH)
    rng = np.random.default_rng(12345 + seed)
    tokens = make_eval_tokens(rng, ctx + cont)
    return cfg, params, tokens


def make_sequence(rng: np.random.Generator, total: int,
                  repeat: int) -> np.ndarray:
    """One copy-task sequence: unique random base of ``repeat`` tokens,
    then ``s[t] = s[t - repeat]``."""
    if repeat > VOCAB:
        raise ValueError(f"repeat {repeat} > vocab {VOCAB}: base tokens "
                         "could not be unique")
    base = rng.permutation(VOCAB)[:repeat].astype(np.int32)
    reps = -(-total // repeat)
    return np.tile(base, reps)[:total]


def make_eval_tokens(rng: np.random.Generator, total: int) -> np.ndarray:
    """Evaluation sequence with retrieval distance ~total/2, capped at
    the R=2048 top of the trained rotary band (the r4 curriculum
    extends the mechanism to 2048; at ctx-8192 evals the scored
    positions then retrieve from 2048 tokens away — still deep inside
    the codec-round-tripped blob, whose full 8k tokens are cached)."""
    return make_sequence(rng, total, min(total // 2, 2048))


def make_train_batch(rng: np.random.Generator, batch: int, total: int,
                     repeat: int) -> np.ndarray:
    """[batch, total] independent copy-task rows (one shared R)."""
    # argsort of uniform noise = batch of random permutations
    base = np.argsort(rng.random((batch, VOCAB)), axis=1)[:, :repeat]
    reps = -(-total // repeat)
    return np.tile(base, (1, reps))[:, :total].astype(np.int32)


def target_mask(total: int, repeat: int) -> np.ndarray:
    """[total-1] bool: next-token targets that are DETERMINED by the
    copy rule (t+1 >= repeat). Base-segment targets are iid noise and
    carry no learnable signal — the loss masks them out."""
    t = np.arange(total - 1)
    return (t + 1) >= repeat


def save_params(params, path: str = CKPT_PATH) -> None:
    """Flatten the param pytree to an npz (float16 storage)."""
    import jax
    flat = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = "/".join(str(k.key) for k in kp)
        flat[name] = np.asarray(leaf, np.float16)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **flat)


def load_params(dtype: str = "float32", path: str = CKPT_PATH):
    """Rebuild the param pytree from the committed npz."""
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"{path} missing — run tools/train_quality_model.py "
            "(the checkpoint is normally committed)")
    import jax.numpy as jnp
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    tree: dict = {}
    for name, arr in flat.items():
        node = tree
        parts = name.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(arr, jnp.dtype(dtype))
    return tree
