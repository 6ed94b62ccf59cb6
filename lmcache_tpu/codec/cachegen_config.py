"""Per-model-family graduated quantization schedule.

Capability parity with the reference's hard-coded family table
(reference: lmcache/storage_backend/serde/cachegen_basics.py:16-78):
early layers get more bins because their KV values matter more for
output quality (the CacheGen insight, SIGCOMM'24). Instead of three
named layer groups we materialize an explicit per-layer bins vector,
which is what the vectorized TPU quantizer consumes directly, and we
fall back to a sane default for unknown models instead of raising.
"""

from dataclasses import dataclass
from typing import List, Tuple

_MAX_BINS = 32  # CDF width is fixed at _MAX_BINS + 1 (reference value_range)


@dataclass(frozen=True)
class CacheGenConfig:
    """Per-layer bin counts for keys and values. len == num_layers."""

    key_bins: Tuple[int, ...]
    value_bins: Tuple[int, ...]

    def __post_init__(self):
        if len(self.key_bins) != len(self.value_bins):
            raise ValueError("key/value bins length mismatch")
        for b in (*self.key_bins, *self.value_bins):
            if not (2 <= b <= _MAX_BINS):
                raise ValueError(f"bins out of range: {b}")

    @property
    def num_layers(self) -> int:
        return len(self.key_bins)

    @staticmethod
    def graduated(num_layers: int,
                  key_schedule: List[Tuple[int, int]] = None,
                  value_schedule: List[Tuple[int, int]] = None
                  ) -> "CacheGenConfig":
        """Build from (layer_upper_bound, bins) breakpoints.

        Default = the reference's 7B/8B family schedule scaled to the
        model depth: keys 32 bins for the first ~1/3 of layers then 16;
        values 32 bins for the first 2 layers then 16.
        """
        if key_schedule is None:
            key_schedule = [(max(1, num_layers // 3), 32), (num_layers, 16)]
        if value_schedule is None:
            value_schedule = [(min(2, num_layers), 32), (num_layers, 16)]

        def expand(schedule):
            bins = []
            prev = 0
            for upper, b in schedule:
                upper = min(upper, num_layers)
                bins.extend([b] * (upper - prev))
                prev = upper
            if prev < num_layers:  # pad with the last bin width
                bins.extend([schedule[-1][1]] * (num_layers - prev))
            return tuple(bins)

        return CacheGenConfig(key_bins=expand(key_schedule),
                              value_bins=expand(value_schedule))

    @staticmethod
    def for_latent(num_layers: int) -> "CacheGenConfig":
        """Schedule for MLA latent streams (single-stream containers,
        models/mla.py cache_to_blob).

        One latent row feeds BOTH keys and values of EVERY head after
        up-projection, so per-value damage is amplified ~2*n_heads x
        relative to a GQA K or V entry — the schedule keeps the full
        32-bin width at every layer instead of the graduated K/V curve
        (measured: all-32 halves latent relative error and logit KL vs
        the 7B K/V schedule at equal order of wire size). value_bins is
        carried but unused for N == 1 containers."""
        return CacheGenConfig(key_bins=(32,) * num_layers,
                              value_bins=(32,) * num_layers)

    @staticmethod
    def from_model_name(model_name: str,
                        num_layers: int = 32) -> "CacheGenConfig":
        name = model_name.lower()
        if any(f in name for f in
               ("mistral-7b", "longchat-7b", "qwen-7b", "llama-3.1-8b",
                "llama-2-7b", "tinyllama",
                # newer families ship no reference schedule; the
                # 7B-style graduated curve transfers — the quality gate
                # (tools/eval_quality.py) is the arbiter
                "phi-3", "phi-4", "gemma-2", "gemma-3", "llama-4",
                "deepseek")):
            return CacheGenConfig.graduated(
                num_layers,
                key_schedule=[(10 * num_layers // 32, 32),
                              (num_layers, 16)],
                value_schedule=[(min(2, num_layers), 32), (num_layers, 16)])
        if "glm-4-" in name:  # glm-4-9b and *-0414 variants
            return CacheGenConfig.graduated(
                num_layers,
                key_schedule=[(10, 32), (num_layers, 16)],
                value_schedule=[(2, 32), (num_layers, 16)])
        # unknown model: conservative default (reference raises here; a
        # cache codec should degrade, not fail)
        return CacheGenConfig.graduated(num_layers)
