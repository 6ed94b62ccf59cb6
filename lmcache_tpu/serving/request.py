"""Request lifecycle types for the serving engine."""

import itertools
import time
from dataclasses import dataclass, field
from enum import Enum
from typing import List, Optional

import numpy as np

_req_counter = itertools.count()


class RequestState(Enum):
    WAITING = "waiting"
    RUNNING = "running"
    FINISHED = "finished"


@dataclass
class SamplingParams:
    max_new_tokens: int = 64
    temperature: float = 0.0  # 0 => greedy
    top_k: int = 0  # 0 => no top-k restriction
    top_p: float = 1.0  # 1.0 => no nucleus restriction
    stop_token_ids: tuple = ()
    seed: int = 0  # != 0 => reproducible per-request sample stream


@dataclass(eq=False)  # identity semantics: requests live in scheduler lists
class Request:
    prompt_tokens: np.ndarray
    sampling: SamplingParams = field(default_factory=SamplingParams)
    request_id: int = field(default_factory=lambda: next(_req_counter))
    state: RequestState = RequestState.WAITING
    output_tokens: List[int] = field(default_factory=list)
    slot: Optional[int] = None  # KV-pool slot while RUNNING
    cached_prefix_len: int = 0  # tokens reused from the cache engine
    prefill_pos: Optional[int] = None  # next token to prefill (in-flight)
    num_preemptions: int = 0  # times evicted to the cache tiers
    spec_proposed: int = 0  # speculative tokens proposed (prompt-lookup)
    spec_accepted: int = 0  # speculative tokens accepted by verification
    # CacheBlend: the prompt as independently-cached text chunks (RAG
    # docs + question). When set, admission blends their KV instead of
    # prefix-matching (lmcache_tpu/blend.py); prompt_tokens may be empty
    # and is derived from the chunks.
    context_chunks: Optional[List[np.ndarray]] = None
    blended_tokens_recomputed: Optional[int] = None
    arrival_s: float = field(default_factory=time.perf_counter)
    ttft_s: Optional[float] = None  # set when the first token lands
    finish_s: Optional[float] = None

    def __post_init__(self):
        if self.context_chunks is not None:
            self.context_chunks = [
                np.asarray(c, dtype=np.int32).reshape(-1)
                for c in self.context_chunks
            ]
            if len(np.asarray(self.prompt_tokens).reshape(-1)) == 0:
                self.prompt_tokens = np.concatenate(self.context_chunks)
        self.prompt_tokens = np.asarray(self.prompt_tokens,
                                        dtype=np.int32).reshape(-1)

    @property
    def num_prompt_tokens(self) -> int:
        return len(self.prompt_tokens)

    @property
    def total_len(self) -> int:
        return self.num_prompt_tokens + len(self.output_tokens)

    @property
    def all_tokens(self) -> np.ndarray:
        return np.concatenate(
            [self.prompt_tokens,
             np.asarray(self.output_tokens, np.int32)])

    def is_finished(self, eos_token_id: Optional[int] = None) -> bool:
        if len(self.output_tokens) >= self.sampling.max_new_tokens:
            return True
        if self.output_tokens:
            last = self.output_tokens[-1]
            if last in self.sampling.stop_token_ids:
                return True
            if eos_token_id is not None and last == eos_token_id:
                return True
        return False
