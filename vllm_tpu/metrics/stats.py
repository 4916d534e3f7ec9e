"""Per-iteration and per-request stats (reference: vllm/v1/metrics/stats.py)."""

from __future__ import annotations

import time
from dataclasses import dataclass, field


@dataclass
class RequestStateStats:
    arrival_time: float = 0.0
    first_scheduled_time: float = 0.0
    first_token_time: float = 0.0
    last_token_time: float = 0.0
    num_generation_tokens: int = 0


@dataclass
class FinishedRequestStats:
    e2e_latency: float = 0.0
    num_prompt_tokens: int = 0
    num_generation_tokens: int = 0
    queued_time: float = 0.0
    inference_time: float = 0.0
    finish_reason: str = ""


@dataclass
class IterationStats:
    """Stats accumulated while processing one batch of engine outputs
    (reference: v1/metrics/stats.py IterationStats)."""

    num_prompt_tokens: int = 0
    num_generation_tokens: int = 0
    time_to_first_tokens: list[float] = field(default_factory=list)
    inter_token_latencies: list[float] = field(default_factory=list)
    finished_requests: list[FinishedRequestStats] = field(
        default_factory=list)

    def update_from_output(self, output, is_first_token: bool,
                           req_stats: RequestStateStats) -> None:
        now = time.monotonic()
        n_new = len(output.new_token_ids)
        self.num_generation_tokens += n_new
        if n_new:
            if req_stats.first_token_time == 0.0:
                req_stats.first_token_time = now
                self.time_to_first_tokens.append(now -
                                                 req_stats.arrival_time)
            elif req_stats.last_token_time:
                self.inter_token_latencies.append(
                    (now - req_stats.last_token_time) / n_new)
            req_stats.last_token_time = now
            req_stats.num_generation_tokens += n_new

    def update_from_finished(self, output, num_prompt_tokens: int,
                             req_stats: RequestStateStats) -> None:
        now = time.monotonic()
        self.num_prompt_tokens += num_prompt_tokens
        self.finished_requests.append(
            FinishedRequestStats(
                e2e_latency=now - req_stats.arrival_time,
                num_prompt_tokens=num_prompt_tokens,
                num_generation_tokens=req_stats.num_generation_tokens,
                finish_reason=str(output.finish_reason),
            ))
