"""Per-iteration and per-request stats (reference: vllm/v1/metrics/stats.py)."""

from __future__ import annotations

import time
from dataclasses import dataclass, field


@dataclass
class RequestStateStats:
    arrival_time: float = 0.0
    queued_ts: float = 0.0  # QUEUED event (engine-core monotonic clock)
    scheduled_ts: float = 0.0  # first SCHEDULED event
    first_token_time: float = 0.0
    last_token_time: float = 0.0
    num_generation_tokens: int = 0


@dataclass
class FinishedRequestStats:
    e2e_latency: float = 0.0
    num_prompt_tokens: int = 0
    num_generation_tokens: int = 0
    # Interval metrics from EngineCoreEvents (reference:
    # loggers.py:593-618 queue/prefill/decode/inference histograms)
    queued_time: float = 0.0  # QUEUED -> first SCHEDULED
    prefill_time: float = 0.0  # first SCHEDULED -> first token
    decode_time: float = 0.0  # first token -> finished
    inference_time: float = 0.0  # first SCHEDULED -> finished
    finish_reason: str = ""
    n_params: int = 1
    max_tokens_param: int = 0


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
        if output.events:
            from vllm_tpu.engine import EngineCoreEventType

            for ev in output.events:
                if ev.type == EngineCoreEventType.QUEUED and \
                        not req_stats.queued_ts:
                    req_stats.queued_ts = ev.timestamp
                elif ev.type == EngineCoreEventType.SCHEDULED and \
                        not req_stats.scheduled_ts:
                    req_stats.scheduled_ts = ev.timestamp
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
                             req_stats: RequestStateStats,
                             sampling_params=None) -> None:
        now = time.monotonic()
        self.num_prompt_tokens += num_prompt_tokens
        queued_time = prefill_time = decode_time = inference_time = 0.0
        if req_stats.scheduled_ts:
            if req_stats.queued_ts:
                queued_time = max(
                    req_stats.scheduled_ts - req_stats.queued_ts, 0.0)
            inference_time = max(now - req_stats.scheduled_ts, 0.0)
            if req_stats.first_token_time:
                prefill_time = max(
                    req_stats.first_token_time - req_stats.scheduled_ts,
                    0.0)
                decode_time = max(now - req_stats.first_token_time, 0.0)
        self.finished_requests.append(
            FinishedRequestStats(
                e2e_latency=now - req_stats.arrival_time,
                num_prompt_tokens=num_prompt_tokens,
                num_generation_tokens=req_stats.num_generation_tokens,
                queued_time=queued_time,
                prefill_time=prefill_time,
                decode_time=decode_time,
                inference_time=inference_time,
                finish_reason=str(output.finish_reason),
                n_params=getattr(sampling_params, "n", 1) or 1,
                max_tokens_param=getattr(sampling_params, "max_tokens", 0)
                or 0,
            ))
