"""Engine-core wire contract (reference: vllm/v1/engine/__init__.py).

Plain dataclasses (pickle/json-friendly) instead of msgspec structs; the
array-like encoding is handled by vllm_tpu.engine.serial_utils when these
cross a process boundary.
"""

from __future__ import annotations

import enum
import time
from dataclasses import dataclass, field
from typing import Any, Optional

from vllm_tpu.sampling_params import PoolingParams, SamplingParams


class EngineCoreEventType(enum.IntEnum):
    QUEUED = 1
    SCHEDULED = 2
    PREEMPTED = 3


@dataclass
class EngineCoreEvent:
    type: EngineCoreEventType
    timestamp: float

    @classmethod
    def new(cls, event_type: EngineCoreEventType) -> "EngineCoreEvent":
        return cls(event_type, time.monotonic())


@dataclass
class EngineCoreRequest:
    """Front-end -> engine-core request (reference: v1/engine/__init__.py:44)."""

    request_id: str
    prompt_token_ids: list[int]
    sampling_params: Optional[SamplingParams] = None
    pooling_params: Optional[PoolingParams] = None
    eos_token_id: Optional[int] = None
    arrival_time: float = field(default_factory=time.monotonic)
    lora_request: Optional[Any] = None
    cache_salt: Optional[str] = None
    priority: int = 0
    client_index: int = 0
    current_wave: int = 0
    # multimodal inputs, e.g. {"pixel_values": np[B, C, H, W]}
    mm_inputs: Optional[dict] = None
    # content hashes of the mm inputs (encoder dedup + prefix caching)
    mm_hashes: Optional[list[str]] = None
    encoder_token_count: int = 0


class FinishReason(enum.IntEnum):
    STOP = 0
    LENGTH = 1
    ABORT = 2

    def __str__(self) -> str:
        return ("stop", "length", "abort")[self.value]


@dataclass
class EngineCoreOutput:
    """Engine-core -> front-end per-request step output
    (reference: v1/engine/__init__.py:99)."""

    request_id: str
    new_token_ids: list[int]
    finish_reason: Optional[FinishReason] = None
    stop_reason: Optional[int | str] = None
    # list over new tokens of {token_id: logprob}
    new_logprobs: Optional[list[dict[int, float]]] = None
    new_prompt_logprobs: Optional[Any] = None
    pooling_output: Optional[Any] = None
    events: Optional[list[EngineCoreEvent]] = None
    num_cached_tokens: int = 0

    @property
    def finished(self) -> bool:
        return self.finish_reason is not None


@dataclass
class SchedulerStats:
    """Per-step snapshot for metrics (reference: v1/metrics/stats.py)."""

    num_running_reqs: int = 0
    num_waiting_reqs: int = 0
    kv_cache_usage: float = 0.0
    prefix_cache_queries: int = 0
    prefix_cache_hits: int = 0
    num_preempted_reqs: int = 0
    spec_num_drafts: int = 0
    spec_num_draft_tokens: int = 0
    spec_num_accepted_tokens: int = 0
    # LoRA serving state (None when LoRA is disabled): (max_loras,
    # running adapter names, waiting adapter names)
    lora_stats: "Optional[tuple]" = None


@dataclass
class EngineCoreOutputs:
    """Batch of step outputs for one client
    (reference: v1/engine/__init__.py)."""

    engine_index: int = 0
    outputs: list[EngineCoreOutput] = field(default_factory=list)
    scheduler_stats: Optional[SchedulerStats] = None
    timestamp: float = 0.0
    wave_complete: Optional[int] = None
    start_wave: Optional[int] = None


class EngineCoreRequestType(enum.Enum):
    """ZMQ message types on the engine-core input socket."""

    ADD = b"\x00"
    ABORT = b"\x01"
    UTILITY = b"\x02"
    EXECUTOR_FAILED = b"\x03"


@dataclass
class UtilityOutput:
    call_id: int
    failure_message: Optional[str] = None
    result: Any = None
