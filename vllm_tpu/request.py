"""Engine-core request state machine (reference: vllm/v1/request.py:21)."""

from __future__ import annotations

import enum
import time
from typing import Any, Optional

from vllm_tpu.sampling_params import PoolingParams, SamplingParams


class RequestStatus(enum.IntEnum):
    WAITING = 0
    WAITING_FOR_FSM = 1
    WAITING_FOR_REMOTE_KVS = 2
    RUNNING = 3
    PREEMPTED = 4
    # Finished states must stay > PREEMPTED (is_finished relies on order).
    FINISHED_STOPPED = 5
    FINISHED_LENGTH_CAPPED = 6
    FINISHED_ABORTED = 7
    FINISHED_IGNORED = 8

    @staticmethod
    def is_finished(status: "RequestStatus") -> bool:
        return status > RequestStatus.PREEMPTED

    @staticmethod
    def get_finished_reason(status: "RequestStatus") -> Optional[str]:
        return _FINISHED_REASON.get(status)


_FINISHED_REASON = {
    RequestStatus.FINISHED_STOPPED: "stop",
    RequestStatus.FINISHED_LENGTH_CAPPED: "length",
    RequestStatus.FINISHED_ABORTED: "abort",
    RequestStatus.FINISHED_IGNORED: "length",
}


class Request:
    """One generation request as the engine core / scheduler sees it."""

    def __init__(
        self,
        request_id: str,
        prompt_token_ids: list[int],
        sampling_params: Optional[SamplingParams] = None,
        pooling_params: Optional[PoolingParams] = None,
        eos_token_id: Optional[int] = None,
        arrival_time: Optional[float] = None,
        lora_request: Optional[Any] = None,
        cache_salt: Optional[str] = None,
        mm_inputs: Optional[dict] = None,
        mm_hashes: Optional[list[str]] = None,
        encoder_token_count: int = 0,
        priority: int = 0,
        client_index: int = 0,
    ) -> None:
        self.request_id = request_id
        self.prompt_token_ids = list(prompt_token_ids)
        self.num_prompt_tokens = len(self.prompt_token_ids)
        self.sampling_params = sampling_params
        self.pooling_params = pooling_params
        self.eos_token_id = eos_token_id
        self.arrival_time = (time.monotonic()
                             if arrival_time is None else arrival_time)
        self.lora_request = lora_request
        self.cache_salt = cache_salt
        self.mm_inputs = mm_inputs
        self.mm_hashes = mm_hashes
        self.encoder_token_count = encoder_token_count
        self.priority = priority
        self.client_index = client_index

        self.status = RequestStatus.WAITING
        self.stop_reason: Optional[int | str] = None

        # All token ids: prompt + generated. Mutated by update_from_output.
        self._all_token_ids: list[int] = list(self.prompt_token_ids)
        self.num_output_tokens = 0
        # Draft tokens proposed by the spec-decoder for the next step.
        self.spec_token_ids: list[int] = []
        # Tokens whose KV is already computed on device.
        self.num_computed_tokens = 0
        # Prefix-cache hit length recorded at first schedule.
        self.num_cached_tokens = -1
        # async scheduling: samples scheduled but not yet materialized
        self.num_pending_samples = 0
        self.num_preemptions = 0

        # Structured-output FSM state (set by StructuredOutputManager).
        self.structured_output_request: Optional[Any] = None

        if sampling_params is not None:
            sampling_params.update_from_generation_config(eos_token_id)
            self.max_tokens = sampling_params.max_tokens or 2**31
        else:
            self.max_tokens = 1  # pooling: single pass

        # Per-request generation events (QUEUED/SCHEDULED/PREEMPTED) for
        # metrics; list of (event_name, monotonic_ts).
        self.events: list[tuple[str, float]] = [("queued", time.monotonic())]
        self._events_shipped = 0

    # -- token bookkeeping ---------------------------------------------------

    @property
    def all_token_ids(self) -> list[int]:
        return self._all_token_ids

    @property
    def num_tokens(self) -> int:
        return len(self._all_token_ids)

    @property
    def num_tokens_with_spec(self) -> int:
        return len(self._all_token_ids) + len(self.spec_token_ids)

    @property
    def output_token_ids(self) -> list[int]:
        return self._all_token_ids[self.num_prompt_tokens:]

    def append_output_token_ids(self, token_ids: int | list[int]) -> None:
        if isinstance(token_ids, int):
            token_ids = [token_ids]
        self._all_token_ids.extend(token_ids)
        self.num_output_tokens += len(token_ids)

    # -- status --------------------------------------------------------------

    @property
    def is_finished(self) -> bool:
        return RequestStatus.is_finished(self.status)

    def get_finished_reason(self) -> Optional[str]:
        return RequestStatus.get_finished_reason(self.status)

    @property
    def use_structured_output(self) -> bool:
        return self.structured_output_request is not None

    def record_event(self, name: str) -> None:
        self.events.append((name, time.monotonic()))

    def take_events(self):
        """Events recorded since the last ship, as EngineCoreEvents
        (reference: v1/engine/__init__.py:74-96 — QUEUED/SCHEDULED/
        PREEMPTED timestamps ride in EngineCoreOutput so the front-end
        can compute queue/prefill/decode intervals)."""
        if self._events_shipped >= len(self.events):
            return None
        from vllm_tpu.engine import EngineCoreEvent, EngineCoreEventType

        kinds = {
            "queued": EngineCoreEventType.QUEUED,
            "scheduled": EngineCoreEventType.SCHEDULED,
            "preempted": EngineCoreEventType.PREEMPTED,
        }
        out = [
            EngineCoreEvent(kinds[name], ts)
            for name, ts in self.events[self._events_shipped:]
            if name in kinds
        ]
        self._events_shipped = len(self.events)
        return out or None

    def __repr__(self) -> str:
        return (f"Request(id={self.request_id}, status={self.status.name}, "
                f"prompt={self.num_prompt_tokens}, "
                f"out={self.num_output_tokens}, "
                f"computed={self.num_computed_tokens})")
