"""Scheduler <-> model-runner contract (reference: vllm/v1/core/sched/output.py).

``SchedulerOutput`` is the single host-side message that fully determines a
device step: the scheduler never touches tensors, the runner never makes
policy decisions. Everything here must stay cheaply serializable (plain
lists/dicts) so it can be broadcast to remote hosts.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

from vllm_tpu.sampling_params import SamplingParams


@dataclass
class NewRequestData:
    """First-time schedule of a request (reference: output.py:23)."""

    req_id: str
    prompt_token_ids: list[int]
    sampling_params: Optional[SamplingParams]
    block_ids: tuple[list[int], ...]  # per KV-cache group
    num_computed_tokens: int  # prefix-cache hit length
    lora_request: Optional[Any] = None
    pooling_params: Optional[Any] = None
    mm_inputs: Optional[dict] = None
    # content hashes of the mm inputs (runner encoder-cache keys)
    mm_hashes: Optional[list[str]] = None


@dataclass
class CachedRequestData:
    """Delta for requests already known to the runner
    (reference: output.py:84). Struct-of-arrays over requests."""

    req_ids: list[str] = field(default_factory=list)
    # Whether the request was resumed from preemption (block ids replace
    # instead of extend).
    resumed_from_preemption: list[bool] = field(default_factory=list)
    # New block ids appended since last step, per request, per group.
    new_block_ids: list[Optional[tuple[list[int], ...]]] = field(
        default_factory=list)
    num_computed_tokens: list[int] = field(default_factory=list)
    # For resumed requests: all token ids (runner lost them on preemption).
    resumed_req_token_ids: list[Optional[list[int]]] = field(
        default_factory=list)

    @property
    def num_reqs(self) -> int:
        return len(self.req_ids)


@dataclass
class SchedulerOutput:
    """Everything the runner needs for one step (reference: output.py:113)."""

    scheduled_new_reqs: list[NewRequestData] = field(default_factory=list)
    scheduled_cached_reqs: CachedRequestData = field(
        default_factory=CachedRequestData)
    # req_id -> number of tokens to run this step (incl. spec tokens).
    num_scheduled_tokens: dict[str, int] = field(default_factory=dict)
    total_num_scheduled_tokens: int = 0
    # req_id -> draft token ids being verified this step.
    scheduled_spec_decode_tokens: dict[str, list[int]] = field(
        default_factory=dict)
    # Prefix blocks shared by ALL running requests (cascade attention).
    num_common_prefix_blocks: list[int] = field(default_factory=list)
    finished_req_ids: set[str] = field(default_factory=set)
    # Requests preempted THIS step: the runner evicts their batch rows
    # (they re-enter via the resumed path with full token ids later);
    # without this, stale preempted rows + newly admitted requests can
    # overflow the persistent batch (found by tests/test_engine_stress_e2e).
    preempted_req_ids: set[str] = field(default_factory=set)
    free_encoder_mm_hashes: list[str] = field(default_factory=list)
    # Structured-output: req_id -> row into the grammar bitmask array.
    # disagg-P/D connector loads for this step (base.KVConnectorMetadata)
    kv_connector_metadata: Optional[Any] = None
    structured_output_request_ids: dict[str, int] = field(
        default_factory=dict)
    grammar_bitmask: Optional[Any] = None  # np.ndarray [num_reqs, ceil(V/32)]
    # encoder-cache entries evicted this step; every worker drops them
    # (reference: SchedulerOutput.free_encoder_input_ids)
    freed_mm_hashes: list[str] = field(default_factory=list)

    def is_empty(self) -> bool:
        return self.total_num_scheduled_tokens == 0


@dataclass
class ModelRunnerOutput:
    """What comes back from the device step (reference: vllm/v1/outputs.py:77)."""

    req_ids: list[str] = field(default_factory=list)
    # Per request: newly sampled token ids (>1 with spec decode).
    sampled_token_ids: list[list[int]] = field(default_factory=list)
    # Per request: draft tokens proposed for the NEXT step.
    spec_token_ids: Optional[list[list[int]]] = None
    # Per request: list over new tokens of {token_id: logprob} dicts.
    logprobs: Optional[list[Optional[list[dict[int, float]]]]] = None
    # req_id -> prompt logprobs (chunked prefill accumulates).
    prompt_logprobs_dict: dict[str, Any] = field(default_factory=dict)
    # Pooling outputs for embedding models.
    pooler_output: Optional[list[Any]] = None
    # PP streaming (resident ring): request ids still inside the device
    # pipeline after this dispatch — the engine must not reschedule them
    # until their batch exits (their next input token does not exist yet
    # anywhere, even on device).
    inflight_req_ids: Optional[list[str]] = None


EMPTY_MODEL_RUNNER_OUTPUT = ModelRunnerOutput()
