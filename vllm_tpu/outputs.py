"""User-facing output types (reference: vllm/outputs.py)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional


@dataclass
class Logprob:
    """Log probability of one token, with its decoded text and rank."""

    logprob: float
    rank: Optional[int] = None
    decoded_token: Optional[str] = None


# {token_id: Logprob} for one generated position.
LogprobsDict = dict[int, Logprob]
# One LogprobsDict per generated token position.
SampleLogprobs = list[LogprobsDict]
# One (optional) LogprobsDict per prompt position (None for position 0).
PromptLogprobs = list[Optional[LogprobsDict]]


@dataclass
class CompletionOutput:
    """One generated sequence of a request (n>1 yields several)."""

    index: int
    text: str
    token_ids: list[int]
    cumulative_logprob: Optional[float]
    logprobs: Optional[SampleLogprobs]
    finish_reason: Optional[str] = None
    stop_reason: Optional[int | str] = None

    def finished(self) -> bool:
        return self.finish_reason is not None


@dataclass
class RequestOutput:
    """The output of one generation request at a point in time."""

    request_id: str
    prompt: Optional[str]
    prompt_token_ids: Optional[list[int]]
    prompt_logprobs: Optional[PromptLogprobs]
    outputs: list[CompletionOutput]
    finished: bool
    num_cached_tokens: int = 0
    metrics: Optional["RequestMetrics"] = None

    def add(self, next_output: "RequestOutput", aggregate: bool) -> None:
        """Merge a later chunk into this one (for delta aggregation)."""
        self.finished |= next_output.finished
        self.num_cached_tokens = max(self.num_cached_tokens,
                                     next_output.num_cached_tokens)
        by_index = {c.index: i for i, c in enumerate(self.outputs)}
        for nxt in next_output.outputs:
            pos = by_index.get(nxt.index)
            if pos is None:
                self.outputs.append(nxt)
            elif not aggregate:
                self.outputs[pos] = nxt
            else:
                cur = self.outputs[pos]
                cur.text += nxt.text
                cur.token_ids.extend(nxt.token_ids)
                if nxt.logprobs is not None:
                    cur.logprobs = (cur.logprobs or []) + nxt.logprobs
                cur.cumulative_logprob = nxt.cumulative_logprob
                cur.finish_reason = nxt.finish_reason
                cur.stop_reason = nxt.stop_reason


@dataclass
class RequestMetrics:
    """Per-request latency breakdown (absolute monotonic timestamps)."""

    arrival_time: float = 0.0
    queued_time: float = 0.0
    scheduled_time: float = 0.0
    first_token_time: float = 0.0
    finished_time: float = 0.0
    num_preemptions: int = 0


@dataclass
class PoolingOutput:
    """Output of a pooling (embedding) request."""

    data: "object"  # np.ndarray


@dataclass
class PoolingRequestOutput:
    request_id: str
    outputs: PoolingOutput
    prompt_token_ids: list[int] = field(default_factory=list)
    finished: bool = True


@dataclass
class EmbeddingRequestOutput(PoolingRequestOutput):
    pass


@dataclass
class BeamSearchSequence:
    """(reference: vllm/beam_search.py BeamSearchSequence)"""

    tokens: list[int]
    text: str = ""
    cum_logprob: float = 0.0


@dataclass
class BeamSearchOutput:
    sequences: list[BeamSearchSequence] = field(default_factory=list)
