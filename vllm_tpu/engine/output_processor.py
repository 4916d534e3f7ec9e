"""Per-request output assembly: detokenize, stop strings, RequestOutput
(reference: vllm/v1/engine/output_processor.py:345)."""

from __future__ import annotations

import asyncio
import time
from dataclasses import dataclass, field
from typing import Optional

from vllm_tpu.engine import EngineCoreOutput, EngineCoreRequest, \
    FinishReason
from vllm_tpu.engine.detokenizer import IncrementalDetokenizer
from vllm_tpu.outputs import (CompletionOutput, Logprob, RequestMetrics,
                              RequestOutput)
from vllm_tpu.sampling_params import RequestOutputKind, SamplingParams


class RequestOutputCollector:
    """Async bridge: engine output handler -> per-request generator
    (reference: output_processor.py:24). Aggregates while the consumer is
    slow."""

    def __init__(self, aggregate: bool) -> None:
        self.aggregate = aggregate
        self._event = asyncio.Event()
        self._output: Optional[RequestOutput | Exception] = None

    def put(self, output: RequestOutput | Exception) -> None:
        if self._output is None or isinstance(output, Exception):
            self._output = output
        elif isinstance(self._output, RequestOutput):
            self._output.add(output, aggregate=self.aggregate)
        self._event.set()

    async def get(self) -> RequestOutput:
        while (output := self._output) is None:
            await self._event.wait()
            self._event.clear()
        self._output = None
        if isinstance(output, Exception):
            raise output
        return output

    def get_nowait(self) -> Optional[RequestOutput]:
        output = self._output
        self._output = None
        if isinstance(output, Exception):
            raise output
        return output


@dataclass
class RequestState:
    """(reference: output_processor.py:79)"""

    request_id: str
    prompt_token_ids: list[int]
    prompt_text: Optional[str]
    sampling_params: Optional[SamplingParams]
    detokenizer: Optional[IncrementalDetokenizer]
    queue: Optional[RequestOutputCollector]
    arrival_time: float
    output_token_ids: list[int] = field(default_factory=list)
    logprobs: list = field(default_factory=list)
    prompt_logprobs: list = field(default_factory=list)
    cumulative_logprob: float = 0.0
    num_cached_tokens: int = 0
    first_token_time: float = 0.0
    finished: bool = False

    @property
    def output_kind(self) -> RequestOutputKind:
        if self.sampling_params is None:
            return RequestOutputKind.FINAL_ONLY
        return self.sampling_params.output_kind


@dataclass
class OutputProcessorResult:
    request_outputs: list[RequestOutput]
    reqs_to_abort: list[str]


class OutputProcessor:

    def __init__(self, tokenizer, log_stats: bool = False,
                 tracer=None, model_name: str = "") -> None:
        self.tokenizer = tokenizer
        self.log_stats = log_stats
        self.request_states: dict[str, RequestState] = {}
        # OTel-style span emission per finished request
        # (reference: tracing via v1 OutputProcessor path, SURVEY §5.1)
        self.tracer = tracer
        self.model_name = model_name

    def _emit_span(self, state: "RequestState") -> None:
        if self.tracer is None:
            return
        from vllm_tpu.tracing import request_span_attributes

        now = time.monotonic()
        wall_now = time.time()
        offset = wall_now - now  # monotonic -> wall clock
        self.tracer.span(
            "llm_request",
            start_time=state.arrival_time + offset,
            end_time=wall_now,
            attributes=request_span_attributes(
                request_id=state.request_id,
                model=self.model_name,
                num_prompt_tokens=len(state.prompt_token_ids),
                num_completion_tokens=len(state.output_token_ids),
                arrival_time=state.arrival_time,
                first_token_time=state.first_token_time,
                finished_time=now,
                sampling_params=state.sampling_params,
            ))

    def get_num_unfinished_requests(self) -> int:
        return len(self.request_states)

    def has_unfinished_requests(self) -> bool:
        return bool(self.request_states)

    def add_request(self, request: EngineCoreRequest,
                    prompt_text: Optional[str] = None,
                    queue: Optional[RequestOutputCollector] = None) -> None:
        detok = None
        if request.sampling_params is not None and \
                request.sampling_params.detokenize and \
                self.tokenizer is not None:
            detok = IncrementalDetokenizer(self.tokenizer,
                                           request.sampling_params,
                                           request.prompt_token_ids)
        self.request_states[request.request_id] = RequestState(
            request_id=request.request_id,
            prompt_token_ids=request.prompt_token_ids,
            prompt_text=prompt_text,
            sampling_params=request.sampling_params,
            detokenizer=detok,
            queue=queue,
            arrival_time=request.arrival_time,
        )

    def abort_requests(self, request_ids: list[str]) -> None:
        for rid in request_ids:
            self.request_states.pop(rid, None)

    def process_outputs(
            self,
            engine_core_outputs: list[EngineCoreOutput]
    ) -> OutputProcessorResult:
        request_outputs: list[RequestOutput] = []
        reqs_to_abort: list[str] = []
        for out in engine_core_outputs:
            state = self.request_states.get(out.request_id)
            if state is None:
                continue  # aborted

            if out.pooling_output is not None:
                from vllm_tpu.outputs import (PoolingOutput,
                                              PoolingRequestOutput)

                state.finished = True
                pool_out = PoolingRequestOutput(
                    request_id=out.request_id,
                    outputs=PoolingOutput(data=out.pooling_output),
                    prompt_token_ids=state.prompt_token_ids,
                    finished=True)
                if state.queue is not None:
                    state.queue.put(pool_out)
                else:
                    request_outputs.append(pool_out)
                del self.request_states[out.request_id]
                continue

            new_tokens = out.new_token_ids
            finish_reason = out.finish_reason
            stop_reason = out.stop_reason

            if new_tokens and not state.output_token_ids:
                state.first_token_time = time.monotonic()
            state.output_token_ids.extend(new_tokens)
            state.num_cached_tokens = out.num_cached_tokens

            # Detokenize + stop-string scan (engine core can't see text).
            stop_str = None
            if state.detokenizer is not None:
                stop_str = state.detokenizer.update(new_tokens)
            if stop_str is not None and finish_reason is None:
                finish_reason = FinishReason.STOP
                stop_reason = stop_str
                reqs_to_abort.append(out.request_id)

            if out.new_prompt_logprobs is not None:
                # chunked-prefill increments of {token_id: lp} dicts
                # (position 0 arrives as None); decode for parity with
                # the sampled-logprob Logprob objects
                for d in out.new_prompt_logprobs:
                    if d is None:
                        state.prompt_logprobs.append(None)
                        continue
                    lp_dict = {}
                    for rank_pos, (tid, lp) in enumerate(
                            sorted(d.items(), key=lambda kv: -kv[1])):
                        decoded = None
                        if self.tokenizer is not None:
                            decoded = self.tokenizer.decode([tid])
                        lp_dict[tid] = Logprob(lp, rank_pos + 1, decoded)
                    state.prompt_logprobs.append(lp_dict)

            if out.new_logprobs is not None:
                for d in out.new_logprobs:
                    if d is None:
                        continue
                    lp_dict = {}
                    for rank_pos, (tid, lp) in enumerate(
                            sorted(d.items(), key=lambda kv: -kv[1])):
                        decoded = None
                        if self.tokenizer is not None:
                            decoded = self.tokenizer.decode([tid])
                        lp_dict[tid] = Logprob(lp, rank_pos + 1, decoded)
                    state.logprobs.append(lp_dict)
                    # cumulative logprob of the sampled (=last appended)
                    sampled_tid = state.output_token_ids[
                        len(state.logprobs) - 1] if state.logprobs else None
                    if sampled_tid in d:
                        state.cumulative_logprob += d[sampled_tid]

            finished = finish_reason is not None
            state.finished = finished
            req_out = self._make_request_output(state, new_tokens,
                                                finish_reason, stop_reason)
            if req_out is not None:
                if state.queue is not None:
                    state.queue.put(req_out)
                else:
                    request_outputs.append(req_out)
            if finished:
                self._emit_span(state)
                del self.request_states[out.request_id]
        return OutputProcessorResult(request_outputs, reqs_to_abort)

    def _make_request_output(self, state: RequestState,
                             new_tokens: list[int],
                             finish_reason, stop_reason
                             ) -> Optional[RequestOutput]:
        finished = finish_reason is not None
        kind = state.output_kind
        if kind == RequestOutputKind.FINAL_ONLY and not finished:
            return None
        delta = kind == RequestOutputKind.DELTA

        if state.detokenizer is not None:
            text = state.detokenizer.get_next_output_text(finished, delta)
        else:
            text = ""
        token_ids = new_tokens if delta else list(state.output_token_ids)
        logprobs = None
        if state.sampling_params is not None and \
                state.sampling_params.logprobs is not None:
            logprobs = (state.logprobs[-len(new_tokens):]
                        if delta else list(state.logprobs))
        completion = CompletionOutput(
            index=0,
            text=text,
            token_ids=token_ids,
            cumulative_logprob=(state.cumulative_logprob
                                if logprobs is not None else None),
            logprobs=logprobs,
            finish_reason=str(finish_reason) if finished else None,
            stop_reason=stop_reason,
        )
        return RequestOutput(
            request_id=state.request_id,
            prompt=state.prompt_text,
            prompt_token_ids=state.prompt_token_ids,
            prompt_logprobs=(state.prompt_logprobs or None),
            outputs=[completion],
            finished=finished,
            num_cached_tokens=state.num_cached_tokens,
        )
