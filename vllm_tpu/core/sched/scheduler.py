"""Continuous-batching scheduler (reference: vllm/v1/core/sched/scheduler.py:41).

Single unified loop — no prefill/decode phases. Each step assigns a token
budget across requests: every request catches ``num_computed_tokens`` up to
``num_tokens_with_spec``, which subsumes prefill, chunked prefill, decode,
and speculative verification in one rule. Preemption frees blocks of the
lowest-priority running request; preempted requests recompute from token 0
(the TPU engine never swaps KV to host).

Spec-decode rejection accounting happens here, host-side, not on device:
``num_computed_tokens -= len(scheduled_spec) + 1 - len(generated)``
(reference: scheduler.py:784-797).
"""

from __future__ import annotations

import time
from typing import Optional

from vllm_tpu.config import CacheConfig, SchedulerConfig, SpeculativeConfig
from vllm_tpu.core.kv_cache_interface import KVCacheConfig
from vllm_tpu.core.kv_cache_manager import KVCacheManager
from vllm_tpu.core.sched.output import (CachedRequestData, ModelRunnerOutput,
                                        NewRequestData, SchedulerOutput)
from vllm_tpu.core.sched.request_queue import create_request_queue
from vllm_tpu.engine import (EngineCoreEvent, EngineCoreEventType,
                             EngineCoreOutput, EngineCoreOutputs,
                             FinishReason, SchedulerStats)
from vllm_tpu.request import Request, RequestStatus


def check_stop(request: Request, max_model_len: int) -> bool:
    """Stop-condition check after appending new tokens
    (reference: v1/core/sched/utils.py)."""
    if (request.num_tokens >= max_model_len
            or request.num_output_tokens >= request.max_tokens):
        request.status = RequestStatus.FINISHED_LENGTH_CAPPED
        return True
    sampling_params = request.sampling_params
    if sampling_params is None:
        return False
    last_token_id = request.all_token_ids[-1]
    if request.num_output_tokens >= sampling_params.min_tokens:
        if last_token_id in sampling_params.all_stop_token_ids:
            request.status = RequestStatus.FINISHED_STOPPED
            if last_token_id != request.eos_token_id:
                request.stop_reason = last_token_id
            return True
    return False


class Scheduler:

    def __init__(
        self,
        scheduler_config: SchedulerConfig,
        cache_config: CacheConfig,
        kv_cache_config: KVCacheConfig,
        speculative_config: Optional[SpeculativeConfig] = None,
        structured_output_manager=None,
        log_stats: bool = True,
        kv_connector=None,
        lora_config=None,
    ) -> None:
        self.scheduler_config = scheduler_config
        self.cache_config = cache_config
        self.kv_cache_config = kv_cache_config
        self.max_num_running_reqs = scheduler_config.max_num_seqs
        self.max_num_scheduled_tokens = scheduler_config.max_num_batched_tokens
        self.max_model_len = scheduler_config.max_model_len
        self.log_stats = log_stats
        self.lora_config = lora_config
        self.structured_output_manager = structured_output_manager
        self.async_scheduling = scheduler_config.async_scheduling

        num_spec_tokens = 0
        if speculative_config is not None and speculative_config.enabled:
            num_spec_tokens = speculative_config.num_speculative_tokens
        self.num_spec_tokens = num_spec_tokens
        # Lookahead slots so spec tokens have KV space in the verify step.
        self.num_lookahead_tokens = num_spec_tokens

        self.kv_cache_manager = KVCacheManager(
            kv_cache_config=kv_cache_config,
            max_model_len=self.max_model_len,
            enable_caching=cache_config.enable_prefix_caching,
            hash_algo=cache_config.prefix_caching_hash_algo,
        )
        self.block_size = self.kv_cache_manager.block_size
        # Disaggregated-P/D connector, scheduler role (reference:
        # KVConnectorBase_V1 scheduler-side hooks).
        self.kv_connector = kv_connector
        if kv_connector is not None and hasattr(kv_connector,
                                                "set_block_size"):
            kv_connector.set_block_size(self.block_size)
        self._pending_kv_saves: list = []

        # Vision-encoder output budget/dedup accounting (reference:
        # v1/core/encoder_cache_manager.py). Arrays live in the runner,
        # keyed by the same content hashes.
        from vllm_tpu.core.encoder_cache_manager import EncoderCacheManager

        self.encoder_cache_manager = EncoderCacheManager(
            cache_budget_tokens=max(
                scheduler_config.max_num_batched_tokens, 2048))

        self.requests: dict[str, Request] = {}
        self.waiting = create_request_queue(scheduler_config.policy)
        self.running: list[Request] = []
        # req ids finished since the last schedule() per client; the runner
        # uses this to release persistent-batch slots.
        self.finished_req_ids: set[str] = set()
        # Requests failed outside a model step (e.g. grammar-compile
        # errors) awaiting an EngineCoreOutput in update_from_output.
        self._error_outputs: list[Request] = []
        # Accumulated stats
        self.num_preempted_reqs_total = 0
        self._step_spec_stats = [0, 0, 0]  # drafts, draft tokens, accepted
        # Requests whose activations are still inside the worker's
        # resident PP ring (ModelRunnerOutput.inflight_req_ids): their
        # next input token does not exist yet anywhere, so they can be
        # neither rescheduled nor preempted until their batch exits.
        self.runner_inflight: set[str] = set()

    # ------------------------------------------------------------------ admin

    def add_request(self, request: Request) -> None:
        self.requests[request.request_id] = request
        if (self.structured_output_manager is not None
                and request.use_structured_output):
            request.status = RequestStatus.WAITING_FOR_FSM
        self.waiting.add_request(request)
        request.record_event("queued")

    def finish_requests(self, request_ids: str | list[str],
                        finished_status: RequestStatus) -> None:
        """External finish (abort) — not used for engine-detected stops."""
        if isinstance(request_ids, str):
            request_ids = [request_ids]
        waiting_to_remove: set[Request] = set()
        for req_id in request_ids:
            request = self.requests.get(req_id)
            if request is None or request.is_finished:
                continue
            if request.status == RequestStatus.RUNNING:
                self.running.remove(request)
            else:
                waiting_to_remove.add(request)
            request.status = finished_status
            self._free_request(request)
        if waiting_to_remove:
            self.waiting.remove_requests(waiting_to_remove)

    def has_unfinished_requests(self) -> bool:
        return self.get_num_unfinished_requests() > 0

    def get_num_unfinished_requests(self) -> int:
        return len(self.waiting) + len(self.running)

    def has_requests(self) -> bool:
        return self.has_unfinished_requests()

    def reset_prefix_cache(self) -> bool:
        return self.kv_cache_manager.reset_prefix_cache()

    # --------------------------------------------------------------- schedule

    def schedule(self) -> SchedulerOutput:
        scheduled_new_reqs: list[Request] = []
        scheduled_resumed_reqs: list[Request] = []
        scheduled_running_reqs: list[Request] = []
        preempted_reqs: set[Request] = set()

        num_scheduled_tokens: dict[str, int] = {}
        scheduled_spec_decode_tokens: dict[str, list[int]] = {}
        req_to_new_block_ids: dict[str, tuple[list[int], ...]] = {}
        token_budget = self.max_num_scheduled_tokens
        long_cap = self.scheduler_config.long_prefill_token_threshold

        # ---- pass 1: running requests (reference: scheduler.py:202-317)
        req_index = 0
        while req_index < len(self.running) and token_budget > 0:
            request = self.running[req_index]
            if request.request_id in self.runner_inflight:
                req_index += 1
                continue
            num_new_tokens = (request.num_tokens_with_spec +
                              request.num_pending_samples -
                              request.num_computed_tokens)
            if long_cap > 0:
                num_new_tokens = min(num_new_tokens, long_cap)
            num_new_tokens = min(num_new_tokens, token_budget,
                                 self.max_model_len -
                                 request.num_computed_tokens)
            # Hard cap at the request's own max_tokens: the final output
            # materializes after forwarding prompt + max_tokens - 1
            # positions, so scheduling past that wastes a decode slot
            # per request AND (with async pending samples) can allocate
            # a KV page past the request's true end — at page-boundary
            # context lengths that double the page footprint of every
            # request at once and cascades into preemption thrash.
            sp = request.sampling_params
            if sp is not None and sp.max_tokens is not None:
                hard_cap = (request.num_prompt_tokens + sp.max_tokens - 1
                            - request.num_computed_tokens)
                num_new_tokens = min(num_new_tokens, hard_cap)
            if num_new_tokens <= 0:
                req_index += 1
                continue

            # Allocate; preempt victims from the back until it fits.
            while True:
                new_blocks = self.kv_cache_manager.allocate_slots(
                    request,
                    num_new_tokens,
                    num_lookahead_tokens=self.num_lookahead_tokens)
                if new_blocks is not None:
                    break
                victim = self._choose_preemption_victim(
                    num_scheduled_tokens, request)
                self._preempt(victim)
                preempted_reqs.add(victim)
                if victim is request:
                    break
            if request in preempted_reqs:
                # The request itself was preempted: stop the running pass.
                break

            scheduled_running_reqs.append(request)
            req_to_new_block_ids[request.request_id] = (
                new_blocks.get_block_ids())
            # Trim spec tokens that did not fit the budget
            # (reference: scheduler.py:299-308).
            num_scheduled_spec = (request.num_computed_tokens +
                                  num_new_tokens - request.num_tokens)
            if request.spec_token_ids:
                if num_scheduled_spec < len(request.spec_token_ids):
                    del request.spec_token_ids[max(num_scheduled_spec, 0):]
                if request.spec_token_ids:
                    scheduled_spec_decode_tokens[request.request_id] = (
                        list(request.spec_token_ids))
            num_scheduled_tokens[request.request_id] = num_new_tokens
            token_budget -= num_new_tokens
            req_index += 1

        # ---- pass 2: waiting requests (reference: scheduler.py:331-507)
        if not preempted_reqs:
            while self.waiting and token_budget > 0:
                if len(self.running) >= self.max_num_running_reqs:
                    break
                request = self.waiting.peek_request()

                if request.status == RequestStatus.WAITING_FOR_FSM:
                    from vllm_tpu.structured_output.manager import \
                        GrammarCompileError

                    try:
                        ready = (self.structured_output_manager is not None
                                 and self.structured_output_manager.
                                 grammar_ready(request))
                    except GrammarCompileError as e:
                        # Fail the request: a bad guided_json/regex/
                        # grammar must error, not silently serve
                        # unconstrained output (ADVICE r02).
                        self.waiting.pop_request()
                        request.status = RequestStatus.FINISHED_ABORTED
                        request.stop_reason = str(e)
                        self._free_request(request)
                        self._error_outputs.append(request)
                        continue
                    if ready:
                        request.status = RequestStatus.WAITING
                    else:
                        break

                # Vision-encoder budget: defer image requests whose
                # encoder output does not fit next to what's cached
                # (reference: scheduler encoder-budget pass).
                if request.mm_hashes and not \
                        self.encoder_cache_manager.can_schedule(request):
                    break

                # Prefix-cache lookup whenever no tokens are computed yet —
                # this covers both brand-new requests and PREEMPTED ones
                # resuming (preemption resets num_computed_tokens to 0 but
                # the prompt's blocks may still sit in the prefix cache;
                # reference gates the same way, scheduler.py:377-380).
                # Pooling requests skip it: mean pooling needs the hidden
                # state of EVERY prompt token computed, so cached blocks
                # cannot stand in for computation.
                num_new_computed_tokens = 0
                new_computed_blocks = None
                if (request.num_computed_tokens == 0
                        and request.pooling_params is None):
                    new_computed_blocks, num_new_computed_tokens = (
                        self.kv_cache_manager.get_computed_blocks(request))

                # External KV lookup (disagg P/D): tokens whose KV can be
                # pulled from the connector instead of recomputed.
                num_external_tokens = 0
                if (self.kv_connector is not None
                        and request.status == RequestStatus.WAITING
                        and request.num_computed_tokens == 0
                        and request.pooling_params is None):
                    num_external_tokens, _ = \
                        self.kv_connector.get_num_new_matched_tokens(
                            request, num_new_computed_tokens)

                num_new_tokens = (request.num_tokens -
                                  request.num_computed_tokens -
                                  num_new_computed_tokens -
                                  num_external_tokens)
                if request.pooling_params is not None:
                    # All-or-nothing: the pooler consumes every prompt
                    # token's hidden state in one device step.
                    if num_new_tokens > token_budget:
                        break
                elif long_cap > 0:
                    num_new_tokens = min(num_new_tokens, long_cap)
                if (not self.scheduler_config.enable_chunked_prefill
                        and num_new_tokens > token_budget):
                    break
                num_new_tokens = min(num_new_tokens, token_budget)
                assert num_new_tokens > 0

                new_blocks = self.kv_cache_manager.allocate_slots(
                    request,
                    num_new_tokens + num_external_tokens,
                    num_new_computed_tokens=num_new_computed_tokens,
                    new_computed_blocks=new_computed_blocks,
                    num_lookahead_tokens=self.num_lookahead_tokens)
                if new_blocks is None:
                    break  # out of KV space; keep FIFO order

                if num_external_tokens:
                    self.kv_connector.update_state_after_alloc(
                        request,
                        self.kv_cache_manager.get_block_ids(
                            request.request_id)[0], num_external_tokens)

                self.waiting.pop_request()
                if request.mm_hashes:
                    self.encoder_cache_manager.allocate(request)
                was_preempted = request.status == RequestStatus.PREEMPTED
                request.status = RequestStatus.RUNNING
                self.running.append(request)
                request.record_event("scheduled")
                if was_preempted:
                    scheduled_resumed_reqs.append(request)
                else:
                    scheduled_new_reqs.append(request)
                # Externally-loaded tokens count as computed: the worker
                # pulls their KV before the forward pass. Applies equally
                # to preempted-resumed requests whose prompt blocks were
                # still cached.
                total_hit = num_new_computed_tokens + num_external_tokens
                if total_hit:
                    request.num_computed_tokens = total_hit
                request.num_cached_tokens = max(request.num_cached_tokens,
                                                total_hit)

                # New requests carry their FULL block list (hit + new).
                req_to_new_block_ids[request.request_id] = (
                    self.kv_cache_manager.get_block_ids(request.request_id))
                num_scheduled_tokens[request.request_id] = num_new_tokens
                token_budget -= num_new_tokens

        total_tokens = sum(num_scheduled_tokens.values())
        assert total_tokens <= self.max_num_scheduled_tokens

        # Cascade-attention hint: blocks shared by every running request.
        num_common_prefix_blocks = [0] * self.kv_cache_manager.num_groups
        if self.running:
            any_req = self.running[0]
            num_common_prefix_blocks = (
                self.kv_cache_manager.get_num_common_prefix_blocks(
                    any_req, len(self.running)))

        new_reqs_data = [
            NewRequestData(
                req_id=req.request_id,
                prompt_token_ids=req.prompt_token_ids,
                sampling_params=req.sampling_params,
                block_ids=req_to_new_block_ids[req.request_id],
                num_computed_tokens=req.num_computed_tokens,
                lora_request=req.lora_request,
                pooling_params=req.pooling_params,
                mm_inputs=req.mm_inputs,
                mm_hashes=req.mm_hashes,
            ) for req in scheduled_new_reqs
        ]
        cached_reqs_data = self._make_cached_request_data(
            scheduled_running_reqs, scheduled_resumed_reqs,
            req_to_new_block_ids)

        scheduler_output = SchedulerOutput(
            scheduled_new_reqs=new_reqs_data,
            scheduled_cached_reqs=cached_reqs_data,
            num_scheduled_tokens=num_scheduled_tokens,
            total_num_scheduled_tokens=total_tokens,
            scheduled_spec_decode_tokens=scheduled_spec_decode_tokens,
            num_common_prefix_blocks=num_common_prefix_blocks,
            finished_req_ids=self.finished_req_ids,
            preempted_req_ids={r.request_id for r in preempted_reqs},
            kv_connector_metadata=(self.kv_connector.build_connector_meta()
                                   if self.kv_connector else None),
            freed_mm_hashes=self.encoder_cache_manager.take_freed_hashes(),
        )
        self.finished_req_ids = set()

        if self.structured_output_manager is not None:
            self.structured_output_manager.build_bitmask(
                self.requests, scheduler_output)

        # Optimistically advance computed tokens; update_from_output rolls
        # back rejected speculative tokens.
        for req_id, num in num_scheduled_tokens.items():
            request = self.requests[req_id]
            if (self.async_scheduling
                    and request.sampling_params is not None
                    and request.num_computed_tokens + num >=
                    request.num_tokens + request.num_pending_samples):
                # this step samples; its token materializes one step late
                request.num_pending_samples += 1
            request.num_computed_tokens += num

        return scheduler_output

    def _make_cached_request_data(
        self,
        running_reqs: list[Request],
        resumed_reqs: list[Request],
        req_to_new_block_ids: dict[str, tuple[list[int], ...]],
    ) -> CachedRequestData:
        data = CachedRequestData()
        for request in running_reqs:
            data.req_ids.append(request.request_id)
            data.resumed_from_preemption.append(False)
            data.new_block_ids.append(
                req_to_new_block_ids[request.request_id])
            data.num_computed_tokens.append(request.num_computed_tokens)
            data.resumed_req_token_ids.append(None)
        for request in resumed_reqs:
            data.req_ids.append(request.request_id)
            data.resumed_from_preemption.append(True)
            data.new_block_ids.append(
                self.kv_cache_manager.get_block_ids(request.request_id))
            data.num_computed_tokens.append(request.num_computed_tokens)
            data.resumed_req_token_ids.append(list(request.all_token_ids))
        return data

    def set_runner_inflight(self, req_ids: set[str]) -> None:
        self.runner_inflight = req_ids

    def _choose_preemption_victim(self, scheduled: dict,
                                  requester: Request) -> Request:
        # Ring-resident requests cannot be preempted (their in-flight
        # stages still write KV through their current block tables), and
        # neither can requests ALREADY SCHEDULED this step (their step
        # allocation is committed; freeing it would run them on freed
        # blocks — the runner has also evicted nothing for them). The
        # requesting request itself is never ring-resident or scheduled,
        # so an eligible victim always exists.
        eligible = [r for r in self.running
                    if r.request_id not in self.runner_inflight
                    and r.request_id not in scheduled]
        if not eligible:
            return requester
        if self.scheduler_config.policy == "priority":
            return max(eligible,
                       key=lambda r: (r.priority, r.arrival_time))
        return eligible[-1]

    def _preempt(self, request: Request) -> None:
        self.running.remove(request)
        self.kv_cache_manager.free(request)
        request.status = RequestStatus.PREEMPTED
        request.num_computed_tokens = 0
        request.num_pending_samples = 0
        request.num_preemptions += 1
        request.spec_token_ids.clear()
        request.record_event("preempted")
        self.num_preempted_reqs_total += 1
        self.waiting.prepend_request(request)

    # ------------------------------------------------------------ post-step

    def update_from_output(
        self,
        scheduler_output: SchedulerOutput,
        runner_output: ModelRunnerOutput,
    ) -> dict[int, EngineCoreOutputs]:
        """Apply sampled tokens, do spec-rejection accounting, detect stops
        (reference: scheduler.py:748)."""
        outputs_by_client: dict[int, list[EngineCoreOutput]] = {}
        stopped_reqs: list[Request] = []
        spec_stats = self._step_spec_stats

        for request in self._error_outputs:
            outputs_by_client.setdefault(request.client_index, []).append(
                EngineCoreOutput(
                    request_id=request.request_id,
                    new_token_ids=[],
                    finish_reason=FinishReason.ABORT,
                    stop_reason=request.stop_reason,
                    events=request.take_events(),
                ))
        self._error_outputs = []

        for i, req_id in enumerate(runner_output.req_ids):
            request = self.requests.get(req_id)
            if request is None:
                continue  # aborted while the step ran
            generated = runner_output.sampled_token_ids[i]
            if self.async_scheduling and generated:
                request.num_pending_samples = max(
                    request.num_pending_samples - len(generated), 0)
            scheduled_spec = scheduler_output.scheduled_spec_decode_tokens.get(
                req_id, [])
            if scheduled_spec:
                # len(generated) = 1 + num accepted drafts. Roll back the
                # optimistic advance for rejected drafts.
                num_rejected = len(scheduled_spec) + 1 - len(generated)
                request.num_computed_tokens -= num_rejected
                spec_stats[0] += 1
                spec_stats[1] += len(scheduled_spec)
                spec_stats[2] += len(generated) - 1

            stopped = False
            new_token_ids: list[int] = []
            for token_id in generated:
                request.append_output_token_ids(token_id)
                new_token_ids.append(token_id)
                if check_stop(request, self.max_model_len):
                    stopped = True
                    break
            # Advance the structured-output FSM on accepted tokens only.
            if (self.structured_output_manager is not None
                    and request.use_structured_output and new_token_ids):
                self.structured_output_manager.accept_tokens(
                    request, new_token_ids)

            # Store next step's draft tokens.
            if runner_output.spec_token_ids is not None and not stopped:
                request.spec_token_ids = list(
                    runner_output.spec_token_ids[i])
                # Never draft past max_model_len - 1.
                max_draft = (self.max_model_len - 1 - request.num_tokens)
                if len(request.spec_token_ids) > max_draft:
                    del request.spec_token_ids[max(max_draft, 0):]

            if not new_token_ids and request.pooling_params is None:
                # Partial prefill step: nothing to emit unless we need to
                # report prompt logprobs progress.
                if req_id not in runner_output.prompt_logprobs_dict:
                    continue

            logprobs = None
            if runner_output.logprobs is not None:
                logprobs = runner_output.logprobs[i]
            pooling = None
            if runner_output.pooler_output is not None:
                pooling = runner_output.pooler_output[i]
                if pooling is not None:
                    request.status = RequestStatus.FINISHED_STOPPED
                    stopped = True

            if stopped:
                stopped_reqs.append(request)

            finish_reason = None
            if request.is_finished:
                fr = request.get_finished_reason()
                finish_reason = (FinishReason.LENGTH if fr == "length" else
                                 FinishReason.STOP)
            outputs_by_client.setdefault(request.client_index, []).append(
                EngineCoreOutput(
                    request_id=req_id,
                    new_token_ids=new_token_ids,
                    finish_reason=finish_reason,
                    stop_reason=request.stop_reason,
                    new_logprobs=logprobs,
                    new_prompt_logprobs=runner_output.prompt_logprobs_dict.
                    get(req_id),
                    pooling_output=pooling,
                    num_cached_tokens=max(request.num_cached_tokens, 0),
                    events=request.take_events(),
                ))

        for request in stopped_reqs:
            self.running.remove(request)
            self._free_request(request)

        now = time.time()
        return {
            client: EngineCoreOutputs(
                outputs=outs,
                scheduler_stats=self.make_stats(),
                timestamp=now,
            )
            for client, outs in outputs_by_client.items()
        } or {
            0:
            EngineCoreOutputs(outputs=[],
                              scheduler_stats=self.make_stats(),
                              timestamp=now)
        }

    def _free_request(self, request: Request) -> None:
        if self.kv_connector is not None:
            block_ids = self.kv_cache_manager.get_block_ids(
                request.request_id)[0]
            save = self.kv_connector.request_finished(request, block_ids)
            if save is not None:
                # drained by EngineCore.step BEFORE the freed blocks can
                # be reallocated (next schedule() call); MultiConnector
                # returns a list (one spec per child tier)
                self._pending_kv_saves.extend(
                    save if isinstance(save, list) else [save])
        if request.mm_hashes:
            self.encoder_cache_manager.free_request(request)
        self.kv_cache_manager.free(request)
        self.kv_cache_manager.free_block_hashes(request)
        self.finished_req_ids.add(request.request_id)
        del self.requests[request.request_id]

    def take_pending_kv_saves(self) -> list:
        saves, self._pending_kv_saves = self._pending_kv_saves, []
        return saves

    # ---------------------------------------------------------------- stats

    def make_stats(self) -> Optional[SchedulerStats]:
        if not self.log_stats:
            return None
        kvm = self.kv_cache_manager
        stats = SchedulerStats(
            num_running_reqs=len(self.running),
            num_waiting_reqs=len(self.waiting),
            kv_cache_usage=kvm.usage,
            prefix_cache_queries=kvm.stats.prefix_cache_queries,
            prefix_cache_hits=kvm.stats.prefix_cache_hits,
            num_preempted_reqs=self.num_preempted_reqs_total,
            spec_num_drafts=self._step_spec_stats[0],
            spec_num_draft_tokens=self._step_spec_stats[1],
            spec_num_accepted_tokens=self._step_spec_stats[2],
        )
        if self.lora_config is not None:
            running = {r.lora_request.lora_name for r in self.running
                       if r.lora_request is not None}
            waiting = {r.lora_request.lora_name for r in self.waiting
                       if r.lora_request is not None}
            stats.lora_stats = (self.lora_config.max_loras,
                                sorted(running), sorted(waiting))
        return stats
