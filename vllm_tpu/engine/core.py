"""Engine core: owns the scheduler + executor; step = schedule -> execute
-> update (reference: vllm/v1/engine/core.py:59 EngineCore).

The busy-loop/ZMQ process wrapper lives in engine/core_proc.py; this class
is the in-process core used directly by the sync LLMEngine.
"""

from __future__ import annotations

import logging
import time
from typing import Any, Optional

from vllm_tpu.config import EngineConfig
from vllm_tpu.core.kv_cache_interface import make_kv_cache_config
from vllm_tpu.core.sched.scheduler import Scheduler
from vllm_tpu.engine import EngineCoreOutputs, EngineCoreRequest
from vllm_tpu.executor.abstract import Executor
from vllm_tpu.request import Request, RequestStatus

logger = logging.getLogger(__name__)


class EngineCore:

    def __init__(self, engine_config: EngineConfig,
                 executor_class: Optional[type[Executor]] = None,
                 log_stats: bool = True) -> None:
        self.config = engine_config
        from vllm_tpu.plugins import load_general_plugins

        load_general_plugins()
        executor_class = executor_class or Executor.get_class(engine_config)
        self.executor = executor_class(engine_config)

        kv_cache_config = self._initialize_kv_caches()

        structured_output_manager = None
        from vllm_tpu.structured_output.manager import \
            StructuredOutputManager

        structured_output_manager = StructuredOutputManager(engine_config)
        self.structured_output_manager = structured_output_manager

        kv_connector = None
        if engine_config.kv_transfer_config is not None:
            from vllm_tpu.distributed.kv_transfer import (KVConnectorRole,
                                                          create_connector)

            kv_connector = create_connector(
                engine_config.kv_transfer_config,
                KVConnectorRole.SCHEDULER)

        self.scheduler = Scheduler(
            scheduler_config=engine_config.scheduler_config,
            cache_config=engine_config.cache_config,
            kv_cache_config=kv_cache_config,
            speculative_config=engine_config.speculative_config,
            structured_output_manager=structured_output_manager,
            log_stats=log_stats,
            kv_connector=kv_connector,
            lora_config=engine_config.lora_config,
        )

        # KV-cache event publishing for external prefix-aware routers
        # (reference: kv_events.py wired via block_pool listener)
        from vllm_tpu.distributed.kv_events import EventPublisherFactory

        self.kv_event_publisher = EventPublisherFactory.create(
            engine_config.kv_events_config)
        if engine_config.kv_events_config and \
                engine_config.kv_events_config.enable_kv_cache_events:
            import time as _time

            from vllm_tpu.distributed.kv_events import (AllBlocksCleared,
                                                        BlockRemoved,
                                                        BlockStored,
                                                        EventBatch)

            block_size = engine_config.cache_config.block_size

            def _on_event(kind: str, payload: dict) -> None:
                if kind == "block_stored":
                    ev = BlockStored(
                        block_hashes=payload.get("block_hashes", []),
                        parent_block_hash=payload.get("parent"),
                        token_ids=payload.get("token_ids", []),
                        block_size=block_size)
                elif kind == "block_removed":
                    ev = BlockRemoved(
                        block_hashes=payload.get("block_hashes", []))
                else:
                    ev = AllBlocksCleared()
                self.kv_event_publisher.publish(
                    EventBatch(ts=_time.time(), events=[ev]))

            self.scheduler.kv_cache_manager.block_pool.event_listener = \
                _on_event

        self.async_scheduling = \
            engine_config.scheduler_config.async_scheduling
        self.async_depth = max(
            1, engine_config.scheduler_config.async_depth)
        # PP resident-ring streaming (model_runner._execute_stream)
        # keeps pp batches in flight on device; the oldest dispatched
        # step only EXITS the ring after pp-1 further dispatches, so
        # the finalize lag must be at least pp or every finalize would
        # force bubble hops and collapse the ring.
        pp = engine_config.parallel_config.pipeline_parallel_size
        if pp > 1 and self.async_scheduling:
            self.async_depth = max(self.async_depth, pp)
        from collections import deque

        self._inflight = deque()  # scheduler outputs awaiting finalize

        # ngram speculative proposer runs host-side in the core
        self.spec_proposer = None
        spec = engine_config.speculative_config
        if spec.enabled and spec.method == "ngram":
            from vllm_tpu.spec_decode.ngram import NgramProposer

            self.spec_proposer = NgramProposer(
                spec.num_speculative_tokens, spec.prompt_lookup_min,
                spec.prompt_lookup_max)

        # GC tuning (reference: vllm's post-init gc.freeze): the engine
        # graph (weights refs, compiled fns, config tree) is permanent —
        # freeze it out of collection and widen gen0 so steady-state
        # steps don't pay multi-ms GC pauses scanning hundreds of live
        # request objects (measured: step p50 34.8 ms but MEAN 70 ms
        # from collection pauses at bs=256 before this).
        import gc

        gc.collect()
        gc.freeze()
        allocs, g1, g2 = gc.get_threshold()
        gc.set_threshold(max(allocs, 50_000), g1, g2)

    def _initialize_kv_caches(self):
        """Spec -> profile -> size -> allocate
        (reference: core.py:145 _initialize_kv_caches; SURVEY §3.3)."""
        t0 = time.perf_counter()
        kv_specs = self.executor.get_kv_cache_specs()
        available = self.executor.determine_available_memory()
        kv_cache_config = make_kv_cache_config(
            kv_specs, available,
            self.config.cache_config.num_gpu_blocks_override)
        self.config.cache_config.num_gpu_blocks = kv_cache_config.num_blocks
        logger.info(
            "KV cache: %d blocks x %d tokens (%.2f GiB) in %.1fs",
            kv_cache_config.num_blocks,
            self.config.cache_config.block_size,
            kv_cache_config.total_bytes / 2**30,
            time.perf_counter() - t0)
        self.executor.initialize_from_config(kv_cache_config)
        return kv_cache_config

    # ------------------------------------------------------------- requests

    def add_request(self, request: EngineCoreRequest) -> None:
        req = Request(
            request_id=request.request_id,
            prompt_token_ids=request.prompt_token_ids,
            sampling_params=request.sampling_params,
            pooling_params=request.pooling_params,
            eos_token_id=request.eos_token_id,
            arrival_time=request.arrival_time,
            lora_request=request.lora_request,
            cache_salt=request.cache_salt,
            mm_inputs=request.mm_inputs,
            mm_hashes=request.mm_hashes,
            encoder_token_count=request.encoder_token_count,
            priority=request.priority,
            client_index=request.client_index,
        )
        if (request.sampling_params and
                self.structured_output_manager is not None):
            self.structured_output_manager.maybe_init_request(
                req, request.sampling_params)
        self.scheduler.add_request(req)

    def abort_requests(self, request_ids: list[str]) -> None:
        self.scheduler.finish_requests(request_ids,
                                       RequestStatus.FINISHED_ABORTED)

    # ---------------------------------------------------------------- step

    def step(self) -> dict[int, EngineCoreOutputs]:
        """One iteration (reference: core.py:269)."""
        if self.async_scheduling:
            return self._step_async()
        if not self.scheduler.has_requests():
            return {}
        scheduler_output = self.scheduler.schedule()
        try:
            runner_output = self.executor.execute_model(scheduler_output)
        except Exception:
            from vllm_tpu.logging_utils import dump_engine_exception

            dump_engine_exception(self.config, scheduler_output,
                                  self.scheduler)
            raise
        if self.spec_proposer is not None and runner_output.req_ids:
            runner_output.spec_token_ids = self.spec_proposer.propose(
                self.scheduler.requests, runner_output)
        outputs = self.scheduler.update_from_output(scheduler_output,
                                                    runner_output)
        if self.scheduler.kv_connector is not None:
            # persist finished requests' KV before their freed blocks can
            # be reallocated (that happens in the next schedule() call)
            saves = self.scheduler.take_pending_kv_saves()
            if saves:
                self.collective_rpc("kv_save_blocks", (saves,))
        return outputs

    def _step_async(self) -> dict[int, EngineCoreOutputs]:
        """Pipelined step (reference: vllm --async-scheduling): dispatch
        step N BEFORE fetching step N-1's sampled tokens, so the host's
        schedule/prepare/fetch work overlaps device execution. Sampled
        tokens materialize one step late; placeholder inputs substitute
        from the previous step's device tokens inside the jitted step."""
        scheduled = None
        zero_so = None
        if self.scheduler.has_requests():
            so = self.scheduler.schedule()
            if so.total_num_scheduled_tokens > 0:
                # dispatch, no fetch; the immediate output only carries
                # the runner's PP-ring occupancy (if streaming)
                ro = self.executor.execute_model(so)
                self.scheduler.set_runner_inflight(
                    set(ro.inflight_req_ids or ())
                    if ro is not None else set())
                scheduled = so
                self._inflight.append(so)
            else:
                # Nothing ran (all waiting blocked, requests capped at
                # max_tokens awaiting their pending finals, or a request
                # errored in schedule()): no device step to finalize,
                # but the SchedulerOutput still carries state the runner
                # must apply — schedule() already MOVED the accumulated
                # finished_req_ids into it, so skipping delivery would
                # leak the runner's batch rows (stale rows then collide
                # with reused request ids). The runner's execute_model
                # applies update_states and returns without dispatching.
                self.executor.execute_model(so)
                zero_so = so
        outputs: dict[int, EngineCoreOutputs] = {}
        # Drain the oldest in-flight step once the pipeline is full, or
        # whenever nothing new was dispatched (drain-down / blocked).
        if self._inflight and (len(self._inflight) > self.async_depth
                               or scheduled is None):
            prev_so = self._inflight.popleft()
            prev_ro = self.executor.collective_rpc("finalize_pending")[0]
            if prev_ro.inflight_req_ids is not None:
                # the drain may have bubble-hopped batches out of the
                # PP ring — refresh occupancy so they reschedule
                self.scheduler.set_runner_inflight(
                    set(prev_ro.inflight_req_ids))
            outputs = self.scheduler.update_from_output(prev_so, prev_ro)
        elif zero_so is not None:
            from vllm_tpu.core.sched.output import ModelRunnerOutput

            outputs = self.scheduler.update_from_output(
                zero_so, ModelRunnerOutput())
        return outputs

    # ------------------------------------------------------------- control

    def has_unfinished_requests(self) -> bool:
        return (self.scheduler.has_unfinished_requests()
                or len(self._inflight) > 0)

    def reset_prefix_cache(self) -> bool:
        return self.scheduler.reset_prefix_cache()

    def collective_rpc(self, method: str, args: tuple = (),
                       kwargs: dict | None = None) -> list[Any]:
        return self.executor.collective_rpc(method, args, kwargs)

    def save_sharded_state(self, path: str) -> None:
        """(reference: core.py:387 save_sharded_state)"""
        self.collective_rpc("save_sharded_state", (path,))

    def sleep(self, level: int = 1) -> None:
        self.collective_rpc("sleep", (level,))

    def wake_up(self, tags: Optional[list[str]] = None) -> None:
        self.collective_rpc("wake_up", (tags,))

    def profile(self, is_start: bool = True) -> None:
        self.collective_rpc("profile", (is_start,))

    def add_lora(self, lora_request) -> bool:
        return all(self.collective_rpc("add_lora", (lora_request,)))

    def remove_lora(self, lora_id: int) -> bool:
        return all(self.collective_rpc("remove_lora", (lora_id,)))

    def list_loras(self) -> set[int]:
        results = self.collective_rpc("list_loras")
        return results[0] if results else set()

    def pin_lora(self, lora_id: int) -> bool:
        return all(self.collective_rpc("pin_lora", (lora_id,)))

    def shutdown(self) -> None:
        self.executor.shutdown()
