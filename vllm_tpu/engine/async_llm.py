"""Asyncio serving engine (reference: vllm/v1/engine/async_llm.py:46).

Architecture: the blocking device-step loop runs on a dedicated engine
thread; asyncio callers enqueue adds/aborts through a thread-safe queue
and receive RequestOutputs through per-request collectors whose `put` is
marshalled onto the event loop with call_soon_threadsafe. (The reference
uses a ZMQ-separated EngineCoreProc; JAX dispatch releases the GIL during
device execution, so a thread gives the same overlap without IPC cost on
one host. The multi-host path adds the process split.)
"""

from __future__ import annotations

import asyncio
import logging
import queue as thread_queue
import threading
import time
from typing import Any, AsyncGenerator, Optional, Union

from vllm_tpu.config import EngineConfig
from vllm_tpu.engine import EngineCoreOutputs
from vllm_tpu.engine.core import EngineCore
from vllm_tpu.engine.llm_engine import build_tokenizer
from vllm_tpu.engine.output_processor import (OutputProcessor,
                                              RequestOutputCollector)
from vllm_tpu.engine.processor import Processor, PromptType
from vllm_tpu.metrics.loggers import LoggingStatLogger, PrometheusStatLogger
from vllm_tpu.metrics.stats import IterationStats, RequestStateStats
from vllm_tpu.outputs import RequestOutput
from vllm_tpu.sampling_params import (PoolingParams, RequestOutputKind,
                                      SamplingParams)

logger = logging.getLogger(__name__)


class EngineDeadError(RuntimeError):
    pass


class AsyncLLM:

    def __init__(self, engine_config: EngineConfig,
                 log_stats: bool = True) -> None:
        self.config = engine_config
        self.log_stats = log_stats
        self.tokenizer = build_tokenizer(engine_config.model_config)
        self.processor = Processor(engine_config, self.tokenizer)
        from vllm_tpu.tracing import init_tracer

        self.tracer = init_tracer(
            "vllm_tpu",
            engine_config.observability_config.otlp_traces_endpoint
            if engine_config.observability_config else None)
        self.output_processor = OutputProcessor(
            self.tokenizer, log_stats, tracer=self.tracer,
            model_name=engine_config.model_config.served_model_name)
        self.engine_core = EngineCore(engine_config, log_stats=log_stats)
        if self.engine_core.structured_output_manager is not None:
            self.engine_core.structured_output_manager.attach_tokenizer(
                self.tokenizer)

        self.stat_loggers = []
        if log_stats:
            self.stat_loggers = [
                PrometheusStatLogger(
                    engine_config.model_config.served_model_name),
                LoggingStatLogger(
                    engine_config.observability_config.log_stats_interval),
            ]
        self._req_stats: dict[str, RequestStateStats] = {}

        self.loop: Optional[asyncio.AbstractEventLoop] = None
        self._ops: thread_queue.Queue = thread_queue.Queue()
        self._wakeup = threading.Event()
        self._shutdown = threading.Event()
        self._errored: Optional[BaseException] = None
        self._lock = threading.Lock()
        self._thread = threading.Thread(target=self._engine_loop,
                                        name="engine-core", daemon=True)
        self._thread.start()

    @classmethod
    def from_engine_args(cls, engine_args) -> "AsyncLLM":
        return cls(engine_args.create_engine_config())

    @classmethod
    def from_vllm_config(cls, config: EngineConfig, **kw) -> "AsyncLLM":
        return cls(config)

    # --------------------------------------------------------- engine thread

    def _engine_loop(self) -> None:
        try:
            while not self._shutdown.is_set():
                self._drain_ops()
                if not self.engine_core.has_unfinished_requests():
                    self._wakeup.wait(timeout=0.05)
                    self._wakeup.clear()
                    continue
                outputs_by_client = self.engine_core.step()
                self._handle_outputs(outputs_by_client)
        except BaseException as e:  # noqa: BLE001 — engine death propagates
            logger.exception("engine core died")
            self._errored = e
            with self._lock:
                for state in self.output_processor.request_states.values():
                    if state.queue is not None and self.loop is not None:
                        self.loop.call_soon_threadsafe(
                            state.queue.put, EngineDeadError(str(e)))

    def _drain_ops(self) -> None:
        while True:
            try:
                op, payload = self._ops.get_nowait()
            except thread_queue.Empty:
                return
            if op == "add":
                self.engine_core.add_request(payload)
            elif op == "abort":
                self.engine_core.abort_requests(payload)

    def _handle_outputs(self, outputs_by_client: dict[int,
                                                      EngineCoreOutputs]
                        ) -> None:
        iteration_stats = IterationStats() if self.log_stats else None
        for ec in outputs_by_client.values():
            with self._lock:
                if iteration_stats is not None:
                    for out in ec.outputs:
                        rs = self._req_stats.get(out.request_id)
                        if rs is None:
                            continue
                        state = self.output_processor.request_states.get(
                            out.request_id)
                        iteration_stats.update_from_output(
                            out, rs.first_token_time == 0.0, rs)
                        if out.finished and state is not None:
                            iteration_stats.update_from_finished(
                                out, len(state.prompt_token_ids), rs,
                                state.sampling_params)
                            self._req_stats.pop(out.request_id, None)
                result = self.output_processor.process_outputs(ec.outputs)
            if result.reqs_to_abort:
                self.engine_core.abort_requests(result.reqs_to_abort)
            for logger_ in self.stat_loggers:
                logger_.record(ec.scheduler_stats, iteration_stats)

    # ------------------------------------------------------------ public API

    async def generate(
        self,
        prompt: PromptType,
        sampling_params: SamplingParams,
        request_id: str,
        lora_request: Optional[Any] = None,
        priority: int = 0,
    ) -> AsyncGenerator[RequestOutput, None]:
        if self._errored is not None:
            raise EngineDeadError(str(self._errored))
        self.loop = asyncio.get_running_loop()

        request = self.processor.process_inputs(request_id, prompt,
                                                sampling_params,
                                                time.monotonic(),
                                                lora_request, priority)
        queue = RequestOutputCollector(
            aggregate=sampling_params.output_kind ==
            RequestOutputKind.DELTA)
        # The engine thread calls queue.put; marshal it onto the event loop
        # (asyncio.Event is not thread-safe).
        loop = self.loop
        orig_put = queue.put
        queue.put = lambda out: loop.call_soon_threadsafe(orig_put, out)
        prompt_text = prompt if isinstance(prompt, str) else (
            prompt.get("prompt") if isinstance(prompt, dict) else None)
        with self._lock:
            self.output_processor.add_request(request, prompt_text, queue)
            if self.log_stats:
                self._req_stats[request_id] = RequestStateStats(
                    arrival_time=time.monotonic())
        self._ops.put(("add", request))
        self._wakeup.set()

        try:
            while True:
                out = await queue.get()
                yield out
                if out.finished:
                    return
        except (asyncio.CancelledError, GeneratorExit):
            await self.abort(request_id)
            raise

    async def encode(
        self,
        prompt: PromptType,
        pooling_params,
        request_id: str,
        lora_request: Optional[Any] = None,
        priority: int = 0,
    ):
        """Pooling pass (reference: AsyncLLM.encode); yields one final
        PoolingRequestOutput."""
        if self._errored is not None:
            raise EngineDeadError(str(self._errored))
        self.loop = asyncio.get_running_loop()
        request = self.processor.process_inputs(request_id, prompt,
                                                pooling_params,
                                                time.monotonic(),
                                                lora_request, priority)
        queue = RequestOutputCollector(aggregate=False)
        loop = self.loop
        orig_put = queue.put
        queue.put = lambda out: loop.call_soon_threadsafe(orig_put, out)
        prompt_text = prompt if isinstance(prompt, str) else (
            prompt.get("prompt") if isinstance(prompt, dict) else None)
        with self._lock:
            self.output_processor.add_request(request, prompt_text, queue)
        self._ops.put(("add", request))
        self._wakeup.set()
        try:
            while True:
                out = await queue.get()
                yield out
                if out.finished:
                    return
        except (asyncio.CancelledError, GeneratorExit):
            await self.abort(request_id)
            raise

    async def abort(self, request_id: Union[str, list[str]]) -> None:
        ids = [request_id] if isinstance(request_id, str) else request_id
        with self._lock:
            self.output_processor.abort_requests(ids)
        self._ops.put(("abort", ids))
        self._wakeup.set()

    # admin verbs ------------------------------------------------------------

    async def get_model_config(self):
        return self.config.model_config

    async def get_tokenizer(self):
        return self.tokenizer

    def is_running(self) -> bool:
        return self._errored is None and self._thread.is_alive()

    @property
    def errored(self) -> bool:
        return self._errored is not None

    async def reset_prefix_cache(self) -> bool:
        return self.engine_core.reset_prefix_cache()

    async def sleep(self, level: int = 1) -> None:
        self.engine_core.sleep(level)

    async def wake_up(self, tags: Optional[list[str]] = None) -> None:
        self.engine_core.wake_up(tags)

    async def is_sleeping(self) -> bool:
        return not self.engine_core.executor.worker.runner.kv_caches

    async def add_lora(self, lora_request) -> bool:
        return self.engine_core.add_lora(lora_request)

    async def remove_lora(self, lora_id: int) -> bool:
        return self.engine_core.remove_lora(lora_id)

    async def list_loras(self) -> set[int]:
        return self.engine_core.list_loras()

    async def start_profile(self) -> None:
        self.engine_core.profile(True)

    async def stop_profile(self) -> None:
        self.engine_core.profile(False)

    async def check_health(self) -> None:
        if self._errored is not None:
            raise EngineDeadError(str(self._errored))

    def shutdown(self) -> None:
        self._shutdown.set()
        self._wakeup.set()
        if self._thread.is_alive():
            self._thread.join(timeout=5)
        self.engine_core.shutdown()
