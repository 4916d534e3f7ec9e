"""Multi-host executor: driver broadcasts every executor verb to follower
hosts so all processes issue identical device programs
(reference: vllm/v1/executor/multiproc_executor.py:42 MultiprocExecutor —
there the broadcast is a shared-memory MessageQueue to per-GPU worker
processes; here it is ZMQ to per-HOST controller processes, and the
device fan-out within a host is XLA SPMD over the global mesh).

Correctness rule of multi-controller JAX: every process must launch the
same cross-process computations in the same order. The driver therefore
broadcasts a verb BEFORE running it locally, and followers replay verbs
in receive order. Host-side state (InputBatch, pending async steps) stays
identical everywhere because it is a deterministic function of the verb
stream; followers fetch their locally-addressable replica of sampled
tokens, so no token values ever cross the wire.
"""

from __future__ import annotations

import logging
from typing import Any

from vllm_tpu.core.kv_cache_interface import KVCacheConfig, KVCacheSpec
from vllm_tpu.core.sched.output import ModelRunnerOutput, SchedulerOutput
from vllm_tpu.distributed.multihost import (DriverBus, FollowerBus,
                                            maybe_init_multihost)
from vllm_tpu.executor.abstract import Executor
from vllm_tpu.worker.worker import Worker

logger = logging.getLogger(__name__)


class MultiHostExecutor(Executor):
    """Driver-side (host 0) executor for a multi-host engine."""

    def _init_executor(self) -> None:
        pc = self.config.parallel_config
        self.info = maybe_init_multihost(pc)
        if self.info is None or not self.info.is_driver:
            raise ValueError(
                "MultiHostExecutor runs on host 0 of a >1-host topology; "
                "follower hosts run vllm_tpu.executor.multihost."
                "run_follower (vllm-tpu serve --headless)")
        # Worker first: model load issues global-mesh computations that
        # followers issue symmetrically during their own startup.
        self.worker = Worker(self.config, rank=0)
        self.worker.init_device()
        self.worker.load_model()
        self.bus = DriverBus(self.info)

    def get_kv_cache_specs(self) -> dict[str, KVCacheSpec]:
        return self.worker.get_kv_cache_specs()

    def determine_available_memory(self) -> int:
        self.bus.broadcast("determine_available_memory")
        local = self.worker.determine_available_memory()
        # KV sizing must fit the tightest host.
        return min([local] + self.bus.gather())

    def initialize_from_config(self, kv_cache_config: KVCacheConfig) -> None:
        self.bus.broadcast("initialize_from_config", kv_cache_config)
        self.worker.initialize_from_config(kv_cache_config)
        self.worker.compile_or_warm_up_model()
        # Barrier: serving must not start before every host finished
        # bucket precompilation.
        self.bus.broadcast("barrier")
        self.bus.gather()

    def execute_model(
            self, scheduler_output: SchedulerOutput) -> ModelRunnerOutput:
        self.bus.broadcast("execute_model", scheduler_output)
        return self.worker.execute_model(scheduler_output)

    def collective_rpc(self, method: str, args: tuple = (),
                       kwargs: dict | None = None) -> list[Any]:
        self.bus.broadcast("rpc", (method, args, kwargs))
        return [self.worker.apply_method(method, *args, **(kwargs or {}))]

    def check_health(self) -> None:
        self.worker.check_health()

    def shutdown(self) -> None:
        bus = getattr(self, "bus", None)
        if bus is not None:
            try:
                bus.broadcast("shutdown")
            except Exception:
                pass
            bus.close()
            self.bus = None


def run_follower(engine_config) -> None:
    """Follower-host main loop: replay the driver's verb stream
    (reference analog: multiproc_executor.py:579 worker_busy_loop)."""
    pc = engine_config.parallel_config
    info = maybe_init_multihost(pc)
    assert info is not None and not info.is_driver
    worker = Worker(engine_config, rank=info.host_id)
    worker.init_device()
    worker.load_model()
    bus = FollowerBus(info)
    logger.info("follower host %d ready", info.host_id)
    try:
        while True:
            verb, payload = bus.recv()
            if verb == "shutdown":
                return
            if verb == "determine_available_memory":
                bus.reply(worker.determine_available_memory())
            elif verb == "initialize_from_config":
                worker.initialize_from_config(payload)
                worker.compile_or_warm_up_model()
            elif verb == "barrier":
                bus.reply("ok")
            elif verb == "execute_model":
                worker.execute_model(payload)
            elif verb == "rpc":
                method, args, kwargs = payload
                worker.apply_method(method, *args, **(kwargs or {}))
            else:
                raise ValueError(f"unknown verb {verb!r}")
    finally:
        bus.close()
