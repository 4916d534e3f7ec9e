"""Executor abstraction (reference: vllm/v1/executor/abstract.py:22).

JAX is single-controller: one process drives all local chips through one
jitted step, so "uniproc" covers single-host TP (the multiproc executor of
the reference exists to give each GPU a process — unnecessary here).
A multi-host executor broadcasts SchedulerOutput over ZMQ (engine/multihost).
"""

from __future__ import annotations

from typing import Any, Callable

from vllm_tpu.config import EngineConfig
from vllm_tpu.core.kv_cache_interface import KVCacheConfig, KVCacheSpec
from vllm_tpu.core.sched.output import ModelRunnerOutput, SchedulerOutput
from vllm_tpu.worker.worker import Worker


class Executor:

    @staticmethod
    def get_class(engine_config: EngineConfig) -> type["Executor"]:
        backend = engine_config.parallel_config.distributed_executor_backend
        if backend in ("uniproc", "auto"):
            return UniProcExecutor
        if backend == "multihost":
            from vllm_tpu.executor.multihost import MultiHostExecutor

            return MultiHostExecutor
        raise ValueError(f"unknown executor backend {backend!r}")

    def __init__(self, engine_config: EngineConfig) -> None:
        self.config = engine_config
        self._init_executor()

    def _init_executor(self) -> None:
        raise NotImplementedError

    # Engine-facing API
    def get_kv_cache_specs(self) -> dict[str, KVCacheSpec]:
        raise NotImplementedError

    def determine_available_memory(self) -> int:
        raise NotImplementedError

    def initialize_from_config(self, kv_cache_config: KVCacheConfig) -> None:
        raise NotImplementedError

    def execute_model(
            self, scheduler_output: SchedulerOutput) -> ModelRunnerOutput:
        raise NotImplementedError

    def collective_rpc(self, method: str, args: tuple = (),
                       kwargs: dict | None = None) -> list[Any]:
        raise NotImplementedError

    def check_health(self) -> None:
        pass

    def shutdown(self) -> None:
        pass


class UniProcExecutor(Executor):
    """Single process, all local devices via one mesh
    (reference analog: abstract.py:99 UniProcExecutor)."""

    def _init_executor(self) -> None:
        self.worker = Worker(self.config, rank=0)
        self.worker.init_device()
        self.worker.load_model()

    def get_kv_cache_specs(self) -> dict[str, KVCacheSpec]:
        return self.worker.get_kv_cache_specs()

    def shutdown(self) -> None:
        if getattr(self, "worker", None) is not None:
            self.worker.flush_kv_saves()

    def determine_available_memory(self) -> int:
        return self.worker.determine_available_memory()

    def initialize_from_config(self, kv_cache_config: KVCacheConfig) -> None:
        self.worker.initialize_from_config(kv_cache_config)
        self.worker.compile_or_warm_up_model()

    def execute_model(
            self, scheduler_output: SchedulerOutput) -> ModelRunnerOutput:
        return self.worker.execute_model(scheduler_output)

    def collective_rpc(self, method: str, args: tuple = (),
                       kwargs: dict | None = None) -> list[Any]:
        return [self.worker.apply_method(method, *args, **(kwargs or {}))]

    def check_health(self) -> None:
        self.worker.check_health()
