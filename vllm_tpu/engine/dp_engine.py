"""Data-parallel engine replication with load-balanced dispatch
(reference behavior parity: vllm/v1/engine/coordinator.py DPCoordinator +
core_client.py DPLBAsyncMPClient — replicated engine cores, requests
routed to the least-loaded rank, per-rank waves).

TPU-native shape: each DP rank is an EngineCoreProc (own process, own
device context via JAX) or an in-process EngineCore for single-host test
topologies; the router keeps per-rank in-flight counts (the reference's
load stats) and assigns new requests to the emptiest rank."""

from __future__ import annotations

import logging
import time
from typing import Any, Optional

from vllm_tpu.config import EngineConfig
from vllm_tpu.engine import EngineCoreOutputs, EngineCoreRequest

logger = logging.getLogger(__name__)


class DPEngineRouter:
    """Least-loaded request router over N engine replicas
    (reference: DPLBAsyncMPClient.get_core_engine_for_request)."""

    def __init__(self, num_ranks: int) -> None:
        self.num_ranks = num_ranks
        self.in_flight = [0] * num_ranks
        self.req_rank: dict[str, int] = {}

    def assign(self, request_id: str,
               reported_load: Optional[list[int]] = None) -> int:
        """Least-loaded rank; `reported_load` (coordinator scheduler
        stats) is added to the local in-flight guess when available
        (reference: DPLBAsyncMPClient routing off coordinator stats)."""
        def key(r: int) -> int:
            extra = reported_load[r] if reported_load else 0
            return self.in_flight[r] + extra

        rank = min(range(self.num_ranks), key=key)
        self.in_flight[rank] += 1
        self.req_rank[request_id] = rank
        return rank

    def finished(self, request_id: str) -> None:
        rank = self.req_rank.pop(request_id, None)
        if rank is not None and rank < self.num_ranks:
            self.in_flight[rank] = max(self.in_flight[rank] - 1, 0)

    def rank_of(self, request_id: str) -> Optional[int]:
        return self.req_rank.get(request_id)

    def resize(self, num_ranks: int) -> None:
        """Elastic scale (see DPCoordinator.resize). Shrinking assumes
        the dropped tail ranks have no in-flight requests."""
        if num_ranks > self.num_ranks:
            self.in_flight.extend([0] * (num_ranks - self.num_ranks))
        else:
            self.in_flight = self.in_flight[:num_ranks]
        self.num_ranks = num_ranks

    def rank_in_flight(self, rank: int) -> int:
        return self.in_flight[rank] if rank < self.num_ranks else 0


class DPLLMEngine:
    """Synchronous facade over N replicated engine cores (data parallel
    serving; reference: DP engine replication, SURVEY §2.6 DP row).

    in_process=True runs the replicas as in-process EngineCores (CPU
    test topology); otherwise each replica is an EngineCoreProc in its
    own process talking over ZMQ."""

    def __init__(self, engine_config: EngineConfig, dp_size: int,
                 in_process: bool = False) -> None:
        from vllm_tpu.engine.coordinator import DPCoordinator

        self.config = engine_config
        self.dp_size = dp_size
        self.router = DPEngineRouter(dp_size)
        self.coordinator = DPCoordinator(dp_size)
        self.in_process = in_process
        # outputs produced while scale_elastic_ep drains victim ranks;
        # surfaced by the next step() so nothing is lost
        self._stashed: list[dict[int, EngineCoreOutputs]] = []
        self.cores: list[Any] = []
        if in_process:
            from vllm_tpu.engine.core import EngineCore

            self.cores = [EngineCore(engine_config)
                          for _ in range(dp_size)]
        else:
            from vllm_tpu.engine.core_proc import SyncMPClient

            self.cores = [SyncMPClient(engine_config)
                          for _ in range(dp_size)]

    # ------------------------------------------------------------- verbs

    def add_request(self, request: EngineCoreRequest) -> int:
        rank = self.router.assign(request.request_id)
        self.cores[rank].add_request(request)
        return rank

    def abort_requests(self, request_ids: list[str]) -> None:
        by_rank: dict[int, list[str]] = {}
        for rid in request_ids:
            rank = self.router.rank_of(rid)
            if rank is not None:
                by_rank.setdefault(rank, []).append(rid)
                self.router.finished(rid)
        for rank, rids in by_rank.items():
            self.cores[rank].abort_requests(rids)

    def step(self) -> dict[int, EngineCoreOutputs]:
        """One wave tick: while ANY rank is busy, EVERY rank steps —
        idle ranks run an empty step that still drains their async
        pipeline and refreshes their stats (reference: DP wave
        lockstep + idle-rank dummy batches, coordinator.py:21,
        core.py:874; here each replica owns its own jit program so the
        empty step is cheap and never runs the device)."""
        merged: dict[int, EngineCoreOutputs] = {}
        for outs in self._stashed:
            for client_idx, eco in outs.items():
                if client_idx in merged:
                    merged[client_idx].outputs.extend(eco.outputs)
                else:
                    merged[client_idx] = eco
        self._stashed = []
        inner = self._step_inner()
        for client_idx, eco in inner.items():
            if client_idx in merged:
                merged[client_idx].outputs.extend(eco.outputs)
            else:
                merged[client_idx] = eco
        return merged

    def _step_inner(self) -> dict[int, EngineCoreOutputs]:
        merged: dict[int, EngineCoreOutputs] = {}
        wave_active = any(
            c.has_unfinished_requests() for c in self.cores
        ) if self.in_process else bool(self.router.req_rank)
        for rank, core in enumerate(self.cores):
            if self.in_process:
                if not wave_active:
                    continue
                outs = core.step()
                sched = core.scheduler
                self.coordinator.report(
                    rank, len(sched.waiting), len(sched.running),
                    sched.kv_cache_manager.usage)
            else:
                outs = core.poll_output() or {}
                stats = None
                for eco in outs.values():
                    stats = eco.scheduler_stats or stats
                if stats is not None:
                    self.coordinator.report(
                        rank, getattr(stats, "num_waiting_reqs", 0),
                        getattr(stats, "num_running_reqs", 0),
                        getattr(stats, "kv_cache_usage", 0.0))
            for client_idx, eco in outs.items():
                for out in eco.outputs:
                    if out.finish_reason is not None:
                        self.router.finished(out.request_id)
                if client_idx in merged:
                    merged[client_idx].outputs.extend(eco.outputs)
                else:
                    merged[client_idx] = eco
        return merged

    def has_unfinished_requests(self) -> bool:
        if self._stashed:
            return True  # drained-but-unread outputs from a scale-down
        if self.in_process:
            return any(c.has_unfinished_requests() for c in self.cores)
        return bool(self.router.req_rank)

    def scale_elastic_ep(self, new_dp_size: int,
                         drain_timeout_s: float = 120.0) -> int:
        """Elastic scale of the DP replica pool at runtime (reference:
        CoreEngineActorManager.scale_up_elastic_ep / scale_down,
        v1/engine/utils.py:438,533; API /scale_elastic_ep
        api_server.py:1033).

        TPU-native shape: each replica owns a full expert set inside its
        own mesh (EP is sharded WITHIN a replica's devices), so scaling
        the replica pool needs no cross-replica expert-weight
        reshuffling — scale-up spawns fresh engine cores, scale-down
        stops routing to the victim tail ranks, drains their in-flight
        requests, then shuts them down."""
        if new_dp_size < 1:
            raise ValueError(f"dp_size must be >= 1, got {new_dp_size}")
        if new_dp_size == self.dp_size:
            return self.dp_size
        if new_dp_size > self.dp_size:
            n_new = new_dp_size - self.dp_size
            if self.in_process:
                from vllm_tpu.engine.core import EngineCore

                self.cores.extend(EngineCore(self.config)
                                  for _ in range(n_new))
            else:
                from vllm_tpu.engine.core_proc import SyncMPClient

                self.cores.extend(SyncMPClient(self.config)
                                  for _ in range(n_new))
            self.router.resize(new_dp_size)
            self.coordinator.resize(new_dp_size)
            self.dp_size = new_dp_size
            logger.info("elastic EP: scaled up to %d replicas",
                        new_dp_size)
            return self.dp_size
        # scale down: stop routing to the tail, drain, then retire
        victims = list(range(new_dp_size, self.dp_size))
        self.router.resize(new_dp_size)  # new requests avoid victims
        deadline = time.monotonic() + drain_timeout_s
        while any(r >= new_dp_size for r in self.router.req_rank.values()):
            if time.monotonic() > deadline:
                raise TimeoutError(
                    "elastic EP scale-down: victim ranks did not drain "
                    f"within {drain_timeout_s}s")
            outs = self._step_inner()
            if outs:
                self._stashed.append(outs)
        for rank in victims[::-1]:
            self.cores[rank].shutdown()
            del self.cores[rank]
        self.coordinator.resize(new_dp_size)
        self.dp_size = new_dp_size
        logger.info("elastic EP: scaled down to %d replicas",
                    new_dp_size)
        return self.dp_size

    def shutdown(self) -> None:
        for core in self.cores:
            core.shutdown()
        self.coordinator.shutdown()

    @property
    def load(self) -> list[int]:
        return list(self.router.in_flight)


class DPAsyncMPClient:
    """Async DP-LB client over N EngineCoreProc replicas (reference:
    core_client.py:1057 DPLBAsyncMPClient): per-rank AsyncMPClient,
    least-loaded routing off the coordinator's scheduler stats (freshest
    per-rank waiting/running counts from each rank's own output stream)
    plus the local in-flight guess, and a fan-in output stream."""

    def __init__(self, engine_config: EngineConfig, dp_size: int) -> None:
        from vllm_tpu.engine.coordinator import DPCoordinator
        from vllm_tpu.engine.core_proc import AsyncMPClient

        self.dp_size = dp_size
        self.router = DPEngineRouter(dp_size)
        self.coordinator = DPCoordinator(dp_size)
        self.cores = [AsyncMPClient(engine_config)
                      for _ in range(dp_size)]

    async def add_request_async(self, request: EngineCoreRequest) -> int:
        snap = self.coordinator.snapshot()
        rank = self.router.assign(request.request_id, snap["load"])
        await self.cores[rank].add_request_async(request)
        return rank

    async def abort_requests_async(self, request_ids: list[str]) -> None:
        by_rank: dict[int, list[str]] = {}
        for rid in request_ids:
            rank = self.router.rank_of(rid)
            if rank is not None:
                by_rank.setdefault(rank, []).append(rid)
                self.router.finished(rid)
        for rank, rids in by_rank.items():
            await self.cores[rank].abort_requests_async(rids)

    async def get_output_async(self, timeout: Optional[float] = None
                               ) -> dict[int, EngineCoreOutputs]:
        """Merge whatever any replica has ready (poll round-robin with a
        short executor-parked wait on the first)."""
        import asyncio

        merged: dict[int, EngineCoreOutputs] = {}

        def drain_into(rank: int, outs) -> None:
            stats = None
            for client_idx, eco in (outs or {}).items():
                stats = eco.scheduler_stats or stats
                for out in eco.outputs:
                    if out.finish_reason is not None:
                        self.router.finished(out.request_id)
                if client_idx in merged:
                    merged[client_idx].outputs.extend(eco.outputs)
                else:
                    merged[client_idx] = eco
            if stats is not None:
                self.coordinator.report(rank, stats.num_waiting_reqs,
                                        stats.num_running_reqs,
                                        stats.kv_cache_usage)

        for rank, core in enumerate(self.cores):
            drain_into(rank, core.poll_output())
        if merged:
            return merged
        # nothing ready: park on each replica briefly until one speaks
        per = (timeout / self.dp_size) if timeout else 0.1
        for _ in range(200 if timeout is None else 1):
            for rank, core in enumerate(self.cores):
                try:
                    outs = await self.cores[rank].get_output_async(
                        timeout=per)
                except Exception:
                    outs = None
                drain_into(rank, outs)
                if merged:
                    return merged
            await asyncio.sleep(0)
        return merged

    def has_unfinished_requests(self) -> bool:
        return bool(self.router.req_rank)

    async def scale_elastic_ep_async(self, new_dp_size: int,
                                     drain_timeout_s: float = 120.0
                                     ) -> int:
        """Async elastic scale of the replica pool (see
        DPLLMEngine.scale_elastic_ep for the design; reference API
        /scale_elastic_ep api_server.py:1033)."""
        import asyncio

        if new_dp_size < 1:
            raise ValueError(f"dp_size must be >= 1, got {new_dp_size}")
        if new_dp_size == self.dp_size:
            return self.dp_size
        if new_dp_size > self.dp_size:
            from vllm_tpu.engine.core_proc import AsyncMPClient

            loop = asyncio.get_running_loop()
            n_new = new_dp_size - self.dp_size
            new_cores = await asyncio.gather(*[
                loop.run_in_executor(None, AsyncMPClient, self.config)
                for _ in range(n_new)
            ])
            self.cores.extend(new_cores)
            self.router.resize(new_dp_size)
            self.coordinator.resize(new_dp_size)
            self.dp_size = new_dp_size
            return self.dp_size
        victims = list(range(new_dp_size, self.dp_size))
        self.router.resize(new_dp_size)
        deadline = time.monotonic() + drain_timeout_s
        while any(r >= new_dp_size
                  for r in self.router.req_rank.values()):
            if time.monotonic() > deadline:
                raise TimeoutError(
                    "elastic EP scale-down: victim ranks did not drain "
                    f"within {drain_timeout_s}s")
            await self.get_output_async(timeout=1.0)
        for rank in victims[::-1]:
            self.cores[rank].shutdown()
            del self.cores[rank]
        self.coordinator.resize(new_dp_size)
        self.dp_size = new_dp_size
        return self.dp_size

    @property
    def load(self) -> list[int]:
        return list(self.router.in_flight)

    def shutdown(self) -> None:
        for core in self.cores:
            core.shutdown()
        self.coordinator.shutdown()
