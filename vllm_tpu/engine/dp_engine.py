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

    def assign(self, request_id: str) -> int:
        rank = min(range(self.num_ranks), key=lambda r: self.in_flight[r])
        self.in_flight[rank] += 1
        self.req_rank[request_id] = rank
        return rank

    def finished(self, request_id: str) -> None:
        rank = self.req_rank.pop(request_id, None)
        if rank is not None:
            self.in_flight[rank] = max(self.in_flight[rank] - 1, 0)

    def rank_of(self, request_id: str) -> Optional[int]:
        return self.req_rank.get(request_id)


class DPLLMEngine:
    """Synchronous facade over N replicated engine cores (data parallel
    serving; reference: DP engine replication, SURVEY §2.6 DP row).

    in_process=True runs the replicas as in-process EngineCores (CPU
    test topology); otherwise each replica is an EngineCoreProc in its
    own process talking over ZMQ."""

    def __init__(self, engine_config: EngineConfig, dp_size: int,
                 in_process: bool = False) -> None:
        self.config = engine_config
        self.dp_size = dp_size
        self.router = DPEngineRouter(dp_size)
        self.in_process = in_process
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
        """One wave: step every rank with unfinished work; merge outputs
        (reference: DP wave lockstep, coordinator.py)."""
        merged: dict[int, EngineCoreOutputs] = {}
        for rank, core in enumerate(self.cores):
            if self.in_process:
                if not core.has_unfinished_requests():
                    continue
                outs = core.step()
            else:
                outs = core.poll_output() or {}
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
        if self.in_process:
            return any(c.has_unfinished_requests() for c in self.cores)
        return bool(self.router.req_rank)

    def shutdown(self) -> None:
        for core in self.cores:
            core.shutdown()

    @property
    def load(self) -> list[int]:
        return list(self.router.in_flight)
