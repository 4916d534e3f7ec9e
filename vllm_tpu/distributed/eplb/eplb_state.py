"""EPLB runtime state: per-expert load statistics + rearrangement
trigger (reference: vllm/distributed/eplb/eplb_state.py — sliding-window
load accumulation, periodic rebalance).

TPU-native shape: the load signal is the per-step logical-expert token
count, computed in-graph by the MoE layer (a bincount over routing ids
— one tiny [L, E] i32 array per step, fetched alongside sampled
tokens). The state lives on the host; the placement mappings
(phy2log / log2phy / logcnt) are small device arrays consumed by the
redundancy-aware router in fused_moe.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from vllm_tpu.distributed.eplb.rebalance_algo import rebalance_experts


@dataclass
class EplbConfig:
    """(reference analog: ParallelConfig.eplb_config /
    EPLBConfig: window_size, step_interval, num_redundant_experts)."""
    window_size: int = 1000
    step_interval: int = 3000
    num_redundant_experts: int = 0
    log_balancedness: bool = False


@dataclass
class EplbState:
    """Tracks expert load and produces placements.

    ``num_physical = num_logical + num_redundant``; physical slots are
    laid out contiguously over EP ranks (rank r owns slots
    [r*P/R, (r+1)*P/R)).
    """
    num_layers: int
    num_logical: int
    config: EplbConfig = field(default_factory=EplbConfig)
    num_groups: int = 1
    num_nodes: int = 1
    num_ranks: int = 1

    def __post_init__(self) -> None:
        P = self.num_physical
        L, E = self.num_layers, self.num_logical
        if P % self.num_ranks != 0:
            raise ValueError(
                f"{P} physical experts not divisible by {self.num_ranks} "
                "EP ranks; adjust num_redundant_experts")
        # identity placement to start
        base = np.tile(np.arange(E, dtype=np.int64), (L, 1))
        extra = np.tile(np.arange(P - E, dtype=np.int64) % E, (L, 1))
        self.phy2log = np.concatenate([base, extra], axis=1)
        self.logcnt = np.ones((L, E), dtype=np.int64)
        for layer in range(L):
            for slot in range(E, P):
                self.logcnt[layer, self.phy2log[layer, slot]] += 1
        max_cnt = int(self.logcnt.max())
        self.log2phy = np.full((L, E, max_cnt), -1, dtype=np.int64)
        cnt = np.zeros((L, E), dtype=np.int64)
        for layer in range(L):
            for slot in range(P):
                e = self.phy2log[layer, slot]
                self.log2phy[layer, e, cnt[layer, e]] = slot
                cnt[layer, e] += 1
        self._window: list[np.ndarray] = []
        self._steps_since_rearrange = 0
        self.num_rearrangements = 0

    @property
    def num_physical(self) -> int:
        return self.num_logical + self.config.num_redundant_experts

    def record_load(self, expert_counts: np.ndarray) -> None:
        """Accumulate one step's per-LOGICAL-expert token counts
        ([L, E] — physical replica counts must be pre-combined by the
        caller via phy2log)."""
        counts = np.asarray(expert_counts)
        if counts.shape != (self.num_layers, self.num_logical):
            raise ValueError(
                f"expected [{self.num_layers}, {self.num_logical}] "
                f"counts, got {counts.shape}")
        self._window.append(counts.astype(np.float64))
        if len(self._window) > self.config.window_size:
            self._window.pop(0)
        self._steps_since_rearrange += 1

    def combine_physical_counts(self, phys_counts: np.ndarray) -> np.ndarray:
        """[L, P] physical-slot counts -> [L, E] logical counts."""
        L = self.num_layers
        out = np.zeros((L, self.num_logical), dtype=np.float64)
        for layer in range(L):
            np.add.at(out[layer], self.phy2log[layer], phys_counts[layer])
        return out

    def should_rearrange(self) -> bool:
        return (self._steps_since_rearrange >= self.config.step_interval
                and len(self._window) > 0)

    def window_load(self) -> np.ndarray:
        if not self._window:
            return np.ones((self.num_layers, self.num_logical))
        return np.sum(self._window, axis=0)

    def balancedness(self) -> float:
        """mean over layers of (avg load / max load) per EP rank —
        1.0 is perfectly balanced (reference: eplb_state.py
        balancedness logging)."""
        load = self.window_load()  # [L, E] logical
        per_slot = np.take_along_axis(
            load / np.maximum(self.logcnt, 1), self.phy2log, axis=1)
        per_rank = per_slot.reshape(self.num_layers, self.num_ranks,
                                    -1).sum(-1)
        mx = per_rank.max(-1)
        return float(np.mean(np.where(mx > 0, per_rank.mean(-1) /
                                      np.maximum(mx, 1e-9), 1.0)))

    def rearrange(self) -> np.ndarray:
        """Compute a new placement from the windowed load. Returns the
        per-layer SOURCE-slot permutation ``perm [L, P]`` such that the
        new physical slot p must be filled with the weights currently
        held at old physical slot perm[l, p] (feed to
        rebalance_execute.permute_expert_weights)."""
        load = self.window_load()
        phy2log, log2phy, logcnt = rebalance_experts(
            load, self.num_physical, self.num_groups, self.num_nodes,
            self.num_ranks)
        # old slot holding each logical expert (first replica is fine —
        # replicas are identical)
        first_old = np.full((self.num_layers, self.num_logical), -1,
                            dtype=np.int64)
        for layer in range(self.num_layers):
            for slot in range(self.num_physical - 1, -1, -1):
                first_old[layer, self.phy2log[layer, slot]] = slot
        perm = np.take_along_axis(first_old, phy2log, axis=1)
        self.phy2log, self.log2phy, self.logcnt = phy2log, log2phy, logcnt
        self._steps_since_rearrange = 0
        self._window.clear()
        self.num_rearrangements += 1
        return perm

    def physical_routing_tables(self) -> tuple[np.ndarray, np.ndarray]:
        """(log2phy [L, E, max_cnt] with -1 slots backfilled by replica
        0, logcnt [L, E]) — device-uploadable routing tables for
        map_to_physical."""
        l2p = self.log2phy.copy()
        first = l2p[..., :1]
        return np.where(l2p < 0, first, l2p), self.logcnt.copy()
