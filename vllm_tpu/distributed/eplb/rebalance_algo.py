"""Expert-parallel load-balancer placement algorithm (EPLB).

Device-free (pure numpy) re-derivation of the reference's expert
rebalancing (reference: vllm/distributed/eplb/rebalance_algo.py —
balanced packing + heaviest-expert replication, hierarchical over
nodes when the routing groups divide evenly).

Given the observed per-logical-expert load, produce a placement of
``num_physical_experts`` physical slots (>= num logical experts; the
surplus slots hold REPLICAS of the hottest experts) such that the load
is balanced across EP ranks. Outputs:

- ``phy2log [L, P]``  — logical expert id held by each physical slot
- ``phy_rank [L, P]`` — replica index of that slot among its logical
  expert's replicas
- ``logcnt [L, E]``   — replica count per logical expert

All arrays are per-layer (leading L axis) because MoE load skew is
layer-dependent.
"""

from __future__ import annotations

import numpy as np


def balanced_packing(weight: np.ndarray,
                     num_packs: int) -> tuple[np.ndarray, np.ndarray]:
    """Pack n weighted items into ``num_packs`` packs of exactly
    n/num_packs items each, greedily minimising the maximum pack load
    (reference: rebalance_algo.py:19 balanced_packing).

    weight: [L, n]. Returns (pack_index [L, n], rank_in_pack [L, n]).
    """
    L, n = weight.shape
    if n % num_packs != 0:
        raise ValueError(f"{n} items not divisible by {num_packs} packs")
    per_pack = n // num_packs
    pack_index = np.full((L, n), -1, dtype=np.int64)
    rank_in_pack = np.full((L, n), -1, dtype=np.int64)
    if per_pack == 1:
        order = np.argsort(-weight, axis=-1, kind="stable")
        for layer in range(L):
            pack_index[layer, order[layer]] = np.arange(n)
        rank_in_pack[:] = 0
        return pack_index, rank_in_pack

    for layer in range(L):
        order = np.argsort(-weight[layer], kind="stable")
        loads = np.zeros(num_packs)
        counts = np.zeros(num_packs, dtype=np.int64)
        for item in order:
            # least-loaded pack that still has a free slot
            open_packs = np.flatnonzero(counts < per_pack)
            pack = open_packs[np.argmin(loads[open_packs])]
            pack_index[layer, item] = pack
            rank_in_pack[layer, item] = counts[pack]
            loads[pack] += weight[layer, item]
            counts[pack] += 1
    return pack_index, rank_in_pack


def replicate_experts(
        weight: np.ndarray,
        num_physical: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Assign ``num_physical - E`` redundant slots to the experts with
    the highest load-per-replica (reference: rebalance_algo.py:73
    replicate_experts).

    weight: [L, E]. Returns (phy2log [L, P], phy_rank [L, P],
    logcnt [L, E]).
    """
    L, E = weight.shape
    if num_physical < E:
        raise ValueError(f"{num_physical} physical slots < {E} experts")
    phy2log = np.tile(np.arange(E, dtype=np.int64), (L, 1))
    phy2log = np.concatenate(
        [phy2log,
         np.zeros((L, num_physical - E), dtype=np.int64)], axis=1)
    phy_rank = np.zeros((L, num_physical), dtype=np.int64)
    logcnt = np.ones((L, E), dtype=np.int64)
    for slot in range(E, num_physical):
        # expert whose per-replica load is currently highest
        redundant = np.argmax(weight / logcnt, axis=-1)  # [L]
        rows = np.arange(L)
        phy2log[rows, slot] = redundant
        phy_rank[rows, slot] = logcnt[rows, redundant]
        logcnt[rows, redundant] += 1
    return phy2log, phy_rank, logcnt


def rebalance_experts_hierarchical(
        weight: np.ndarray, num_physical_experts: int, num_groups: int,
        num_nodes: int,
        num_ranks: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Hierarchical placement (reference: rebalance_algo.py:104): pack
    expert GROUPS onto nodes (keeps group-limited routing node-local so
    dispatch rides ICI, not DCN), replicate within each node, then pack
    physical slots onto that node's EP ranks."""
    L, num_logical = weight.shape
    group_size = num_logical // num_groups
    groups_per_node = num_groups // num_nodes
    ranks_per_node = num_ranks // num_nodes
    phy_per_node = num_physical_experts // num_nodes
    log_per_node = num_logical // num_nodes

    # Step 1: groups -> nodes
    group_load = weight.reshape(L, num_groups, group_size).sum(-1)
    g_pack, g_rank = balanced_packing(group_load, num_nodes)
    # logical expert -> position inside its node's local numbering
    group_of = np.arange(num_logical) // group_size  # [E]
    log2mlog = np.empty((L, num_logical), dtype=np.int64)  # node-local id
    mlog2log = np.empty((L, num_logical), dtype=np.int64)
    for layer in range(L):
        for g in range(num_groups):
            node = g_pack[layer, g]
            pos = g_rank[layer, g]
            base = node * log_per_node + pos * group_size
            ids = np.arange(g * group_size, (g + 1) * group_size)
            log2mlog[layer, ids] = base + np.arange(group_size)
            mlog2log[layer, base:base + group_size] = ids
    del group_of

    # Step 2: replicate within nodes
    mweight = np.take_along_axis(weight, mlog2log, axis=1)
    mweight = mweight.reshape(L * num_nodes, log_per_node)
    phy2mlog, phy_rank, mlogcnt = replicate_experts(mweight, phy_per_node)

    # Step 3: physical slots -> ranks within the node
    slot_load = np.take_along_axis(
        mweight / mlogcnt, phy2mlog, axis=1)
    r_pack, r_rank = balanced_packing(slot_load, ranks_per_node)
    phy_per_rank = phy_per_node // ranks_per_node
    packed = np.empty_like(phy2mlog)
    packed_rank = np.empty_like(phy_rank)
    for row in range(L * num_nodes):
        dest = r_pack[row] * phy_per_rank + r_rank[row]
        packed[row, dest] = phy2mlog[row]
        packed_rank[row, dest] = phy_rank[row]

    # stitch nodes back together into global physical/logical ids
    packed = packed.reshape(L, num_nodes, phy_per_node)
    packed_rank = packed_rank.reshape(L, num_nodes, phy_per_node)
    node_base = (np.arange(num_nodes) * log_per_node)[None, :, None]
    phy2mlog_g = (packed + node_base).reshape(L, num_physical_experts)
    phy2log = np.take_along_axis(mlog2log, phy2mlog_g, axis=1)
    phy_rank_g = packed_rank.reshape(L, num_physical_experts)
    logcnt = np.take_along_axis(
        mlogcnt.reshape(L, num_logical), log2mlog, axis=1)
    return phy2log, phy_rank_g, logcnt


def rebalance_experts(
        weight: np.ndarray, num_replicas: int, num_groups: int,
        num_nodes: int,
        num_ranks: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Entry point (reference: rebalance_algo.py:170 rebalance_experts).

    weight: [L, E] observed per-logical-expert load. Returns
    (phy2log [L, P], log2phy [L, E, max_cnt] padded with -1,
    logcnt [L, E]).
    """
    weight = np.asarray(weight, dtype=np.float64)
    L, num_logical = weight.shape
    if num_groups % num_nodes == 0 and num_logical % num_groups == 0 \
            and num_ranks % num_nodes == 0 \
            and num_replicas % num_nodes == 0 \
            and (num_replicas // num_nodes) % (num_ranks // num_nodes) == 0:
        phy2log, phy_rank, logcnt = rebalance_experts_hierarchical(
            weight, num_replicas, num_groups, num_nodes, num_ranks)
    else:
        phy2log, phy_rank, logcnt = rebalance_experts_hierarchical(
            weight, num_replicas, 1, 1, num_ranks)

    max_cnt = int(logcnt.max())
    log2phy = np.full((L, num_logical, max_cnt), -1, dtype=np.int64)
    for layer in range(L):
        for slot in range(num_replicas):
            log2phy[layer, phy2log[layer, slot],
                    phy_rank[layer, slot]] = slot
    return phy2log, log2phy, logcnt
