"""Apply an EPLB placement to expert weight stacks (reference:
vllm/distributed/eplb/rebalance_execute.py — there, P2P send/recv
shuffles between GPU ranks; here, a sharded gather).

TPU-native shape: expert weights live as stacked ``[P, ...]`` arrays
whose leading axis is sharded over the EP mesh axes. Rearrangement is
``w[perm]`` under the SAME sharding — XLA lowers the cross-shard rows
to collective-permute / all-gather traffic on ICI, which is exactly
the reference's weight shuffle without hand-written P2P plumbing. The
gather is jitted with donation so the old buffers are reused.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, donate_argnums=(0,))
def _permute(stack: jnp.ndarray, perm: jnp.ndarray) -> jnp.ndarray:
    if stack.ndim == perm.ndim:  # unstacked layer axis: perm [P]
        return jnp.take(stack, perm, axis=0)
    # layered stacks [L, P, ...] with per-layer perm [L, P]
    return jnp.take_along_axis(
        stack, perm.reshape(perm.shape + (1,) * (stack.ndim - 2)), axis=1)


def permute_expert_weights(expert_stacks, perm: np.ndarray):
    """Apply a source-slot permutation to every expert-stacked array in
    a pytree.

    expert_stacks: pytree of [L, P, ...] (or [P, ...] with a 1-layer
    perm) arrays. perm: [L, P] int — new slot p takes the weights from
    old slot perm[l, p]. Returns the permuted pytree; shardings are
    preserved (donated in-place where XLA can alias).
    """
    perm_dev = jnp.asarray(perm)

    def apply(w):
        if w.ndim >= 2 and w.shape[0] == perm.shape[0] \
                and w.shape[1] == perm.shape[1]:
            return _permute(w, perm_dev)
        if w.ndim >= 1 and perm.shape[0] == 1 \
                and w.shape[0] == perm.shape[1]:
            return _permute(w, perm_dev[0])
        raise ValueError(
            f"stack shape {w.shape} does not match perm {perm.shape}")

    return jax.tree.map(apply, expert_stacks)


def expand_to_physical(expert_stacks, phy2log: np.ndarray):
    """Materialise the physical expert stacks from LOGICAL weight stacks
    at startup: [L, E, ...] -> [L, P, ...] with replica slots filled per
    the placement (subsequent rearrangements use
    permute_expert_weights, which moves physical slots directly)."""
    p2l = jnp.asarray(phy2log)

    def apply(w):
        return jnp.take_along_axis(
            w, p2l.reshape(p2l.shape + (1,) * (w.ndim - 2)), axis=1)

    return jax.tree.map(apply, expert_stacks)


def map_to_physical(expert_ids: jnp.ndarray, token_idx: jnp.ndarray,
                    log2phy: jnp.ndarray,
                    logcnt: jnp.ndarray,
                    layer: int | jnp.ndarray = 0) -> jnp.ndarray:
    """Redundancy-aware routing: logical expert ids -> physical slots,
    spreading tokens round-robin over an expert's replicas (reference:
    eplb_state.py physical routing via token-index modulo).

    expert_ids: [T, K] logical. token_idx: [T] i32. log2phy:
    [L, E, max_cnt] (no -1 entries; see physical_routing_tables).
    logcnt: [L, E]. Returns [T, K] physical slot ids.
    """
    l2p = log2phy[layer]  # [E, max_cnt]
    cnt = logcnt[layer]  # [E]
    replica = jnp.mod(token_idx[:, None].astype(jnp.int32),
                      cnt[expert_ids].astype(jnp.int32))
    return l2p[expert_ids, replica].astype(jnp.int32)
