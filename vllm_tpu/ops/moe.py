"""Fused Mixture-of-Experts ops.

TPU-native answer to the reference's fused_moe stack (reference:
vllm/model_executor/layers/fused_moe/ — Triton fused_moe kernels,
moe_align_block_size, topk_softmax; design re-derived for XLA).

Approach: capacity-based dispatch (GShard-style). Instead of the GPU
pattern (sort tokens by expert + ragged grouped GEMM), tokens are
scattered into a dense [num_experts, capacity, H] buffer and all expert
FFNs run as one batched einsum — static shapes, MXU-friendly, and XLA
overlaps the gather/scatter with compute. Capacity is sized so overflow
(dropped tokens) is impossible at the chosen factor; with EP the expert
axis shards over the mesh and the scatter becomes an all-to-all inserted
by XLA.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vllm_tpu.ops.activation import GATED_ACTIVATIONS


def topk_routing(
    router_logits: jnp.ndarray,  # [T, E]
    top_k: int,
    renormalize: bool = True,
    scoring: str = "softmax",  # softmax | sigmoid
    e_score_bias: Optional[jnp.ndarray] = None,  # [E] (deepseek v3)
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (weights [T, K] f32, expert_ids [T, K] i32)
    (reference analog: csrc/moe topk_softmax)."""
    if scoring == "sigmoid":
        scores = jax.nn.sigmoid(router_logits.astype(jnp.float32))
    else:
        scores = jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1)
    select = scores if e_score_bias is None else scores + e_score_bias
    _, expert_ids = jax.lax.top_k(select, top_k)
    weights = jnp.take_along_axis(scores, expert_ids, axis=-1)
    if renormalize:
        weights = weights / jnp.maximum(
            jnp.sum(weights, axis=-1, keepdims=True), 1e-9)
    return weights, expert_ids.astype(jnp.int32)


def fused_moe(
    x: jnp.ndarray,  # [T, H]
    w_gate_up: jnp.ndarray,  # [E, H, 2*I] (fused gate+up per expert)
    w_down: jnp.ndarray,  # [E, I, H]
    router_weights: jnp.ndarray,  # [T, K]
    expert_ids: jnp.ndarray,  # [T, K]
    act: str = "silu",
    capacity_factor: float = 0.0,  # kept for API compat; unused
    scale_inputs: bool = False,  # Llama-4: weight the expert INPUT
) -> jnp.ndarray:
    """Dropless MoE: sort token-expert assignments by expert, run the
    expert FFNs as ragged grouped GEMMs (``jax.lax.ragged_dot`` — XLA's
    native megablocks-style gmm on TPU), then unsort and combine.

    Static shapes throughout ([T*K] rows regardless of routing skew), no
    capacity drops, and the MXU sees two tall ragged matmuls per layer
    (reference GPU analog: fused_moe.py moe_align_block_size + grouped
    GEMM).
    """
    T, H = x.shape
    E = w_gate_up.shape[0]
    K = expert_ids.shape[1]

    flat_expert = expert_ids.reshape(-1)  # [T*K]
    flat_weight = router_weights.reshape(-1)
    flat_token = jnp.repeat(jnp.arange(T, dtype=jnp.int32), K)

    order = jnp.argsort(flat_expert)  # stable
    token_sorted = flat_token[order]
    x_sorted = x[token_sorted]  # [T*K, H]
    group_sizes = jnp.bincount(flat_expert, length=E).astype(jnp.int32)

    if scale_inputs:
        # out = expert(w * x), combine weight 1 (reference: llama4
        # Llama4TextMoe — nonlinear, so not equal to w * expert(x))
        x_sorted = x_sorted * flat_weight[order][:, None].astype(x.dtype)

    gate_up = jax.lax.ragged_dot(x_sorted, w_gate_up.astype(x.dtype),
                                 group_sizes)
    h = GATED_ACTIVATIONS[act](gate_up)
    out_sorted = jax.lax.ragged_dot(h, w_down.astype(x.dtype), group_sizes)

    weighted = out_sorted if scale_inputs else \
        out_sorted * flat_weight[order][:, None].astype(x.dtype)
    out = jnp.zeros((T, H), jnp.float32).at[token_sorted].add(
        weighted.astype(jnp.float32))
    return out.astype(x.dtype)


def fused_moe_ep(
    x: jnp.ndarray,  # [T, H]
    w_gate_up: jnp.ndarray,  # [E, H, 2*I], expert axis sharded over EP
    w_down: jnp.ndarray,  # [E, I, H]
    router_weights: jnp.ndarray,  # [T, K]
    expert_ids: jnp.ndarray,  # [T, K]
    act: str = "silu",
    mesh=None,
) -> jnp.ndarray:
    """Expert-parallel MoE: experts shard over the flattened ("dp","tp")
    axes (reference: EP = DP x TP, parallel_state.py:1092-1097; all2all
    dispatch in device_communicators/all2all.py).

    Each EP shard keeps only its resident experts' weights, computes its
    local share of the token-expert assignments (non-local assignments
    are zero-weighted), and the partial outputs psum over the EP axes —
    the XLA collective rides ICI. Memory scales 1/ep; the grouped GEMM
    rows are not yet redistributed (TODO: capacity-based all-to-all
    dispatch for compute scaling at high expert counts).
    """
    from jax.sharding import PartitionSpec as P

    from vllm_tpu.parallel.mesh import EP_AXES

    if mesh is None:
        return fused_moe(x, w_gate_up, w_down, router_weights, expert_ids,
                         act=act)
    ep_size = 1
    for a in EP_AXES:
        ep_size *= mesh.shape[a]
    E = w_gate_up.shape[0]
    if ep_size <= 1 or E % ep_size != 0:
        return fused_moe(x, w_gate_up, w_down, router_weights, expert_ids,
                         act=act)
    e_local = E // ep_size

    def local_fn(wg, wd, x, rw, ids):
        shard = jax.lax.axis_index(EP_AXES)
        lo = shard * e_local
        local = ids - lo
        resident = (local >= 0) & (local < e_local)
        rw_l = jnp.where(resident, rw, 0.0)
        ids_l = jnp.clip(local, 0, e_local - 1)
        out = fused_moe(x, wg, wd, rw_l, ids_l, act=act)
        return jax.lax.psum(out, EP_AXES)

    return jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(EP_AXES), P(EP_AXES), P(), P(), P()),
        out_specs=P(), axis_names=set(EP_AXES), check_vma=False)(
            w_gate_up, w_down, x, router_weights, expert_ids)


def fused_moe_ref(x, w_gate_up, w_down, router_weights, expert_ids,
                  act: str = "silu") -> jnp.ndarray:
    """Dense reference: every expert computes every token (oracle for
    tests)."""
    T, H = x.shape
    E = w_gate_up.shape[0]
    gate_up = jnp.einsum("th,ehf->etf", x, w_gate_up.astype(x.dtype))
    h = GATED_ACTIVATIONS[act](gate_up)
    out_e = jnp.einsum("etf,efh->eth", h, w_down.astype(x.dtype))  # [E,T,H]
    K = expert_ids.shape[1]
    combined = jnp.zeros((T, H), jnp.float32)
    for k in range(K):
        sel = jnp.take_along_axis(
            out_e.transpose(1, 0, 2), expert_ids[:, k][:, None, None],
            axis=1)[:, 0]  # [T, H]
        combined += sel.astype(jnp.float32) * \
            router_weights[:, k][:, None]
    return combined.astype(x.dtype)
