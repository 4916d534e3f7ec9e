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

    gate_up = jax.lax.ragged_dot(x_sorted, w_gate_up.astype(x.dtype),
                                 group_sizes)
    h = GATED_ACTIVATIONS[act](gate_up)
    out_sorted = jax.lax.ragged_dot(h, w_down.astype(x.dtype), group_sizes)

    weighted = out_sorted * flat_weight[order][:, None].astype(x.dtype)
    out = jnp.zeros((T, H), jnp.float32).at[token_sorted].add(
        weighted.astype(jnp.float32))
    return out.astype(x.dtype)


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
