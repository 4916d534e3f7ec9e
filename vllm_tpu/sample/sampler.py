"""Static-shape on-device sampler
(reference: vllm/v1/sample/sampler.py:20, v1/sample/tpu/sampler.py).

Pipeline: logit bias -> grammar bitmask -> penalties -> min-tokens EOS
suppression -> temperature -> top-k -> top-p -> min-p -> gumbel sampling
(greedy rows take argmax of the unscaled logits). Everything is masked
per-row so one compiled graph serves mixed batches; padding rows are
greedy and their results are discarded host-side.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vllm_tpu.sample.metadata import SamplingMetadata

_NEG_INF = -1e30  # avoid actual -inf: keeps masked softmax NaN-free


def apply_penalties(logits: jnp.ndarray, meta: SamplingMetadata
                    ) -> jnp.ndarray:
    """Presence/frequency/repetition penalties from persistent device-side
    token-count state (reference analog: vllm/v1/sample/ops/penalties.py;
    csrc/sampler.cu apply_repetition_penalties_)."""
    out_counts = meta.output_counts.astype(jnp.float32)
    has_out = out_counts > 0
    if meta.repetition_penalty is not None:
        seen = has_out | meta.prompt_mask
        rp = meta.repetition_penalty[:, None]
        penalized = jnp.where(logits > 0, logits / rp, logits * rp)
        logits = jnp.where(seen, penalized, logits)
    if meta.frequency_penalty is not None:
        logits = logits - meta.frequency_penalty[:, None] * out_counts
    if meta.presence_penalty is not None:
        logits = logits - meta.presence_penalty[:, None] * has_out
    return logits


def apply_grammar_bitmask(logits: jnp.ndarray,
                          bitmask: jnp.ndarray) -> jnp.ndarray:
    """Mask logits of grammar-invalid tokens. bitmask: u32[R, ceil(V/32)],
    bit set => token allowed (reference: gpu_model_runner.py:1232)."""
    R, V = logits.shape
    token_idx = jnp.arange(V, dtype=jnp.uint32)
    words = bitmask[:, token_idx // 32]  # [R, V]
    bits = (words >> (token_idx % 32)) & 1
    return jnp.where(bits.astype(bool), logits, _NEG_INF)


def _apply_top_k(logits: jnp.ndarray, top_k: jnp.ndarray,
                 sorted_desc: jnp.ndarray) -> jnp.ndarray:
    V = logits.shape[-1]
    k = jnp.where(top_k > 0, top_k, V)
    kth_idx = jnp.clip(k - 1, 0, V - 1)
    kth_value = jnp.take_along_axis(sorted_desc, kth_idx[:, None], axis=-1)
    return jnp.where(logits >= kth_value, logits, _NEG_INF)


def _apply_top_p(logits: jnp.ndarray, top_p: jnp.ndarray,
                 sorted_desc: jnp.ndarray) -> jnp.ndarray:
    """Nucleus: keep the smallest prefix of the sorted distribution whose
    mass reaches top_p (the cutoff token itself is kept)."""
    probs_sorted = jax.nn.softmax(sorted_desc, axis=-1)
    cumsum = jnp.cumsum(probs_sorted, axis=-1)
    # exclusive cumulative mass before each position
    exclusive = cumsum - probs_sorted
    keep_sorted = exclusive < top_p[:, None]
    # Per-row threshold = smallest kept logit value.
    thresh = jnp.min(
        jnp.where(keep_sorted, sorted_desc, jnp.inf), axis=-1, keepdims=True)
    return jnp.where(logits >= thresh, logits, _NEG_INF)


def _apply_min_p(logits: jnp.ndarray, min_p: jnp.ndarray) -> jnp.ndarray:
    probs = jax.nn.softmax(logits, axis=-1)
    max_prob = jnp.max(probs, axis=-1, keepdims=True)
    keep = probs >= (min_p[:, None] * max_prob)
    return jnp.where(keep, logits, _NEG_INF)


def sample(
    logits: jnp.ndarray,  # f32[R, V]
    meta: SamplingMetadata,
) -> jnp.ndarray:
    """Sample one token per row. Returns i32[R]."""
    raw_logits = logits
    logits = logits.astype(jnp.float32)

    if meta.logit_bias is not None:
        logits = logits + meta.logit_bias
    if meta.banned_tokens is not None:
        # bad_words: ban the final token of a bad-word sequence when the
        # host-matched prefix holds AND the device-side condition token
        # (the row's last input token) matches.
        cond = (meta.banned_required < 0) | (
            meta.banned_required == meta.prev_input_tokens[:, None])
        valid = (meta.banned_tokens >= 0) & cond
        rows = jnp.arange(logits.shape[0])[:, None]
        safe = jnp.where(valid, meta.banned_tokens, 0)
        logits = logits.at[rows, safe].min(
            jnp.where(valid, _NEG_INF, jnp.inf))
    if meta.grammar_bitmask is not None:
        logits = apply_grammar_bitmask(logits, meta.grammar_bitmask)
    if meta.output_counts is not None:
        logits = apply_penalties(logits, meta)
    if meta.block_eos is not None:
        V = logits.shape[-1]
        eos_onehot = jax.nn.one_hot(meta.eos_token_id, V, dtype=bool)
        logits = jnp.where(meta.block_eos[:, None] & eos_onehot, _NEG_INF,
                           logits)

    greedy_tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    is_random = meta.temperature > 0.0
    # Temperature scale (guard padding rows against div-by-zero).
    safe_t = jnp.where(is_random, meta.temperature, 1.0)
    scaled = logits / safe_t[:, None]

    needs_sort = jnp.any((meta.top_k > 0) | (meta.top_p < 1.0))
    # Sorting is the expensive part; XLA hoists it behind the cond so
    # pure-greedy / pure-temperature batches skip it.
    def with_filters(x):
        sorted_desc = -jnp.sort(-x, axis=-1)
        x = _apply_top_k(x, meta.top_k, sorted_desc)
        x = _apply_top_p(x, meta.top_p, sorted_desc)
        return x

    scaled = jax.lax.cond(needs_sort, with_filters, lambda x: x, scaled)
    scaled = jax.lax.cond(
        jnp.any(meta.min_p > 0.0),
        lambda x: _apply_min_p(x, meta.min_p), lambda x: x, scaled)

    # Per-request fold-in of (seed, position) — deterministic given seed,
    # independent of batch composition and engine step count.
    def row_key(seed, pos):
        return jax.random.fold_in(jax.random.PRNGKey(seed), pos)

    keys = jax.vmap(row_key)(meta.seeds, meta.step)
    gumbel = jax.vmap(
        lambda k, row: jax.random.gumbel(k, row.shape, jnp.float32))(
            keys, scaled)
    random_tokens = jnp.argmax(scaled + gumbel, axis=-1).astype(jnp.int32)

    del raw_logits
    return jnp.where(is_random, random_tokens, greedy_tokens)


def compute_logprobs(
    logits: jnp.ndarray,  # f32[R, V]
    sampled: jnp.ndarray,  # i32[R]
    num_logprobs: int,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Top-k raw logprobs + the sampled token's logprob and rank
    (reference: vllm/v1/sample/sampler.py gather_logprobs).

    Returns (topk_values f32[R, num_logprobs], topk_ids i32[R, num_logprobs],
    sampled_info f32[R, 2] = [sampled_logprob, sampled_rank]).
    """
    logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    topk_vals, topk_ids = jax.lax.top_k(logprobs, num_logprobs)
    sampled_lp = jnp.take_along_axis(logprobs, sampled[:, None],
                                     axis=-1)[:, 0]
    rank = jnp.sum(logprobs > sampled_lp[:, None], axis=-1) + 1
    sampled_info = jnp.stack([sampled_lp, rank.astype(jnp.float32)], axis=-1)
    return topk_vals, topk_ids.astype(jnp.int32), sampled_info
