"""Static-shape sampling metadata (reference analog:
vllm/v1/worker/gpu_input_batch.py SamplingMetadata + v1/sample/tpu/).

All fields are dense [R]-shaped arrays over the padded request batch;
padding rows carry neutral values (temperature 0 -> greedy, penalties 0).
Optional fields are None when no request in the batch uses the feature, so
jit specializes a cheaper graph (None is static in a pytree).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclass
class SamplingMetadata:
    temperature: jnp.ndarray  # f32[R]; 0 => greedy row
    top_k: jnp.ndarray  # i32[R]; 0 => disabled
    top_p: jnp.ndarray  # f32[R]; 1.0 => disabled
    min_p: jnp.ndarray  # f32[R]; 0.0 => disabled
    seeds: jnp.ndarray  # u32[R] per-request seed
    # Per-row fold-in counter: the request's sequence position. Using the
    # position (not a global step counter) makes seeded sampling
    # reproducible across runs and engine restarts.
    step: jnp.ndarray  # i32[R]
    # Penalties (None when unused in the whole batch):
    #   output_counts: i32[R, V] counts of generated tokens
    #   prompt_mask:   bool[R, V] tokens present in the prompt
    presence_penalty: Optional[jnp.ndarray] = None  # f32[R]
    frequency_penalty: Optional[jnp.ndarray] = None  # f32[R]
    repetition_penalty: Optional[jnp.ndarray] = None  # f32[R]
    output_counts: Optional[jnp.ndarray] = None
    prompt_mask: Optional[jnp.ndarray] = None
    # min-tokens EOS suppression: bool[R], True => EOS logit masked
    block_eos: Optional[jnp.ndarray] = None
    eos_token_id: Optional[jnp.ndarray] = None  # i32[R]
    # logit bias: dense f32[R, V] (rarely used; built host-side)
    logit_bias: Optional[jnp.ndarray] = None
    # bad_words conditional bans (reference:
    # v1/sample/logits_processor.py bad-words): ban banned_tokens[r, j]
    # iff banned_required[r, j] < 0 (unconditional) or equals the row's
    # last INPUT token (prev_input_tokens[r] — which may be an in-flight
    # async-substituted token, so the check must run on device).
    # banned_tokens: i32[R, B], -1 => slot unused.
    banned_tokens: Optional[jnp.ndarray] = None
    banned_required: Optional[jnp.ndarray] = None  # i32[R, B]
    prev_input_tokens: Optional[jnp.ndarray] = None  # i32[R]
    # structured output grammar bitmask: u32[R, ceil(V/32)]
    grammar_bitmask: Optional[jnp.ndarray] = None


def greedy_metadata(num_reqs: int) -> SamplingMetadata:
    """All-greedy metadata (warmup / tests)."""
    return SamplingMetadata(
        temperature=jnp.zeros(num_reqs, jnp.float32),
        top_k=jnp.zeros(num_reqs, jnp.int32),
        top_p=jnp.ones(num_reqs, jnp.float32),
        min_p=jnp.zeros(num_reqs, jnp.float32),
        seeds=jnp.zeros(num_reqs, jnp.uint32),
        step=jnp.zeros(num_reqs, jnp.int32),
    )
