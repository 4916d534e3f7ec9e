"""Draft-token verification for speculative decoding
(reference: vllm/v1/sample/rejection_sampler.py:23).

Scheme: at each of the 1+S verify positions, sample from the TARGET
distribution (same per-row sampling params, per-position fold-in keys).
A draft token is accepted while it equals the target's sample; the first
mismatch position emits the target sample as the correction, and a fully
accepted draft emits the bonus sample at the last position. Every emitted
token is therefore an exact sample from the target distribution given its
prefix — lossless regardless of where the drafts came from (ngram/EAGLE).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vllm_tpu.sample.metadata import SamplingMetadata
from vllm_tpu.sample.sampler import sample


def sample_positions(
    logits: jnp.ndarray,  # f32[R, P, V]
    meta: SamplingMetadata,  # [R]-shaped params
    positions: jnp.ndarray,  # i32[R, P] absolute seq positions (fold keys)
) -> jnp.ndarray:
    """Run the full sampling pipeline independently at P positions per
    row. Returns i32[R, P]."""
    R, P, V = logits.shape

    def tile(x):
        if x is None:
            return None
        return jnp.repeat(x, P, axis=0)

    flat_meta = SamplingMetadata(
        temperature=tile(meta.temperature),
        top_k=tile(meta.top_k),
        top_p=tile(meta.top_p),
        min_p=tile(meta.min_p),
        seeds=tile(meta.seeds),
        step=positions.reshape(-1),
        presence_penalty=tile(meta.presence_penalty),
        frequency_penalty=tile(meta.frequency_penalty),
        repetition_penalty=tile(meta.repetition_penalty),
        output_counts=tile(meta.output_counts),
        prompt_mask=tile(meta.prompt_mask),
        block_eos=tile(meta.block_eos),
        eos_token_id=tile(meta.eos_token_id),
        logit_bias=tile(meta.logit_bias),
        grammar_bitmask=tile(meta.grammar_bitmask),
    )
    flat = sample(logits.reshape(R * P, V), flat_meta)
    return flat.reshape(R, P)


def verify_drafts(
    sampled: jnp.ndarray,  # i32[R, 1+S] target samples per position
    draft_tokens: jnp.ndarray,  # i32[R, S]
    num_drafts: jnp.ndarray,  # i32[R] drafts scheduled per row
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (emitted i32[R, 1+S], num_emitted i32[R]).

    emitted[:, j] for j < num_emitted are valid output tokens.
    """
    R, S1 = sampled.shape
    S = S1 - 1
    if S == 0:
        return sampled, jnp.ones(R, jnp.int32)
    pos = jnp.arange(S, dtype=jnp.int32)[None, :]
    match = (sampled[:, :S] == draft_tokens) & (pos < num_drafts[:, None])
    # number of leading accepts
    accepted = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1),
                       axis=1)
    num_emitted = jnp.minimum(accepted + 1, S1)
    return sampled, num_emitted.astype(jnp.int32)
