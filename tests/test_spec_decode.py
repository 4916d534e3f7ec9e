"""Speculative decoding end-to-end: ngram proposer + on-device verify
(reference analog: tests/v1/e2e/test_spec_decode.py).

The acceptance scheme emits exact target samples, so greedy generation
WITH spec decode must equal greedy generation WITHOUT it, token for token.
"""

import numpy as np
import pytest

from tests.test_llm_engine import tiny_model_dir  # noqa: F401 fixture


def make_llm(model_dir, spec: bool):
    from vllm_tpu.entrypoints.llm import LLM

    kwargs = {}
    if spec:
        kwargs.update(speculative_method="ngram",
                      num_speculative_tokens=3)
    return LLM(
        model=model_dir,
        dtype="float32",
        max_model_len=128,
        max_num_seqs=8,
        max_num_batched_tokens=256,
        block_size=16,
        num_gpu_blocks_override=64,
        enforce_eager=True,
        **kwargs,
    )


def test_ngram_proposer_unit():
    from vllm_tpu.spec_decode.ngram import NgramProposer

    p = NgramProposer(3, 1, 3)
    # repeated pattern: [5, 6, 7] appeared before; propose what followed
    tokens = [1, 5, 6, 7, 9, 11, 2, 5, 6, 7]
    assert p.propose_for_tokens(tokens) == [9, 11, 2]
    # no match
    assert p.propose_for_tokens([1, 2, 3, 4]) == []


def test_spec_greedy_equals_plain_greedy(tiny_model_dir):
    from vllm_tpu.sampling_params import SamplingParams

    # A prompt with repetition so the ngram proposer actually fires.
    prompt = ("the quick brown fox jumps over the lazy dog the quick "
              "brown fox jumps over the lazy dog the quick brown")
    params = SamplingParams(temperature=0.0, max_tokens=24,
                            ignore_eos=True)

    plain = make_llm(tiny_model_dir, spec=False)
    base = plain.generate(prompt, params)[0].outputs[0].token_ids
    del plain

    spec = make_llm(tiny_model_dir, spec=True)
    got = spec.generate(prompt, params)[0].outputs[0].token_ids
    stats = spec.llm_engine.engine_core.scheduler._step_spec_stats
    assert got == base, f"spec-decode changed greedy output\n{got}\n{base}"
    # the proposer must have actually drafted something on this prompt
    assert stats[1] > 0, "no draft tokens were ever scheduled"
    assert stats[2] >= 0


def test_spec_with_seeded_sampling_deterministic(tiny_model_dir):
    from vllm_tpu.sampling_params import SamplingParams

    llm = make_llm(tiny_model_dir, spec=True)
    sp = SamplingParams(temperature=0.8, seed=7, max_tokens=12,
                        ignore_eos=True)
    prompt = "one two three one two three one two"
    a = llm.generate(prompt, sp)[0].outputs[0].token_ids
    b = llm.generate(prompt, sp)[0].outputs[0].token_ids
    assert a == b


def test_spec_decode_with_logprobs(tiny_model_dir):
    """Logprobs flow under spec decode (previously silently dropped):
    greedy logprobs with spec must match plain greedy logprobs."""
    from vllm_tpu.sampling_params import SamplingParams

    prompt = ("the quick brown fox jumps over the lazy dog the quick "
              "brown fox jumps over the lazy dog the quick brown")
    params = SamplingParams(temperature=0.0, max_tokens=12,
                            ignore_eos=True, logprobs=3)

    plain = make_llm(tiny_model_dir, spec=False)
    base = plain.generate(prompt, params)[0].outputs[0]
    del plain
    spec = make_llm(tiny_model_dir, spec=True)
    got = spec.generate(prompt, params)[0].outputs[0]

    assert got.token_ids == base.token_ids
    assert got.logprobs is not None and len(got.logprobs) == len(
        got.token_ids)
    for lp_spec, lp_base, tok in zip(got.logprobs, base.logprobs,
                                     base.token_ids):
        assert tok in lp_spec
        a = getattr(lp_spec[tok], "logprob", lp_spec[tok])
        b = getattr(lp_base[tok], "logprob", lp_base[tok])
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4)
