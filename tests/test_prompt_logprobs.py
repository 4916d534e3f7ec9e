"""Prompt logprobs (SamplingParams.prompt_logprobs) through the full
engine, cross-checked against transformers teacher-forced log-softmax
(reference: v1 gpu_model_runner prompt_logprobs_dict +
output_processor prompt logprob assembly)."""

import numpy as np
import pytest

from tests.utils import build_tiny_llama


@pytest.fixture(scope="module")
def tiny_model_dir(tmp_path_factory):
    return build_tiny_llama(str(tmp_path_factory.mktemp("plp")))


PROMPT = [3, 5, 7, 11, 13, 17, 19, 23, 29, 31]


def _hf_prompt_logprobs(model_dir):
    import torch
    from transformers import AutoModelForCausalLM

    model = AutoModelForCausalLM.from_pretrained(model_dir).eval()
    ids = torch.tensor([PROMPT])
    with torch.no_grad():
        logits = model(ids).logits[0]
    lp = torch.log_softmax(logits.float(), -1)
    # position p >= 1 scored by logits at p-1
    return [float(lp[p - 1, PROMPT[p]]) for p in range(1, len(PROMPT))]


def _engine_prompt_logprobs(model_dir, budget):
    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import SamplingParams

    llm = LLM(model=model_dir, dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=budget,
              block_size=16, num_gpu_blocks_override=32,
              enforce_eager=True, skip_tokenizer_init=True)
    outs = llm.generate(
        [{"prompt_token_ids": PROMPT}],
        SamplingParams(temperature=0.0, max_tokens=2, ignore_eos=True,
                       prompt_logprobs=2))
    plp = outs[0].prompt_logprobs
    llm.llm_engine.shutdown()
    return plp


@pytest.mark.parametrize("budget", [64, 4])
def test_prompt_logprobs_match_hf(tiny_model_dir, budget):
    """budget=4 forces chunked prefill: increments must stitch into the
    same sequence as the single-chunk case."""
    ref = _hf_prompt_logprobs(tiny_model_dir)
    plp = _engine_prompt_logprobs(tiny_model_dir, budget)
    assert plp is not None
    assert plp[0] is None  # first prompt token has no context
    assert len(plp) == len(PROMPT)
    got = [plp[p][PROMPT[p]].logprob for p in range(1, len(PROMPT))]
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)
    # top-k entries present and ranked
    d = plp[1]
    assert len(d) >= 2
    ranks = [lp.rank for lp in d.values()]
    assert sorted(ranks) == list(range(1, len(d) + 1))


def test_prompt_logprobs_with_async_scheduling(tiny_model_dir):
    ref = _hf_prompt_logprobs(tiny_model_dir)
    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import SamplingParams

    llm = LLM(model=tiny_model_dir, dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=32,
              block_size=16, num_gpu_blocks_override=32,
              enforce_eager=True, skip_tokenizer_init=True,
              async_scheduling=True)
    outs = llm.generate(
        [{"prompt_token_ids": PROMPT},
         {"prompt_token_ids": [2, 4, 6]}],
        SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True,
                       prompt_logprobs=1))
    plp = outs[0].prompt_logprobs
    llm.llm_engine.shutdown()
    got = [plp[p][PROMPT[p]].logprob for p in range(1, len(PROMPT))]
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)
