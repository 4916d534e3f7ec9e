"""GPTBigCode (StarCoder-1) golden test: engine e2e greedy vs HF
(reference analog: vllm models/gpt_bigcode.py — multi-query GPT-2)."""

import numpy as np
import pytest


@pytest.fixture(scope="module", params=[True, False],
                ids=["mqa", "mha"])
def tiny_bigcode(request, tmp_path_factory):
    import torch
    from transformers import GPTBigCodeConfig, GPTBigCodeForCausalLM

    torch.manual_seed(0)
    cfg = GPTBigCodeConfig(vocab_size=128, n_positions=128, n_embd=64,
                           n_layer=2, n_head=4, n_inner=96,
                           multi_query=request.param,
                           activation_function="gelu_pytorch_tanh",
                           bos_token_id=1, eos_token_id=2)
    hf_model = GPTBigCodeForCausalLM(cfg)
    hf_model.eval()
    d = tmp_path_factory.mktemp("tiny_bigcode")
    hf_model.save_pretrained(str(d), safe_serialization=True)
    return str(d), hf_model


def test_gpt_bigcode_engine_matches_hf_greedy(tiny_bigcode):
    import torch

    model_dir, hf_model = tiny_bigcode

    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import SamplingParams

    prompt_ids = [3, 17, 9, 44, 5]
    llm = LLM(model=model_dir, dtype="float32", max_model_len=64,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_gpu_blocks_override=32, enforce_eager=True,
              skip_tokenizer_init=True)
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    got = list(llm.generate({"prompt_token_ids": prompt_ids},
                            sp)[0].outputs[0].token_ids)

    with torch.no_grad():
        expect = hf_model.generate(
            input_ids=torch.tensor([prompt_ids]), max_new_tokens=8,
            do_sample=False, eos_token_id=None)
        expect = expect[0, len(prompt_ids):].tolist()
    assert got == expect, (got, expect)
