"""Pure Mamba-1 + FalconMamba tests: engine e2e greedy vs HF
(reference analog: vllm models/mamba.py, falcon_mamba.py)."""

import numpy as np
import pytest


def _run_engine_vs_hf(model_dir, hf_model, prompts, max_tokens=8):
    import torch

    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import SamplingParams

    llm = LLM(model=model_dir, dtype="float32", max_model_len=64,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_gpu_blocks_override=32, enforce_eager=True,
              skip_tokenizer_init=True)
    sp = SamplingParams(temperature=0.0, max_tokens=max_tokens,
                        ignore_eos=True)
    for prompt in prompts:
        got = list(llm.generate({"prompt_token_ids": prompt},
                                sp)[0].outputs[0].token_ids)
        with torch.no_grad():
            expect = hf_model.generate(
                input_ids=torch.tensor([prompt]),
                max_new_tokens=max_tokens, do_sample=False,
                eos_token_id=None)
            expect = expect[0, len(prompt):].tolist()
        assert got == expect, (prompt, got, expect)


@pytest.fixture(scope="module")
def tiny_mamba(tmp_path_factory):
    import torch
    from transformers import MambaConfig, MambaForCausalLM

    torch.manual_seed(0)
    cfg = MambaConfig(vocab_size=128, hidden_size=48, state_size=8,
                      num_hidden_layers=2, conv_kernel=4, expand=2,
                      time_step_rank=8, use_bias=False,
                      use_conv_bias=True, tie_word_embeddings=True,
                      pad_token_id=0, bos_token_id=1, eos_token_id=2)
    hf_model = MambaForCausalLM(cfg)
    hf_model.eval()
    d = tmp_path_factory.mktemp("tiny_mamba")
    hf_model.save_pretrained(str(d), safe_serialization=True)
    return str(d), hf_model


def test_mamba1_engine_matches_hf_greedy(tiny_mamba):
    model_dir, hf_model = tiny_mamba
    _run_engine_vs_hf(model_dir, hf_model,
                      [[3, 17, 9, 44, 5], [2, 31, 7]])


@pytest.fixture(scope="module")
def tiny_falcon_mamba(tmp_path_factory):
    import torch
    from transformers import FalconMambaConfig, FalconMambaForCausalLM

    torch.manual_seed(0)
    cfg = FalconMambaConfig(vocab_size=128, hidden_size=48,
                            state_size=8, num_hidden_layers=2,
                            conv_kernel=4, expand=2, time_step_rank=8,
                            use_bias=False, use_conv_bias=True,
                            mixer_rms_eps=1e-6,
                            tie_word_embeddings=True, pad_token_id=0,
                            bos_token_id=1, eos_token_id=2)
    hf_model = FalconMambaForCausalLM(cfg)
    hf_model.eval()
    d = tmp_path_factory.mktemp("tiny_falcon_mamba")
    hf_model.save_pretrained(str(d), safe_serialization=True)
    return str(d), hf_model


def test_falcon_mamba_engine_matches_hf_greedy(tiny_falcon_mamba):
    model_dir, hf_model = tiny_falcon_mamba
    _run_engine_vs_hf(model_dir, hf_model, [[4, 99, 23, 58, 7, 12]])
