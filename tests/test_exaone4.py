"""EXAONE 4.0 golden tests: engine e2e greedy vs HF, covering both the
pure-global (rope everywhere) and hybrid (sliding rope + global NoPE)
schedules (reference analog: the registry's Exaone4ForCausalLM)."""

import numpy as np
import pytest


@pytest.fixture(scope="module", params=["global", "hybrid"])
def tiny_exaone4(request, tmp_path_factory):
    import torch
    from transformers import Exaone4Config, Exaone4ForCausalLM

    torch.manual_seed(0)
    kwargs = dict(vocab_size=128, hidden_size=64, num_hidden_layers=4,
                  num_attention_heads=4, num_key_value_heads=2,
                  intermediate_size=96, max_position_embeddings=128,
                  rms_norm_eps=1e-6, tie_word_embeddings=False,
                  pad_token_id=0)
    if request.param == "hybrid":
        kwargs.update(sliding_window=16, sliding_window_pattern=4)
    else:
        kwargs.update(sliding_window=None, sliding_window_pattern=1,
                      layer_types=["full_attention"] * 4)
    cfg = Exaone4Config(**kwargs)
    hf_model = Exaone4ForCausalLM(cfg)
    hf_model.eval()
    d = tmp_path_factory.mktemp("tiny_exaone4")
    hf_model.save_pretrained(str(d), safe_serialization=True)
    return str(d), hf_model


def test_exaone4_engine_matches_hf_greedy(tiny_exaone4):
    import torch

    model_dir, hf_model = tiny_exaone4

    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import SamplingParams

    prompt_ids = [3, 17, 9, 44, 5, 81, 22]
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
