"""MiniCPM golden test (reference analog: vllm minicpm.py).

MiniCPM = llama block + muP scalings (scale_emb on embeddings,
scale_depth/sqrt(L) on residual branches, dim_model_base/hidden on
logits). The scalings fold exactly into weights, so the golden is a
transformers LlamaForCausalLM with folded weights: embed x scale_emb,
o_proj/down_proj x scale_depth/sqrt(L), lm_head = embed x logits_scale
(MiniCPM ties embeddings). Also exercises the generic PretrainedConfig
fallback (model_type "minicpm" has no transformers class)."""

import json

import numpy as np
import pytest

DIMS = dict(vocab_size=128, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            intermediate_size=96)
SCALE_EMB, SCALE_DEPTH, DIM_MODEL_BASE = 2.0, 1.4, 32


@pytest.fixture(scope="module")
def tiny_minicpm(tmp_path_factory):
    import torch
    from safetensors.numpy import save_file
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    cfg = LlamaConfig(**DIMS, max_position_embeddings=128,
                      rms_norm_eps=1e-6, tie_word_embeddings=True)
    base = LlamaForCausalLM(cfg)
    base.eval()
    sd = {k: v.numpy().copy() for k, v in base.state_dict().items()}

    # MiniCPM checkpoint: raw weights, llama names, tied (no lm_head)
    mc = {k: v for k, v in sd.items() if not k.startswith("lm_head.")}
    d = tmp_path_factory.mktemp("tiny_minicpm")
    save_file(mc, str(d / "model.safetensors"))
    (d / "config.json").write_text(json.dumps({
        "model_type": "minicpm",
        "architectures": ["MiniCPMForCausalLM"],
        **DIMS,
        "rms_norm_eps": 1e-6,
        "max_position_embeddings": 128,
        "tie_word_embeddings": True,
        "scale_emb": SCALE_EMB,
        "scale_depth": SCALE_DEPTH,
        "dim_model_base": DIM_MODEL_BASE,
    }))

    # folded-equivalent llama (untied: embed and lm_head scale apart)
    s_r = SCALE_DEPTH / np.sqrt(DIMS["num_hidden_layers"])
    ls = DIM_MODEL_BASE / DIMS["hidden_size"]
    folded_cfg = LlamaConfig(**DIMS, max_position_embeddings=128,
                             rms_norm_eps=1e-6,
                             tie_word_embeddings=False)
    folded = LlamaForCausalLM(folded_cfg)
    fsd = dict(folded.state_dict())
    for k, v in sd.items():
        w = torch.tensor(v)
        if k == "model.embed_tokens.weight":
            fsd[k] = w * SCALE_EMB
            fsd["lm_head.weight"] = w * ls
        elif ".self_attn.o_proj.weight" in k or \
                ".mlp.down_proj.weight" in k:
            fsd[k] = w * s_r
        elif k != "lm_head.weight":
            fsd[k] = w
    folded.load_state_dict(fsd)
    folded.eval()
    return str(d), folded


def test_minicpm_engine_matches_folded_llama_greedy(tiny_minicpm):
    import torch

    model_dir, folded = tiny_minicpm

    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import SamplingParams

    prompt_ids = [4, 99, 23, 58, 7, 12]
    llm = LLM(model=model_dir, dtype="float32", max_model_len=64,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_gpu_blocks_override=32, enforce_eager=True,
              skip_tokenizer_init=True)
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    got = list(llm.generate({"prompt_token_ids": prompt_ids},
                            sp)[0].outputs[0].token_ids)

    with torch.no_grad():
        expect = folded.generate(
            input_ids=torch.tensor([prompt_ids]), max_new_tokens=8,
            do_sample=False, eos_token_id=None)
        expect = expect[0, len(prompt_ids):].tolist()
    assert got == expect, (got, expect)
