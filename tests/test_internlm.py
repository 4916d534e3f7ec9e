"""InternLM / InternLM3 bias-flag tests (reference analog: llama.py:
267-274 — `bias` implies qkv+o biases, `qkv_bias` overrides the qkv
side only). Both are remote-code-only model types, so configs ride the
generic PretrainedConfig fallback; goldens are transformers models
with the equivalent bias layout (Llama attention_bias for InternLM,
Qwen2 qkv-bias for InternLM3) sharing the same weights."""

import json

import numpy as np
import pytest

DIMS = dict(vocab_size=128, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            intermediate_size=96)


def _save_variant(tmpdir, hf_model, model_type, arch, extra):
    from safetensors.numpy import save_file

    sd = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    save_file(sd, str(tmpdir / "model.safetensors"))
    (tmpdir / "config.json").write_text(json.dumps({
        "model_type": model_type, "architectures": [arch], **DIMS,
        "rms_norm_eps": 1e-6, "max_position_embeddings": 128,
        "rope_theta": 10000.0, "tie_word_embeddings": False, **extra}))
    return str(tmpdir)


def _drive(model_dir, hf_model, prompt, n=8):
    import torch

    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import SamplingParams

    llm = LLM(model=model_dir, dtype="float32", max_model_len=64,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_gpu_blocks_override=32, enforce_eager=True,
              skip_tokenizer_init=True)
    got = list(llm.generate(
        {"prompt_token_ids": prompt},
        SamplingParams(temperature=0.0, max_tokens=n,
                       ignore_eos=True))[0].outputs[0].token_ids)
    with torch.no_grad():
        expect = hf_model.generate(
            input_ids=torch.tensor([prompt]), max_new_tokens=n,
            do_sample=False, eos_token_id=None)
        expect = expect[0, len(prompt):].tolist()
    assert got == expect, (got, expect)


def test_internlm_bias_matches_hf_llama(tmp_path):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    cfg = LlamaConfig(**DIMS, max_position_embeddings=128,
                      rms_norm_eps=1e-6, attention_bias=True,
                      tie_word_embeddings=False)
    hf_model = LlamaForCausalLM(cfg)
    hf_model.eval()
    d = _save_variant(tmp_path, hf_model, "internlm",
                      "InternLMForCausalLM", {"bias": True})
    _drive(d, hf_model, [3, 17, 9, 44, 5])


def test_internlm3_qkv_bias_matches_hf_qwen2(tmp_path):
    import torch
    from transformers import Qwen2Config, Qwen2ForCausalLM

    torch.manual_seed(1)
    cfg = Qwen2Config(**DIMS, max_position_embeddings=128,
                      rms_norm_eps=1e-6, tie_word_embeddings=False,
                      use_sliding_window=False)
    hf_model = Qwen2ForCausalLM(cfg)
    hf_model.eval()
    d = _save_variant(tmp_path, hf_model, "internlm3",
                      "InternLM3ForCausalLM",
                      {"qkv_bias": True, "bias": False})
    _drive(d, hf_model, [4, 99, 23, 58, 7, 12])


def test_llama_alias_archs_resolve():
    """Reference registry.py maps these arch strings to LlamaForCausalLM
    verbatim; resolution must succeed and hit the llama class."""
    from vllm_tpu.models.llama import LlamaForCausalLM
    from vllm_tpu.models.registry import resolve_model_cls

    for arch in ("AquilaForCausalLM", "AquilaModel", "LLaMAForCausalLM",
                 "XverseForCausalLM", "InternLMForCausalLM",
                 "InternLM3ForCausalLM"):
        assert resolve_model_cls(arch) is LlamaForCausalLM, arch
