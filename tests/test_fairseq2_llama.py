"""Fairseq2-serialized Llama golden test (reference analog: tests for
models/fairseq2_llama.py): a HF llama's weights re-serialized the
fairseq2 way (wrapper dict, fairseq2 names, interleaved-rotary q/k)
must produce identical greedy output."""

import json

import numpy as np
import pytest
import torch


@pytest.fixture(scope="module")
def fs2_dir(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    cfg = LlamaConfig(vocab_size=128, hidden_size=64,
                      intermediate_size=128, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      max_position_embeddings=128,
                      tie_word_embeddings=False)
    m = LlamaForCausalLM(cfg)
    m.eval()

    def unpermute(w, n_heads):
        # HF neox layout -> fairseq2 interleaved layout
        attn_in, attn_out = w.shape
        return (w.view(n_heads, 2, attn_in // n_heads // 2,
                       attn_out).transpose(1, 2).reshape(attn_in,
                                                         attn_out))

    sub = {
        "model.embed_tokens.": "decoder_frontend.embed.",
        "lm_head.": "final_proj.",
        "model.norm.": "decoder.layer_norm.",
    }
    state = {}
    for name, w in m.state_dict().items():
        w = w.clone()
        if name.endswith("q_proj.weight"):
            w = unpermute(w, cfg.num_attention_heads)
        elif name.endswith("k_proj.weight"):
            w = unpermute(w, cfg.num_key_value_heads)
        for old, new in sub.items():
            if name.startswith(old):
                name = new + name[len(old):]
                break
        else:
            name = (name.replace("model.", "decoder.")
                    .replace(".input_layernorm.", ".self_attn_layer_norm.")
                    .replace(".post_attention_layernorm.",
                             ".ffn_layer_norm.")
                    .replace(".self_attn.o_proj.",
                             ".self_attn.output_proj.")
                    .replace(".mlp.gate_proj.", ".ffn.gate_proj.")
                    .replace(".mlp.up_proj.", ".ffn.inner_proj.")
                    .replace(".mlp.down_proj.", ".ffn.output_proj."))
        state[name] = w

    d = tmp_path_factory.mktemp("fs2_llama")
    torch.save({"model_key": "llama", "llama": state},
               str(d / "model.pt"))
    hf_cfg = json.loads(cfg.to_json_string())
    hf_cfg["architectures"] = ["Fairseq2LlamaForCausalLM"]
    with open(d / "config.json", "w") as f:
        json.dump(hf_cfg, f)
    return str(d), m


def test_fairseq2_llama_engine_greedy_matches_hf(fs2_dir):
    model_dir, hf = fs2_dir

    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import SamplingParams

    prompts = [[3, 17, 42, 9, 88], [7, 21, 4]]
    ref = []
    with torch.no_grad():
        for p in prompts:
            seq = list(p)
            for _ in range(10):
                seq.append(int(hf(torch.tensor([seq])
                                  ).logits[0, -1].argmax()))
            ref.append(seq[len(p):])

    llm = LLM(model=model_dir, dtype="float32", max_model_len=64,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_gpu_blocks_override=32, enforce_eager=True,
              skip_tokenizer_init=True)
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    outs = llm.generate([{"prompt_token_ids": p} for p in prompts], sp)
    llm.llm_engine.shutdown()
    for r in range(2):
        assert list(outs[r].outputs[0].token_ids) == ref[r], \
            (r, list(outs[r].outputs[0].token_ids), ref[r])
