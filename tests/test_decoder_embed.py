"""Decoder-only embedding + GPT-2 classifier tests (reference analog:
the registry's bare *Model arch mappings and
GPT2ForSequenceClassification)."""

import numpy as np
import pytest


def test_qwen2model_embedding_matches_hf_hidden(tmp_path):
    import torch
    from transformers import Qwen2Config, Qwen2Model

    torch.manual_seed(0)
    cfg = Qwen2Config(vocab_size=128, hidden_size=64,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, intermediate_size=96,
                      max_position_embeddings=128, rms_norm_eps=1e-6,
                      use_sliding_window=False,
                      architectures=["Qwen2Model"])
    hf_model = Qwen2Model(cfg)
    hf_model.eval()
    hf_model.save_pretrained(str(tmp_path), safe_serialization=True)

    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import PoolingParams

    toks = [3, 17, 9, 44, 5]
    llm = LLM(model=str(tmp_path), dtype="float32", max_model_len=64,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_gpu_blocks_override=32, enforce_eager=True,
              skip_tokenizer_init=True)
    out = llm.encode({"prompt_token_ids": toks},
                     PoolingParams(pooling_type="mean",
                                   normalize=True))[0]
    got = np.asarray(out.outputs.data, np.float32)

    with torch.no_grad():
        h = hf_model(torch.tensor([toks])).last_hidden_state[0].numpy()
    expect = h.mean(0)
    expect = expect / np.linalg.norm(expect)
    np.testing.assert_allclose(got, expect, rtol=3e-4, atol=3e-4)


def test_gpt2_sequence_classification_matches_hf(tmp_path):
    import torch
    from transformers import GPT2Config, GPT2ForSequenceClassification

    torch.manual_seed(0)
    cfg = GPT2Config(vocab_size=128, n_positions=128, n_embd=64,
                     n_layer=2, n_head=4, n_inner=96, num_labels=3,
                     pad_token_id=0)
    hf_model = GPT2ForSequenceClassification(cfg)
    hf_model.eval()
    hf_model.save_pretrained(str(tmp_path), safe_serialization=True)

    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import PoolingParams

    toks = [3, 17, 9, 44, 5, 12]
    llm = LLM(model=str(tmp_path), dtype="float32", max_model_len=64,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_gpu_blocks_override=32, enforce_eager=True,
              skip_tokenizer_init=True)
    out = llm.encode({"prompt_token_ids": toks},
                     PoolingParams(task="classify", softmax=False))[0]
    got = np.asarray(out.outputs.data, np.float32)

    with torch.no_grad():
        logits = hf_model(torch.tensor([toks])).logits[0].numpy()
    np.testing.assert_allclose(got, logits, rtol=3e-4, atol=3e-4)
