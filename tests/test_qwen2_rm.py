"""Qwen2 reward-model tests: engine pooling scores vs torch golden
(reference analog: vllm models/qwen2_rm.py)."""

import json

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_qwen2_rm(tmp_path_factory):
    import torch
    from safetensors.numpy import save_file
    from transformers import Qwen2Config, Qwen2ForCausalLM

    torch.manual_seed(0)
    cfg = Qwen2Config(vocab_size=128, hidden_size=64,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, intermediate_size=96,
                      max_position_embeddings=128, rms_norm_eps=1e-6,
                      tie_word_embeddings=False,
                      use_sliding_window=False)
    hf_model = Qwen2ForCausalLM(cfg)
    hf_model.eval()
    rng = np.random.default_rng(2)
    H = 64
    score = {
        "score.0.weight": (rng.standard_normal((H, H)) /
                           np.sqrt(H)).astype(np.float32),
        "score.0.bias": (0.1 * rng.standard_normal(H)).astype(
            np.float32),
        "score.2.weight": (rng.standard_normal((1, H)) /
                           np.sqrt(H)).astype(np.float32),
        "score.2.bias": (0.1 * rng.standard_normal(1)).astype(
            np.float32),
    }
    d = tmp_path_factory.mktemp("tiny_qwen2_rm")
    sd = {k: v.numpy() for k, v in hf_model.state_dict().items()
          if not k.startswith("lm_head.")}
    sd.update(score)
    save_file(sd, str(d / "model.safetensors"))
    conf = json.loads(cfg.to_json_string())
    conf["architectures"] = ["Qwen2ForRewardModel"]
    (d / "config.json").write_text(json.dumps(conf))
    return str(d), hf_model, score


def test_qwen2_rm_scores_match_torch(tiny_qwen2_rm):
    import torch

    model_dir, hf_model, score = tiny_qwen2_rm

    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import PoolingParams

    prompts = [[3, 17, 9, 44, 5], [2, 31, 7, 90, 11, 8]]
    llm = LLM(model=model_dir, dtype="float32", max_model_len=64,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_gpu_blocks_override=32, enforce_eager=True,
              skip_tokenizer_init=True)
    outs = llm.encode([{"prompt_token_ids": t} for t in prompts],
                      PoolingParams(task="score", normalize=False))
    got = [float(np.asarray(o.outputs.data)[0]) for o in outs]

    with torch.no_grad():
        w0 = torch.tensor(score["score.0.weight"])
        b0 = torch.tensor(score["score.0.bias"])
        w2 = torch.tensor(score["score.2.weight"])
        b2 = torch.tensor(score["score.2.bias"])
        expect = []
        for t in prompts:
            h = hf_model.model(torch.tensor([t])).last_hidden_state
            last = h[0, -1]
            s = torch.relu(last @ w0.T + b0) @ w2.T + b2
            expect.append(float(s[0]))
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-4)
