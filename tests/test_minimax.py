"""MiniMax lightning-attention hybrid golden tests vs HF (reference
analog: tests for models/minimax_text_01.py) — linear attention via the
SSD recurrence + full attention + MoE + post-norm alpha/beta
residuals."""

import numpy as np
import pytest

import jax.numpy as jnp

from tests.test_model_vs_hf import build_metadata

TOKENS = [[1, 5, 9, 3, 7, 11, 2], [4, 8, 100, 42]]


@pytest.fixture(scope="module")
def minimax_dir(tmp_path_factory):
    import torch
    from transformers import MiniMaxConfig, MiniMaxForCausalLM

    torch.manual_seed(0)
    cfg = MiniMaxConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=3, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16,
        layer_types=["linear_attention", "full_attention",
                     "linear_attention"],
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128, block_size=16, pad_token_id=0,
        full_attn_alpha_factor=1.2, full_attn_beta_factor=0.9,
        linear_attn_alpha_factor=0.8, linear_attn_beta_factor=1.1,
        mlp_alpha_factor=1.05, mlp_beta_factor=0.95)
    m = MiniMaxForCausalLM(cfg)
    m.eval()
    d = tmp_path_factory.mktemp("minimax")
    m.save_pretrained(d, safe_serialization=True)
    return str(d)


def _load(model_dir):
    from vllm_tpu.config import ModelConfig
    from vllm_tpu.models.registry import get_model
    from vllm_tpu.models.weight_utils import weights_iterator

    mc = ModelConfig(model=model_dir, dtype="float32")
    model = get_model(mc)
    params = model.load_weights(weights_iterator(model_dir))
    return model, params


def test_minimax_logits_match_hf(minimax_dir):
    import torch
    from transformers import MiniMaxForCausalLM

    hf = MiniMaxForCausalLM.from_pretrained(minimax_dir)
    hf.eval()
    expected = []
    with torch.no_grad():
        for toks in TOKENS:
            expected.append(hf(torch.tensor([toks])).logits[0].numpy())

    model, params = _load(minimax_dir)
    a = model.args
    attn_kv = jnp.zeros((model.num_attn_layers, 32, 2 * a.num_kv_heads,
                         4, a.head_dim), jnp.float32)
    caches = [model.init_states(4), attn_kv]  # layer 0 is linear
    metadata, input_ids, _ = build_metadata(TOKENS, 4, max_blocks=8,
                                            total_pad=16, req_pad=4)
    hidden, _ = model.forward(params, input_ids, caches, metadata)
    logits = np.asarray(model.compute_logits(params, hidden))
    offset = 0
    for r, toks in enumerate(TOKENS):
        np.testing.assert_allclose(logits[offset:offset + len(toks)],
                                   expected[r], rtol=2e-3, atol=2e-3)
        offset += len(toks)


def test_minimax_engine_greedy_matches_hf(minimax_dir):
    """Engine decode over linear-attention state slots + paged KV: the
    chunked SSD carry must reproduce HF's token-by-token recurrence."""
    import torch
    from transformers import MiniMaxForCausalLM

    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import SamplingParams

    hf = MiniMaxForCausalLM.from_pretrained(minimax_dir)
    hf.eval()
    prompts = [[3, 17, 42, 9, 88], [7, 21, 4]]
    hf_out = []
    with torch.no_grad():
        for p in prompts:
            seq = list(p)
            for _ in range(10):
                logits = hf(torch.tensor([seq])).logits[0, -1]
                seq.append(int(logits.argmax()))
            hf_out.append(seq[len(p):])

    llm = LLM(model=minimax_dir, dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_gpu_blocks_override=32, enforce_eager=True,
              skip_tokenizer_init=True)
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    outs = llm.generate([{"prompt_token_ids": p} for p in prompts], sp)
    for r in range(2):
        assert list(outs[r].outputs[0].token_ids) == hf_out[r], \
            (r, list(outs[r].outputs[0].token_ids), hf_out[r])
