"""Llama-4 golden tests vs HF: chunked+NoPE layer mix, temperature
tuning, qk-norm, input-scaled MoE + shared expert (reference analog:
tests for models/llama4.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tests.test_model_vs_hf import build_metadata

# long enough that chunked attention (chunk 8) actually masks history
TOKENS = [[1, 5, 9, 3, 7, 11, 2, 8, 100, 42, 6, 13], [4, 8, 100, 42]]


@pytest.fixture(scope="module")
def llama4_dir(tmp_path_factory):
    import torch
    from transformers import Llama4ForCausalLM, Llama4TextConfig

    torch.manual_seed(0)
    cfg = Llama4TextConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        intermediate_size_mlp=96, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        num_local_experts=4, num_experts_per_tok=2,
        interleave_moe_layer_step=2, attention_chunk_size=8,
        attn_temperature_tuning=True, floor_scale=4.0, attn_scale=0.1,
        use_qk_norm=True, pad_token_id=0, max_position_embeddings=256)
    m = Llama4ForCausalLM(cfg)
    m.eval()
    d = tmp_path_factory.mktemp("llama4")
    m.save_pretrained(d, safe_serialization=True)
    return str(d)


def _load(llama4_dir):
    from vllm_tpu.config import ModelConfig
    from vllm_tpu.models.registry import get_model
    from vllm_tpu.models.weight_utils import weights_iterator

    mc = ModelConfig(model=llama4_dir, dtype="float32")
    model = get_model(mc)
    params = model.load_weights(weights_iterator(llama4_dir))
    return model, params


def test_llama4_logits_match_hf(llama4_dir):
    import torch
    from transformers import Llama4ForCausalLM

    hf = Llama4ForCausalLM.from_pretrained(llama4_dir)
    hf.eval()
    expected = []
    with torch.no_grad():
        for toks in TOKENS:
            expected.append(hf(torch.tensor([toks])).logits[0].numpy())

    model, params = _load(llama4_dir)
    a = model.args
    assert a.moe_layers == (1, 3) and a.rope_layers == (1, 1, 1, 0)
    metadata, input_ids, _ = build_metadata(TOKENS, 4, max_blocks=8,
                                            total_pad=16, req_pad=4)
    kv = jnp.zeros((a.num_layers, 32, 2 * a.num_kv_heads, 4, a.head_dim),
                   jnp.float32)
    hidden, _ = model.forward(params, input_ids, [kv], metadata)
    logits = np.asarray(model.compute_logits(params, hidden))
    offset = 0
    for r, toks in enumerate(TOKENS):
        np.testing.assert_allclose(logits[offset:offset + len(toks)],
                                   expected[r], rtol=2e-3, atol=2e-3)
        offset += len(toks)


def test_llama4_engine_greedy_matches_hf(llama4_dir):
    import torch
    from transformers import Llama4ForCausalLM

    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import SamplingParams

    hf = Llama4ForCausalLM.from_pretrained(llama4_dir)
    hf.eval()
    prompts = [[3, 17, 42, 9, 88], [7, 21, 4]]
    hf_out = []
    with torch.no_grad():
        for p in prompts:
            seq = list(p)
            for _ in range(10):
                seq.append(int(hf(torch.tensor([seq]))
                               .logits[0, -1].argmax()))
            hf_out.append(seq[len(p):])

    llm = LLM(model=llama4_dir, dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_gpu_blocks_override=32, enforce_eager=True,
              skip_tokenizer_init=True)
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    outs = llm.generate([{"prompt_token_ids": p} for p in prompts], sp)
    for r in range(2):
        assert list(outs[r].outputs[0].token_ids) == hf_out[r], \
            (r, list(outs[r].outputs[0].token_ids), hf_out[r])
