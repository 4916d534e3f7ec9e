"""Zamba2 golden tests vs HF (reference analog: tests for
models/zamba2.py) — shared transformer blocks over concat([x, embed])
with per-use adapters, per-layer linear injection into the Mamba2
path, Zamba attention scale, mem-rope."""

import numpy as np
import pytest

import jax.numpy as jnp

from tests.test_model_vs_hf import build_metadata

TOKENS = [[1, 5, 9, 3, 7, 11, 2], [4, 8, 100, 42]]


@pytest.fixture(scope="module")
def zamba2_dir(tmp_path_factory):
    import torch
    from transformers import Zamba2Config
    from transformers.models.zamba2.modeling_zamba2 import (
        Zamba2ForCausalLM)

    torch.manual_seed(0)
    cfg = Zamba2Config(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=5, num_attention_heads=4,
        attention_head_dim=32, num_key_value_heads=4,
        n_mamba_heads=4, mamba_ngroups=1, mamba_d_state=16,
        mamba_d_conv=4, mamba_expand=2, chunk_size=8,
        num_mem_blocks=2, use_shared_attention_adapter=True,
        adapter_rank=8, use_mem_rope=True,
        max_position_embeddings=128, pad_token_id=0,
        layers_block_type=["mamba", "hybrid", "mamba", "hybrid",
                           "hybrid"])
    m = Zamba2ForCausalLM(cfg)
    m.eval()
    d = tmp_path_factory.mktemp("zamba2")
    # shared transformer blocks alias tensors across layers -> .bin
    m.save_pretrained(d, safe_serialization=False)
    return str(d)


def _load(model_dir):
    from vllm_tpu.config import ModelConfig
    from vllm_tpu.models.registry import get_model
    from vllm_tpu.models.weight_utils import weights_iterator

    mc = ModelConfig(model=model_dir, dtype="float32")
    model = get_model(mc)
    params = model.load_weights(weights_iterator(model_dir))
    return model, params


def test_zamba2_logits_match_hf(zamba2_dir):
    import torch
    from transformers.models.zamba2.modeling_zamba2 import (
        Zamba2ForCausalLM)

    hf = Zamba2ForCausalLM.from_pretrained(zamba2_dir)
    hf.eval()
    expected = []
    with torch.no_grad():
        for toks in TOKENS:
            expected.append(hf(torch.tensor([toks])).logits[0].numpy())

    model, params = _load(zamba2_dir)
    a = model.args
    attn_kv = jnp.zeros((model.num_hybrid, 32, 2 * a.num_kv_heads,
                         4, a.head_dim), jnp.float32)
    caches = [model.init_states(4), attn_kv]
    metadata, input_ids, _ = build_metadata(TOKENS, 4, max_blocks=8,
                                            total_pad=16, req_pad=4)
    hidden, _ = model.forward(params, input_ids, caches, metadata)
    logits = np.asarray(model.compute_logits(params, hidden))
    offset = 0
    for r, toks in enumerate(TOKENS):
        np.testing.assert_allclose(logits[offset:offset + len(toks)],
                                   expected[r], rtol=2e-3, atol=2e-3)
        offset += len(toks)


def test_zamba2_engine_greedy_matches_hf(zamba2_dir):
    import torch
    from transformers.models.zamba2.modeling_zamba2 import (
        Zamba2ForCausalLM)

    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import SamplingParams

    hf = Zamba2ForCausalLM.from_pretrained(zamba2_dir)
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

    llm = LLM(model=zamba2_dir, dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_gpu_blocks_override=32, enforce_eager=True,
              skip_tokenizer_init=True)
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    outs = llm.generate([{"prompt_token_ids": p} for p in prompts], sp)
    llm.llm_engine.shutdown()
    for r in range(2):
        assert list(outs[r].outputs[0].token_ids) == hf_out[r], \
            (r, list(outs[r].outputs[0].token_ids), hf_out[r])
