"""Gemma 3n golden tests vs HF (reference analog: tests for
models/gemma3n.py) — AltUp predict/correct, Laurel residual, per-layer
embeddings, sparse gelu, unweighted v-norm, KV sharing, sliding/full
rope split, final logit softcap."""

import numpy as np
import pytest

import jax.numpy as jnp

from tests.test_model_vs_hf import build_metadata

TOKENS = [[1, 5, 9, 3, 7, 11, 2], [4, 8, 100, 42]]


@pytest.fixture(scope="module")
def gemma3n_dir(tmp_path_factory):
    import torch
    from transformers import Gemma3nTextConfig
    from transformers.models.gemma3n.modeling_gemma3n import (
        Gemma3nForCausalLM)

    torch.manual_seed(0)
    cfg = Gemma3nTextConfig(
        vocab_size=160, vocab_size_per_layer_input=160,
        hidden_size=64, hidden_size_per_layer_input=16,
        intermediate_size=[96, 96, 96, 96, 96],
        num_hidden_layers=5, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16,
        max_position_embeddings=128, rope_theta=1000000.0,
        rope_local_base_freq=10000.0, sliding_window=8,
        layer_types=["sliding_attention", "full_attention",
                     "sliding_attention", "sliding_attention",
                     "full_attention"],
        final_logit_softcapping=30.0, altup_active_idx=0,
        altup_coef_clip=120.0, altup_correct_scale=True,
        altup_num_inputs=4, num_kv_shared_layers=2, laurel_rank=8,
        activation_sparsity_pattern=[0.95, 0.95, 0.0, 0.0, 0.0],
        pad_token_id=0)
    m = Gemma3nForCausalLM(cfg)
    m.eval()
    d = tmp_path_factory.mktemp("gemma3n")
    m.save_pretrained(d, safe_serialization=True)
    return str(d)


def _load(model_dir):
    from vllm_tpu.config import ModelConfig
    from vllm_tpu.models.registry import get_model
    from vllm_tpu.models.weight_utils import weights_iterator

    model = get_model(ModelConfig(model=model_dir, dtype="float32"))
    params = model.load_weights(weights_iterator(model_dir))
    return model, params


def test_gemma3n_logits_match_hf(gemma3n_dir):
    import torch
    from transformers.models.gemma3n.modeling_gemma3n import (
        Gemma3nForCausalLM)

    hf = Gemma3nForCausalLM.from_pretrained(gemma3n_dir)
    hf.eval()
    expected = []
    with torch.no_grad():
        for toks in TOKENS:
            expected.append(hf(torch.tensor([toks])).logits[0].numpy())

    model, params = _load(gemma3n_dir)
    kv = jnp.zeros((len(model.cache_index), 32, 2 * model.nk, 4,
                    model.d), jnp.float32)
    metadata, input_ids, _ = build_metadata(TOKENS, 4, max_blocks=8,
                                            total_pad=16, req_pad=4)
    hidden, _ = model.forward(params, input_ids, [kv], metadata)
    logits = np.asarray(model.compute_logits(params, hidden))
    offset = 0
    for r, toks in enumerate(TOKENS):
        np.testing.assert_allclose(logits[offset:offset + len(toks)],
                                   expected[r], rtol=2e-3, atol=2e-3)
        offset += len(toks)


def test_gemma3n_engine_greedy_matches_hf(gemma3n_dir):
    """Decode path exercises KV sharing + the sliding window (prompt
    longer than window 8)."""
    import torch
    from transformers.models.gemma3n.modeling_gemma3n import (
        Gemma3nForCausalLM)

    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import SamplingParams

    hf = Gemma3nForCausalLM.from_pretrained(gemma3n_dir)
    hf.eval()
    prompts = [[3, 17, 42, 9, 88, 5, 77, 140, 23, 6], [7, 21, 4]]
    hf_out = []
    with torch.no_grad():
        for p in prompts:
            seq = list(p)
            for _ in range(10):
                logits = hf(torch.tensor([seq])).logits[0, -1]
                seq.append(int(logits.argmax()))
            hf_out.append(seq[len(p):])

    llm = LLM(model=gemma3n_dir, dtype="float32", max_model_len=64,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_gpu_blocks_override=32, enforce_eager=True,
              skip_tokenizer_init=True)
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    outs = llm.generate([{"prompt_token_ids": p} for p in prompts], sp)
    llm.llm_engine.shutdown()
    for r in range(2):
        assert list(outs[r].outputs[0].token_ids) == hf_out[r], \
            (r, list(outs[r].outputs[0].token_ids), hf_out[r])
