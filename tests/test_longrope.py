"""LongRoPE tests (reference analog: rotary_embedding.py
Phi3LongRoPEScaledRotaryEmbedding): Phi-3-style per-dim frequency
rescale factors with per-position short/long regime selection."""

import numpy as np
import pytest

DIMS = dict(vocab_size=128, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            intermediate_size=96)
ORIG = 32


@pytest.fixture(scope="module")
def tiny_phi3_longrope(tmp_path_factory):
    import torch
    from transformers import Phi3Config, Phi3ForCausalLM

    torch.manual_seed(0)
    half = (DIMS["hidden_size"] // DIMS["num_attention_heads"]) // 2
    rng = np.random.default_rng(5)
    cfg = Phi3Config(
        **DIMS, max_position_embeddings=64,
        original_max_position_embeddings=ORIG,
        rope_theta=10000.0, rms_norm_eps=1e-6,
        rope_scaling={
            "type": "longrope",
            "short_factor": (1.0 + rng.random(half)).tolist(),
            "long_factor": (2.0 + rng.random(half)).tolist(),
        },
        tie_word_embeddings=False, pad_token_id=0)
    hf_model = Phi3ForCausalLM(cfg)
    hf_model.eval()
    d = tmp_path_factory.mktemp("tiny_phi3_longrope")
    hf_model.save_pretrained(str(d), safe_serialization=True)
    return str(d), hf_model


def test_longrope_short_regime_matches_hf_greedy(tiny_phi3_longrope):
    """Sequence stays under original_max_position_embeddings: both HF
    and the engine use the short factors; greedy tokens must match
    (non-trivial factors make wrong-regime selection diverge)."""
    import torch

    model_dir, hf_model = tiny_phi3_longrope

    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import SamplingParams

    prompt_ids = [4, 99, 23, 58, 7, 12, 61, 30]
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


def test_longrope_long_regime_prefill_decode_consistent(
        tiny_phi3_longrope):
    """Crossing the original_max boundary: positions >= ORIG take the
    long factors per position. A longer prefill must continue exactly
    where the shorter prefill's decodes left off across the boundary."""
    model_dir, _ = tiny_phi3_longrope

    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import SamplingParams

    llm = LLM(model=model_dir, dtype="float32", max_model_len=64,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_gpu_blocks_override=32, enforce_eager=True,
              skip_tokenizer_init=True)
    rng = np.random.default_rng(3)
    prompt = rng.integers(3, 120, ORIG - 4).tolist()  # ends near ORIG
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    full = list(llm.generate({"prompt_token_ids": prompt},
                             sp)[0].outputs[0].token_ids)
    assert len(full) == 12  # crosses position ORIG during decode

    sp2 = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    cont = list(llm.generate({"prompt_token_ids": prompt + full[:6]},
                             sp2)[0].outputs[0].token_ids)
    assert cont == full[6:], (cont, full)
