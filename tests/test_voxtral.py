"""Voxtral tests: whisper-style tower + reshape projector golden vs HF,
engine e2e (reference analog: vllm models/voxtral.py)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_voxtral(tmp_path_factory):
    import torch
    from transformers import (MistralConfig, VoxtralConfig,
                              VoxtralEncoderConfig,
                              VoxtralForConditionalGeneration)

    torch.manual_seed(0)
    audio = VoxtralEncoderConfig(hidden_size=32, num_hidden_layers=2,
                                 num_attention_heads=4,
                                 intermediate_size=128, num_mel_bins=16,
                                 max_source_positions=40)
    text = MistralConfig(vocab_size=128, hidden_size=64,
                         intermediate_size=128, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         max_position_embeddings=128)
    cfg = VoxtralConfig(audio_config=audio, text_config=text,
                        audio_token_id=120, pad_token_id=0)
    hf_model = VoxtralForConditionalGeneration(cfg)
    hf_model.eval()
    d = tmp_path_factory.mktemp("tiny_voxtral")
    hf_model.save_pretrained(str(d), safe_serialization=True)
    return str(d), hf_model, cfg


def test_voxtral_audio_encoding_matches_hf(tiny_voxtral):
    import jax
    import jax.numpy as jnp
    import torch

    model_dir, hf_model, cfg = tiny_voxtral

    from vllm_tpu.config import ModelConfig
    from vllm_tpu.models.qwen2_audio import VoxtralForConditionalGeneration
    from vllm_tpu.models.weight_utils import weights_iterator

    mc = ModelConfig(model=model_dir, dtype="float32")
    model = VoxtralForConditionalGeneration(mc)
    params = model.load_weights(weights_iterator(model_dir))

    rng = np.random.default_rng(0)
    feats = rng.normal(size=(1, 16, 80)).astype(np.float32)

    with torch.no_grad():
        expect = hf_model.get_audio_features(
            torch.tensor(feats)).numpy()

    got = np.asarray(
        jax.jit(model.encode_audio)(jax.tree.map(jnp.asarray, params),
                                    jnp.asarray(feats)))
    assert got.shape == expect.shape, (got.shape, expect.shape)
    np.testing.assert_allclose(got, expect, rtol=3e-4, atol=3e-4)


def test_voxtral_engine_e2e_matches_hf_greedy(tiny_voxtral):
    import torch

    model_dir, hf_model, cfg = tiny_voxtral

    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import SamplingParams

    rng = np.random.default_rng(1)
    feats = rng.normal(size=(1, 16, 80)).astype(np.float32)
    # encoder: conv2 stride2 -> 40 frames; reshape ratio inter/d = 4
    num_audio_tokens = 10
    prompt_ids = [1, 5] + [120] * num_audio_tokens + [11]

    llm = LLM(model=model_dir, dtype="float32", max_model_len=64,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_gpu_blocks_override=32, enforce_eager=True,
              skip_tokenizer_init=True)
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    out = llm.generate(
        {"prompt_token_ids": prompt_ids,
         "multi_modal_data": {"input_features": feats[0]}}, sp)
    got = list(out[0].outputs[0].token_ids)

    with torch.no_grad():
        ids = torch.tensor([prompt_ids])
        expect = hf_model.generate(
            input_ids=ids, input_features=torch.tensor(feats),
            max_new_tokens=6, do_sample=False)
        expect = expect[0, len(prompt_ids):].tolist()
    assert got == expect, (got, expect)
