"""Qwen2-Audio tests: audio tower + projector golden vs HF, and engine
e2e with audio-embedding substitution (reference analog:
vllm models/qwen2_audio.py)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_qwen2_audio(tmp_path_factory):
    import torch
    from transformers import (Qwen2AudioConfig, Qwen2AudioEncoderConfig,
                              Qwen2AudioForConditionalGeneration,
                              Qwen2Config)

    torch.manual_seed(0)
    audio = Qwen2AudioEncoderConfig(d_model=32, encoder_layers=2,
                                    encoder_attention_heads=4,
                                    encoder_ffn_dim=64, num_mel_bins=16,
                                    max_source_positions=40)
    text = Qwen2Config(vocab_size=128, hidden_size=64,
                       intermediate_size=128, num_hidden_layers=2,
                       num_attention_heads=4, num_key_value_heads=2,
                       max_position_embeddings=128)
    cfg = Qwen2AudioConfig(audio_config=audio, text_config=text,
                           audio_token_index=120, pad_token_id=0)
    hf_model = Qwen2AudioForConditionalGeneration(cfg)
    hf_model.eval()
    d = tmp_path_factory.mktemp("tiny_q2a")
    hf_model.save_pretrained(str(d), safe_serialization=True)
    return str(d), hf_model, cfg


def test_qwen2_audio_encoding_matches_hf(tiny_qwen2_audio):
    import jax
    import jax.numpy as jnp
    import torch

    model_dir, hf_model, cfg = tiny_qwen2_audio

    from vllm_tpu.config import ModelConfig
    from vllm_tpu.models.qwen2_audio import (
        Qwen2AudioForConditionalGeneration)
    from vllm_tpu.models.weight_utils import weights_iterator

    mc = ModelConfig(model=model_dir, dtype="float32")
    model = Qwen2AudioForConditionalGeneration(mc)
    params = model.load_weights(weights_iterator(model_dir))

    rng = np.random.default_rng(0)
    # T=80 mel frames -> conv2 stride 2 -> 40 -> pool -> 20 positions
    feats = rng.normal(size=(1, 16, 80)).astype(np.float32)

    with torch.no_grad():
        enc = hf_model.audio_tower(torch.tensor(feats)).last_hidden_state
        expect = hf_model.multi_modal_projector(enc)[0].numpy()

    got = np.asarray(
        jax.jit(model.encode_audio)(jax.tree.map(jnp.asarray, params),
                                    jnp.asarray(feats)))
    assert got.shape == expect.shape, (got.shape, expect.shape)
    np.testing.assert_allclose(got, expect, rtol=3e-4, atol=3e-4)


def test_qwen2_audio_engine_e2e_matches_hf_greedy(tiny_qwen2_audio):
    import torch

    model_dir, hf_model, cfg = tiny_qwen2_audio

    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import SamplingParams

    rng = np.random.default_rng(1)
    feats = rng.normal(size=(1, 16, 80)).astype(np.float32)
    num_audio_tokens = 20
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
            feature_attention_mask=torch.ones(1, 80, dtype=torch.long),
            max_new_tokens=6, do_sample=False)
        expect = expect[0, len(prompt_ids):].tolist()
    assert got == expect, (got, expect)
