"""AyaVision multimodal tests: SigLIP tower + SwiGLU pixel-shuffle
projector golden vs HF, and engine e2e (reference analog:
vllm models/aya_vision.py)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_aya(tmp_path_factory):
    import torch
    from transformers import (AyaVisionConfig,
                              AyaVisionForConditionalGeneration,
                              CohereConfig, SiglipVisionConfig)

    torch.manual_seed(0)
    vision = SiglipVisionConfig(hidden_size=32, intermediate_size=64,
                                num_hidden_layers=3,
                                num_attention_heads=4,
                                image_size=28, patch_size=7)
    text = CohereConfig(vocab_size=128, hidden_size=64,
                        intermediate_size=128, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=4,
                        max_position_embeddings=128, use_qk_norm=False)
    cfg = AyaVisionConfig(vision_config=vision, text_config=text,
                          downsample_factor=2,
                          alignment_intermediate_size=64,
                          image_token_index=120, pad_token_id=0)
    hf_model = AyaVisionForConditionalGeneration(cfg)
    hf_model.eval()
    d = tmp_path_factory.mktemp("tiny_aya")
    hf_model.save_pretrained(str(d), safe_serialization=True)
    return str(d), hf_model, cfg


def test_aya_image_encoding_matches_hf(tiny_aya):
    import jax
    import jax.numpy as jnp
    import torch

    model_dir, hf_model, cfg = tiny_aya

    from vllm_tpu.config import ModelConfig
    from vllm_tpu.models.aya_vision import AyaVisionForConditionalGeneration
    from vllm_tpu.models.weight_utils import weights_iterator

    mc = ModelConfig(model=model_dir, dtype="float32")
    model = AyaVisionForConditionalGeneration(mc)
    params = model.load_weights(weights_iterator(model_dir))

    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(1, 3, 28, 28)).astype(np.float32)

    with torch.no_grad():
        expect = hf_model.get_image_features(torch.tensor(pixels))
        if isinstance(expect, (list, tuple)):
            expect = expect[0]
        expect = expect.numpy().reshape(-1, expect.shape[-1])

    got = np.asarray(
        jax.jit(model.encode_image)(jax.tree.map(jnp.asarray, params),
                                    jnp.asarray(pixels)))
    got = got.reshape(-1, got.shape[-1])
    np.testing.assert_allclose(got, expect, rtol=3e-4, atol=3e-4)


def test_aya_engine_e2e_matches_hf_greedy(tiny_aya):
    import torch

    model_dir, hf_model, cfg = tiny_aya

    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import SamplingParams

    num_img_tokens = 4  # 16 patches / downsample^2
    rng = np.random.default_rng(1)
    pixels = rng.normal(size=(1, 3, 28, 28)).astype(np.float32)
    prompt_ids = [1, 5, 9] + [120] * num_img_tokens + [11, 13]

    llm = LLM(model=model_dir, dtype="float32", max_model_len=64,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_gpu_blocks_override=32, enforce_eager=True,
              skip_tokenizer_init=True)
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    out = llm.generate(
        {"prompt_token_ids": prompt_ids,
         "multi_modal_data": {"pixel_values": pixels}}, sp)
    got = list(out[0].outputs[0].token_ids)

    with torch.no_grad():
        ids = torch.tensor([prompt_ids])
        expect = hf_model.generate(input_ids=ids,
                                   pixel_values=torch.tensor(pixels),
                                   max_new_tokens=6, do_sample=False)
        expect = expect[0, len(prompt_ids):].tolist()
    assert got == expect, (got, expect)
