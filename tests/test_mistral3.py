"""Mistral3 (Pixtral tower) tests: 2-D rope tower + patch-merger
projector golden vs HF, engine e2e (reference analog:
vllm models/mistral3.py, pixtral.py)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_mistral3(tmp_path_factory):
    import torch
    from transformers import (Mistral3Config,
                              Mistral3ForConditionalGeneration,
                              MistralConfig, PixtralVisionConfig)

    torch.manual_seed(0)
    vision = PixtralVisionConfig(hidden_size=32, num_hidden_layers=2,
                                 num_attention_heads=4,
                                 intermediate_size=64, image_size=56,
                                 patch_size=14, head_dim=8)
    text = MistralConfig(vocab_size=128, hidden_size=64,
                         intermediate_size=128, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         max_position_embeddings=128)
    cfg = Mistral3Config(vision_config=vision, text_config=text,
                         image_token_index=120, spatial_merge_size=2,
                         multimodal_projector_bias=False, pad_token_id=0)
    hf_model = Mistral3ForConditionalGeneration(cfg)
    hf_model.eval()
    d = tmp_path_factory.mktemp("tiny_mistral3")
    hf_model.save_pretrained(str(d), safe_serialization=True)
    return str(d), hf_model, cfg


def test_mistral3_image_encoding_matches_hf(tiny_mistral3):
    import jax
    import jax.numpy as jnp
    import torch

    model_dir, hf_model, cfg = tiny_mistral3

    from vllm_tpu.config import ModelConfig
    from vllm_tpu.models.mistral3 import Mistral3ForConditionalGeneration
    from vllm_tpu.models.weight_utils import weights_iterator

    mc = ModelConfig(model=model_dir, dtype="float32")
    model = Mistral3ForConditionalGeneration(mc)
    params = model.load_weights(weights_iterator(model_dir))

    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(1, 3, 56, 56)).astype(np.float32)

    with torch.no_grad():
        expect = hf_model.model.get_image_features(
            torch.tensor(pixels),
            image_sizes=torch.tensor([[56, 56]]))
        if isinstance(expect, (list, tuple)):
            expect = expect[0]
        expect = expect.reshape(-1, expect.shape[-1]).numpy()

    got = model.encode_image_mm(
        jax.tree.map(jnp.asarray, params),
        {"pixel_values": pixels, "image_sizes": [[56, 56]]})
    got = got.reshape(-1, got.shape[-1])
    assert got.shape == expect.shape, (got.shape, expect.shape)
    np.testing.assert_allclose(got, expect, rtol=5e-4, atol=5e-4)


def test_mistral3_engine_e2e_matches_hf_greedy(tiny_mistral3):
    import torch

    model_dir, hf_model, cfg = tiny_mistral3

    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import SamplingParams

    rng = np.random.default_rng(1)
    pixels = rng.normal(size=(1, 3, 56, 56)).astype(np.float32)
    # 16 patches -> merge 2x2 -> 4 image tokens
    prompt_ids = [1, 5] + [120] * 4 + [11]

    llm = LLM(model=model_dir, dtype="float32", max_model_len=64,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_gpu_blocks_override=32, enforce_eager=True,
              skip_tokenizer_init=True)
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    out = llm.generate(
        {"prompt_token_ids": prompt_ids,
         "multi_modal_data": {"pixel_values": pixels,
                              "image_sizes": [[56, 56]]}}, sp)
    got = list(out[0].outputs[0].token_ids)

    with torch.no_grad():
        expect = hf_model.generate(
            input_ids=torch.tensor([prompt_ids]),
            pixel_values=torch.tensor(pixels),
            image_sizes=torch.tensor([[56, 56]]),
            max_new_tokens=6, do_sample=False, eos_token_id=None)
        expect = expect[0, len(prompt_ids):].tolist()
    assert got == expect, (got, expect)
