"""Mllama (Llama 3.2 Vision) tests: vision+projector golden vs HF and
engine e2e greedy with cross-attention state slots (reference analog:
vllm models/mllama.py)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_mllama(tmp_path_factory):
    import torch
    from transformers import MllamaConfig, MllamaForConditionalGeneration
    from transformers.models.mllama.configuration_mllama import (
        MllamaTextConfig, MllamaVisionConfig)

    torch.manual_seed(0)
    vision = MllamaVisionConfig(
        hidden_size=32, num_hidden_layers=2, num_global_layers=1,
        attention_heads=4, intermediate_size=64, image_size=28,
        patch_size=14, max_num_tiles=2, num_channels=3,
        intermediate_layers_indices=[0, 1], vision_output_dim=96,
        supported_aspect_ratios=[[1, 1], [1, 2]])
    text = MllamaTextConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=4,
        cross_attention_layers=[1, 3], num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=96,
        max_position_embeddings=128, rope_theta=10000.0,
        rope_scaling={"rope_type": "default"}, rms_norm_eps=1e-6,
        tie_word_embeddings=False,
        pad_token_id=0, bos_token_id=1, eos_token_id=2)
    cfg = MllamaConfig(vision_config=vision, text_config=text,
                       image_token_index=120, pad_token_id=0)
    hf_model = MllamaForConditionalGeneration(cfg)
    hf_model.eval()
    d = tmp_path_factory.mktemp("tiny_mllama")
    hf_model.save_pretrained(str(d), safe_serialization=True)
    return str(d), hf_model, cfg


def _mm_inputs(rng, tiles=2):
    pixels = rng.normal(size=(1, 1, tiles, 3, 28, 28)).astype(np.float32)
    ar_ids = np.array([[2]], np.int64)  # aspect [1, 2] -> id 2
    ar_mask = np.ones((1, 1, tiles), np.int64)
    return pixels, ar_ids, ar_mask


def test_mllama_vision_projection_matches_hf(tiny_mllama):
    import torch

    model_dir, hf_model, cfg = tiny_mllama

    from vllm_tpu.config import ModelConfig
    from vllm_tpu.models.mllama import MllamaForConditionalGeneration
    from vllm_tpu.models.weight_utils import weights_iterator

    mc = ModelConfig(model=model_dir, dtype="float32")
    model = MllamaForConditionalGeneration(mc)
    params = model.load_weights(weights_iterator(model_dir))

    rng = np.random.default_rng(0)
    pixels, ar_ids, ar_mask = _mm_inputs(rng)

    with torch.no_grad():
        vis = hf_model.model.vision_model(
            pixel_values=torch.tensor(pixels),
            aspect_ratio_ids=torch.tensor(ar_ids),
            aspect_ratio_mask=torch.tensor(ar_mask)).last_hidden_state
        expect = hf_model.model.multi_modal_projector(vis).reshape(
            -1, vis.shape[-2], cfg.text_config.hidden_size)
        # [tiles, num_patches, H] -> flat rows like the serving hook
        expect = expect.reshape(-1, cfg.text_config.hidden_size).numpy()

    got = model.encode_image_mm(params, {
        "pixel_values": pixels, "aspect_ratio_ids": ar_ids,
        "aspect_ratio_mask": ar_mask})
    assert got.shape == expect.shape, (got.shape, expect.shape)
    np.testing.assert_allclose(got, expect, rtol=3e-4, atol=3e-4)


def test_mllama_engine_e2e_matches_hf_greedy(tiny_mllama):
    import torch

    model_dir, hf_model, cfg = tiny_mllama

    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import SamplingParams

    rng = np.random.default_rng(1)
    pixels, ar_ids, ar_mask = _mm_inputs(rng)
    prompt_ids = [120, 3, 17, 9, 44]  # <image> + text

    llm = LLM(model=model_dir, dtype="float32", max_model_len=64,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_gpu_blocks_override=32, enforce_eager=True,
              skip_tokenizer_init=True)
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    out = llm.generate(
        {"prompt_token_ids": prompt_ids,
         "multi_modal_data": {"pixel_values": pixels,
                              "aspect_ratio_ids": ar_ids,
                              "aspect_ratio_mask": ar_mask}}, sp)
    got = list(out[0].outputs[0].token_ids)

    with torch.no_grad():
        # all-ones cross mask == serving semantics (every text row
        # attends every valid vision token)
        cross_mask = torch.ones((1, len(prompt_ids), 1, 2),
                                dtype=torch.long)
        expect = hf_model.generate(
            input_ids=torch.tensor([prompt_ids]),
            pixel_values=torch.tensor(pixels),
            aspect_ratio_ids=torch.tensor(ar_ids),
            aspect_ratio_mask=torch.tensor(ar_mask),
            cross_attention_mask=cross_mask,
            max_new_tokens=6, do_sample=False, eos_token_id=None)
        expect = expect[0, len(prompt_ids):].tolist()
    assert got == expect, (got, expect)

    # text-only request in the same engine: cross-attention layers are
    # masked out per-row; generation must be deterministic and finish
    t1 = list(llm.generate({"prompt_token_ids": [5, 9, 13]},
                           sp)[0].outputs[0].token_ids)
    t2 = list(llm.generate({"prompt_token_ids": [5, 9, 13]},
                           sp)[0].outputs[0].token_ids)
    assert len(t1) == 6 and t1 == t2, (t1, t2)
