"""PaliGemma + Gemma3-VLM tests: projector goldens and engine e2e with
the bidirectional-span masks (reference analog: vllm
models/paligemma.py, gemma3_mm.py)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_paligemma(tmp_path_factory):
    import torch
    from transformers import (GemmaConfig, PaliGemmaConfig,
                              PaliGemmaForConditionalGeneration,
                              SiglipVisionConfig)

    torch.manual_seed(0)
    vision = SiglipVisionConfig(hidden_size=32, intermediate_size=64,
                                num_hidden_layers=2,
                                num_attention_heads=4,
                                image_size=28, patch_size=14,
                                projection_dim=64)
    text = GemmaConfig(vocab_size=128, hidden_size=64,
                       intermediate_size=128, num_hidden_layers=2,
                       num_attention_heads=4, num_key_value_heads=2,
                       head_dim=16, max_position_embeddings=128)
    cfg = PaliGemmaConfig(vision_config=vision, text_config=text,
                          image_token_index=120, projection_dim=64,
                          pad_token_id=0)
    hf_model = PaliGemmaForConditionalGeneration(cfg)
    hf_model.eval()
    d = tmp_path_factory.mktemp("tiny_paligemma")
    hf_model.save_pretrained(str(d), safe_serialization=True)
    return str(d), hf_model, cfg


def test_paligemma_image_encoding_matches_hf(tiny_paligemma):
    import jax
    import jax.numpy as jnp
    import torch

    model_dir, hf_model, cfg = tiny_paligemma

    from vllm_tpu.config import ModelConfig
    from vllm_tpu.models.paligemma import PaliGemmaForConditionalGeneration
    from vllm_tpu.models.weight_utils import weights_iterator

    mc = ModelConfig(model=model_dir, dtype="float32")
    model = PaliGemmaForConditionalGeneration(mc)
    params = model.load_weights(weights_iterator(model_dir))

    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(1, 3, 28, 28)).astype(np.float32)

    with torch.no_grad():
        expect = hf_model.model.get_image_features(
            torch.tensor(pixels))[0].numpy()

    got = np.asarray(
        jax.jit(model.encode_image)(jax.tree.map(jnp.asarray, params),
                                    jnp.asarray(pixels)))[0]
    np.testing.assert_allclose(got, expect, rtol=3e-4, atol=3e-4)


def test_paligemma_engine_e2e_matches_hf_greedy(tiny_paligemma):
    """Multi-token text SUFFIX after the image exercises the prefix-LM
    bidirectional mask (causal-only serving would diverge)."""
    import torch

    model_dir, hf_model, cfg = tiny_paligemma

    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import SamplingParams

    rng = np.random.default_rng(1)
    pixels = rng.normal(size=(1, 3, 28, 28)).astype(np.float32)
    prompt_ids = [120] * 4 + [1, 5, 9, 13]

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
        expect = hf_model.generate(
            input_ids=ids, pixel_values=torch.tensor(pixels),
            max_new_tokens=6, do_sample=False, eos_token_id=None)
        expect = expect[0, len(prompt_ids):].tolist()
    assert got == expect, (got, expect)


@pytest.fixture(scope="module")
def tiny_gemma3mm(tmp_path_factory):
    import torch
    from transformers import (Gemma3Config,
                              Gemma3ForConditionalGeneration,
                              Gemma3TextConfig, SiglipVisionConfig)

    torch.manual_seed(0)
    vision = SiglipVisionConfig(hidden_size=32, intermediate_size=64,
                                num_hidden_layers=2,
                                num_attention_heads=4,
                                image_size=28, patch_size=7)
    text = Gemma3TextConfig(vocab_size=128, hidden_size=64,
                            intermediate_size=128, num_hidden_layers=2,
                            num_attention_heads=4, num_key_value_heads=2,
                            head_dim=16, max_position_embeddings=128,
                            sliding_window=16,
                            sliding_window_pattern=2)
    cfg = Gemma3Config(vision_config=vision, text_config=text,
                       image_token_index=120, mm_tokens_per_image=4,
                       boi_token_index=121, eoi_token_index=122,
                       pad_token_id=0)
    hf_model = Gemma3ForConditionalGeneration(cfg)
    hf_model.eval()
    d = tmp_path_factory.mktemp("tiny_gemma3mm")
    hf_model.save_pretrained(str(d), safe_serialization=True)
    return str(d), hf_model, cfg


def test_gemma3mm_image_encoding_matches_hf(tiny_gemma3mm):
    import jax
    import jax.numpy as jnp
    import torch

    model_dir, hf_model, cfg = tiny_gemma3mm

    from vllm_tpu.config import ModelConfig
    from vllm_tpu.models.paligemma import Gemma3ForConditionalGeneration
    from vllm_tpu.models.weight_utils import weights_iterator

    mc = ModelConfig(model=model_dir, dtype="float32")
    model = Gemma3ForConditionalGeneration(mc)
    params = model.load_weights(weights_iterator(model_dir))

    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(1, 3, 28, 28)).astype(np.float32)

    with torch.no_grad():
        expect = hf_model.model.get_image_features(
            torch.tensor(pixels))[0].numpy()

    got = np.asarray(
        jax.jit(model.encode_image)(jax.tree.map(jnp.asarray, params),
                                    jnp.asarray(pixels)))[0]
    assert got.shape == expect.shape, (got.shape, expect.shape)
    np.testing.assert_allclose(got, expect, rtol=3e-4, atol=3e-4)


def test_gemma3mm_engine_e2e_matches_hf_greedy(tiny_gemma3mm):
    import torch

    model_dir, hf_model, cfg = tiny_gemma3mm

    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import SamplingParams

    rng = np.random.default_rng(1)
    pixels = rng.normal(size=(1, 3, 28, 28)).astype(np.float32)
    prompt_ids = [2, 121] + [120] * 4 + [122, 5, 9]
    token_type_ids = [0, 0, 1, 1, 1, 1, 0, 0, 0]

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
        expect = hf_model.generate(
            input_ids=torch.tensor([prompt_ids]),
            token_type_ids=torch.tensor([token_type_ids]),
            pixel_values=torch.tensor(pixels),
            max_new_tokens=6, do_sample=False, eos_token_id=None)
        expect = expect[0, len(prompt_ids):].tolist()
    assert got == expect, (got, expect)
