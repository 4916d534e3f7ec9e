"""Idefics3/SmolVLM multimodal tests: SigLIP tower + pixel-shuffle
connector golden vs HF, and engine end-to-end with image-embedding
substitution (reference analog: vllm models/idefics3.py, smolvlm.py)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_idefics3(tmp_path_factory):
    import torch
    from transformers import (Idefics3Config,
                              Idefics3ForConditionalGeneration,
                              Idefics3VisionConfig, LlamaConfig)

    torch.manual_seed(0)
    vision = Idefics3VisionConfig(hidden_size=32, intermediate_size=64,
                                  num_hidden_layers=3,
                                  num_attention_heads=4,
                                  image_size=28, patch_size=7)
    text = LlamaConfig(vocab_size=128, hidden_size=64,
                       intermediate_size=128, num_hidden_layers=2,
                       num_attention_heads=4, num_key_value_heads=2,
                       max_position_embeddings=128)
    cfg = Idefics3Config(vision_config=vision, text_config=text,
                         scale_factor=2, image_token_id=120,
                         pad_token_id=0)
    hf_model = Idefics3ForConditionalGeneration(cfg)
    hf_model.eval()
    d = tmp_path_factory.mktemp("tiny_idefics3")
    hf_model.save_pretrained(str(d), safe_serialization=True)
    return str(d), hf_model, cfg


def test_idefics3_image_encoding_matches_hf(tiny_idefics3):
    import jax
    import jax.numpy as jnp
    import torch

    model_dir, hf_model, cfg = tiny_idefics3

    from vllm_tpu.config import ModelConfig
    from vllm_tpu.models.idefics3 import Idefics3ForConditionalGeneration
    from vllm_tpu.models.weight_utils import weights_iterator

    mc = ModelConfig(model=model_dir, dtype="float32")
    model = Idefics3ForConditionalGeneration(mc)
    params = model.load_weights(weights_iterator(model_dir))

    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(1, 3, 28, 28)).astype(np.float32)

    with torch.no_grad():
        vis = hf_model.model.vision_model(
            torch.tensor(pixels)).last_hidden_state
        expect = hf_model.model.connector(vis)[0].numpy()

    got = np.asarray(
        jax.jit(model.encode_image)(jax.tree.map(jnp.asarray, params),
                                    jnp.asarray(pixels)))[0]
    # (28/7)^2 = 16 patches -> /4 = 4 image tokens
    assert got.shape == (model.num_image_tokens, 64)
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-4)


def test_idefics3_engine_e2e_matches_hf_greedy(tiny_idefics3):
    import torch

    model_dir, hf_model, cfg = tiny_idefics3

    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import SamplingParams

    num_img_tokens = 4
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
        # HF expects pixel_values [B, num_images, C, H, W]
        pv = torch.tensor(pixels)[None]
        expect = hf_model.generate(input_ids=ids, pixel_values=pv,
                                   max_new_tokens=6, do_sample=False)
        expect = expect[0, len(prompt_ids):].tolist()
    assert got == expect, (got, expect)


def test_smolvlm_arch_resolves():
    from vllm_tpu.models.registry import resolve_model_cls

    cls = resolve_model_cls("SmolVLMForConditionalGeneration")
    from vllm_tpu.models.idefics3 import Idefics3ForConditionalGeneration
    assert cls is Idefics3ForConditionalGeneration
