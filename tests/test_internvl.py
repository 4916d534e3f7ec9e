"""InternVL tests: InternViT tower + pixel-shuffle projector golden vs
HF, engine e2e (reference analog: vllm models/internvl.py)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_internvl(tmp_path_factory):
    import torch
    from transformers import (InternVLConfig,
                              InternVLForConditionalGeneration,
                              InternVLVisionConfig, Qwen2Config)

    torch.manual_seed(0)
    vis = InternVLVisionConfig(hidden_size=32, num_hidden_layers=2,
                               num_attention_heads=4,
                               intermediate_size=64,
                               image_size=[28, 28], patch_size=[7, 7])
    txt = Qwen2Config(vocab_size=128, hidden_size=64,
                      intermediate_size=128, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      max_position_embeddings=128)
    cfg = InternVLConfig(vision_config=vis, text_config=txt,
                         image_token_id=120, downsample_ratio=0.5,
                         pad_token_id=0)
    hf_model = InternVLForConditionalGeneration(cfg)
    hf_model.eval()
    d = tmp_path_factory.mktemp("tiny_internvl")
    hf_model.save_pretrained(str(d), safe_serialization=True)
    return str(d), hf_model, cfg


def test_internvl_image_encoding_matches_hf(tiny_internvl):
    import jax
    import jax.numpy as jnp
    import torch

    model_dir, hf_model, cfg = tiny_internvl

    from vllm_tpu.config import ModelConfig
    from vllm_tpu.models.internvl import InternVLForConditionalGeneration
    from vllm_tpu.models.weight_utils import weights_iterator

    mc = ModelConfig(model=model_dir, dtype="float32")
    model = InternVLForConditionalGeneration(mc)
    params = model.load_weights(weights_iterator(model_dir))

    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(1, 3, 28, 28)).astype(np.float32)

    with torch.no_grad():
        expect = hf_model.model.get_image_features(
            torch.tensor(pixels))[0].numpy()

    got = np.asarray(
        jax.jit(model.encode_image)(jax.tree.map(jnp.asarray, params),
                                    jnp.asarray(pixels)))[0]
    # 16 patches -> 0.5 shuffle -> 4 image tokens
    assert got.shape == expect.shape, (got.shape, expect.shape)
    np.testing.assert_allclose(got, expect, rtol=3e-4, atol=3e-4)


def test_internvl_engine_e2e_matches_hf_greedy(tiny_internvl):
    import torch

    model_dir, hf_model, cfg = tiny_internvl

    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import SamplingParams

    rng = np.random.default_rng(1)
    pixels = rng.normal(size=(1, 3, 28, 28)).astype(np.float32)
    prompt_ids = [1, 5] + [120] * 4 + [11]

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
