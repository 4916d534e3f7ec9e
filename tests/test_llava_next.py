"""LLaVA-NeXT anyres tests: tile packing/unpadding golden vs HF, engine
e2e (reference analog: vllm models/llava_next.py)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_llava_next(tmp_path_factory):
    import torch
    from transformers import (CLIPVisionConfig, LlamaConfig,
                              LlavaNextConfig,
                              LlavaNextForConditionalGeneration)

    torch.manual_seed(0)
    vision = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                              num_hidden_layers=3, num_attention_heads=4,
                              image_size=28, patch_size=14,
                              projection_dim=32)
    text = LlamaConfig(vocab_size=128, hidden_size=64,
                       intermediate_size=128, num_hidden_layers=2,
                       num_attention_heads=4, num_key_value_heads=2,
                       max_position_embeddings=128)
    cfg = LlavaNextConfig(vision_config=vision, text_config=text,
                          image_token_index=120,
                          image_grid_pinpoints=[[28, 56], [56, 28],
                                                [56, 56]],
                          vision_feature_layer=-2,
                          vision_feature_select_strategy="default",
                          pad_token_id=0)
    hf_model = LlavaNextForConditionalGeneration(cfg)
    hf_model.eval()
    d = tmp_path_factory.mktemp("tiny_llava_next")
    hf_model.save_pretrained(str(d), safe_serialization=True)
    return str(d), hf_model, cfg


def _tiles(rng):
    # a (28, 56) image -> best resolution (28, 56) -> 1x2 grid + base
    return rng.normal(size=(3, 3, 28, 28)).astype(np.float32), (28, 56)


def test_llava_next_features_match_hf(tiny_llava_next):
    import jax.numpy as jnp
    import torch

    model_dir, hf_model, cfg = tiny_llava_next

    from vllm_tpu.config import ModelConfig
    from vllm_tpu.models.llava_next import LlavaNextForConditionalGeneration
    from vllm_tpu.models.weight_utils import weights_iterator

    mc = ModelConfig(model=model_dir, dtype="float32")
    model = LlavaNextForConditionalGeneration(mc)
    params = model.load_weights(weights_iterator(model_dir))

    rng = np.random.default_rng(0)
    pv, size = _tiles(rng)

    with torch.no_grad():
        # transformers >= 4.57: get_image_features returns the PACKED
        # per-image features (base + unpadded spatial + newline)
        feats = hf_model.model.get_image_features(
            torch.tensor(pv[None]), image_sizes=torch.tensor([size]))
        expect = feats[0].numpy()

    import jax
    got = model.encode_image_mm(
        jax.tree.map(jnp.asarray, params),
        {"pixel_values": pv, "image_sizes": [size]})
    assert got.shape == expect.shape, (got.shape, expect.shape)
    np.testing.assert_allclose(got, expect, rtol=3e-4, atol=3e-4)


def test_llava_next_engine_e2e_matches_hf_greedy(tiny_llava_next):
    import torch

    model_dir, hf_model, cfg = tiny_llava_next

    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import SamplingParams

    rng = np.random.default_rng(1)
    pv, size = _tiles(rng)
    with torch.no_grad():
        feats = hf_model.model.get_image_features(
            torch.tensor(pv[None]), image_sizes=torch.tensor([size]))
    n_img = feats[0].shape[0]
    prompt_ids = [1, 5] + [120] * n_img + [11]

    llm = LLM(model=model_dir, dtype="float32", max_model_len=64,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_gpu_blocks_override=32, enforce_eager=True,
              skip_tokenizer_init=True)
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    out = llm.generate(
        {"prompt_token_ids": prompt_ids,
         "multi_modal_data": {"pixel_values": pv,
                              "image_sizes": [size]}}, sp)
    got = list(out[0].outputs[0].token_ids)

    with torch.no_grad():
        expect = hf_model.generate(
            input_ids=torch.tensor([prompt_ids]),
            pixel_values=torch.tensor(pv[None]),
            image_sizes=torch.tensor([size]),
            max_new_tokens=6, do_sample=False)
        expect = expect[0, len(prompt_ids):].tolist()
    assert got == expect, (got, expect)
