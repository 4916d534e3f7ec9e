"""LLaVA-OneVision golden tests vs HF (reference analog: tests for
models/llava_onevision.py) — SigLIP tower, anyres_max packer with the
bilinear downscale branch, engine e2e."""

import numpy as np
import pytest

IMG_TOK = 120


@pytest.fixture(scope="module")
def tiny_onevision(tmp_path_factory):
    import torch
    from transformers import (LlavaOnevisionConfig,
                              LlavaOnevisionForConditionalGeneration,
                              Qwen2Config, SiglipVisionConfig)

    torch.manual_seed(0)
    vision = SiglipVisionConfig(hidden_size=32, intermediate_size=64,
                                num_hidden_layers=2,
                                num_attention_heads=4, image_size=16,
                                patch_size=8, num_channels=3)
    text = Qwen2Config(vocab_size=128, hidden_size=64,
                       intermediate_size=128, num_hidden_layers=2,
                       num_attention_heads=4, num_key_value_heads=2,
                       max_position_embeddings=256)
    cfg = LlavaOnevisionConfig(
        vision_config=vision, text_config=text,
        image_token_index=IMG_TOK, video_token_index=121,
        image_grid_pinpoints=[[16, 16], [16, 32], [32, 16], [32, 32],
                              [48, 32], [32, 48]],
        vision_aspect_ratio="anyres_max_4",
        vision_feature_select_strategy="full",
        vision_feature_layer=-1, pad_token_id=0)
    m = LlavaOnevisionForConditionalGeneration(cfg)
    m.eval()
    d = tmp_path_factory.mktemp("tiny_onevision")
    m.save_pretrained(str(d), safe_serialization=True)
    return str(d), m, cfg


def _hf_features(hf_model, cfg, pv, image_size):
    import torch

    with torch.no_grad():
        # transformers >= 4.53 packs (unpad + anyres_max downscale +
        # newline) INSIDE get_image_features
        feats = hf_model.model.get_image_features(
            torch.tensor(pv),
            image_sizes=torch.tensor([image_size]),
            vision_feature_layer=cfg.vision_feature_layer,
            vision_feature_select_strategy="full")
    return feats[0].numpy()


@pytest.mark.parametrize("image_size,n_tiles", [
    ((48, 32), 7),   # 3x2 grid + base: triggers the bilinear downscale
    ((16, 16), 2),   # base + one tile (1x1 grid)
])
def test_onevision_packer_matches_hf(tiny_onevision, image_size, n_tiles):
    model_dir, hf_model, cfg = tiny_onevision

    from vllm_tpu.config import ModelConfig
    from vllm_tpu.models.registry import get_model
    from vllm_tpu.models.weight_utils import weights_iterator

    mc = ModelConfig(model=model_dir, dtype="float32")
    model = get_model(mc)
    assert type(model).__name__ == "LlavaOnevisionForConditionalGeneration"
    params = model.load_weights(weights_iterator(model_dir))

    rng = np.random.default_rng(0)
    pv = rng.normal(size=(n_tiles, 3, 16, 16)).astype(np.float32) * 0.5

    expect = _hf_features(hf_model, cfg, pv, image_size)
    got = model.encode_image_mm(
        params, {"pixel_values": pv, "image_sizes": [list(image_size)]})
    assert got.shape == expect.shape, (got.shape, expect.shape)
    np.testing.assert_allclose(got, expect, rtol=3e-4, atol=3e-4)


def test_onevision_engine_e2e_matches_hf_greedy(tiny_onevision):
    import torch

    model_dir, hf_model, cfg = tiny_onevision

    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import SamplingParams

    rng = np.random.default_rng(1)
    pv = rng.normal(size=(2, 3, 16, 16)).astype(np.float32) * 0.5
    embeds = _hf_features(hf_model, cfg, pv, (16, 16))
    n_img = embeds.shape[0]
    prompt_ids = [1, 5] + [IMG_TOK] * n_img + [11]

    llm = LLM(model=model_dir, dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_gpu_blocks_override=32, enforce_eager=True,
              skip_tokenizer_init=True)
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    out = llm.generate(
        {"prompt_token_ids": prompt_ids,
         "multi_modal_data": {"pixel_values": pv,
                              "image_sizes": [[16, 16]]}}, sp)
    got = list(out[0].outputs[0].token_ids)

    lm = hf_model.model.language_model
    with torch.no_grad():
        ids = torch.tensor([prompt_ids])
        emb = hf_model.get_input_embeddings()(ids)
        emb[0, 2:2 + n_img] = torch.tensor(embeds)
        cur = emb
        toks = []
        for _ in range(6):
            h = lm(inputs_embeds=cur).last_hidden_state
            logits = hf_model.lm_head(h)[0, -1]
            nxt = int(logits.argmax())
            toks.append(nxt)
            cur = torch.cat(
                [cur, hf_model.get_input_embeddings()(
                    torch.tensor([[nxt]]))], dim=1)
    assert got == toks, (got, toks)
