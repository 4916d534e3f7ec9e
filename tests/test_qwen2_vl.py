"""Qwen2-VL golden tests vs HF transformers: MRoPE position computation,
vision tower + merger, and full logits with image embeddings substituted
(reference analog: tests/models/multimodal for Qwen2-VL)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tests.test_model_vs_hf import build_metadata

IMG_TOKEN = 250


@pytest.fixture(scope="module")
def qwen2vl_dir(tmp_path_factory):
    import torch
    from transformers import Qwen2VLConfig, Qwen2VLForConditionalGeneration

    torch.manual_seed(0)
    cfg = Qwen2VLConfig(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
        rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
        image_token_id=IMG_TOKEN,
        video_token_id=251,
        vision_start_token_id=252,
        vision_config=dict(
            depth=2,
            embed_dim=32,
            num_heads=4,
            mlp_ratio=2,
            hidden_size=64,
            patch_size=4,
            temporal_patch_size=2,
            spatial_merge_size=2,
            in_channels=3,
        ),
    )
    m = Qwen2VLForConditionalGeneration(cfg)
    m.eval()
    d = tmp_path_factory.mktemp("qwen2vl")
    m.save_pretrained(d, safe_serialization=True)
    return str(d)


def _load(qwen2vl_dir):
    from vllm_tpu.config import ModelConfig
    from vllm_tpu.models.registry import get_model
    from vllm_tpu.models.weight_utils import weights_iterator

    mc = ModelConfig(model=qwen2vl_dir, dtype="float32")
    model = get_model(mc)
    params = model.load_weights(weights_iterator(qwen2vl_dir))
    return model, params


def _mk_inputs(rng):
    # one 8x8-patch image (t=1) -> 4x4 = 16 merged tokens
    grid = np.array([[1, 8, 8]], np.int64)
    n_patches = int(grid.prod())
    pv = rng.standard_normal((n_patches, 3 * 2 * 4 * 4)).astype(np.float32)
    # real prompts wrap images in <|vision_start|>...: HF's
    # get_rope_index keys off vision_start_token_id (252)
    prompt = [3, 5, 252] + [IMG_TOKEN] * 16 + [7, 11, 13]
    return prompt, pv, grid


def test_mrope_positions_match_hf(qwen2vl_dir):
    import torch
    from transformers import Qwen2VLForConditionalGeneration

    rng = np.random.default_rng(0)
    prompt, pv, grid = _mk_inputs(rng)
    model, _ = _load(qwen2vl_dir)
    pos, delta = model.compute_mrope(prompt, {
        "pixel_values": pv, "image_grid_thw": grid})

    hf = Qwen2VLForConditionalGeneration.from_pretrained(qwen2vl_dir)
    hf_pos, hf_delta = hf.model.get_rope_index(
        torch.tensor([prompt]), torch.tensor(grid))
    np.testing.assert_array_equal(pos, hf_pos[:, 0].numpy())
    assert delta == int(hf_delta[0])


def test_vision_tower_matches_hf(qwen2vl_dir):
    import torch
    from transformers import Qwen2VLForConditionalGeneration

    rng = np.random.default_rng(1)
    _, pv, grid = _mk_inputs(rng)
    hf = Qwen2VLForConditionalGeneration.from_pretrained(qwen2vl_dir)
    hf.eval()
    with torch.no_grad():
        expected = hf.model.visual(
            torch.tensor(pv), grid_thw=torch.tensor(grid)).numpy()

    model, params = _load(qwen2vl_dir)
    got = model.encode_image_mm(params, {
        "pixel_values": pv, "image_grid_thw": grid})
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-4)


def test_full_logits_match_hf(qwen2vl_dir):
    import torch
    from transformers import Qwen2VLForConditionalGeneration

    rng = np.random.default_rng(2)
    prompt, pv, grid = _mk_inputs(rng)
    hf = Qwen2VLForConditionalGeneration.from_pretrained(qwen2vl_dir)
    hf.eval()
    with torch.no_grad():
        expected = hf(
            input_ids=torch.tensor([prompt]),
            pixel_values=torch.tensor(pv),
            image_grid_thw=torch.tensor(grid)).logits[0].numpy()

    model, params = _load(qwen2vl_dir)
    T_pad = 32
    metadata, input_ids, _ = build_metadata([prompt], 4, max_blocks=8,
                                            total_pad=T_pad, req_pad=2)
    pos3, _ = model.compute_mrope(prompt, {
        "pixel_values": pv, "image_grid_thw": grid})
    mrope = np.zeros((3, T_pad), np.int32)
    mrope[:, :len(prompt)] = pos3
    import dataclasses

    metadata = dataclasses.replace(metadata,
                                   mrope_positions=jnp.asarray(mrope))

    emb = model.encode_image_mm(params, {
        "pixel_values": pv, "image_grid_thw": grid})
    embed_idx = np.full(T_pad, T_pad, np.int32)
    embed_vecs = np.zeros((T_pad, emb.shape[-1]), np.float32)
    img_pos = [i for i, t in enumerate(prompt) if t == IMG_TOKEN]
    for j, p in enumerate(img_pos):
        embed_idx[p] = p
        embed_vecs[p] = emb[j]

    a = model.args
    kv = jnp.zeros((a.num_layers, 32, 2 * a.num_kv_heads, 4, a.head_dim),
                   jnp.float32)
    hidden, _ = model.forward(
        params, input_ids, [kv], metadata,
        embed_override=(jnp.asarray(embed_idx), jnp.asarray(embed_vecs)))
    logits = np.asarray(model.compute_logits(params, hidden))
    np.testing.assert_allclose(logits[:len(prompt)], expected, rtol=4e-4,
                               atol=4e-4)


def test_qwen2vl_engine_e2e_matches_hf_greedy(qwen2vl_dir):
    """Full engine path: MRoPE positions, vision encode, embed
    substitution, decode — greedy tokens must match HF generate."""
    import torch
    from transformers import Qwen2VLForConditionalGeneration

    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import SamplingParams

    rng = np.random.default_rng(3)
    prompt, pv, grid = _mk_inputs(rng)

    llm = LLM(model=qwen2vl_dir, dtype="float32", max_model_len=64,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_gpu_blocks_override=32, enforce_eager=True,
              skip_tokenizer_init=True)
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    out = llm.generate(
        {"prompt_token_ids": prompt,
         "multi_modal_data": {"pixel_values": pv,
                              "image_grid_thw": grid}}, sp)
    got = list(out[0].outputs[0].token_ids)

    hf = Qwen2VLForConditionalGeneration.from_pretrained(qwen2vl_dir)
    hf.eval()
    with torch.no_grad():
        expect = hf.generate(input_ids=torch.tensor([prompt]),
                             pixel_values=torch.tensor(pv),
                             image_grid_thw=torch.tensor(grid),
                             max_new_tokens=6, do_sample=False)
        expect = expect[0, len(prompt):].tolist()
    assert got == expect, (got, expect)

    # text-only request through the same mrope engine still works
    out2 = llm.generate({"prompt_token_ids": [3, 5, 7, 11]}, sp)
    assert len(out2[0].outputs[0].token_ids) == 6


# ------------------------------------------------------------ Qwen2.5-VL

@pytest.fixture(scope="module")
def qwen25vl_dir(tmp_path_factory):
    import torch
    from transformers import (Qwen2_5_VLConfig,
                              Qwen2_5_VLForConditionalGeneration)

    torch.manual_seed(0)
    cfg = Qwen2_5_VLConfig(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
        rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
        image_token_id=IMG_TOKEN,
        video_token_id=251,
        vision_start_token_id=252,
        vision_config=dict(
            depth=3,
            hidden_size=32,
            intermediate_size=48,
            num_heads=4,
            out_hidden_size=64,
            patch_size=4,
            temporal_patch_size=2,
            spatial_merge_size=2,
            in_channels=3,
            window_size=16,  # 2x2 merged units per window
            fullatt_block_indexes=[1],
        ),
    )
    m = Qwen2_5_VLForConditionalGeneration(cfg)
    m.eval()
    d = tmp_path_factory.mktemp("qwen25vl")
    m.save_pretrained(d, safe_serialization=True)
    return str(d)


def test_qwen25_vision_tower_matches_hf(qwen25vl_dir):
    """Window attention + RMSNorm/SwiGLU ViT vs HF, with a grid that
    needs window padding (10x8 patches -> 5x4 merged units, window=2)."""
    import torch
    from transformers import Qwen2_5_VLForConditionalGeneration

    rng = np.random.default_rng(5)
    grid = np.array([[1, 10, 8]], np.int64)
    pv = rng.standard_normal(
        (int(grid.prod()), 3 * 2 * 4 * 4)).astype(np.float32)
    hf = Qwen2_5_VLForConditionalGeneration.from_pretrained(qwen25vl_dir)
    hf.eval()
    with torch.no_grad():
        expected = hf.model.visual(
            torch.tensor(pv), grid_thw=torch.tensor(grid)).numpy()

    model, params = _load(qwen25vl_dir)
    got = model.encode_image_mm(params, {
        "pixel_values": pv, "image_grid_thw": grid})
    np.testing.assert_allclose(got, expected, rtol=3e-4, atol=3e-4)


def test_qwen25_engine_e2e_matches_hf_greedy(qwen25vl_dir):
    import torch
    from transformers import Qwen2_5_VLForConditionalGeneration

    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import SamplingParams

    rng = np.random.default_rng(6)
    grid = np.array([[1, 8, 8]], np.int64)
    pv = rng.standard_normal(
        (int(grid.prod()), 3 * 2 * 4 * 4)).astype(np.float32)
    prompt = [3, 5, 252] + [IMG_TOKEN] * 16 + [7, 11, 13]

    llm = LLM(model=qwen25vl_dir, dtype="float32", max_model_len=64,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_gpu_blocks_override=32, enforce_eager=True,
              skip_tokenizer_init=True)
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    out = llm.generate(
        {"prompt_token_ids": prompt,
         "multi_modal_data": {"pixel_values": pv,
                              "image_grid_thw": grid}}, sp)
    got = list(out[0].outputs[0].token_ids)

    hf = Qwen2_5_VLForConditionalGeneration.from_pretrained(qwen25vl_dir)
    hf.eval()
    with torch.no_grad():
        expect = hf.generate(input_ids=torch.tensor([prompt]),
                             pixel_values=torch.tensor(pv),
                             image_grid_thw=torch.tensor(grid),
                             max_new_tokens=6, do_sample=False)
        expect = expect[0, len(prompt):].tolist()
    assert got == expect, (got, expect)
