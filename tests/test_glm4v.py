"""GLM-4.1V golden tests vs HF (reference analog: tests for
models/glm4_1v.py) — bicubic position-embed adaptation in the vision
tower, downsample conv + gated merger, GLM interleaved partial MRoPE,
engine e2e."""

import numpy as np
import pytest

import jax.numpy as jnp

from tests.test_model_vs_hf import build_metadata

IMG_TOKEN = 250


@pytest.fixture(scope="module")
def glm4v_dir(tmp_path_factory):
    import torch
    from transformers import Glm4vConfig, Glm4vForConditionalGeneration

    torch.manual_seed(0)
    cfg = Glm4vConfig(
        vocab_size=256,
        image_token_id=IMG_TOKEN,
        video_start_token_id=251,
        video_end_token_id=252,
        image_start_token_id=253,
        image_end_token_id=254,
        text_config=dict(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=256,
            partial_rotary_factor=0.5,
            rope_scaling={"type": "default",
                          "mrope_section": [1, 1, 2]},
            pad_token_id=0),
        vision_config=dict(
            depth=2, hidden_size=32, num_heads=4, intermediate_size=48,
            out_hidden_size=64, patch_size=4, temporal_patch_size=2,
            spatial_merge_size=2, in_channels=3, image_size=16,
            rms_norm_eps=1e-5, hidden_act="silu"),
    )
    m = Glm4vForConditionalGeneration(cfg)
    m.eval()
    d = tmp_path_factory.mktemp("glm4v")
    m.save_pretrained(d, safe_serialization=True)
    return str(d)


def _load(model_dir):
    from vllm_tpu.config import ModelConfig
    from vllm_tpu.models.registry import get_model
    from vllm_tpu.models.weight_utils import weights_iterator

    model = get_model(ModelConfig(model=model_dir, dtype="float32"))
    params = model.load_weights(weights_iterator(model_dir))
    return model, params


def _mk_inputs(rng):
    # one 8x8-patch image (t=1) -> 4x4 = 16 merged tokens
    grid = np.array([[1, 8, 8]], np.int64)
    n_patches = int(grid.prod())
    pv = rng.standard_normal((n_patches, 3 * 2 * 4 * 4)).astype(
        np.float32)
    prompt = [3, 5, 253] + [IMG_TOKEN] * 16 + [254, 7, 11, 13]
    return prompt, pv, grid


def test_glm4v_mrope_positions_match_hf(glm4v_dir):
    import torch
    from transformers import Glm4vForConditionalGeneration

    rng = np.random.default_rng(0)
    prompt, pv, grid = _mk_inputs(rng)
    model, _ = _load(glm4v_dir)
    pos, delta = model.compute_mrope(prompt, {
        "pixel_values": pv, "image_grid_thw": grid})

    hf = Glm4vForConditionalGeneration.from_pretrained(glm4v_dir)
    hf_pos, hf_delta = hf.model.get_rope_index(
        torch.tensor([prompt]), torch.tensor(grid))
    np.testing.assert_array_equal(pos, hf_pos[:, 0].numpy())
    assert delta == int(hf_delta[0])


def test_glm4v_vision_tower_matches_hf(glm4v_dir):
    import torch
    from transformers import Glm4vForConditionalGeneration

    rng = np.random.default_rng(1)
    _, pv, grid = _mk_inputs(rng)
    hf = Glm4vForConditionalGeneration.from_pretrained(glm4v_dir)
    hf.eval()
    with torch.no_grad():
        expected = hf.model.visual(
            torch.tensor(pv), grid_thw=torch.tensor(grid)).numpy()

    model, params = _load(glm4v_dir)
    got = model.encode_image_mm(params, {
        "pixel_values": pv, "image_grid_thw": grid})
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-4)


def test_glm4v_full_logits_match_hf(glm4v_dir):
    import torch
    from transformers import Glm4vForConditionalGeneration

    rng = np.random.default_rng(2)
    prompt, pv, grid = _mk_inputs(rng)
    hf = Glm4vForConditionalGeneration.from_pretrained(glm4v_dir)
    hf.eval()
    with torch.no_grad():
        expected = hf(
            input_ids=torch.tensor([prompt]),
            pixel_values=torch.tensor(pv),
            image_grid_thw=torch.tensor(grid)).logits[0].numpy()

    model, params = _load(glm4v_dir)
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


def test_glm4v_engine_e2e_matches_hf_greedy(glm4v_dir):
    import torch
    from transformers import Glm4vForConditionalGeneration

    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import SamplingParams

    rng = np.random.default_rng(3)
    prompt, pv, grid = _mk_inputs(rng)

    llm = LLM(model=glm4v_dir, dtype="float32", max_model_len=64,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_gpu_blocks_override=32, enforce_eager=True,
              skip_tokenizer_init=True)
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    out = llm.generate(
        {"prompt_token_ids": prompt,
         "multi_modal_data": {"pixel_values": pv,
                              "image_grid_thw": grid}}, sp)
    got = list(out[0].outputs[0].token_ids)
    llm.llm_engine.shutdown()

    hf = Glm4vForConditionalGeneration.from_pretrained(glm4v_dir)
    hf.eval()
    with torch.no_grad():
        expect = hf.generate(input_ids=torch.tensor([prompt]),
                             pixel_values=torch.tensor(pv),
                             image_grid_thw=torch.tensor(grid),
                             max_new_tokens=6, do_sample=False)
        expect = expect[0, len(prompt):].tolist()
    assert got == expect, (got, expect)
