"""Aria golden tests vs HF (reference analog: tests for models/aria.py)
— grouped-expert MoE text model + SigLIP tower + learned-query
resampler projector."""

import numpy as np
import pytest

IMG_TOK = 9


@pytest.fixture(scope="module")
def tiny_aria(tmp_path_factory):
    import torch
    from transformers import (AriaConfig, AriaForConditionalGeneration,
                              AriaTextConfig, Idefics3VisionConfig)

    torch.manual_seed(0)
    t = AriaTextConfig(vocab_size=128, hidden_size=64,
                       intermediate_size=96, num_hidden_layers=2,
                       num_attention_heads=4, num_key_value_heads=2,
                       moe_num_experts=4, moe_topk=2,
                       moe_num_shared_experts=1,
                       max_position_embeddings=128, pad_token_id=0)
    v = Idefics3VisionConfig(hidden_size=32, intermediate_size=64,
                             num_hidden_layers=2, num_attention_heads=4,
                             image_size=16, patch_size=8)
    cfg = AriaConfig(text_config=t, vision_config=v,
                     image_token_index=IMG_TOK,
                     projector_patch_to_query_dict={4: 3})
    m = AriaForConditionalGeneration(cfg)
    m.eval()
    d = tmp_path_factory.mktemp("tiny_aria")
    m.save_pretrained(str(d), safe_serialization=True)
    return str(d), m, cfg


def test_aria_image_encoding_matches_hf(tiny_aria):
    import jax
    import jax.numpy as jnp
    import torch

    model_dir, hf_model, cfg = tiny_aria

    from vllm_tpu.config import ModelConfig
    from vllm_tpu.models.registry import get_model
    from vllm_tpu.models.weight_utils import weights_iterator

    model = get_model(ModelConfig(model=model_dir, dtype="float32"))
    params = jax.tree.map(jnp.asarray,
                          model.load_weights(weights_iterator(model_dir)))

    rng = np.random.default_rng(0)
    pv = rng.normal(size=(1, 3, 16, 16)).astype(np.float32) * 0.5
    with torch.no_grad():
        img = hf_model.model.vision_tower(
            torch.tensor(pv)).last_hidden_state
        expect = hf_model.model.multi_modal_projector(img).numpy()[0]
    got = np.asarray(
        jax.jit(model.encode_image)(params, jnp.asarray(pv)))[0]
    assert got.shape == expect.shape, (got.shape, expect.shape)
    np.testing.assert_allclose(got, expect, rtol=1e-3, atol=1e-3)


def test_aria_engine_greedy_matches_hf(tiny_aria):
    import torch

    model_dir, hf_model, cfg = tiny_aria

    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import SamplingParams

    prompts = [[3, 17, 42, 5, 88], [7, 21, 4]]
    hf_out = []
    lm_head = hf_model.lm_head
    lm = hf_model.model.language_model
    with torch.no_grad():
        for p in prompts:
            seq = list(p)
            for _ in range(8):
                h = lm(torch.tensor([seq])).last_hidden_state
                seq.append(int(lm_head(h)[0, -1].argmax()))
            hf_out.append(seq[len(p):])

    llm = LLM(model=model_dir, dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_gpu_blocks_override=32, enforce_eager=True,
              skip_tokenizer_init=True)
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    outs = llm.generate([{"prompt_token_ids": p} for p in prompts], sp)
    for r in range(2):
        assert list(outs[r].outputs[0].token_ids) == hf_out[r], \
            (r, list(outs[r].outputs[0].token_ids), hf_out[r])
