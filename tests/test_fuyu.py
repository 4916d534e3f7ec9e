"""Fuyu tests: linear patch embedding + Persimmon LM, engine e2e vs HF
greedy (reference analog: vllm models/fuyu.py)."""

import numpy as np
import pytest

PATCH = 4
IMG_TOK = 71011


@pytest.fixture(scope="module")
def tiny_fuyu(tmp_path_factory):
    import torch
    from transformers import FuyuConfig, FuyuForCausalLM

    torch.manual_seed(0)
    cfg = FuyuConfig(vocab_size=72000, hidden_size=64,
                     intermediate_size=128, num_hidden_layers=2,
                     num_attention_heads=4, patch_size=PATCH,
                     num_channels=3, max_position_embeddings=128,
                     pad_token_id=0)
    m = FuyuForCausalLM(cfg)
    m.eval()
    d = tmp_path_factory.mktemp("tiny_fuyu")
    m.save_pretrained(str(d), safe_serialization=True)
    return str(d), m, cfg


def test_fuyu_patch_embedding_matches_hf(tiny_fuyu):
    import jax
    import torch

    model_dir, hf_model, cfg = tiny_fuyu

    from vllm_tpu.config import ModelConfig
    from vllm_tpu.models.fuyu import FuyuForCausalLM
    from vllm_tpu.models.weight_utils import weights_iterator

    mc = ModelConfig(model=model_dir, dtype="float32")
    model = FuyuForCausalLM(mc)
    params = model.load_weights(weights_iterator(model_dir))
    params = jax.tree.map(np.asarray, params)

    rng = np.random.default_rng(0)
    patches = rng.normal(size=(6, PATCH * PATCH * 3)).astype(np.float32)

    with torch.no_grad():
        expect = hf_model.model.vision_embed_tokens(
            torch.tensor(patches)).numpy()
    got = model.encode_image_mm(params, {"image_patches": patches})
    np.testing.assert_allclose(got, expect, rtol=3e-4, atol=3e-4)


def test_fuyu_engine_e2e_matches_hf_greedy(tiny_fuyu):
    import torch

    model_dir, hf_model, cfg = tiny_fuyu

    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import SamplingParams

    rng = np.random.default_rng(1)
    n_patches = 6
    patches = rng.normal(size=(n_patches, PATCH * PATCH * 3)
                         ).astype(np.float32)
    prompt_ids = [1, 5] + [IMG_TOK] * n_patches + [11]

    llm = LLM(model=model_dir, dtype="float32", max_model_len=64,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_gpu_blocks_override=32, enforce_eager=True,
              skip_tokenizer_init=True)
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    out = llm.generate(
        {"prompt_token_ids": prompt_ids,
         "multi_modal_data": {"image_patches": patches}}, sp)
    got = list(out[0].outputs[0].token_ids)

    with torch.no_grad():
        ids = torch.tensor([prompt_ids])
        emb = hf_model.get_input_embeddings()(ids)
        emb[0, 2:2 + n_patches] = hf_model.model.vision_embed_tokens(
            torch.tensor(patches))
        cur = emb
        toks = []
        for _ in range(6):
            logits = hf_model(inputs_embeds=cur).logits[0, -1]
            nxt = int(logits.argmax())
            toks.append(nxt)
            cur = torch.cat(
                [cur, hf_model.get_input_embeddings()(
                    torch.tensor([[nxt]]))], dim=1)
    assert got == toks, (got, toks)
