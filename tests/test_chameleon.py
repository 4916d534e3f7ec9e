"""Chameleon golden tests vs HF (reference analog: tests for
models/chameleon.py) — per-head biased qk-LayerNorm text model, VQ-VAE
image tokenizer, early-fusion engine e2e."""

import numpy as np
import pytest

IMG_TOK = 99
N_CODES = 16


def _code_token(i: int) -> str:
    enc = "".join(chr(ord("A") + int(d)) for d in str(i))
    return f"IMGIMG{enc}Z"


@pytest.fixture(scope="module")
def tiny_chameleon(tmp_path_factory):
    import torch
    from transformers import (ChameleonConfig,
                              ChameleonForConditionalGeneration,
                              ChameleonVQVAEConfig)

    torch.manual_seed(0)
    vq = ChameleonVQVAEConfig(
        embed_dim=8, num_embeddings=N_CODES, base_channels=32,
        channel_multiplier=[1, 2], num_res_blocks=1, resolution=16,
        latent_channels=8, in_channels=3, double_latent=False,
        attn_resolutions=[8])
    vocab_map = {_code_token(i): 200 + i for i in range(N_CODES)}
    vocab_map["<image>"] = IMG_TOK
    cfg = ChameleonConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=128,
        swin_norm=False, vq_config=vq.to_dict(),
        vocabulary_map=vocab_map, pad_token_id=0)
    m = ChameleonForConditionalGeneration(cfg)
    m.eval()
    d = tmp_path_factory.mktemp("tiny_chameleon")
    m.save_pretrained(str(d), safe_serialization=True)
    return str(d), m, cfg


def _load(model_dir):
    from vllm_tpu.config import ModelConfig
    from vllm_tpu.models.registry import get_model
    from vllm_tpu.models.weight_utils import weights_iterator

    model = get_model(ModelConfig(model=model_dir, dtype="float32"))
    params = model.load_weights(weights_iterator(model_dir))
    return model, params


def test_chameleon_vq_tokens_match_hf(tiny_chameleon):
    import torch

    model_dir, hf_model, cfg = tiny_chameleon
    model, params = _load(model_dir)

    rng = np.random.default_rng(0)
    pv = rng.normal(size=(1, 3, 16, 16)).astype(np.float32) * 0.5
    with torch.no_grad():
        expect = hf_model.model.get_image_tokens(
            torch.tensor(pv)).numpy().reshape(-1)
    import jax.numpy as jnp

    codes = np.asarray(model._vq_tokens(params, jnp.asarray(pv)))
    got_bpe = np.asarray([model._img2bpe[int(c)]
                          for c in codes.reshape(-1)])
    np.testing.assert_array_equal(got_bpe, expect)


def test_chameleon_text_logits_match_hf(tiny_chameleon):
    import torch

    model_dir, hf_model, cfg = tiny_chameleon
    model, params = _load(model_dir)

    from tests.test_model_vs_hf import build_metadata
    import jax.numpy as jnp

    TOKENS = [[1, 5, 9, 3, 7, 11, 2], [4, 8, 100, 42]]
    with torch.no_grad():
        expected = [hf_model(torch.tensor([t])).logits[0].numpy()
                    for t in TOKENS]
    metadata, input_ids, _ = build_metadata(TOKENS, 4, max_blocks=8,
                                            total_pad=16, req_pad=4)
    a = model.args
    kv = jnp.zeros((a.num_layers, 32, 2 * a.num_kv_heads, 4,
                    a.head_dim), jnp.float32)
    hidden, _ = model.forward(params, input_ids, [kv], metadata)
    logits = np.asarray(model.compute_logits(params, hidden))
    offset = 0
    for r, toks in enumerate(TOKENS):
        np.testing.assert_allclose(logits[offset:offset + len(toks)],
                                   expected[r], rtol=2e-3, atol=2e-3)
        offset += len(toks)


def test_chameleon_engine_early_fusion_e2e(tiny_chameleon):
    """Image pixels -> VQ codes -> BPE embedding rows substituted at
    <image> placeholders; greedy must match HF running the SAME token
    substitution."""
    import torch

    model_dir, hf_model, cfg = tiny_chameleon

    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import SamplingParams

    rng = np.random.default_rng(1)
    pv = rng.normal(size=(3, 16, 16)).astype(np.float32) * 0.5
    with torch.no_grad():
        img_bpe = hf_model.model.get_image_tokens(
            torch.tensor(pv[None])).numpy().reshape(-1).tolist()
    n_img = len(img_bpe)
    prompt_ids = [1, 5] + [IMG_TOK] * n_img + [11]

    llm = LLM(model=model_dir, dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_gpu_blocks_override=48, enforce_eager=True,
              skip_tokenizer_init=True)
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    out = llm.generate(
        {"prompt_token_ids": prompt_ids,
         "multi_modal_data": {"pixel_values": pv}}, sp)
    got = list(out[0].outputs[0].token_ids)

    full = [1, 5] + img_bpe + [11]
    seq = list(full)
    with torch.no_grad():
        for _ in range(6):
            logits = hf_model(torch.tensor([seq])).logits[0, -1]
            seq.append(int(logits.argmax()))
    assert got == seq[len(full):], (got, seq[len(full):])
