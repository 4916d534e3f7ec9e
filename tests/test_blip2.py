"""BLIP-2 golden tests vs HF (reference analog: tests for
models/blip2.py). Staged: ViT and Q-Former+projection are each compared
tightly against the HF modules. (The composite is NOT compared
end-to-end at random init: a tiny random Q-Former sits on near-zero
LayerNorm variance where fp32 einsum-order noise in the ViT output is
amplified ~1e6x — measured; real trained checkpoints do not share that
knife edge.) The engine e2e test injects the SAME query embeddings into
the torch reference, making the greedy comparison deterministic while
still exercising the full placeholder-substitution + OPT serving
path."""

import numpy as np
import pytest

IMG_TOK = 120


@pytest.fixture(scope="module")
def tiny_blip2(tmp_path_factory):
    import torch
    from transformers import (Blip2Config, Blip2ForConditionalGeneration,
                              Blip2QFormerConfig, Blip2VisionConfig,
                              OPTConfig)

    torch.manual_seed(0)
    v = Blip2VisionConfig(hidden_size=32, intermediate_size=64,
                          num_hidden_layers=2, num_attention_heads=4,
                          image_size=16, patch_size=8)
    q = Blip2QFormerConfig(hidden_size=32, num_hidden_layers=3,
                           num_attention_heads=4, intermediate_size=64,
                           encoder_hidden_size=32,
                           cross_attention_frequency=2)
    t = OPTConfig(vocab_size=128, hidden_size=64, ffn_dim=128,
                  num_hidden_layers=2, num_attention_heads=4,
                  max_position_embeddings=128, word_embed_proj_dim=64)
    cfg = Blip2Config(vision_config=v.to_dict(),
                      qformer_config=q.to_dict(),
                      text_config=t.to_dict(), num_query_tokens=4)
    cfg.image_token_index = IMG_TOK
    m = Blip2ForConditionalGeneration(cfg)
    m.eval()
    d = tmp_path_factory.mktemp("tiny_blip2")
    m.save_pretrained(str(d), safe_serialization=True)
    return str(d), m, cfg


def _load(model_dir):
    import jax
    import jax.numpy as jnp

    from vllm_tpu.config import ModelConfig
    from vllm_tpu.models.registry import get_model
    from vllm_tpu.models.weight_utils import weights_iterator

    mc = ModelConfig(model=model_dir, dtype="float32")
    model = get_model(mc)
    assert type(model).__name__ == "Blip2ForConditionalGeneration"
    params = jax.tree.map(jnp.asarray,
                          model.load_weights(weights_iterator(model_dir)))
    return model, params


def test_blip2_vit_stage_matches_hf(tiny_blip2):
    import jax.numpy as jnp
    import torch

    model_dir, hf_model, cfg = tiny_blip2
    model, params = _load(model_dir)

    rng = np.random.default_rng(0)
    pv = rng.normal(size=(1, 3, 16, 16)).astype(np.float32) * 0.5
    with torch.no_grad():
        expect = hf_model.vision_model(
            torch.tensor(pv)).last_hidden_state.numpy()[0]
    got = np.asarray(model._encode_vit(params, jnp.asarray(pv)))[0]
    np.testing.assert_allclose(got, expect, rtol=3e-4, atol=3e-4)


def test_blip2_qformer_stage_matches_hf(tiny_blip2):
    import jax.numpy as jnp
    import torch

    model_dir, hf_model, cfg = tiny_blip2
    model, params = _load(model_dir)

    rng = np.random.default_rng(1)
    img = rng.normal(size=(1, 5, 32)).astype(np.float32) * 0.5
    with torch.no_grad():
        qo = hf_model.qformer(
            query_embeds=hf_model.query_tokens,
            encoder_hidden_states=torch.tensor(img)).last_hidden_state
        expect = hf_model.language_projection(qo).numpy()[0]
    got = np.asarray(model._encode_qformer(params, jnp.asarray(img)))[0]
    np.testing.assert_allclose(got, expect, rtol=3e-4, atol=3e-4)


def test_blip2_engine_e2e_substitution(tiny_blip2):
    import jax
    import jax.numpy as jnp
    import torch

    model_dir, hf_model, cfg = tiny_blip2

    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import SamplingParams

    model, params = _load(model_dir)
    rng = np.random.default_rng(2)
    pv = rng.normal(size=(1, 3, 16, 16)).astype(np.float32) * 0.5
    # the engine will compute THESE embeds internally; use the same ones
    # in the torch reference so the greedy comparison is deterministic
    embeds = np.asarray(
        jax.jit(model.encode_image)(params, jnp.asarray(pv)))[0]
    n_img = embeds.shape[0]
    prompt_ids = [2, 5] + [IMG_TOK] * n_img + [11]

    llm = LLM(model=model_dir, dtype="float32", max_model_len=64,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_gpu_blocks_override=32, enforce_eager=True,
              skip_tokenizer_init=True)
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    out = llm.generate(
        {"prompt_token_ids": prompt_ids,
         "multi_modal_data": {"pixel_values": pv[0]}}, sp)
    got = list(out[0].outputs[0].token_ids)

    lm = hf_model.language_model
    with torch.no_grad():
        ids = torch.tensor([prompt_ids])
        emb = lm.get_input_embeddings()(ids)
        emb[0, 2:2 + n_img] = torch.tensor(embeds)
        cur = emb
        toks = []
        for _ in range(6):
            logits = lm(inputs_embeds=cur).logits[0, -1]
            nxt = int(logits.argmax())
            toks.append(nxt)
            cur = torch.cat(
                [cur, lm.get_input_embeddings()(
                    torch.tensor([[nxt]]))], dim=1)
    assert got == toks, (got, toks)
