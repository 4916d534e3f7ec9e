"""Ultravox tests: whisper tower + stack/projector golden vs a torch
reference, engine e2e with audio substitution (reference analog:
vllm models/ultravox.py; transformers has no Ultravox class, so the
reference is composed in-test from WhisperEncoder + Llama)."""

import json

import numpy as np
import pytest

SF = 4          # stack_factor
PROJ_H = 48     # projector hidden (swiglu -> mid 24)
AUDIO_TOK = 120


def _rms(x, w, eps=1e-6):
    import torch
    xf = x.float()
    return (xf * torch.rsqrt(xf.pow(2).mean(-1, keepdim=True) + eps)
            ) * w.float()


@pytest.fixture(scope="module")
def tiny_ultravox(tmp_path_factory):
    import torch
    from safetensors.torch import save_file
    from transformers import LlamaConfig, LlamaForCausalLM, WhisperConfig
    from transformers.models.whisper.modeling_whisper import WhisperEncoder

    torch.manual_seed(0)
    audio_cfg = WhisperConfig(d_model=32, encoder_layers=2,
                              encoder_attention_heads=4,
                              encoder_ffn_dim=64, num_mel_bins=16,
                              max_source_positions=40)
    text_cfg = LlamaConfig(vocab_size=128, hidden_size=64,
                           intermediate_size=128, num_hidden_layers=2,
                           num_attention_heads=4, num_key_value_heads=2,
                           max_position_embeddings=128)
    enc = WhisperEncoder(audio_cfg)
    enc.eval()
    lm = LlamaForCausalLM(text_cfg)
    lm.eval()
    proj = {
        "ln_pre.weight": torch.rand(32 * SF) * 0.5 + 0.75,
        "linear_1.weight": torch.randn(PROJ_H, 32 * SF) * 0.05,
        "linear_2.weight": torch.randn(64, PROJ_H // 2) * 0.05,
        "ln_post.weight": torch.rand(64) * 0.5 + 0.75,
    }

    d = tmp_path_factory.mktemp("tiny_ultravox")
    tensors = {}
    for k, v in enc.state_dict().items():
        tensors[f"audio_tower.model.encoder.{k}"] = v.contiguous()
    for k, v in lm.state_dict().items():
        tensors[f"language_model.{k}"] = v.contiguous()
    for k, v in proj.items():
        tensors[f"multi_modal_projector.{k}"] = v.contiguous()
    save_file(tensors, f"{d}/model.safetensors")
    cfg = {
        "model_type": "ultravox",
        "architectures": ["UltravoxModel"],
        "audio_config": audio_cfg.to_dict(),
        "text_config": text_cfg.to_dict(),
        "audio_token_index": AUDIO_TOK,
        "stack_factor": SF,
        "projector_act": "swiglu",
        "projector_ln_mid": False,
        "hidden_size": PROJ_H,
        "vocab_size": 128,
    }
    with open(f"{d}/config.json", "w") as f:
        json.dump(cfg, f)
    return str(d), enc, lm, proj


def _torch_audio_embeds(enc, proj, feats):
    """Reference: ultravox.py StackAudioFrames + UltravoxProjector."""
    import torch

    with torch.no_grad():
        h = enc(torch.tensor(feats)).last_hidden_state[0]  # [T, D]
        T, D = h.shape
        Tp = -(-T // SF) * SF
        h = torch.nn.functional.pad(h, (0, 0, 0, Tp - T))
        h = h.reshape(Tp // SF, D * SF)
        h = _rms(h, proj["ln_pre.weight"])
        h = h @ proj["linear_1.weight"].T.float()
        x1, x2 = h.chunk(2, dim=-1)
        h = x1 * torch.nn.functional.silu(x2)
        h = h @ proj["linear_2.weight"].T.float()
        h = _rms(h, proj["ln_post.weight"])
    return h.numpy()


def test_ultravox_audio_encoding_matches_reference(tiny_ultravox):
    import jax
    import jax.numpy as jnp

    model_dir, enc, lm, proj = tiny_ultravox

    from vllm_tpu.config import ModelConfig
    from vllm_tpu.models.ultravox import UltravoxModel
    from vllm_tpu.models.weight_utils import weights_iterator

    mc = ModelConfig(model=model_dir, dtype="float32")
    model = UltravoxModel(mc)
    assert model.stack_factor == SF
    params = model.load_weights(weights_iterator(model_dir))

    rng = np.random.default_rng(0)
    feats = rng.normal(size=(1, 16, 80)).astype(np.float32)

    expect = _torch_audio_embeds(enc, proj, feats)
    got = np.asarray(
        jax.jit(model.encode_audio)(jax.tree.map(jnp.asarray, params),
                                    jnp.asarray(feats)))
    assert got.shape == expect.shape, (got.shape, expect.shape)
    np.testing.assert_allclose(got, expect, rtol=3e-4, atol=3e-4)


def test_ultravox_engine_e2e_matches_reference_greedy(tiny_ultravox):
    import torch

    model_dir, enc, lm, proj = tiny_ultravox

    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import SamplingParams

    rng = np.random.default_rng(1)
    feats = rng.normal(size=(1, 16, 80)).astype(np.float32)
    embeds = _torch_audio_embeds(enc, proj, feats)   # [10, 64] (40/SF)
    n_audio = embeds.shape[0]
    prompt_ids = [1, 5] + [AUDIO_TOK] * n_audio + [11]

    llm = LLM(model=model_dir, dtype="float32", max_model_len=64,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_gpu_blocks_override=32, enforce_eager=True,
              skip_tokenizer_init=True)
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    out = llm.generate(
        {"prompt_token_ids": prompt_ids,
         "multi_modal_data": {"input_features": feats[0]}}, sp)
    got = list(out[0].outputs[0].token_ids)

    # torch greedy with audio embeddings substituted at placeholders
    with torch.no_grad():
        ids = torch.tensor([prompt_ids])
        emb = lm.get_input_embeddings()(ids)
        emb[0, 2:2 + n_audio] = torch.tensor(embeds)
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
