"""Baichuan (7B rope / 13B ALiBi) + ChatGLM tests (reference analogs:
vllm/model_executor/models/baichuan.py, chatglm.py).

Both families are remote-code-only on HF (no transformers classes, no
egress), so goldens come from two independent routes:
  * Baichuan-7B is mathematically a llama block with a fused W_pack —
    golden against transformers LlamaForCausalLM with the same weights
    renamed/fused into Baichuan layout.
  * ChatGLM is golden against a from-scratch numpy forward written
    directly from the published block semantics (MQA, interleaved
    half-dim rotary, fused swiglu) — independent of the serving stack.
  * Baichuan-13B (ALiBi) gets a prefill/decode-consistency check (the
    ALiBi math itself is HF-golden-tested via Bloom).

All three load configs through the generic PretrainedConfig fallback in
vllm_tpu/config.py (model_type unknown to AutoConfig)."""

import json

import numpy as np
import pytest

DIMS = dict(vocab_size=128, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=96)


def _save_st(d, tensors):
    from safetensors.numpy import save_file
    save_file(tensors, str(d / "model.safetensors"))


@pytest.fixture(scope="module")
def tiny_llama_and_baichuan(tmp_path_factory):
    """One tiny llama checkpoint saved twice: HF llama layout and
    Baichuan-7B layout (W_pack = [q|k|v] fused)."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    cfg = LlamaConfig(**DIMS, num_key_value_heads=4,
                      max_position_embeddings=128, rms_norm_eps=1e-6,
                      tie_word_embeddings=False)
    hf_model = LlamaForCausalLM(cfg)
    hf_model.eval()

    sd = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    bc = {}
    for k, v in sd.items():
        if ".self_attn.q_proj.weight" in k:
            base = k.replace("q_proj.weight", "")
            bc[base + "W_pack.weight"] = np.concatenate(
                [sd[base + "q_proj.weight"], sd[base + "k_proj.weight"],
                 sd[base + "v_proj.weight"]], axis=0)
        elif ".self_attn.k_proj.weight" in k or \
                ".self_attn.v_proj.weight" in k:
            continue
        else:
            bc[k] = v

    d = tmp_path_factory.mktemp("tiny_baichuan7b")
    _save_st(d, bc)
    (d / "config.json").write_text(json.dumps({
        "model_type": "baichuan",
        "architectures": ["BaiChuanForCausalLM"],
        **DIMS,
        "rms_norm_eps": 1e-6,
        "max_position_embeddings": 128,
        "model_max_length": 128,
        "tie_word_embeddings": False,
    }))
    return str(d), hf_model


def test_baichuan7b_engine_matches_hf_llama_greedy(tiny_llama_and_baichuan):
    """Same weights, Baichuan naming/fusion + generic-config fallback →
    greedy tokens must match transformers llama exactly."""
    import torch

    model_dir, hf_model = tiny_llama_and_baichuan

    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import SamplingParams

    prompt_ids = [1, 17, 9, 44, 5]
    llm = LLM(model=model_dir, dtype="float32", max_model_len=64,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_gpu_blocks_override=32, enforce_eager=True,
              skip_tokenizer_init=True)
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    out = llm.generate({"prompt_token_ids": prompt_ids}, sp)
    got = list(out[0].outputs[0].token_ids)

    with torch.no_grad():
        expect = hf_model.generate(
            input_ids=torch.tensor([prompt_ids]), max_new_tokens=8,
            do_sample=False, eos_token_id=None)
        expect = expect[0, len(prompt_ids):].tolist()
    assert got == expect, (got, expect)


@pytest.fixture(scope="module")
def tiny_baichuan13b(tmp_path_factory):
    rng = np.random.default_rng(3)
    H, I, V, L = (DIMS["hidden_size"], DIMS["intermediate_size"],
                  DIMS["vocab_size"], DIMS["num_hidden_layers"])

    def w(*shape):
        return (rng.standard_normal(shape) / np.sqrt(shape[-1])).astype(
            np.float32)

    t = {"model.embed_tokens.weight": w(V, H),
         "model.norm.weight": np.ones(H, np.float32),
         "lm_head.weight": w(V, H)}
    for i in range(L):
        p = f"model.layers.{i}."
        t[p + "input_layernorm.weight"] = np.ones(H, np.float32)
        t[p + "post_attention_layernorm.weight"] = np.ones(H, np.float32)
        t[p + "self_attn.W_pack.weight"] = w(3 * H, H)
        t[p + "self_attn.o_proj.weight"] = w(H, H)
        t[p + "mlp.gate_proj.weight"] = w(I, H)
        t[p + "mlp.up_proj.weight"] = w(I, H)
        t[p + "mlp.down_proj.weight"] = w(H, I)

    d = tmp_path_factory.mktemp("tiny_baichuan13b")
    _save_st(d, t)
    (d / "config.json").write_text(json.dumps({
        "model_type": "baichuan",
        "architectures": ["BaichuanForCausalLM"],  # 13B = ALiBi variant
        **DIMS,
        "rms_norm_eps": 1e-6,
        "model_max_length": 128,
        "tie_word_embeddings": False,
    }))
    return str(d)


def test_baichuan13b_alibi_prefill_decode_consistent(tiny_baichuan13b):
    """ALiBi serving: a longer prefill must continue exactly where the
    shorter prefill's decodes left off (catches position-bias drift
    between the prefill and decode paths)."""
    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import SamplingParams

    llm = LLM(model=tiny_baichuan13b, dtype="float32", max_model_len=64,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_gpu_blocks_override=32, enforce_eager=True,
              skip_tokenizer_init=True)
    prompt_ids = [2, 31, 7, 90]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    full = list(llm.generate({"prompt_token_ids": prompt_ids},
                             sp)[0].outputs[0].token_ids)
    assert len(full) == 8

    sp2 = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)
    cont = list(llm.generate(
        {"prompt_token_ids": prompt_ids + full[:4]},
        sp2)[0].outputs[0].token_ids)
    assert cont == full[4:], (cont, full)


# --------------------------------------------------------------- ChatGLM

GLM = dict(hidden_size=64, num_layers=2, num_attention_heads=4,
           ffn_hidden_size=96, padded_vocab_size=128,
           multi_query_group_num=2, kv_channels=16)


@pytest.fixture(scope="module")
def tiny_chatglm(tmp_path_factory):
    rng = np.random.default_rng(7)
    H, V, I = (GLM["hidden_size"], GLM["padded_vocab_size"],
               GLM["ffn_hidden_size"])
    nq, nk = GLM["num_attention_heads"], GLM["multi_query_group_num"]
    d = GLM["kv_channels"]

    def w(*shape):
        return (rng.standard_normal(shape) / np.sqrt(shape[-1])).astype(
            np.float32)

    t = {"transformer.embedding.word_embeddings.weight": w(V, H),
         "transformer.encoder.final_layernorm.weight":
             1 + 0.1 * w(H),
         "transformer.output_layer.weight": w(V, H)}
    for i in range(GLM["num_layers"]):
        p = f"transformer.encoder.layers.{i}."
        t[p + "input_layernorm.weight"] = 1 + 0.1 * w(H)
        t[p + "post_attention_layernorm.weight"] = 1 + 0.1 * w(H)
        t[p + "self_attention.query_key_value.weight"] = \
            w((nq + 2 * nk) * d, H)
        t[p + "self_attention.query_key_value.bias"] = \
            0.1 * w((nq + 2 * nk) * d)
        t[p + "self_attention.dense.weight"] = w(H, nq * d)
        t[p + "mlp.dense_h_to_4h.weight"] = w(2 * I, H)
        t[p + "mlp.dense_4h_to_h.weight"] = w(H, I)

    dd = tmp_path_factory.mktemp("tiny_chatglm")
    _save_st(dd, t)
    (dd / "config.json").write_text(json.dumps({
        "model_type": "chatglm",
        "architectures": ["ChatGLMModel"],
        **GLM,
        "multi_query_attention": True,
        "add_qkv_bias": True,
        "rmsnorm": True,
        "layernorm_epsilon": 1e-5,
        "seq_length": 128,
        "rope_ratio": 1.0,
    }))
    return str(dd), t


def _chatglm_ref_logits(t, ids):
    """From-scratch numpy ChatGLM forward (block semantics per the
    published GLM architecture: RMSNorm, MQA, interleaved rotary over
    the first half of each head dim, fused swiglu)."""
    H = GLM["hidden_size"]
    nq, nk, d = (GLM["num_attention_heads"],
                 GLM["multi_query_group_num"], GLM["kv_channels"])
    eps = 1e-5
    T = len(ids)

    def rms(x, g):
        return x / np.sqrt((x * x).mean(-1, keepdims=True) + eps) * g

    def rope(x):  # [T, h, d] -> interleaved pairs over first d//2 dims
        rot = d // 2
        inv = 1.0 / 10000.0**(np.arange(0, rot, 2) / rot)
        ang = np.arange(T)[:, None] * inv[None, :]  # [T, rot//2]
        cos, sin = np.cos(ang), np.sin(ang)
        xr = x[..., :rot].reshape(T, x.shape[1], rot // 2, 2)
        x0, x1 = xr[..., 0], xr[..., 1]
        out = np.stack([x0 * cos[:, None] - x1 * sin[:, None],
                        x1 * cos[:, None] + x0 * sin[:, None]], axis=-1)
        return np.concatenate([out.reshape(T, x.shape[1], rot),
                               x[..., rot:]], axis=-1)

    x = t["transformer.embedding.word_embeddings.weight"][ids]
    mask = np.tril(np.ones((T, T), bool))
    for i in range(GLM["num_layers"]):
        p = f"transformer.encoder.layers.{i}."
        h = rms(x, t[p + "input_layernorm.weight"])
        qkv = h @ t[p + "self_attention.query_key_value.weight"].T + \
            t[p + "self_attention.query_key_value.bias"]
        q = qkv[:, :nq * d].reshape(T, nq, d)
        k = qkv[:, nq * d:(nq + nk) * d].reshape(T, nk, d)
        v = qkv[:, (nq + nk) * d:].reshape(T, nk, d)
        q, k = rope(q), rope(k)
        k = np.repeat(k, nq // nk, axis=1)
        v = np.repeat(v, nq // nk, axis=1)
        s = np.einsum("qhd,khd->hqk", q, k) / np.sqrt(d)
        s = np.where(mask[None], s, -1e30)
        pr = np.exp(s - s.max(-1, keepdims=True))
        pr /= pr.sum(-1, keepdims=True)
        o = np.einsum("hqk,khd->qhd", pr, v).reshape(T, nq * d)
        x = x + o @ t[p + "self_attention.dense.weight"].T
        h = rms(x, t[p + "post_attention_layernorm.weight"])
        gu = h @ t[p + "mlp.dense_h_to_4h.weight"].T
        g, u = np.split(gu, 2, axis=-1)
        act = g / (1 + np.exp(-g)) * u
        x = x + act @ t[p + "mlp.dense_4h_to_h.weight"].T
    x = rms(x, t["transformer.encoder.final_layernorm.weight"])
    return x @ t["transformer.output_layer.weight"].T


def test_chatglm_engine_matches_numpy_reference_greedy(tiny_chatglm):
    model_dir, t = tiny_chatglm

    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import SamplingParams

    prompt_ids = [3, 64, 21, 90, 7]
    llm = LLM(model=model_dir, dtype="float32", max_model_len=64,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_gpu_blocks_override=32, enforce_eager=True,
              skip_tokenizer_init=True)
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    out = llm.generate({"prompt_token_ids": prompt_ids}, sp)
    got = list(out[0].outputs[0].token_ids)

    ids = list(prompt_ids)
    expect = []
    for _ in range(6):
        logits = _chatglm_ref_logits(t, ids)
        nxt = int(np.argmax(logits[-1]))
        expect.append(nxt)
        ids.append(nxt)
    assert got == expect, (got, expect)
