"""MiniCPM3 golden test (reference analog: vllm minicpm3.py).

MiniCPM3 = DeepSeek-style MLA attention + MiniCPM muP scalings.
Remote-code-only on HF, so the golden is a from-scratch NAIVE numpy
forward (full K/V materialization, per-head neox rope on the rope dims,
shared rotary key) — independently validating the engine's ABSORBED
latent-cache MLA serving path. Loads through the generic
PretrainedConfig fallback."""

import json

import numpy as np
import pytest

C = dict(vocab_size=128, hidden_size=64, num_hidden_layers=2,
         num_attention_heads=4, num_key_value_heads=4,
         intermediate_size=96, qk_nope_head_dim=16, qk_rope_head_dim=8,
         v_head_dim=16, q_lora_rank=32, kv_lora_rank=24)
SE, SD, DMB = 2.0, 1.4, 32


@pytest.fixture(scope="module")
def tiny_minicpm3(tmp_path_factory):
    from safetensors.numpy import save_file

    rng = np.random.default_rng(11)
    H, I, V = C["hidden_size"], C["intermediate_size"], C["vocab_size"]
    nh = C["num_attention_heads"]
    dn, dr, dv = (C["qk_nope_head_dim"], C["qk_rope_head_dim"],
                  C["v_head_dim"])
    ql, kl = C["q_lora_rank"], C["kv_lora_rank"]

    def w(*shape):
        return (rng.standard_normal(shape) / np.sqrt(shape[-1])).astype(
            np.float32)

    t = {"model.embed_tokens.weight": w(V, H),
         "model.norm.weight": 1 + 0.1 * w(H),
         "lm_head.weight": w(V, H)}
    for i in range(C["num_hidden_layers"]):
        p = f"model.layers.{i}."
        t[p + "input_layernorm.weight"] = 1 + 0.1 * w(H)
        t[p + "post_attention_layernorm.weight"] = 1 + 0.1 * w(H)
        t[p + "self_attn.q_a_proj.weight"] = w(ql, H)
        t[p + "self_attn.q_a_layernorm.weight"] = 1 + 0.1 * w(ql)
        t[p + "self_attn.q_b_proj.weight"] = w(nh * (dn + dr), ql)
        t[p + "self_attn.kv_a_proj_with_mqa.weight"] = w(kl + dr, H)
        t[p + "self_attn.kv_a_layernorm.weight"] = 1 + 0.1 * w(kl)
        t[p + "self_attn.kv_b_proj.weight"] = w(nh * (dn + dv), kl)
        t[p + "self_attn.o_proj.weight"] = w(H, nh * dv)
        t[p + "mlp.gate_proj.weight"] = w(I, H)
        t[p + "mlp.up_proj.weight"] = w(I, H)
        t[p + "mlp.down_proj.weight"] = w(H, I)

    d = tmp_path_factory.mktemp("tiny_minicpm3")
    save_file(t, str(d / "model.safetensors"))
    (d / "config.json").write_text(json.dumps({
        "model_type": "minicpm3",
        "architectures": ["MiniCPM3ForCausalLM"],
        **C,
        "rms_norm_eps": 1e-6,
        "rope_theta": 10000.0,
        "max_position_embeddings": 128,
        "tie_word_embeddings": False,
        "scale_emb": SE,
        "scale_depth": SD,
        "dim_model_base": DMB,
    }))
    return str(d), t


def _ref_logits(t, ids):
    """Naive MLA forward: materialize full per-head K/V."""
    H = C["hidden_size"]
    nh = C["num_attention_heads"]
    dn, dr, dv = (C["qk_nope_head_dim"], C["qk_rope_head_dim"],
                  C["v_head_dim"])
    kl = C["kv_lora_rank"]
    L = C["num_hidden_layers"]
    eps = 1e-6
    T = len(ids)
    s_r = SD / np.sqrt(L)

    def rms(x, g):
        return x / np.sqrt((x * x).mean(-1, keepdims=True) + eps) * g

    def rope(x):  # [T, h, dr] neox half-split
        inv = 1.0 / 10000.0**(np.arange(0, dr, 2) / dr)
        ang = np.arange(T)[:, None] * inv[None, :]
        cos, sin = np.cos(ang), np.sin(ang)
        x1, x2 = x[..., :dr // 2], x[..., dr // 2:]
        return np.concatenate(
            [x1 * cos[:, None] - x2 * sin[:, None],
             x2 * cos[:, None] + x1 * sin[:, None]], axis=-1)

    x = t["model.embed_tokens.weight"][ids] * SE
    mask = np.tril(np.ones((T, T), bool))
    for i in range(L):
        p = f"model.layers.{i}."
        h = rms(x, t[p + "input_layernorm.weight"])
        cq = rms(h @ t[p + "self_attn.q_a_proj.weight"].T,
                 t[p + "self_attn.q_a_layernorm.weight"])
        q = (cq @ t[p + "self_attn.q_b_proj.weight"].T).reshape(
            T, nh, dn + dr)
        ckv = h @ t[p + "self_attn.kv_a_proj_with_mqa.weight"].T
        c_kv = rms(ckv[:, :kl], t[p + "self_attn.kv_a_layernorm.weight"])
        k_pe = rope(ckv[:, kl:][:, None, :])  # [T, 1, dr]
        kv = (c_kv @ t[p + "self_attn.kv_b_proj.weight"].T).reshape(
            T, nh, dn + dv)
        k_nope, v = kv[..., :dn], kv[..., dn:]
        q = np.concatenate([q[..., :dn], rope(q[..., dn:])], axis=-1)
        k = np.concatenate(
            [k_nope, np.broadcast_to(k_pe, (T, nh, dr))], axis=-1)
        s = np.einsum("qhd,khd->hqk", q, k) / np.sqrt(dn + dr)
        s = np.where(mask[None], s, -1e30)
        pr = np.exp(s - s.max(-1, keepdims=True))
        pr /= pr.sum(-1, keepdims=True)
        o = np.einsum("hqk,khd->qhd", pr, v).reshape(T, nh * dv)
        x = x + (o @ t[p + "self_attn.o_proj.weight"].T) * s_r
        h = rms(x, t[p + "post_attention_layernorm.weight"])
        gte = h @ t[p + "mlp.gate_proj.weight"].T
        up = h @ t[p + "mlp.up_proj.weight"].T
        ffw = (gte / (1 + np.exp(-gte)) * up) @ \
            t[p + "mlp.down_proj.weight"].T
        x = x + ffw * s_r
    x = rms(x, t["model.norm.weight"])
    return (x * (DMB / H)) @ t["lm_head.weight"].T


def test_minicpm3_engine_matches_numpy_reference_greedy(tiny_minicpm3):
    model_dir, t = tiny_minicpm3

    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import SamplingParams

    prompt_ids = [7, 33, 91, 15, 2]
    llm = LLM(model=model_dir, dtype="float32", max_model_len=64,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_gpu_blocks_override=32, enforce_eager=True,
              skip_tokenizer_init=True)
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    got = list(llm.generate({"prompt_token_ids": prompt_ids},
                            sp)[0].outputs[0].token_ids)

    ids = list(prompt_ids)
    expect = []
    for _ in range(6):
        nxt = int(np.argmax(_ref_logits(t, ids)[-1]))
        expect.append(nxt)
        ids.append(nxt)
    assert got == expect, (got, expect)
