"""Golden-logit tests for remote-code llama-skeleton variants that have
no transformers class in this image: Orion, QWen-1, TeleChat2, Solar,
TeleFLM, DeciLM + thin aliases (MiMo, StableLM-Epoch, QuantMixtral).

Each checkpoint is synthesized tensor-by-tensor and compared against a
from-scratch numpy forward (same pattern as tests/test_baichuan_chatglm.py);
TeleFLM and MiMo fold their delta into a real transformers golden instead.
"""

import json

import numpy as np
import pytest

TOKENS = [3, 64, 21, 90, 7]


def _save_st(d, tensors):
    from safetensors.numpy import save_file

    save_file({k: np.ascontiguousarray(v) for k, v in tensors.items()},
              str(d / "model.safetensors"))


def _w(rng, *shape):
    return (rng.standard_normal(shape) / np.sqrt(shape[-1])).astype(
        np.float32)


# ---------------------------------------------------------------- numpy ref


def _rope(x, base=10000.0):
    """neox-style (rotate-half) full rotary over [T, h, d]."""
    T, h, d = x.shape
    inv = 1.0 / base ** (np.arange(0, d, 2) / d)
    ang = np.arange(T)[:, None] * inv[None, :]
    cos = np.concatenate([np.cos(ang), np.cos(ang)], -1)[:, None, :]
    sin = np.concatenate([np.sin(ang), np.sin(ang)], -1)[:, None, :]
    x1, x2 = x[..., :d // 2], x[..., d // 2:]
    rot = np.concatenate([-x2, x1], -1)
    return x * cos + rot * sin


def _llama_ref_logits(t, ids, *, nq, nk, d, eps=1e-5, norm="rms",
                      p="model.layers.", embed="model.embed_tokens.weight",
                      final="model.norm", head="lm_head.weight",
                      num_layers=2, bskcn=None, bskcn_tv=None,
                      nk_per_layer=None, embed_mult=None,
                      logits_mult=None):
    """Llama-skeleton numpy forward with the variant knobs under test:
    LayerNorm-vs-RMSNorm (+bias), per-layer kv head counts (DeciLM),
    o/down biases (TeleChat2), bskcn blends (Solar), muP scalars."""
    T = len(ids)

    def norm_fn(x, prefix):
        w = t[prefix + ".weight"]
        if norm == "ln":
            mu = x.mean(-1, keepdims=True)
            x = (x - mu) / np.sqrt(x.var(-1, keepdims=True) + eps)
            return x * w + t.get(prefix + ".bias", 0.0)
        return x / np.sqrt((x * x).mean(-1, keepdims=True) + eps) * w

    x = t[embed][ids]
    if embed_mult:
        x = x * embed_mult
    mask = np.tril(np.ones((T, T), bool))
    saved = {}
    for i in range(num_layers):
        if bskcn is not None:
            s1, s2, s3, s4 = bskcn
            if i in s1:
                saved[1] = x
            if i in s2:
                saved[2] = x
            if i in s3:
                x = saved[1] * bskcn_tv + x * (1 - bskcn_tv)
            if i in s4:
                x = saved[2] * bskcn_tv + x * (1 - bskcn_tv)
        nki = nk_per_layer[i] if nk_per_layer else nk
        lp = f"{p}{i}."
        h = norm_fn(x, lp + "input_layernorm")
        q = (h @ t[lp + "self_attn.q_proj.weight"].T).reshape(T, nq, d)
        k = (h @ t[lp + "self_attn.k_proj.weight"].T).reshape(T, nki, d)
        v = (h @ t[lp + "self_attn.v_proj.weight"].T).reshape(T, nki, d)
        q, k = _rope(q), _rope(k)
        k = np.repeat(k, nq // nki, axis=1)
        v = np.repeat(v, nq // nki, axis=1)
        s = np.einsum("qhd,khd->hqk", q, k) / np.sqrt(d)
        s = np.where(mask[None], s, -1e30)
        pr = np.exp(s - s.max(-1, keepdims=True))
        pr /= pr.sum(-1, keepdims=True)
        o = np.einsum("hqk,khd->qhd", pr, v).reshape(T, nq * d)
        o = o @ t[lp + "self_attn.o_proj.weight"].T + \
            t.get(lp + "self_attn.o_proj.bias", 0.0)
        x = x + o
        h = norm_fn(x, lp + "post_attention_layernorm")
        g = h @ t[lp + "mlp.gate_proj.weight"].T
        u = h @ t[lp + "mlp.up_proj.weight"].T
        dn = (g / (1 + np.exp(-g)) * u) @ t[lp + "mlp.down_proj.weight"].T
        x = x + dn + t.get(lp + "mlp.down_proj.bias", 0.0)
    x = norm_fn(x, final)
    logits = x @ t[head].T
    if logits_mult:
        logits = logits * logits_mult
    return logits


def _engine_greedy(model_dir, n=6):
    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import SamplingParams

    llm = LLM(model=model_dir, dtype="float32", max_model_len=64,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_gpu_blocks_override=32, enforce_eager=True,
              skip_tokenizer_init=True)
    sp = SamplingParams(temperature=0.0, max_tokens=n, ignore_eos=True)
    out = llm.generate({"prompt_token_ids": TOKENS}, sp)
    return list(out[0].outputs[0].token_ids)


def _ref_greedy(ref_fn, n=6):
    ids = list(TOKENS)
    expect = []
    for _ in range(n):
        nxt = int(np.argmax(ref_fn(ids)[-1]))
        expect.append(nxt)
        ids.append(nxt)
    return expect


# -------------------------------------------------------------------- Orion


def test_orion_matches_numpy(tmp_path):
    rng = np.random.default_rng(11)
    V, H, I, nq, nk, d, L = 128, 64, 96, 4, 2, 16, 2
    t = {"model.embed_tokens.weight": _w(rng, V, H),
         "model.norm.weight": 1 + 0.1 * _w(rng, H),
         "model.norm.bias": 0.1 * _w(rng, H),
         "lm_head.weight": _w(rng, V, H)}
    for i in range(L):
        lp = f"model.layers.{i}."
        t[lp + "input_layernorm.weight"] = 1 + 0.1 * _w(rng, H)
        t[lp + "input_layernorm.bias"] = 0.1 * _w(rng, H)
        t[lp + "post_attention_layernorm.weight"] = 1 + 0.1 * _w(rng, H)
        t[lp + "post_attention_layernorm.bias"] = 0.1 * _w(rng, H)
        t[lp + "self_attn.q_proj.weight"] = _w(rng, nq * d, H)
        t[lp + "self_attn.k_proj.weight"] = _w(rng, nk * d, H)
        t[lp + "self_attn.v_proj.weight"] = _w(rng, nk * d, H)
        t[lp + "self_attn.o_proj.weight"] = _w(rng, H, nq * d)
        t[lp + "mlp.gate_proj.weight"] = _w(rng, I, H)
        t[lp + "mlp.up_proj.weight"] = _w(rng, I, H)
        t[lp + "mlp.down_proj.weight"] = _w(rng, H, I)
    d_dir = tmp_path / "orion"
    d_dir.mkdir()
    _save_st(d_dir, t)
    (d_dir / "config.json").write_text(json.dumps({
        "model_type": "orion", "architectures": ["OrionForCausalLM"],
        "vocab_size": V, "hidden_size": H, "intermediate_size": I,
        "num_hidden_layers": L, "num_attention_heads": nq,
        "num_key_value_heads": nk, "rms_norm_eps": 1e-5,
        "max_position_embeddings": 128, "hidden_act": "silu",
    }))
    got = _engine_greedy(str(d_dir))
    expect = _ref_greedy(lambda ids: _llama_ref_logits(
        t, ids, nq=nq, nk=nk, d=d, norm="ln"))
    assert got == expect, (got, expect)


# ------------------------------------------------------------------- QWen-1


def test_qwen1_matches_numpy(tmp_path):
    rng = np.random.default_rng(13)
    V, H, I, nq, d, L = 128, 64, 48, 4, 16, 2
    t = {"transformer.wte.weight": _w(rng, V, H),
         "transformer.ln_f.weight": 1 + 0.1 * _w(rng, H),
         "lm_head.weight": _w(rng, V, H)}
    for i in range(L):
        lp = f"transformer.h.{i}."
        t[lp + "ln_1.weight"] = 1 + 0.1 * _w(rng, H)
        t[lp + "ln_2.weight"] = 1 + 0.1 * _w(rng, H)
        t[lp + "attn.c_attn.weight"] = _w(rng, 3 * H, H)
        t[lp + "attn.c_attn.bias"] = 0.1 * _w(rng, 3 * H)
        t[lp + "attn.c_proj.weight"] = _w(rng, H, H)
        t[lp + "mlp.w1.weight"] = _w(rng, I, H)  # up
        t[lp + "mlp.w2.weight"] = _w(rng, I, H)  # gate
        t[lp + "mlp.c_proj.weight"] = _w(rng, H, I)
    d_dir = tmp_path / "qwen1"
    d_dir.mkdir()
    _save_st(d_dir, t)
    (d_dir / "config.json").write_text(json.dumps({
        "model_type": "qwen", "architectures": ["QWenLMHeadModel"],
        "vocab_size": V, "hidden_size": H, "intermediate_size": 2 * I,
        "num_hidden_layers": L, "num_attention_heads": nq,
        "layer_norm_epsilon": 1e-6, "max_position_embeddings": 128,
        "rotary_emb_base": 10000,
    }))

    def ref(ids):
        T = len(ids)
        eps = 1e-6

        def rms(x, g):
            return x / np.sqrt((x * x).mean(-1, keepdims=True) + eps) * g

        x = t["transformer.wte.weight"][ids]
        mask = np.tril(np.ones((T, T), bool))
        for i in range(L):
            lp = f"transformer.h.{i}."
            h = rms(x, t[lp + "ln_1.weight"])
            qkv = h @ t[lp + "attn.c_attn.weight"].T + \
                t[lp + "attn.c_attn.bias"]
            q = _rope(qkv[:, :H].reshape(T, nq, d))
            k = _rope(qkv[:, H:2 * H].reshape(T, nq, d))
            v = qkv[:, 2 * H:].reshape(T, nq, d)
            s = np.einsum("qhd,khd->hqk", q, k) / np.sqrt(d)
            s = np.where(mask[None], s, -1e30)
            pr = np.exp(s - s.max(-1, keepdims=True))
            pr /= pr.sum(-1, keepdims=True)
            o = np.einsum("hqk,khd->qhd", pr, v).reshape(T, H)
            x = x + o @ t[lp + "attn.c_proj.weight"].T
            h = rms(x, t[lp + "ln_2.weight"])
            g = h @ t[lp + "mlp.w2.weight"].T
            u = h @ t[lp + "mlp.w1.weight"].T
            x = x + (g / (1 + np.exp(-g)) * u) @ \
                t[lp + "mlp.c_proj.weight"].T
        x = rms(x, t["transformer.ln_f.weight"])
        return x @ t["lm_head.weight"].T

    got = _engine_greedy(str(d_dir))
    expect = _ref_greedy(ref)
    assert got == expect, (got, expect)


# ---------------------------------------------------------------- TeleChat2


def test_telechat2_matches_numpy(tmp_path):
    rng = np.random.default_rng(17)
    V, H, I, nq, d, L = 128, 64, 96, 4, 16, 2
    t = {"transformer.word_embeddings.weight": _w(rng, V, H),
         "transformer.ln_f.weight": 1 + 0.1 * _w(rng, H),
         "lm_head.weight": _w(rng, V, H)}
    for i in range(L):
        lp = f"transformer.h.{i}."
        t[lp + "input_layernorm.weight"] = 1 + 0.1 * _w(rng, H)
        t[lp + "post_attention_layernorm.weight"] = 1 + 0.1 * _w(rng, H)
        t[lp + "self_attention.query.weight"] = _w(rng, nq * d, H)
        # interleaved per-head [k_i; v_i] fused kv
        t[lp + "self_attention.key_value.weight"] = _w(rng, 2 * nq * d, H)
        t[lp + "self_attention.dense.weight"] = _w(rng, H, nq * d)
        t[lp + "self_attention.dense.bias"] = 0.1 * _w(rng, H)
        t[lp + "mlp.gate_proj.weight"] = _w(rng, I, H)
        t[lp + "mlp.up_proj.weight"] = _w(rng, I, H)
        t[lp + "mlp.down_proj.weight"] = _w(rng, H, I)
        t[lp + "mlp.down_proj.bias"] = 0.1 * _w(rng, H)
    d_dir = tmp_path / "telechat2"
    d_dir.mkdir()
    _save_st(d_dir, t)
    (d_dir / "config.json").write_text(json.dumps({
        "model_type": "telechat", "architectures": ["TeleChat2ForCausalLM"],
        "vocab_size": V, "hidden_size": H, "ffn_hidden_size": I,
        "n_layer": L, "n_head": nq, "layer_norm_epsilon": 1e-5,
        "training_seqlen": 128, "hidden_act": "silu",
    }))

    # re-express the fused kv as split k/v for the shared ref
    t2 = dict(t)
    for i in range(L):
        lp = f"transformer.h.{i}."
        kv = t[lp + "self_attention.key_value.weight"].reshape(
            nq, 2, d, H)
        t2[lp + "self_attn.k_proj.weight"] = kv[:, 0].reshape(nq * d, H)
        t2[lp + "self_attn.v_proj.weight"] = kv[:, 1].reshape(nq * d, H)
        t2[lp + "self_attn.q_proj.weight"] = \
            t[lp + "self_attention.query.weight"]
        t2[lp + "self_attn.o_proj.weight"] = \
            t[lp + "self_attention.dense.weight"]
        t2[lp + "self_attn.o_proj.bias"] = \
            t[lp + "self_attention.dense.bias"]

    got = _engine_greedy(str(d_dir))
    expect = _ref_greedy(lambda ids: _llama_ref_logits(
        t2, ids, nq=nq, nk=nq, d=d, p="transformer.h.",
        embed="transformer.word_embeddings.weight",
        final="transformer.ln_f", head="lm_head.weight"))
    assert got == expect, (got, expect)


# -------------------------------------------------------------------- Solar


def test_solar_bskcn_matches_numpy(tmp_path):
    rng = np.random.default_rng(19)
    V, H, I, nq, nk, d, L = 128, 64, 96, 4, 2, 16, 4
    t = {"model.embed_tokens.weight": _w(rng, V, H),
         "model.norm.weight": 1 + 0.1 * _w(rng, H),
         "lm_head.weight": _w(rng, V, H)}
    for i in range(L):
        lp = f"model.layers.{i}."
        t[lp + "input_layernorm.weight"] = 1 + 0.1 * _w(rng, H)
        t[lp + "post_attention_layernorm.weight"] = 1 + 0.1 * _w(rng, H)
        t[lp + "self_attn.q_proj.weight"] = _w(rng, nq * d, H)
        t[lp + "self_attn.k_proj.weight"] = _w(rng, nk * d, H)
        t[lp + "self_attn.v_proj.weight"] = _w(rng, nk * d, H)
        t[lp + "self_attn.o_proj.weight"] = _w(rng, H, nq * d)
        t[lp + "mlp.gate_proj.weight"] = _w(rng, I, H)
        t[lp + "mlp.up_proj.weight"] = _w(rng, I, H)
        t[lp + "mlp.down_proj.weight"] = _w(rng, H, I)
    d_dir = tmp_path / "solar"
    d_dir.mkdir()
    _save_st(d_dir, t)
    bskcn = ([0], [1], [2], [3])
    (d_dir / "config.json").write_text(json.dumps({
        "model_type": "solar", "architectures": ["SolarForCausalLM"],
        "vocab_size": V, "hidden_size": H, "intermediate_size": I,
        "num_hidden_layers": L, "num_attention_heads": nq,
        "num_key_value_heads": nk, "rms_norm_eps": 1e-5,
        "max_position_embeddings": 128, "hidden_act": "silu",
        "bskcn_1": bskcn[0], "bskcn_2": bskcn[1], "bskcn_3": bskcn[2],
        "bskcn_4": bskcn[3], "bskcn_tv": [0.9, 0.8],
    }))
    got = _engine_greedy(str(d_dir))
    expect = _ref_greedy(lambda ids: _llama_ref_logits(
        t, ids, nq=nq, nk=nk, d=d, num_layers=L,
        bskcn=[set(b) for b in bskcn], bskcn_tv=0.8))
    assert got == expect, (got, expect)


# ------------------------------------------------------------------- DeciLM


def test_decilm_variable_gqa_matches_numpy(tmp_path):
    rng = np.random.default_rng(23)
    V, H, I, nq, d, L = 128, 64, 96, 4, 16, 2
    nk_per = [2, 4]
    t = {"model.embed_tokens.weight": _w(rng, V, H),
         "model.norm.weight": 1 + 0.1 * _w(rng, H),
         "lm_head.weight": _w(rng, V, H)}
    for i in range(L):
        lp = f"model.layers.{i}."
        nki = nk_per[i]
        t[lp + "input_layernorm.weight"] = 1 + 0.1 * _w(rng, H)
        t[lp + "post_attention_layernorm.weight"] = 1 + 0.1 * _w(rng, H)
        t[lp + "self_attn.q_proj.weight"] = _w(rng, nq * d, H)
        t[lp + "self_attn.k_proj.weight"] = _w(rng, nki * d, H)
        t[lp + "self_attn.v_proj.weight"] = _w(rng, nki * d, H)
        t[lp + "self_attn.o_proj.weight"] = _w(rng, H, nq * d)
        t[lp + "mlp.gate_proj.weight"] = _w(rng, I, H)
        t[lp + "mlp.up_proj.weight"] = _w(rng, I, H)
        t[lp + "mlp.down_proj.weight"] = _w(rng, H, I)
    d_dir = tmp_path / "decilm"
    d_dir.mkdir()
    _save_st(d_dir, t)
    (d_dir / "config.json").write_text(json.dumps({
        "model_type": "deci", "architectures": ["DeciLMForCausalLM"],
        "vocab_size": V, "hidden_size": H, "intermediate_size": I,
        "num_hidden_layers": L, "num_attention_heads": nq,
        "num_key_value_heads_per_layer": nk_per, "rms_norm_eps": 1e-5,
        "max_position_embeddings": 128, "hidden_act": "silu",
    }))
    got = _engine_greedy(str(d_dir))
    expect = _ref_greedy(lambda ids: _llama_ref_logits(
        t, ids, nq=nq, nk=nq, d=d, nk_per_layer=nk_per))
    assert got == expect, (got, expect)


# ------------------------------------------------------------------ TeleFLM


def test_teleflm_mup_matches_hf_llama(tmp_path):
    """muP scalars fold into the (linear) embed / lm_head weights, so a
    transformers Llama with pre-scaled weights is an exact golden."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    cfg = LlamaConfig(vocab_size=128, hidden_size=64,
                      intermediate_size=128, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      max_position_embeddings=128,
                      tie_word_embeddings=False)
    hf = LlamaForCausalLM(cfg)
    hf.eval()
    d_dir = tmp_path / "teleflm"
    hf.save_pretrained(d_dir, safe_serialization=True)
    conf = json.loads((d_dir / "config.json").read_text())
    conf.update({"architectures": ["TeleFLMForCausalLM"],
                 "use_mup": True, "input_mult": 2.0, "output_mult": 6.0,
                 "mup_scale_factor": 3.0})
    (d_dir / "config.json").write_text(json.dumps(conf))

    with torch.no_grad():
        hf.model.embed_tokens.weight *= 2.0
        hf.lm_head.weight *= 2.0  # output_mult / mup_scale_factor
        ids = list(TOKENS)
        expect = []
        for _ in range(6):
            logits = hf(torch.tensor([ids])).logits[0, -1]
            nxt = int(torch.argmax(logits))
            expect.append(nxt)
            ids.append(nxt)
    got = _engine_greedy(str(d_dir))
    assert got == expect, (got, expect)


# ------------------------------------------------------------------ aliases


@pytest.mark.parametrize("arch,model_type", [
    ("MiMoForCausalLM", "mimo"),
    ("StableLMEpochForCausalLM", "stablelm_epoch"),
    ("QuantMixtralForCausalLM", "mixtral"),
])
def test_alias_archs_resolve(arch, model_type):
    from vllm_tpu.models.registry import resolve_model_cls

    assert resolve_model_cls(arch) is not None


def test_mimo_runs_as_qwen2(tmp_path):
    import torch
    from transformers import Qwen2Config, Qwen2ForCausalLM

    torch.manual_seed(0)
    hf = Qwen2ForCausalLM(Qwen2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=128))
    hf.eval()
    d_dir = tmp_path / "mimo"
    hf.save_pretrained(d_dir, safe_serialization=True)
    conf = json.loads((d_dir / "config.json").read_text())
    conf["architectures"] = ["MiMoForCausalLM"]
    conf["model_type"] = "mimo"
    (d_dir / "config.json").write_text(json.dumps(conf))

    import torch as _t
    with _t.no_grad():
        ids = list(TOKENS)
        expect = []
        for _ in range(6):
            nxt = int(_t.argmax(hf(_t.tensor([ids])).logits[0, -1]))
            expect.append(nxt)
            ids.append(nxt)
    got = _engine_greedy(str(d_dir))
    assert got == expect, (got, expect)


# -------------------------------------------------------------- Deepseek V1


def test_deepseek_v1_moe_matches_numpy(tmp_path):
    rng = np.random.default_rng(29)
    V, H, I, mi, nq, nk, d, L, E, K = 128, 64, 96, 32, 4, 2, 16, 3, 4, 2
    n_shared = 1
    t = {"model.embed_tokens.weight": _w(rng, V, H),
         "model.norm.weight": 1 + 0.1 * _w(rng, H),
         "lm_head.weight": _w(rng, V, H)}
    for i in range(L):
        lp = f"model.layers.{i}."
        t[lp + "input_layernorm.weight"] = 1 + 0.1 * _w(rng, H)
        t[lp + "post_attention_layernorm.weight"] = 1 + 0.1 * _w(rng, H)
        t[lp + "self_attn.q_proj.weight"] = _w(rng, nq * d, H)
        t[lp + "self_attn.k_proj.weight"] = _w(rng, nk * d, H)
        t[lp + "self_attn.v_proj.weight"] = _w(rng, nk * d, H)
        t[lp + "self_attn.o_proj.weight"] = _w(rng, H, nq * d)
        if i == 0:  # dense prefix
            t[lp + "mlp.gate_proj.weight"] = _w(rng, I, H)
            t[lp + "mlp.up_proj.weight"] = _w(rng, I, H)
            t[lp + "mlp.down_proj.weight"] = _w(rng, H, I)
        else:
            t[lp + "mlp.gate.weight"] = _w(rng, E, H)
            for e in range(E):
                ep = lp + f"mlp.experts.{e}."
                t[ep + "gate_proj.weight"] = _w(rng, mi, H)
                t[ep + "up_proj.weight"] = _w(rng, mi, H)
                t[ep + "down_proj.weight"] = _w(rng, H, mi)
            sp = lp + "mlp.shared_experts."
            t[sp + "gate_proj.weight"] = _w(rng, mi * n_shared, H)
            t[sp + "up_proj.weight"] = _w(rng, mi * n_shared, H)
            t[sp + "down_proj.weight"] = _w(rng, H, mi * n_shared)
    d_dir = tmp_path / "deepseek_v1"
    d_dir.mkdir()
    _save_st(d_dir, t)
    (d_dir / "config.json").write_text(json.dumps({
        "model_type": "deepseek", "architectures": ["DeepseekForCausalLM"],
        "vocab_size": V, "hidden_size": H, "intermediate_size": I,
        "moe_intermediate_size": mi, "num_hidden_layers": L,
        "num_attention_heads": nq, "num_key_value_heads": nk,
        "n_routed_experts": E, "num_experts_per_tok": K,
        "n_shared_experts": n_shared, "first_k_dense_replace": 1,
        "moe_layer_freq": 1, "norm_topk_prob": False,
        "rms_norm_eps": 1e-5, "max_position_embeddings": 128,
        "hidden_act": "silu",
    }))

    def ref(ids):
        T = len(ids)
        eps = 1e-5

        def rms(x, g):
            return x / np.sqrt((x * x).mean(-1, keepdims=True) + eps) * g

        def gated(h, pre):
            g = h @ t[pre + "gate_proj.weight"].T
            u = h @ t[pre + "up_proj.weight"].T
            return (g / (1 + np.exp(-g)) * u) @ \
                t[pre + "down_proj.weight"].T

        x = t["model.embed_tokens.weight"][ids]
        mask = np.tril(np.ones((T, T), bool))
        for i in range(L):
            lp = f"model.layers.{i}."
            h = rms(x, t[lp + "input_layernorm.weight"])
            q = (h @ t[lp + "self_attn.q_proj.weight"].T).reshape(
                T, nq, d)
            k = (h @ t[lp + "self_attn.k_proj.weight"].T).reshape(
                T, nk, d)
            v = (h @ t[lp + "self_attn.v_proj.weight"].T).reshape(
                T, nk, d)
            q, k = _rope(q), _rope(k)
            k = np.repeat(k, nq // nk, axis=1)
            v = np.repeat(v, nq // nk, axis=1)
            s = np.einsum("qhd,khd->hqk", q, k) / np.sqrt(d)
            s = np.where(mask[None], s, -1e30)
            pr = np.exp(s - s.max(-1, keepdims=True))
            pr /= pr.sum(-1, keepdims=True)
            o = np.einsum("hqk,khd->qhd", pr, v).reshape(T, nq * d)
            x = x + o @ t[lp + "self_attn.o_proj.weight"].T
            h = rms(x, t[lp + "post_attention_layernorm.weight"])
            if i == 0:
                x = x + gated(h, lp + "mlp.")
            else:
                logits = h @ t[lp + "mlp.gate.weight"].T
                probs = np.exp(logits - logits.max(-1, keepdims=True))
                probs /= probs.sum(-1, keepdims=True)
                ffw = np.zeros_like(h)
                for tok in range(T):
                    ids_k = np.argsort(-probs[tok])[:K]
                    for e in ids_k:
                        ffw[tok] += probs[tok, e] * gated(
                            h[tok:tok + 1], lp + f"mlp.experts.{e}.")[0]
                x = x + ffw + gated(h, lp + "mlp.shared_experts.")
        x = rms(x, t["model.norm.weight"])
        return x @ t["lm_head.weight"].T

    got = _engine_greedy(str(d_dir))
    expect = _ref_greedy(ref)
    assert got == expect, (got, expect)


# --------------------------------------------------------------------- JAIS


def test_jais_matches_numpy(tmp_path):
    rng = np.random.default_rng(31)
    V, H, I, nq, d, L = 128, 64, 96, 4, 16, 2
    t = {"transformer.wte.weight": _w(rng, V, H),
         "transformer.ln_f.weight": 1 + 0.1 * _w(rng, H),
         "transformer.ln_f.bias": 0.1 * _w(rng, H)}
    for i in range(L):
        lp = f"transformer.h.{i}."
        t[lp + "ln_1.weight"] = 1 + 0.1 * _w(rng, H)
        t[lp + "ln_1.bias"] = 0.1 * _w(rng, H)
        t[lp + "ln_2.weight"] = 1 + 0.1 * _w(rng, H)
        t[lp + "ln_2.bias"] = 0.1 * _w(rng, H)
        # gpt2 Conv1D layout [in, out]
        t[lp + "attn.c_attn.weight"] = _w(rng, H, 3 * H)
        t[lp + "attn.c_attn.bias"] = 0.1 * _w(rng, 3 * H)
        t[lp + "attn.c_proj.weight"] = _w(rng, H, H)
        t[lp + "attn.c_proj.bias"] = 0.1 * _w(rng, H)
        t[lp + "mlp.c_fc.weight"] = _w(rng, H, I)
        t[lp + "mlp.c_fc.bias"] = 0.1 * _w(rng, I)
        t[lp + "mlp.c_fc2.weight"] = _w(rng, H, I)
        t[lp + "mlp.c_fc2.bias"] = 0.1 * _w(rng, I)
        t[lp + "mlp.c_proj.weight"] = _w(rng, I, H)
        t[lp + "mlp.c_proj.bias"] = 0.1 * _w(rng, H)
    d_dir = tmp_path / "jais"
    d_dir.mkdir()
    _save_st(d_dir, t)
    (d_dir / "config.json").write_text(json.dumps({
        "model_type": "jais", "architectures": ["JAISLMHeadModel"],
        "vocab_size": V, "n_embd": H, "n_inner": I, "n_layer": L,
        "n_head": nq, "n_positions": 128, "layer_norm_epsilon": 1e-5,
        "activation_function": "swiglu",
        "position_embedding_type": "alibi",
        "embeddings_scale": 2.0, "width_scale": 0.5,
        "scale_qk_dot_by_d": True,
    }))

    def alibi_slopes(n):
        import math
        p = 2 ** math.floor(math.log2(n))
        base = [2 ** (-(2 ** -(math.log2(p) - 3)) * (i + 1))
                for i in range(p)]
        if p < n:
            extra = [2 ** (-(2 ** -(math.log2(2 * p) - 3)) * (i + 1))
                     for i in range(0, 2 * (n - p), 2)]
            base += extra
        return np.asarray(base)

    def ref(ids):
        T = len(ids)
        eps = 1e-5

        def ln(x, pre):
            mu = x.mean(-1, keepdims=True)
            xn = (x - mu) / np.sqrt(x.var(-1, keepdims=True) + eps)
            return xn * t[pre + ".weight"] + t[pre + ".bias"]

        slopes = alibi_slopes(nq)
        x = 2.0 * t["transformer.wte.weight"][ids]
        mask = np.tril(np.ones((T, T), bool))
        # alibi bias: slope * (col - row position distance)
        pos = np.arange(T)
        bias = slopes[:, None, None] * (pos[None, None, :] -
                                        pos[None, :, None])
        for i in range(L):
            lp = f"transformer.h.{i}."
            a = ln(x, lp + "ln_1")
            qkv = a @ t[lp + "attn.c_attn.weight"] + \
                t[lp + "attn.c_attn.bias"]
            q = qkv[:, :H].reshape(T, nq, d)
            k = qkv[:, H:2 * H].reshape(T, nq, d)
            v = qkv[:, 2 * H:].reshape(T, nq, d)
            s = np.einsum("qhd,khd->hqk", q, k) / d + bias
            s = np.where(mask[None], s, -1e30)
            pr = np.exp(s - s.max(-1, keepdims=True))
            pr /= pr.sum(-1, keepdims=True)
            o = np.einsum("hqk,khd->qhd", pr, v).reshape(T, H)
            x = x + o @ t[lp + "attn.c_proj.weight"] + \
                t[lp + "attn.c_proj.bias"]
            a = ln(x, lp + "ln_2")
            g = a @ t[lp + "mlp.c_fc.weight"] + t[lp + "mlp.c_fc.bias"]
            u = a @ t[lp + "mlp.c_fc2.weight"] + t[lp + "mlp.c_fc2.bias"]
            act = g / (1 + np.exp(-g)) * u
            x = x + act @ t[lp + "mlp.c_proj.weight"] + \
                t[lp + "mlp.c_proj.bias"]
        x = ln(x, "transformer.ln_f")
        return 0.5 * (x @ t["transformer.wte.weight"].T)  # tied head

    got = _engine_greedy(str(d_dir))
    expect = _ref_greedy(ref)
    assert got == expect, (got, expect)


# ------------------------------------------------------------------ Exaone3


def test_exaone3_matches_numpy(tmp_path):
    rng = np.random.default_rng(37)
    V, H, I, nq, nk, d, L = 128, 64, 96, 4, 2, 16, 2
    t = {"transformer.wte.weight": _w(rng, V, H),
         "transformer.ln_f.weight": 1 + 0.1 * _w(rng, H),
         "lm_head.weight": _w(rng, V, H)}
    for i in range(L):
        lp = f"transformer.h.{i}."
        t[lp + "ln_1.weight"] = 1 + 0.1 * _w(rng, H)
        t[lp + "ln_2.weight"] = 1 + 0.1 * _w(rng, H)
        t[lp + "attn.attention.q_proj.weight"] = _w(rng, nq * d, H)
        t[lp + "attn.attention.k_proj.weight"] = _w(rng, nk * d, H)
        t[lp + "attn.attention.v_proj.weight"] = _w(rng, nk * d, H)
        t[lp + "attn.attention.out_proj.weight"] = _w(rng, H, nq * d)
        t[lp + "mlp.c_fc_0.weight"] = _w(rng, I, H)
        t[lp + "mlp.c_fc_1.weight"] = _w(rng, I, H)
        t[lp + "mlp.c_proj.weight"] = _w(rng, H, I)
    d_dir = tmp_path / "exaone3"
    d_dir.mkdir()
    _save_st(d_dir, t)
    (d_dir / "config.json").write_text(json.dumps({
        "model_type": "exaone", "architectures": ["ExaoneForCausalLM"],
        "vocab_size": V, "hidden_size": H, "intermediate_size": I,
        "num_layers": L, "num_attention_heads": nq,
        "num_key_value_heads": nk, "layer_norm_epsilon": 1e-5,
        "max_position_embeddings": 128, "activation_function": "silu",
    }))
    # same block as llama; remap names for the shared numpy ref
    t2 = {"model.embed_tokens.weight": t["transformer.wte.weight"],
          "model.norm.weight": t["transformer.ln_f.weight"],
          "lm_head.weight": t["lm_head.weight"]}
    for i in range(L):
        src = f"transformer.h.{i}."
        dst = f"model.layers.{i}."
        t2[dst + "input_layernorm.weight"] = t[src + "ln_1.weight"]
        t2[dst + "post_attention_layernorm.weight"] = \
            t[src + "ln_2.weight"]
        t2[dst + "self_attn.q_proj.weight"] = \
            t[src + "attn.attention.q_proj.weight"]
        t2[dst + "self_attn.k_proj.weight"] = \
            t[src + "attn.attention.k_proj.weight"]
        t2[dst + "self_attn.v_proj.weight"] = \
            t[src + "attn.attention.v_proj.weight"]
        t2[dst + "self_attn.o_proj.weight"] = \
            t[src + "attn.attention.out_proj.weight"]
        t2[dst + "mlp.gate_proj.weight"] = t[src + "mlp.c_fc_0.weight"]
        t2[dst + "mlp.up_proj.weight"] = t[src + "mlp.c_fc_1.weight"]
        t2[dst + "mlp.down_proj.weight"] = t[src + "mlp.c_proj.weight"]
    got = _engine_greedy(str(d_dir))
    expect = _ref_greedy(lambda ids: _llama_ref_logits(
        t2, ids, nq=nq, nk=nk, d=d))
    assert got == expect, (got, expect)


# -------------------------------------------------- InternLM2 native naming


def _internlm2_native_ckpt(tmp_path, with_v_head=False):
    """Build an InternLM2-native-named checkpoint from a transformers
    Llama (wqkv interleaved per kv group), returning (dir, hf_model)."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(3)
    nq, nk, d, H = 4, 2, 16, 64
    cfg = LlamaConfig(vocab_size=128, hidden_size=H,
                      intermediate_size=96, num_hidden_layers=2,
                      num_attention_heads=nq, num_key_value_heads=nk,
                      max_position_embeddings=128,
                      tie_word_embeddings=False)
    hf = LlamaForCausalLM(cfg)
    hf.eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    g = nq // nk
    t = {"model.tok_embeddings.weight": sd["model.embed_tokens.weight"],
         "model.norm.weight": sd["model.norm.weight"],
         "output.weight": sd["lm_head.weight"]}
    for i in range(2):
        s = f"model.layers.{i}."
        q = sd[s + "self_attn.q_proj.weight"].reshape(nk, g, d, H)
        k = sd[s + "self_attn.k_proj.weight"].reshape(nk, 1, d, H)
        v = sd[s + "self_attn.v_proj.weight"].reshape(nk, 1, d, H)
        t[s + "attention.wqkv.weight"] = np.concatenate(
            [q, k, v], axis=1).reshape((g + 2) * nk * d, H)
        t[s + "attention.wo.weight"] = sd[s + "self_attn.o_proj.weight"]
        t[s + "attention_norm.weight"] = sd[s + "input_layernorm.weight"]
        t[s + "ffn_norm.weight"] = \
            sd[s + "post_attention_layernorm.weight"]
        t[s + "feed_forward.w1.weight"] = sd[s + "mlp.gate_proj.weight"]
        t[s + "feed_forward.w3.weight"] = sd[s + "mlp.up_proj.weight"]
        t[s + "feed_forward.w2.weight"] = sd[s + "mlp.down_proj.weight"]
    if with_v_head:
        rng = np.random.default_rng(5)
        t["v_head.weight"] = _w(rng, 1, H)
    d_dir = tmp_path / "internlm2"
    d_dir.mkdir()
    _save_st(d_dir, t)
    arch = ("InternLM2ForRewardModel" if with_v_head else
            "InternLM2ForCausalLM")
    (d_dir / "config.json").write_text(json.dumps({
        "model_type": "internlm2", "architectures": [arch],
        "vocab_size": 128, "hidden_size": H, "intermediate_size": 96,
        "num_hidden_layers": 2, "num_attention_heads": nq,
        "num_key_value_heads": nk, "rms_norm_eps": 1e-6,
        "max_position_embeddings": 128, "hidden_act": "silu",
        "bias": False,
    }))
    return str(d_dir), hf, t


def test_internlm2_native_names_match_hf_llama(tmp_path):
    import torch

    model_dir, hf, _ = _internlm2_native_ckpt(tmp_path)
    with torch.no_grad():
        ids = list(TOKENS)
        expect = []
        for _ in range(6):
            nxt = int(torch.argmax(hf(torch.tensor([ids])).logits[0, -1]))
            expect.append(nxt)
            ids.append(nxt)
    got = _engine_greedy(model_dir)
    assert got == expect, (got, expect)


def test_internlm2_reward_model(tmp_path):
    import torch

    model_dir, hf, t = _internlm2_native_ckpt(tmp_path, with_v_head=True)
    from vllm_tpu.config import ModelConfig
    from vllm_tpu.models.registry import get_model
    from vllm_tpu.models.weight_utils import weights_iterator

    mc = ModelConfig(model=model_dir, dtype="float32")
    model = get_model(mc)
    params = model.load_weights(weights_iterator(model_dir))

    from tests.test_model_vs_hf import build_metadata

    metadata, input_ids, _ = build_metadata([list(TOKENS)], 16, 8, 8, 1)
    import jax.numpy as jnp

    a = model.args
    kv = jnp.zeros((a.num_layers, 16, 2 * a.num_kv_heads, 16,
                    a.head_dim), jnp.float32)
    hidden, _ = model.forward(params, input_ids, [kv], metadata)
    score = np.asarray(model.classify(params, hidden, metadata))[0, 0]

    with torch.no_grad():
        h = hf.model(torch.tensor([list(TOKENS)]))[0][0, -1].numpy()
    expect = float(h @ t["v_head.weight"][0])
    np.testing.assert_allclose(score, expect, rtol=1e-4, atol=1e-4)


# ------------------------------------------------------------------- Grok-1


def test_grok1_matches_numpy(tmp_path):
    from scipy.special import erf  # exact gelu, matching GeluAndMul

    rng = np.random.default_rng(41)
    V, H, I, nq, nk, d, L, E, K = 128, 64, 48, 4, 2, 16, 2, 4, 2
    t = {"model.embed_tokens.weight": _w(rng, V, H),
         "model.norm.weight": 1 + 0.1 * _w(rng, H)}
    for i in range(L):
        lp = f"model.layers.{i}."
        for n in ("pre_attn_norm", "post_attn_norm", "pre_moe_norm",
                  "post_moe_norm"):
            t[lp + n + ".weight"] = 1 + 0.1 * _w(rng, H)
        t[lp + "attn.q_proj.weight"] = _w(rng, nq * d, H)
        t[lp + "attn.k_proj.weight"] = _w(rng, nk * d, H)
        t[lp + "attn.v_proj.weight"] = _w(rng, nk * d, H)
        t[lp + "attn.o_proj.weight"] = _w(rng, H, nq * d)
        t[lp + "moe_block.gate.weight"] = _w(rng, E, H)
        for e in range(E):
            ep = lp + f"moe_block.experts.{e}."
            t[ep + "linear.weight"] = _w(rng, I, H)     # gate
            t[ep + "linear_v.weight"] = _w(rng, I, H)   # up
            t[ep + "linear_1.weight"] = _w(rng, H, I)   # down
    d_dir = tmp_path / "grok1"
    d_dir.mkdir()
    _save_st(d_dir, t)
    (d_dir / "config.json").write_text(json.dumps({
        "model_type": "grok-1", "architectures": ["Grok1ModelForCausalLM"],
        "vocab_size": V, "hidden_size": H, "intermediate_size": I,
        "num_hidden_layers": L, "num_attention_heads": nq,
        "num_key_value_heads": nk, "num_experts": E,
        "num_experts_per_tok": K, "rms_norm_eps": 1e-5,
        "max_position_embeddings": 128,
        "attn_output_multiplier": 0.5, "attn_logit_softcapping": 30.0,
        "embedding_multiplier_scale": 2.0,
        "output_multiplier_scale": 0.25, "tie_word_embeddings": True,
    }))

    def ref(ids):
        T = len(ids)
        eps = 1e-5

        def rms(x, g):
            return x / np.sqrt((x * x).mean(-1, keepdims=True) + eps) * g

        def gelu(x):
            return 0.5 * x * (1 + erf(x / np.sqrt(2.0)))

        x = 2.0 * t["model.embed_tokens.weight"][ids]
        mask = np.tril(np.ones((T, T), bool))
        for i in range(L):
            lp = f"model.layers.{i}."
            h = rms(x, t[lp + "pre_attn_norm.weight"])
            q = (h @ t[lp + "attn.q_proj.weight"].T).reshape(T, nq, d)
            k = (h @ t[lp + "attn.k_proj.weight"].T).reshape(T, nk, d)
            v = (h @ t[lp + "attn.v_proj.weight"].T).reshape(T, nk, d)
            q, k = _rope(q), _rope(k)
            k = np.repeat(k, nq // nk, axis=1)
            v = np.repeat(v, nq // nk, axis=1)
            s = np.einsum("qhd,khd->hqk", q, k) / np.sqrt(d)
            s = 30.0 * np.tanh(s / 30.0)  # attn logit soft cap
            s = np.where(mask[None], s, -1e30)
            pr = np.exp(s - s.max(-1, keepdims=True))
            pr /= pr.sum(-1, keepdims=True)
            o = np.einsum("hqk,khd->qhd", pr, v).reshape(T, nq * d)
            attn = 0.5 * (o @ t[lp + "attn.o_proj.weight"].T)
            x = x + rms(attn, t[lp + "post_attn_norm.weight"])

            h = rms(x, t[lp + "pre_moe_norm.weight"])
            logits = h @ t[lp + "moe_block.gate.weight"].T
            logits = 30.0 * np.tanh(logits / 30.0)  # router cap
            probs = np.exp(logits - logits.max(-1, keepdims=True))
            probs /= probs.sum(-1, keepdims=True)
            ffw = np.zeros_like(h)
            for tok in range(T):
                top = np.argsort(-probs[tok])[:K]
                wsum = probs[tok, top].sum()
                for e in top:
                    ep = lp + f"moe_block.experts.{e}."
                    g = h[tok] @ t[ep + "linear.weight"].T
                    u = h[tok] @ t[ep + "linear_v.weight"].T
                    out = (gelu(g) * u) @ t[ep + "linear_1.weight"].T
                    ffw[tok] += probs[tok, e] / wsum * out
            x = x + rms(ffw, t[lp + "post_moe_norm.weight"])
        x = rms(x, t["model.norm.weight"])
        return 0.25 * (x @ t["model.embed_tokens.weight"].T)  # tied

    got = _engine_greedy(str(d_dir))
    expect = _ref_greedy(ref)
    assert got == expect, (got, expect)


# --------------------------------------------------------------- BailingMoe


def test_bailing_moe_matches_numpy(tmp_path):
    rng = np.random.default_rng(43)
    V, H, mi, nq, nk, d, L, E, K = 128, 64, 32, 4, 2, 16, 2, 4, 2
    t = {"model.word_embeddings.weight": _w(rng, V, H),
         "model.norm.weight": 1 + 0.1 * _w(rng, H),
         "lm_head.weight": _w(rng, V, H)}
    for i in range(L):
        lp = f"model.layers.{i}."
        t[lp + "input_layernorm.weight"] = 1 + 0.1 * _w(rng, H)
        t[lp + "post_attention_layernorm.weight"] = 1 + 0.1 * _w(rng, H)
        t[lp + "attention.query_key_value.weight"] = \
            _w(rng, (nq + 2 * nk) * d, H)
        t[lp + "attention.dense.weight"] = _w(rng, H, nq * d)
        t[lp + "mlp.gate.weight"] = _w(rng, E, H)
        for e in range(E):
            ep = lp + f"mlp.experts.{e}."
            t[ep + "gate_proj.weight"] = _w(rng, mi, H)
            t[ep + "up_proj.weight"] = _w(rng, mi, H)
            t[ep + "down_proj.weight"] = _w(rng, H, mi)
        sp = lp + "mlp.shared_experts."
        t[sp + "gate_proj.weight"] = _w(rng, mi, H)
        t[sp + "up_proj.weight"] = _w(rng, mi, H)
        t[sp + "down_proj.weight"] = _w(rng, H, mi)
    d_dir = tmp_path / "bailing"
    d_dir.mkdir()
    _save_st(d_dir, t)
    (d_dir / "config.json").write_text(json.dumps({
        "model_type": "bailing_moe",
        "architectures": ["BailingMoeForCausalLM"],
        "vocab_size": V, "hidden_size": H, "intermediate_size": 96,
        "moe_intermediate_size": mi, "num_hidden_layers": L,
        "num_attention_heads": nq, "num_key_value_heads": nk,
        "num_experts": E, "num_experts_per_tok": K,
        "num_shared_experts": 1, "norm_topk_prob": True,
        "rms_norm_eps": 1e-5, "max_position_embeddings": 128,
        "hidden_act": "silu", "use_bias": False, "use_qkv_bias": False,
    }))

    def ref(ids):
        T = len(ids)
        eps = 1e-5

        def rms(x, g):
            return x / np.sqrt((x * x).mean(-1, keepdims=True) + eps) * g

        def gated(h, pre):
            g = h @ t[pre + "gate_proj.weight"].T
            u = h @ t[pre + "up_proj.weight"].T
            return (g / (1 + np.exp(-g)) * u) @ \
                t[pre + "down_proj.weight"].T

        x = t["model.word_embeddings.weight"][ids]
        mask = np.tril(np.ones((T, T), bool))
        for i in range(L):
            lp = f"model.layers.{i}."
            h = rms(x, t[lp + "input_layernorm.weight"])
            qkv = h @ t[lp + "attention.query_key_value.weight"].T
            q = qkv[:, :nq * d].reshape(T, nq, d)
            k = qkv[:, nq * d:(nq + nk) * d].reshape(T, nk, d)
            v = qkv[:, (nq + nk) * d:].reshape(T, nk, d)
            q, k = _rope(q), _rope(k)
            k = np.repeat(k, nq // nk, axis=1)
            v = np.repeat(v, nq // nk, axis=1)
            s = np.einsum("qhd,khd->hqk", q, k) / np.sqrt(d)
            s = np.where(mask[None], s, -1e30)
            pr = np.exp(s - s.max(-1, keepdims=True))
            pr /= pr.sum(-1, keepdims=True)
            o = np.einsum("hqk,khd->qhd", pr, v).reshape(T, nq * d)
            x = x + o @ t[lp + "attention.dense.weight"].T
            h = rms(x, t[lp + "post_attention_layernorm.weight"])
            logits = h @ t[lp + "mlp.gate.weight"].T
            probs = np.exp(logits - logits.max(-1, keepdims=True))
            probs /= probs.sum(-1, keepdims=True)
            ffw = np.zeros_like(h)
            for tok in range(T):
                top = np.argsort(-probs[tok])[:K]
                wsum = probs[tok, top].sum()  # norm_topk_prob
                for e in top:
                    ffw[tok] += probs[tok, e] / wsum * gated(
                        h[tok:tok + 1], lp + f"mlp.experts.{e}.")[0]
            x = x + ffw + gated(h, lp + "mlp.shared_experts.")
        x = rms(x, t["model.norm.weight"])
        return x @ t["lm_head.weight"].T

    got = _engine_greedy(str(d_dir))
    expect = _ref_greedy(ref)
    assert got == expect, (got, expect)
