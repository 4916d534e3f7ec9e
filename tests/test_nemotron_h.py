"""Nemotron-H golden tests (reference analog: tests for
models/nemotron_h.py). NemotronHConfig is NOT in local transformers,
so the torch golden is assembled from the reference's exact layer
equations (nemotron_h.py:61-292): HF Mamba2Mixer for "M" layers, NoPE
eager GQA for "*", relu-squared MLP for "-", all as
x += mixer(rmsnorm(x)) with backbone.* checkpoint naming."""

import json

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax.numpy as jnp

from tests.test_model_vs_hf import build_metadata

PATTERN = "M-*M-"
H, I, NQ, NK = 64, 96, 4, 2
D = H // NQ
MAMBA_HEADS, MAMBA_HEAD_DIM = 8, 16  # intermediate = 2*H = 128
STATE, CONV_K, NGROUPS = 16, 4, 1
EPS = 1e-5
TOKENS = [[1, 5, 9, 3, 7, 11, 2], [4, 8, 100, 42]]


def _rms(x, w, eps=EPS):
    v = x.float().pow(2).mean(-1, keepdim=True)
    return (x.float() * torch.rsqrt(v + eps) * w.float()).to(x.dtype)


class _TorchNemotronH(nn.Module):
    """Reference equations, reference checkpoint naming."""

    def __init__(self, vocab=128):
        super().__init__()
        from transformers.models.mamba2.configuration_mamba2 import (
            Mamba2Config)
        from transformers.models.mamba2.modeling_mamba2 import Mamba2Mixer

        mcfg = Mamba2Config(
            hidden_size=H, state_size=STATE, num_heads=MAMBA_HEADS,
            head_dim=MAMBA_HEAD_DIM, expand=2, n_groups=NGROUPS,
            conv_kernel=CONV_K, layer_norm_epsilon=EPS,
            use_conv_bias=True, use_bias=False)
        self.embeddings = nn.Embedding(vocab, H)
        self.norms = nn.ModuleList()
        self.mixers = nn.ModuleList()
        for li, ch in enumerate(PATTERN):
            self.norms.append(nn.Linear(H, 1, bias=False))  # weight holder
            if ch == "M":
                self.mixers.append(Mamba2Mixer(mcfg, layer_idx=li))
            elif ch == "*":
                m = nn.Module()
                m.q_proj = nn.Linear(H, NQ * D, bias=False)
                m.k_proj = nn.Linear(H, NK * D, bias=False)
                m.v_proj = nn.Linear(H, NK * D, bias=False)
                m.o_proj = nn.Linear(NQ * D, H, bias=False)
                self.mixers.append(m)
            else:
                m = nn.Module()
                m.up_proj = nn.Linear(H, I, bias=False)
                m.down_proj = nn.Linear(I, H, bias=False)
                self.mixers.append(m)
        self.norm_f = nn.Linear(H, 1, bias=False)
        self.lm_head = nn.Linear(H, vocab, bias=False)

    def forward(self, ids):
        x = self.embeddings(ids)
        T = ids.shape[1]
        for ch, nrm, mix in zip(PATTERN, self.norms, self.mixers):
            h = _rms(x, nrm.weight[0])
            if ch == "M":
                out = mix(h)
            elif ch == "*":
                q = mix.q_proj(h).view(1, T, NQ, D).transpose(1, 2)
                k = mix.k_proj(h).view(1, T, NK, D).transpose(1, 2)
                v = mix.v_proj(h).view(1, T, NK, D).transpose(1, 2)
                k = k.repeat_interleave(NQ // NK, dim=1)
                v = v.repeat_interleave(NQ // NK, dim=1)
                wts = (q @ k.transpose(-1, -2)) * D ** -0.5
                mask = torch.triu(torch.full((T, T), float("-inf")), 1)
                wts = torch.softmax(wts + mask, dim=-1)
                o = (wts @ v).transpose(1, 2).reshape(1, T, NQ * D)
                out = mix.o_proj(o)
            else:
                out = mix.down_proj(torch.relu(mix.up_proj(h)) ** 2)
            x = x + out
        return self.lm_head(_rms(x, self.norm_f.weight[0]))


@pytest.fixture(scope="module")
def nemotron_h_dir(tmp_path_factory):
    from safetensors.numpy import save_file

    torch.manual_seed(0)
    m = _TorchNemotronH()
    m.eval()
    d = tmp_path_factory.mktemp("nemotron_h")
    cfg = {
        "architectures": ["NemotronHForCausalLM"],
        "model_type": "nemotron_h",
        "vocab_size": 128, "hidden_size": H, "intermediate_size": I,
        "num_hidden_layers": len(PATTERN),
        "hybrid_override_pattern": PATTERN,
        "num_attention_heads": NQ, "num_key_value_heads": NK,
        "attention_head_dim": D, "mlp_hidden_act": "relu2",
        "layer_norm_epsilon": EPS, "ssm_state_size": STATE,
        "mamba_num_heads": MAMBA_HEADS, "mamba_n_groups": NGROUPS,
        "mamba_head_dim": MAMBA_HEAD_DIM, "mamba_d_conv": CONV_K,
        "mamba_expand": 2, "mamba_chunk_size": 8,
        "max_position_embeddings": 128, "tie_word_embeddings": False,
        "pad_token_id": 0, "bos_token_id": 1, "eos_token_id": 2,
    }
    with open(d / "config.json", "w") as f:
        json.dump(cfg, f)
    tensors = {"backbone.embeddings.weight":
               m.embeddings.weight.detach().numpy(),
               "backbone.norm_f.weight":
               m.norm_f.weight[0].detach().numpy(),
               "lm_head.weight": m.lm_head.weight.detach().numpy()}
    for li, (ch, nrm, mix) in enumerate(zip(PATTERN, m.norms, m.mixers)):
        pre = f"backbone.layers.{li}."
        tensors[pre + "norm.weight"] = nrm.weight[0].detach().numpy()
        for pname, p in mix.named_parameters():
            tensors[pre + "mixer." + pname] = p.detach().numpy()
    save_file({k: np.ascontiguousarray(v) for k, v in tensors.items()},
              str(d / "model.safetensors"))
    return str(d), m


def _load(model_dir):
    from vllm_tpu.config import ModelConfig
    from vllm_tpu.models.registry import get_model
    from vllm_tpu.models.weight_utils import weights_iterator

    model = get_model(ModelConfig(model=model_dir, dtype="float32"))
    params = model.load_weights(weights_iterator(model_dir))
    return model, params


def test_nemotron_h_logits_match_torch(nemotron_h_dir):
    model_dir, torch_model = nemotron_h_dir
    expected = []
    with torch.no_grad():
        for toks in TOKENS:
            expected.append(torch_model(torch.tensor([toks]))[0].numpy())

    model, params = _load(model_dir)
    a = model.args
    attn_kv = jnp.zeros((model.num_attn_layers, 32, 2 * a.num_kv_heads,
                         4, a.head_dim), jnp.float32)
    caches = [model.init_states(4), attn_kv]
    metadata, input_ids, _ = build_metadata(TOKENS, 4, max_blocks=8,
                                            total_pad=16, req_pad=4)
    hidden, _ = model.forward(params, input_ids, caches, metadata)
    logits = np.asarray(model.compute_logits(params, hidden))
    offset = 0
    for r, toks in enumerate(TOKENS):
        np.testing.assert_allclose(logits[offset:offset + len(toks)],
                                   expected[r], rtol=2e-3, atol=2e-3)
        offset += len(toks)


def test_nemotron_h_engine_greedy_matches_torch(nemotron_h_dir):
    model_dir, torch_model = nemotron_h_dir

    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import SamplingParams

    prompts = [[3, 17, 42, 9, 88], [7, 21, 4]]
    ref_out = []
    with torch.no_grad():
        for p in prompts:
            seq = list(p)
            for _ in range(10):
                logits = torch_model(torch.tensor([seq]))[0, -1]
                seq.append(int(logits.argmax()))
            ref_out.append(seq[len(p):])

    llm = LLM(model=model_dir, dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_gpu_blocks_override=32, enforce_eager=True,
              skip_tokenizer_init=True)
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    outs = llm.generate([{"prompt_token_ids": p} for p in prompts], sp)
    llm.llm_engine.shutdown()
    for r in range(2):
        assert list(outs[r].outputs[0].token_ids) == ref_out[r], \
            (r, list(outs[r].outputs[0].token_ids), ref_out[r])
