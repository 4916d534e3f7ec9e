"""MiniMax-Text-01 / MiniMax-M1 — lightning (linear) attention hybrid
MoE LM (reference behavior parity:
vllm/model_executor/models/minimax_text_01.py).

Per layer (``config.layer_types``): lightning linear attention OR full
GQA attention, then a Mixtral-style top-k MoE, with MiniMax's
POST-NORM residual form (modeling_minimax.py:550 — the residual is the
NORMALIZED hidden state):
  h = input_ln(x);  x = h*attn_alpha + attn(h)*attn_beta
  h = post_ln(x);   x = h*mlp_alpha + moe(h)*mlp_beta

Lightning attention (minimax_text_01.py:298 MiniMaxText01LinearKernel)
is EXACTLY the Mamba2 SSD recurrence with dt=1, A=-slope_h, B=k, C=q,
x=v:  state_t = e^{-s} state_{t-1} + k_t^T v_t;  y_t = q_t state_t —
so the TPU kernel is a direct reuse of ssd_chunked_segmented with the
per-request segment carries. q/k/v come from silu(qkv_proj(h)); the
output goes through a full-width RMSNorm, a sigmoid(output_gate(h))
gate, then out_proj. Per-head decay slopes follow the ALiBi-style
schedule scaled by (1 - layer/(L-1)) (modeling_minimax.py:141).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from vllm_tpu.config import ModelConfig
from vllm_tpu.core.kv_cache_interface import (FullAttentionSpec,
                                              KVCacheSpec, MambaSpec)
from vllm_tpu.models.mamba2 import packed_segments
from vllm_tpu.ops.attention import (AttentionMetadata, attention,
                                    write_kv_cache)
from vllm_tpu.ops.layernorm import rms_norm
from vllm_tpu.ops.linear import embedding_lookup, linear
from vllm_tpu.ops.mamba import ssd_chunked_segmented
from vllm_tpu.ops.moe import fused_moe, topk_routing
from vllm_tpu.ops.rotary import RopeConfig, apply_rope, compute_inv_freq


@dataclass(frozen=True)
class MiniMaxArgs:
    vocab_size: int
    hidden_size: int
    num_layers: int
    layer_types: tuple  # "linear_attention" | "full_attention"
    num_heads: int
    num_kv_heads: int
    head_dim: int
    rope: RopeConfig
    num_experts: int
    top_k: int
    moe_intermediate: int
    act: str
    rms_eps: float
    tie_embeddings: bool
    attn_alpha: tuple  # (linear, full)
    attn_beta: tuple
    mlp_alpha: float
    mlp_beta: float


class MiniMaxText01ForCausalLM:

    is_ssm = True  # linear-attention state rides per-request slots

    def __init__(self, model_config: ModelConfig) -> None:
        self.model_config = model_config
        hf = model_config.resolve_hf_config()
        L = hf.num_hidden_layers
        ltypes = list(getattr(hf, "layer_types", None) or [])
        if not ltypes:
            # MiniMax-Text-01 default: linear except every 8th full
            ltypes = ["full_attention" if (i + 1) % 8 == 0 else
                      "linear_attention" for i in range(L)]
        head_dim = getattr(hf, "head_dim", None) or \
            hf.hidden_size // hf.num_attention_heads
        self.args = MiniMaxArgs(
            vocab_size=hf.vocab_size,
            hidden_size=hf.hidden_size,
            num_layers=L,
            layer_types=tuple(ltypes),
            num_heads=hf.num_attention_heads,
            num_kv_heads=getattr(hf, "num_key_value_heads",
                                 hf.num_attention_heads),
            head_dim=head_dim,
            rope=RopeConfig.from_hf_config(hf, head_dim),
            num_experts=int(getattr(hf, "num_local_experts", 8)),
            top_k=int(getattr(hf, "num_experts_per_tok", 2)),
            moe_intermediate=int(hf.intermediate_size),
            act=getattr(hf, "hidden_act", "silu"),
            rms_eps=float(getattr(hf, "rms_norm_eps", 1e-5)),
            tie_embeddings=bool(getattr(hf, "tie_word_embeddings",
                                        False)),
            attn_alpha=(float(getattr(hf, "linear_attn_alpha_factor",
                                      1.0)),
                        float(getattr(hf, "full_attn_alpha_factor",
                                      1.0))),
            attn_beta=(float(getattr(hf, "linear_attn_beta_factor",
                                     1.0)),
                       float(getattr(hf, "full_attn_beta_factor", 1.0))),
            mlp_alpha=float(getattr(hf, "mlp_alpha_factor", 1.0)),
            mlp_beta=float(getattr(hf, "mlp_beta_factor", 1.0)),
        )
        self.dtype = jnp.bfloat16 if model_config.dtype == "bfloat16" \
            else jnp.float32
        self.inv_freq, self.rope_mscale = compute_inv_freq(self.args.rope)
        self.scale = 1.0 / math.sqrt(head_dim)
        self.layer_types = list(self.args.layer_types)
        self.num_attn_layers = sum(
            1 for t in self.layer_types if t == "full_attention")
        self.num_linear_layers = self.args.num_layers - \
            self.num_attn_layers

    # per-layer, per-head decay slopes (modeling_minimax.py:141)
    def _slopes(self, layer_idx: int) -> np.ndarray:
        a = self.args
        base = 1.0 / (2.0 ** (8.0 / a.num_heads))
        rate = base ** np.arange(1, a.num_heads + 1, dtype=np.float64)
        factor = 1.0 - layer_idx / (a.num_layers - 1 + 1e-5) + 1e-5
        return (rate * factor).astype(np.float32)

    def embed(self, params: dict, input_ids: jnp.ndarray) -> jnp.ndarray:
        return embedding_lookup(input_ids, params["embed"]["w"])

    def init_states(self, num_slots: int):
        a = self.args
        return (jnp.zeros((self.num_linear_layers, num_slots + 1,
                           a.num_heads, a.head_dim, a.head_dim),
                          jnp.float32),)

    def forward(self, params, input_ids, kv_caches, metadata, lora=None,
                embed_override=None):
        a = self.args
        T = input_ids.shape[0]
        ssm_gi = next(i for i, c in enumerate(kv_caches)
                      if isinstance(c, tuple))
        attn_gi = next((i for i, c in enumerate(kv_caches)
                        if not isinstance(c, tuple)), None)
        (lin_states,) = kv_caches[ssm_gi]
        attn_kv = kv_caches[attn_gi] if attn_gi is not None else None
        num_slots = lin_states.shape[1] - 1
        seg, seg_start, pad_mask = packed_segments(metadata, T, num_slots)
        chunk = min(64, max(8, T))
        while T % chunk:
            chunk //= 2
        dt_ones = jnp.where(pad_mask[:, None], 0.0,
                            jnp.ones((T, a.num_heads), jnp.float32))

        x = self.embed(params, input_ids)
        if embed_override is not None:
            idx, vecs = embed_override
            x = x.at[idx].set(vecs.astype(x.dtype))
        li_lin = li_full = 0
        for li, ltype in enumerate(self.layer_types):
            lp = jax.tree.map(jnp.asarray, params["layers"][li])
            h = rms_norm(x, lp["input_ln"], a.rms_eps)
            linear_layer = ltype == "linear_attention"
            if linear_layer:
                nh, d = a.num_heads, a.head_dim
                qkv = linear(h, lp["qkv"])
                qkv = jax.nn.silu(qkv.astype(jnp.float32)).astype(h.dtype)
                # fused per-head [q|k|v] blocks: reshape then split
                qkv = qkv.reshape(T, nh, 3 * d)
                q, k, v = jnp.split(qkv, 3, axis=-1)
                y, new_state = ssd_chunked_segmented(
                    v.astype(jnp.float32), dt_ones,
                    -jnp.asarray(self._slopes(li)),
                    k.astype(jnp.float32), q.astype(jnp.float32),
                    seg, lin_states[li_lin], chunk_size=chunk)
                lin_states = lin_states.at[li_lin].set(new_state)
                # the lightning output norm is constructed WITHOUT the
                # config eps in HF (modeling_minimax.py:128
                # MiniMaxRMSNorm(nh*d) -> default 1e-6); match it
                y = rms_norm(y.reshape(T, nh * d).astype(h.dtype),
                             lp["attn_norm"], 1e-6)
                gate = jax.nn.sigmoid(
                    linear(h, lp["gate"]).astype(jnp.float32))
                y = (y.astype(jnp.float32) * gate).astype(h.dtype)
                out = linear(y, lp["o"])
                li_lin += 1
            else:
                nq, nk, d = a.num_heads, a.num_kv_heads, a.head_dim
                qkv = linear(h, lp["qkv"])
                q, k, v = jnp.split(qkv, [nq * d, (nq + nk) * d], axis=-1)
                q = q.reshape(T, nq, d)
                k = k.reshape(T, nk, d)
                v = v.reshape(T, nk, d)
                q, k = apply_rope(q, k, metadata.positions, self.inv_freq,
                                  a.rope.is_neox_style, self.rope_mscale)
                attn_kv = write_kv_cache(attn_kv, k, v,
                                         metadata.slot_mapping,
                                         layer=li_full)
                o = attention(q, attn_kv, metadata, self.scale,
                              layer=li_full)
                out = linear(o.reshape(T, nq * d), lp["o"])
                li_full += 1
            ab = 0 if linear_layer else 1
            x = h * a.attn_alpha[ab] + out * a.attn_beta[ab]

            h = rms_norm(x, lp["post_ln"], a.rms_eps)
            weights, expert_ids = topk_routing(
                linear(h, lp["router"]), a.top_k, renormalize=True)
            moe = fused_moe(h, lp["experts_gate_up"], lp["experts_down"],
                            weights, expert_ids, act=a.act)
            x = h * a.mlp_alpha + moe * a.mlp_beta

        x = rms_norm(x, params["final_ln"], a.rms_eps)
        new_caches = [None] * len(kv_caches)
        new_caches[ssm_gi] = (lin_states,)
        if attn_gi is not None:
            new_caches[attn_gi] = attn_kv
        return x, new_caches

    def compute_logits(self, params: dict,
                       hidden: jnp.ndarray) -> jnp.ndarray:
        w = params["lm_head"]["w"] if "lm_head" in params \
            else params["embed"]["w"].T
        return jnp.dot(hidden, w.astype(hidden.dtype))

    def get_kv_cache_specs(self, block_size: int,
                           cache_dtype: str) -> dict[str, KVCacheSpec]:
        a = self.args
        state_bytes = a.num_heads * a.head_dim * a.head_dim * 4
        specs: dict[str, KVCacheSpec] = {}
        for i, ltype in enumerate(self.layer_types):
            if ltype == "full_attention":
                specs[f"layers.{i}"] = FullAttentionSpec(
                    block_size=block_size, num_kv_heads=a.num_kv_heads,
                    head_size=a.head_dim, dtype=cache_dtype)
            else:
                specs[f"layers.{i}"] = MambaSpec(
                    block_size=block_size, state_size_bytes=state_bytes)
        return specs

    # ------------------------------------------------------------- weights

    def load_weights(self, weights_iter) -> dict:
        a = self.args
        npd = np.float32 if self.dtype == jnp.float32 else np.dtype(
            "bfloat16")
        nh, d = a.num_heads, a.head_dim
        E, I = a.num_experts, a.moe_intermediate
        layers: list[dict] = [{} for _ in range(a.num_layers)]
        params: dict = {"layers": layers}
        qkv_parts: dict[int, dict] = {}
        for name, w in weights_iter:
            w = np.asarray(w)
            if name == "model.embed_tokens.weight":
                params["embed"] = {"w": w.astype(npd)}
            elif name == "model.norm.weight":
                params["final_ln"] = w.astype(npd)
            elif name == "lm_head.weight":
                params["lm_head"] = {"w": w.T.astype(npd)}
            elif name.startswith("model.layers."):
                parts = name.split(".")
                li = int(parts[2])
                sub = ".".join(parts[3:])
                lp = layers[li]
                if sub == "input_layernorm.weight":
                    lp["input_ln"] = w.astype(npd)
                elif sub == "post_attention_layernorm.weight":
                    lp["post_ln"] = w.astype(npd)
                elif sub == "block_sparse_moe.gate.weight":
                    lp["router"] = {"w": w.T.astype(npd)}
                elif sub.startswith("block_sparse_moe.experts."):
                    e = int(sub.split(".")[2])
                    kind = sub.split(".")[3]
                    gu = lp.setdefault(
                        "experts_gate_up",
                        np.zeros((E, a.hidden_size, 2 * I), npd))
                    dn = lp.setdefault(
                        "experts_down", np.zeros((E, I, a.hidden_size),
                                                 npd))
                    if kind == "w1":  # gate
                        gu[e, :, :I] = w.T
                    elif kind == "w3":  # up
                        gu[e, :, I:] = w.T
                    else:  # w2 down
                        dn[e] = w.T
                # lightning attention
                elif sub == "self_attn.qkv_proj.weight":
                    # HF rows: per-head [q|k|v] triples -> keep as-is
                    lp["qkv"] = {"w": w.T.astype(npd)}
                elif sub == "self_attn.out_proj.weight":
                    lp["o"] = {"w": w.T.astype(npd)}
                elif sub == "self_attn.output_gate.weight":
                    lp["gate"] = {"w": w.T.astype(npd)}
                elif sub == "self_attn.norm.weight":
                    lp["attn_norm"] = w.astype(npd)
                # full attention
                elif sub in ("self_attn.q_proj.weight",
                             "self_attn.k_proj.weight",
                             "self_attn.v_proj.weight"):
                    qkv_parts.setdefault(li, {})[sub.split(".")[1][0]] = w.T
                elif sub == "self_attn.o_proj.weight":
                    lp["o"] = {"w": w.T.astype(npd)}
        for li, parts in qkv_parts.items():
            layers[li]["qkv"] = {"w": np.concatenate(
                [parts["q"], parts["k"], parts["v"]], axis=1).astype(npd)}
        if a.tie_embeddings and "lm_head" not in params:
            params["lm_head"] = {"w": params["embed"]["w"].T.copy()}
        return params


class MiniMaxM1ForCausalLM(MiniMaxText01ForCausalLM):
    """MiniMax-M1 shares the Text-01 architecture
    (reference: minimax_text_01.py registry aliases)."""


class MiniMaxForCausalLM(MiniMaxText01ForCausalLM):
    """transformers 'minimax' model_type (MiniMax-Text-01)."""
