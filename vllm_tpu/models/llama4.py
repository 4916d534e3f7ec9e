"""Llama-4 text model (reference: vllm/model_executor/models/llama4.py).

The Llama-4 decoder interleaves:
- chunked-local attention layers WITH rope (GPT-J interleaved pairs) and
  weightless L2 qk-norm after rope, and
- full-attention NoPE layers (every `no_rope_layers==0` slot) with
  position-dependent query temperature tuning, plus
- MoE FFNs on `interleave_moe_layer_step` layers: sigmoid-scored top-k
  routing that scales the expert INPUT, summed with an always-on shared
  expert.

Caching: all layers share one FullAttentionSpec group; chunked locality
is enforced in-kernel via the `local_chunk` attention mask
(ChunkedLocalAttention block reclamation per group is future work —
needs per-group block tables on device).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vllm_tpu.config import ModelConfig
from vllm_tpu.core.kv_cache_interface import FullAttentionSpec, KVCacheSpec
from vllm_tpu.ops.activation import GATED_ACTIVATIONS
from vllm_tpu.ops.attention import (AttentionMetadata, attention,
                                    write_kv_cache)
from vllm_tpu.ops.layernorm import rms_norm
from vllm_tpu.ops.linear import embedding_lookup, linear
from vllm_tpu.ops.moe import fused_moe, topk_routing
from vllm_tpu.ops.rotary import RopeConfig, apply_rope, compute_inv_freq


def _l2_norm(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    out = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) +
                             eps)
    return out.astype(x.dtype)


@dataclass(frozen=True)
class Llama4Args:
    vocab_size: int
    hidden_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    intermediate_size: int  # dense-layer MLP width
    intermediate_size_moe: int  # per-expert width
    num_experts: int
    top_k: int
    moe_layers: tuple
    rope_layers: tuple  # 1 = rope (chunked local), 0 = NoPE (full attn)
    attention_chunk_size: int
    use_qk_norm: bool
    attn_temperature_tuning: bool
    floor_scale: float
    attn_scale: float
    rms_eps: float
    rope: RopeConfig
    act: str
    tie_embeddings: bool

    @staticmethod
    def from_hf_config(hf) -> "Llama4Args":
        head_dim = getattr(hf, "head_dim", None) or \
            hf.hidden_size // hf.num_attention_heads
        L = hf.num_hidden_layers
        step = int(getattr(hf, "interleave_moe_layer_step", 1))
        moe_layers = getattr(hf, "moe_layers", None)
        if moe_layers is None:
            moe_layers = [i for i in range(L)
                          if step > 0 and (i + 1) % step == 0]
        no_rope = getattr(hf, "no_rope_layers", None) or [1] * L
        return Llama4Args(
            vocab_size=hf.vocab_size,
            hidden_size=hf.hidden_size,
            num_layers=L,
            num_heads=hf.num_attention_heads,
            num_kv_heads=getattr(hf, "num_key_value_heads",
                                 hf.num_attention_heads),
            head_dim=head_dim,
            intermediate_size=int(getattr(hf, "intermediate_size_mlp",
                                          hf.intermediate_size)),
            intermediate_size_moe=hf.intermediate_size,
            num_experts=int(getattr(hf, "num_local_experts", 0)),
            top_k=int(getattr(hf, "num_experts_per_tok", 1)),
            moe_layers=tuple(moe_layers),
            rope_layers=tuple(int(x) for x in no_rope),
            attention_chunk_size=int(getattr(hf, "attention_chunk_size",
                                             8192)),
            use_qk_norm=bool(getattr(hf, "use_qk_norm", True)),
            attn_temperature_tuning=bool(
                getattr(hf, "attn_temperature_tuning", True)),
            floor_scale=float(getattr(hf, "floor_scale", 8192.0)),
            attn_scale=float(getattr(hf, "attn_scale", 0.1)),
            rms_eps=float(getattr(hf, "rms_norm_eps", 1e-5)),
            rope=RopeConfig.from_hf_config(hf, head_dim),
            act=getattr(hf, "hidden_act", "silu"),
            tie_embeddings=bool(getattr(hf, "tie_word_embeddings",
                                        False)),
        )


class Llama4ForCausalLM:

    def __init__(self, model_config: ModelConfig,
                 args: Optional[Llama4Args] = None) -> None:
        self.model_config = model_config
        hf = model_config.resolve_hf_config()
        hf = getattr(hf, "text_config", hf)
        self.args = args or Llama4Args.from_hf_config(hf)
        self.dtype = jnp.bfloat16 if model_config.dtype == "bfloat16" \
            else jnp.float32
        self.inv_freq, self.rope_mscale = compute_inv_freq(self.args.rope)
        self.scale = 1.0 / math.sqrt(self.args.head_dim)

    def embed(self, params: dict, input_ids: jnp.ndarray) -> jnp.ndarray:
        return embedding_lookup(input_ids, params["embed"]["w"])

    def forward(
        self,
        params: dict,
        input_ids: jnp.ndarray,
        kv_caches,
        metadata: AttentionMetadata,
        lora=None,
        embed_override=None,
    ):
        a = self.args
        T = input_ids.shape[0]
        kv = kv_caches[0]
        x = self.embed(params, input_ids)
        pos = metadata.positions

        for li in range(a.num_layers):
            lp = jax.tree.map(jnp.asarray, params["layers"][li])
            use_rope = bool(a.rope_layers[li])
            nq, nk, d = a.num_heads, a.num_kv_heads, a.head_dim

            h = rms_norm(x, lp["input_ln"], a.rms_eps)
            qkv = linear(h, lp["qkv"])
            q, k, v = jnp.split(qkv, [nq * d, (nq + nk) * d], axis=-1)
            q = q.reshape(T, nq, d)
            k = k.reshape(T, nk, d)
            v = v.reshape(T, nk, d)
            if use_rope:
                q, k = apply_rope(q, k, pos, self.inv_freq,
                                  is_neox_style=False,
                                  mscale=self.rope_mscale)
                if a.use_qk_norm:
                    q = _l2_norm(q)
                    k = _l2_norm(k)
            elif a.attn_temperature_tuning:
                scales = jnp.log1p(
                    jnp.floor((pos.astype(jnp.float32) + 1.0) /
                              a.floor_scale)) * a.attn_scale + 1.0
                q = (q.astype(jnp.float32) *
                     scales[:, None, None]).astype(q.dtype)
            kv = write_kv_cache(kv, k, v, metadata.slot_mapping, layer=li)
            o = attention(q, kv, metadata, self.scale, layer=li,
                          local_chunk=(a.attention_chunk_size
                                       if use_rope else None))
            x = x + linear(o.reshape(T, nq * d), lp["o"])

            h = rms_norm(x, lp["post_ln"], a.rms_eps)
            if li in a.moe_layers:
                router_logits = linear(h, lp["router"])
                weights, ids = topk_routing(router_logits, a.top_k,
                                            renormalize=False,
                                            scoring="sigmoid")
                routed = fused_moe(h, lp["experts_gate_up"],
                                   lp["experts_down"], weights, ids,
                                   act=a.act, scale_inputs=True)
                shared = linear(
                    GATED_ACTIVATIONS[a.act](linear(h, lp["shared_gu"])),
                    lp["shared_down"])
                x = x + routed + shared
            else:
                gate_up = linear(h, lp["gate_up"])
                x = x + linear(GATED_ACTIVATIONS[a.act](gate_up),
                               lp["down"])

        x = rms_norm(x, params["final_ln"], a.rms_eps)
        return x, [kv]

    def compute_logits(self, params: dict,
                       hidden: jnp.ndarray) -> jnp.ndarray:
        w = params["lm_head"]["w"] if "lm_head" in params \
            else params["embed"]["w"].T
        return jnp.dot(hidden, w.astype(hidden.dtype))

    def get_kv_cache_specs(self, block_size: int,
                           cache_dtype: str) -> dict[str, KVCacheSpec]:
        a = self.args
        return {
            f"layers.{i}": FullAttentionSpec(
                block_size=block_size, num_kv_heads=a.num_kv_heads,
                head_size=a.head_dim, dtype=cache_dtype)
            for i in range(a.num_layers)
        }

    def load_weights(self, weights_iter) -> dict:
        a = self.args
        npd = np.float32 if self.dtype == jnp.float32 else np.dtype(
            "bfloat16")
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
                elif sub in ("self_attn.q_proj.weight",
                             "self_attn.k_proj.weight",
                             "self_attn.v_proj.weight"):
                    qkv_parts.setdefault(li, {})[parts[4][0]] = w.T
                elif sub == "self_attn.o_proj.weight":
                    lp["o"] = {"w": w.T.astype(npd)}
                # dense mlp
                elif sub in ("feed_forward.gate_proj.weight",
                             "feed_forward.up_proj.weight"):
                    half = 0 if "gate" in sub else 1
                    gu = lp.setdefault(
                        "gate_up",
                        {"w": np.empty((a.hidden_size,
                                        2 * a.intermediate_size), npd)})
                    gu["w"][:, half * a.intermediate_size:(half + 1) *
                            a.intermediate_size] = w.T
                elif sub == "feed_forward.down_proj.weight":
                    lp["down"] = {"w": w.T.astype(npd)}
                # moe
                elif sub == "feed_forward.router.weight":
                    lp["router"] = {"w": w.T.astype(npd)}
                elif sub == "feed_forward.experts.gate_up_proj":
                    lp["experts_gate_up"] = w.astype(npd)  # [E, H, 2I]
                elif sub == "feed_forward.experts.down_proj":
                    lp["experts_down"] = w.astype(npd)  # [E, I, H]
                elif sub in ("feed_forward.shared_expert.gate_proj.weight",
                             "feed_forward.shared_expert.up_proj.weight"):
                    half = 0 if "gate" in sub else 1
                    I = a.intermediate_size_moe
                    gu = lp.setdefault(
                        "shared_gu",
                        {"w": np.empty((a.hidden_size, 2 * I), npd)})
                    gu["w"][:, half * I:(half + 1) * I] = w.T
                elif sub == "feed_forward.shared_expert.down_proj.weight":
                    lp["shared_down"] = {"w": w.T.astype(npd)}
        for li, parts in qkv_parts.items():
            layers[li]["qkv"] = {"w": np.concatenate(
                [parts["q"], parts["k"], parts["v"]], axis=1).astype(npd)}
        if a.tie_embeddings and "lm_head" not in params:
            params["lm_head"] = {"w": params["embed"]["w"].T.copy()}
        return params
