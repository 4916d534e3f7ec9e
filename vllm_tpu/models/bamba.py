"""Bamba hybrid attention + Mamba2 causal LM (reference:
vllm/model_executor/models/bamba.py — IBM Bamba: Mamba2 mixers on most
layers, GQA attention on `attn_layer_indices`, shared gated MLP).

Hybrid caching: TWO KV-cache groups — the attention layers share a
paged KV stack (FullAttentionSpec) and the Mamba layers share a
constant-size per-request state tuple (MambaSpec). The scheduler's
per-group managers and the runner's group-typed allocation handle the
split; forward consumes the groups in spec order.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vllm_tpu.config import ModelConfig
from vllm_tpu.core.kv_cache_interface import (FullAttentionSpec,
                                              KVCacheSpec, MambaSpec)
from vllm_tpu.models.mamba2 import _pick_chunk, mamba2_mixer, packed_segments
from vllm_tpu.ops.activation import GATED_ACTIVATIONS
from vllm_tpu.ops.attention import (AttentionMetadata, attention,
                                    write_kv_cache)
from vllm_tpu.ops.layernorm import rms_norm
from vllm_tpu.ops.linear import embedding_lookup, linear
from vllm_tpu.ops.rotary import RopeConfig, apply_rope, compute_inv_freq


@dataclass(frozen=True)
class BambaArgs:
    vocab_size: int
    hidden_size: int
    num_layers: int
    attn_layers: tuple  # indices using attention; rest are mamba
    # attention
    num_heads: int
    num_kv_heads: int
    head_dim: int
    rope: RopeConfig
    # mamba
    mamba_heads: int
    mamba_head_dim: int
    mamba_groups: int
    state_size: int
    conv_kernel: int
    mamba_inter: int
    chunk_size: int
    # mlp
    intermediate_size: int
    act: str
    rms_eps: float
    tie_embeddings: bool

    @property
    def conv_dim(self) -> int:
        return self.mamba_inter + 2 * self.mamba_groups * self.state_size

    @staticmethod
    def from_hf_config(hf) -> "BambaArgs":
        head_dim = getattr(hf, "attention_head_dim", None) or \
            hf.hidden_size // hf.num_attention_heads
        return BambaArgs(
            vocab_size=hf.vocab_size,
            hidden_size=hf.hidden_size,
            num_layers=hf.num_hidden_layers,
            attn_layers=tuple(getattr(hf, "attn_layer_indices", None)
                              or ()),
            num_heads=hf.num_attention_heads,
            num_kv_heads=getattr(hf, "num_key_value_heads",
                                 hf.num_attention_heads),
            head_dim=head_dim,
            rope=RopeConfig.from_hf_config(hf, head_dim),
            mamba_heads=hf.mamba_n_heads,
            mamba_head_dim=hf.mamba_d_head,
            mamba_groups=getattr(hf, "mamba_n_groups", 1),
            state_size=hf.mamba_d_state,
            conv_kernel=getattr(hf, "mamba_d_conv", 4),
            mamba_inter=int(getattr(hf, "mamba_expand", 2) *
                            hf.hidden_size),
            chunk_size=int(getattr(hf, "mamba_chunk_size", 256)),
            intermediate_size=hf.intermediate_size,
            act=getattr(hf, "hidden_act", "silu"),
            rms_eps=float(getattr(hf, "rms_norm_eps", 1e-5)),
            tie_embeddings=bool(getattr(hf, "tie_word_embeddings",
                                        False)),
        )


class BambaForCausalLM:
    """Hybrid SSM/attention model. Layer loop is unrolled in the jit
    (layer types alternate irregularly, so a uniform scan does not
    apply; per-type stacked scans are a later optimization)."""

    is_ssm = True  # has recurrent state -> runner emits state slots

    def __init__(self, model_config: ModelConfig,
                 args: Optional[BambaArgs] = None) -> None:
        self.model_config = model_config
        hf = model_config.resolve_hf_config()
        self.args = args or BambaArgs.from_hf_config(hf)
        self.dtype = jnp.bfloat16 if model_config.dtype == "bfloat16" \
            else jnp.float32
        self.inv_freq, self.rope_mscale = compute_inv_freq(self.args.rope)
        self.scale = 1.0 / math.sqrt(self.args.head_dim)
        self.layer_types = [
            "attn" if i in self.args.attn_layers else "mamba"
            for i in range(self.args.num_layers)
        ]
        self.num_attn_layers = len(self.args.attn_layers)
        self.num_mamba_layers = self.args.num_layers - self.num_attn_layers

    def embed(self, params: dict, input_ids: jnp.ndarray) -> jnp.ndarray:
        return embedding_lookup(input_ids, params["embed"]["w"])

    def init_states(self, num_slots: int):
        a = self.args
        return (jnp.zeros((self.num_mamba_layers, num_slots + 1,
                           a.conv_kernel - 1, a.conv_dim), self.dtype),
                jnp.zeros((self.num_mamba_layers, num_slots + 1,
                           a.mamba_heads, a.mamba_head_dim, a.state_size),
                          jnp.float32))

    def forward(
        self,
        params: dict,
        input_ids: jnp.ndarray,
        kv_caches,  # [ (conv, ssm), attn_kv ] in spec-group order
        metadata: AttentionMetadata,
        lora=None,
        embed_override=None,
    ):
        a = self.args
        T = input_ids.shape[0]
        ssm_gi = next(i for i, c in enumerate(kv_caches)
                      if isinstance(c, tuple))
        attn_gi = next((i for i, c in enumerate(kv_caches)
                        if not isinstance(c, tuple)), None)
        conv_states, ssm_states = kv_caches[ssm_gi]
        attn_kv = kv_caches[attn_gi] if attn_gi is not None else None
        num_slots = conv_states.shape[1] - 1
        seg, seg_start, pad_mask = packed_segments(metadata, T, num_slots)
        chunk = _pick_chunk(T, a.chunk_size)

        x = self.embed(params, input_ids)
        mi = ai = 0
        for li, ltype in enumerate(self.layer_types):
            lp = params["layers"][li]
            lp = jax.tree.map(jnp.asarray, lp)
            h = rms_norm(x, lp["input_ln"], a.rms_eps)
            if ltype == "mamba":
                out, new_conv, new_ssm = mamba2_mixer(
                    h, lp, conv_states[mi], ssm_states[mi], seg,
                    seg_start, pad_mask, num_heads=a.mamba_heads,
                    head_dim=a.mamba_head_dim, n_groups=a.mamba_groups,
                    state_size=a.state_size,
                    intermediate_size=a.mamba_inter, rms_eps=a.rms_eps,
                    chunk=chunk)
                conv_states = conv_states.at[mi].set(new_conv)
                ssm_states = ssm_states.at[mi].set(new_ssm)
                mi += 1
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
                                         metadata.slot_mapping, layer=ai)
                o = attention(q, attn_kv, metadata, self.scale, layer=ai)
                out = linear(o.reshape(T, nq * d), lp["o"])
                ai += 1
            x = x + out

            h = rms_norm(x, lp["pre_ff_ln"], a.rms_eps)
            gate_up = linear(h, lp["gate_up"])
            x = x + linear(GATED_ACTIVATIONS[a.act](gate_up), lp["down"])

        x = rms_norm(x, params["final_ln"], a.rms_eps)
        new_caches = [None] * len(kv_caches)
        new_caches[ssm_gi] = (conv_states, ssm_states)
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
        el = 2 if self.dtype == jnp.bfloat16 else 4
        conv_bytes = (a.conv_kernel - 1) * a.conv_dim * el
        ssm_bytes = a.mamba_heads * a.mamba_head_dim * a.state_size * 4
        specs: dict[str, KVCacheSpec] = {}
        for i, ltype in enumerate(self.layer_types):
            if ltype == "attn":
                specs[f"layers.{i}"] = FullAttentionSpec(
                    block_size=block_size, num_kv_heads=a.num_kv_heads,
                    head_size=a.head_dim, dtype=cache_dtype)
            else:
                specs[f"layers.{i}"] = MambaSpec(
                    block_size=block_size,
                    state_size_bytes=conv_bytes + ssm_bytes)
        return specs

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
            elif name == "model.final_layernorm.weight":
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
                elif sub == "pre_ff_layernorm.weight":
                    lp["pre_ff_ln"] = w.astype(npd)
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
                # mamba mixer
                elif sub == "mamba.in_proj.weight":
                    lp["in_proj"] = {"w": w.T.astype(npd)}
                elif sub == "mamba.conv1d.weight":
                    lp["conv_w"] = w[:, 0, :].astype(npd)
                elif sub == "mamba.conv1d.bias":
                    lp["conv_b"] = w.astype(npd)
                elif sub == "mamba.dt_bias":
                    lp["dt_bias"] = w.astype(np.float32)
                elif sub == "mamba.A_log":
                    lp["A_log"] = w.astype(np.float32)
                elif sub == "mamba.D":
                    lp["D"] = w.astype(np.float32)
                elif sub == "mamba.norm.weight":
                    lp["mixer_norm"] = w.astype(npd)
                elif sub == "mamba.out_proj.weight":
                    lp["out_proj"] = {"w": w.T.astype(npd)}
                # attention
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
