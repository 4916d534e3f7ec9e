"""GraniteMoeHybrid — IBM Granite 4.0 hybrid Mamba2 + attention MoE LM
(reference behavior parity: vllm/model_executor/models/
granitemoehybrid.py).

Per layer (``config.layer_types`` picks the mixer):
  x += residual_multiplier * mixer(input_ln(x))     # mamba2 OR GQA attn
  h  = post_attention_ln(x)
  x += residual_multiplier * (topk_moe(h) + shared_mlp(h))
Granite muP scalars: embedding_multiplier on embeddings,
attention_multiplier as the attention scale, 1/logits_scaling on
logits. Attention layers default to NoPE (position_embedding_type is
None) — rope only when config says "rope"."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from vllm_tpu.config import ModelConfig
from vllm_tpu.core.kv_cache_interface import (FullAttentionSpec,
                                              KVCacheSpec, MambaSpec)
from vllm_tpu.models.bamba import BambaArgs, BambaForCausalLM
from vllm_tpu.models.mamba2 import _pick_chunk, mamba2_mixer, packed_segments
from vllm_tpu.ops.activation import GATED_ACTIVATIONS
from vllm_tpu.ops.attention import (AttentionMetadata, attention,
                                    write_kv_cache)
from vllm_tpu.ops.layernorm import rms_norm
from vllm_tpu.ops.linear import linear
from vllm_tpu.ops.moe import fused_moe, topk_routing
from vllm_tpu.ops.rotary import RopeConfig, apply_rope


class GraniteMoeHybridForCausalLM(BambaForCausalLM):

    def __init__(self, model_config: ModelConfig) -> None:
        hf = model_config.resolve_hf_config()
        L = hf.num_hidden_layers
        ltypes = list(getattr(hf, "layer_types", None) or ["mamba"] * L)
        head_dim = getattr(hf, "head_dim", None) or \
            hf.hidden_size // hf.num_attention_heads
        d_ssm = int(getattr(hf, "mamba_expand", 2) * hf.hidden_size)
        mamba_heads = hf.mamba_n_heads
        d_head = getattr(hf, "mamba_d_head", "auto")
        if d_head == "auto" or d_head is None:
            d_head = d_ssm // mamba_heads
        args = BambaArgs(
            vocab_size=hf.vocab_size,
            hidden_size=hf.hidden_size,
            num_layers=L,
            attn_layers=tuple(i for i, t in enumerate(ltypes)
                              if t == "attention"),
            num_heads=hf.num_attention_heads,
            num_kv_heads=getattr(hf, "num_key_value_heads",
                                 hf.num_attention_heads),
            head_dim=head_dim,
            rope=RopeConfig.from_hf_config(hf, head_dim),
            mamba_heads=mamba_heads,
            mamba_head_dim=int(d_head),
            mamba_groups=getattr(hf, "mamba_n_groups", 1),
            state_size=hf.mamba_d_state,
            conv_kernel=getattr(hf, "mamba_d_conv", 4),
            mamba_inter=d_ssm,
            chunk_size=int(getattr(hf, "mamba_chunk_size", 256)),
            intermediate_size=hf.intermediate_size,
            act=getattr(hf, "hidden_act", "silu"),
            rms_eps=float(getattr(hf, "rms_norm_eps", 1e-6)),
            tie_embeddings=bool(getattr(hf, "tie_word_embeddings",
                                        False)),
        )
        super().__init__(model_config, args=args)
        self.num_experts = int(getattr(hf, "num_local_experts", 8))
        self.top_k = int(getattr(hf, "num_experts_per_tok", 2))
        self.shared_inter = int(getattr(hf, "shared_intermediate_size",
                                        0) or 0)
        self.emb_mult = float(getattr(hf, "embedding_multiplier", 1.0))
        self.res_mult = float(getattr(hf, "residual_multiplier", 1.0))
        self.logits_scaling = float(getattr(hf, "logits_scaling", 1.0))
        am = getattr(hf, "attention_multiplier", None)
        self.scale = (float(am) if am is not None
                      else 1.0 / math.sqrt(head_dim))
        self.rope_on = getattr(hf, "position_embedding_type",
                               None) == "rope"

    # ------------------------------------------------------------- forward

    def embed(self, params, input_ids):
        x = super().embed(params, input_ids)
        return x * self.emb_mult if self.emb_mult != 1.0 else x

    def compute_logits(self, params, hidden):
        logits = super().compute_logits(params, hidden)
        if self.logits_scaling != 1.0:
            logits = logits / self.logits_scaling
        return logits

    def _moe_mlp(self, lp, h):
        weights, expert_ids = topk_routing(
            linear(h, lp["router"]), self.top_k, renormalize=True)
        out = fused_moe(h, lp["experts_gate_up"], lp["experts_down"],
                        weights, expert_ids, act=self.args.act)
        if self.shared_inter:
            gate_up = linear(h, lp["shared_gate_up"])
            out = out + linear(
                GATED_ACTIVATIONS[self.args.act](gate_up),
                lp["shared_down"])
        return out

    def forward(self, params, input_ids, kv_caches, metadata, lora=None,
                embed_override=None):
        a = self.args
        rm = self.res_mult
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
        if embed_override is not None:
            idx, vecs = embed_override
            x = x.at[idx].set(vecs.astype(x.dtype))
        mi = ai = 0
        for li, ltype in enumerate(self.layer_types):
            lp = jax.tree.map(jnp.asarray, params["layers"][li])
            h = rms_norm(x, lp["input_ln"], a.rms_eps)
            if ltype == "mamba":
                out, new_conv, new_ssm = mamba2_mixer(
                    h, lp, conv_states[mi], ssm_states[mi], seg,
                    seg_start, pad_mask, num_heads=a.mamba_heads,
                    head_dim=a.mamba_head_dim, n_groups=a.mamba_groups,
                    state_size=a.state_size,
                    intermediate_size=a.mamba_inter,
                    rms_eps=a.rms_eps, chunk=chunk)
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
                if self.rope_on:
                    q, k = apply_rope(q, k, metadata.positions,
                                      self.inv_freq,
                                      a.rope.is_neox_style,
                                      self.rope_mscale)
                attn_kv = write_kv_cache(attn_kv, k, v,
                                         metadata.slot_mapping, layer=ai)
                o = attention(q, attn_kv, metadata, self.scale, layer=ai)
                out = linear(o.reshape(T, nq * d), lp["o"])
                ai += 1
            x = x + rm * out

            h = rms_norm(x, lp["post_ln"], a.rms_eps)
            x = x + rm * self._moe_mlp(lp, h)

        x = rms_norm(x, params["final_ln"], a.rms_eps)
        new_caches = [None] * len(kv_caches)
        new_caches[ssm_gi] = (conv_states, ssm_states)
        if attn_gi is not None:
            new_caches[attn_gi] = attn_kv
        return x, new_caches

    # ------------------------------------------------------------- weights

    def load_weights(self, weights_iter) -> dict:
        a = self.args
        npd = np.float32 if self.dtype == jnp.float32 else np.dtype(
            "bfloat16")
        layers: list[dict] = [{} for _ in range(a.num_layers)]
        params: dict = {"layers": layers}
        qkv_parts: dict[int, dict] = {}
        I = a.intermediate_size
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
                elif sub == "block_sparse_moe.router.layer.weight":
                    lp["router"] = {"w": w.T.astype(npd)}
                elif sub == "block_sparse_moe.input_linear.weight":
                    # HF [E, 2I, H] fused gate|up -> [E, H, 2I]
                    lp["experts_gate_up"] = w.transpose(0, 2, 1).astype(
                        npd)
                elif sub == "block_sparse_moe.output_linear.weight":
                    # HF [E, H, I] -> [E, I, H]
                    lp["experts_down"] = w.transpose(0, 2, 1).astype(npd)
                elif sub == "shared_mlp.input_linear.weight":
                    lp["shared_gate_up"] = {"w": w.T.astype(npd)}
                elif sub == "shared_mlp.output_linear.weight":
                    lp["shared_down"] = {"w": w.T.astype(npd)}
                # mamba mixer (bamba naming)
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
