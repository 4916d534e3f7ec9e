"""Jamba hybrid Mamba-1/attention/MoE causal LM (reference:
vllm/model_executor/models/jamba.py + csrc/mamba/mamba_ssm/
selective_scan_fwd.cu — AI21 Jamba: Mamba-1 mixers on most layers,
GQA attention every `attn_layer_period`-th layer (NO positional
embedding), and a sparse-MoE feed-forward every
`expert_layer_period`-th layer).

Hybrid caching mirrors Bamba: attention layers share one paged KV
group, Mamba layers share one constant-size per-request state tuple
(conv taps + [D, N] SSM state). The Mamba-1 recurrence has per-
(channel, state-dim) decays, so it runs through
ops/mamba.selective_scan_segmented (chunked associative scan), not the
Mamba-2 SSD dual.
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
from vllm_tpu.models.mamba2 import _pick_chunk, packed_segments
from vllm_tpu.ops.attention import (AttentionMetadata, attention,
                                    write_kv_cache)
from vllm_tpu.ops.layernorm import rms_norm
from vllm_tpu.ops.linear import embedding_lookup, linear
from vllm_tpu.ops.mamba import (causal_conv1d_segmented,
                                selective_scan_segmented)


@dataclass(frozen=True)
class JambaArgs:
    vocab_size: int
    hidden_size: int
    num_layers: int
    attn_layer_period: int
    attn_layer_offset: int
    expert_layer_period: int
    expert_layer_offset: int
    num_experts: int
    num_experts_per_tok: int
    # attention
    num_heads: int
    num_kv_heads: int
    head_dim: int
    # mamba-1
    d_inner: int
    d_state: int
    d_conv: int
    dt_rank: int
    # mlp
    intermediate_size: int
    rms_eps: float
    tie_embeddings: bool

    @staticmethod
    def from_hf_config(hf) -> "JambaArgs":
        d_inner = int(getattr(hf, "mamba_expand", 2) * hf.hidden_size)
        dt_rank = getattr(hf, "mamba_dt_rank", None)
        if dt_rank in (None, "auto"):
            dt_rank = math.ceil(hf.hidden_size / 16)
        return JambaArgs(
            vocab_size=hf.vocab_size,
            hidden_size=hf.hidden_size,
            num_layers=hf.num_hidden_layers,
            attn_layer_period=getattr(hf, "attn_layer_period", 8),
            attn_layer_offset=getattr(hf, "attn_layer_offset", 4),
            expert_layer_period=getattr(hf, "expert_layer_period", 2),
            expert_layer_offset=getattr(hf, "expert_layer_offset", 1),
            num_experts=getattr(hf, "num_experts", 1),
            num_experts_per_tok=getattr(hf, "num_experts_per_tok", 1),
            num_heads=hf.num_attention_heads,
            num_kv_heads=getattr(hf, "num_key_value_heads",
                                 hf.num_attention_heads),
            head_dim=hf.hidden_size // hf.num_attention_heads,
            d_inner=d_inner,
            d_state=getattr(hf, "mamba_d_state", 16),
            d_conv=getattr(hf, "mamba_d_conv", 4),
            dt_rank=int(dt_rank),
            intermediate_size=hf.intermediate_size,
            rms_eps=float(getattr(hf, "rms_norm_eps", 1e-6)),
            tie_embeddings=bool(getattr(hf, "tie_word_embeddings",
                                        False)),
        )

    def layer_type(self, i: int) -> str:
        return ("attn" if i % self.attn_layer_period ==
                self.attn_layer_offset else "mamba")

    def is_expert_layer(self, i: int) -> bool:
        return (self.num_experts > 1 and i % self.expert_layer_period ==
                self.expert_layer_offset)


def _rms(x, w, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) * w).astype(jnp.float32)


def mamba1_mixer(h, lp, conv_state, ssm_state, seg, seg_start, pad_mask,
                 *, d_inner: int, d_state: int, dt_rank: int,
                 rms_eps: float, chunk: int):
    """Jamba Mamba-1 mixer over a packed stream (reference:
    modeling_jamba.py JambaMambaMixer.slow_forward / vllm jamba.py
    JambaMambaMixer). Returns (out, new_conv_state, new_ssm_state)."""
    T = h.shape[0]
    xz = linear(h, lp["in_proj"])  # [T, 2*D]
    x, z = jnp.split(xz, 2, axis=-1)
    # pad_mask is True ON PADDING rows (packed_segments contract)
    x = jnp.where(pad_mask[:, None], 0.0, x).astype(h.dtype)
    x, new_conv = causal_conv1d_segmented(x, lp["conv_w"],
                                          lp.get("conv_b"), seg,
                                          seg_start, conv_state)
    x = jax.nn.silu(x.astype(jnp.float32)).astype(h.dtype)

    proj = linear(x, lp["x_proj"])  # [T, dt_rank + 2N]
    dt_raw, B, C = jnp.split(proj, [dt_rank, dt_rank + d_state], axis=-1)
    # RMS norms on the selection parameters: Jamba uses learned weights,
    # FalconMamba weightless ones (keys absent -> pure Mamba, no norms)
    if "dt_ln" in lp:
        dt_raw = _rms(dt_raw, lp["dt_ln"], rms_eps)
        B = _rms(B, lp["b_ln"], rms_eps)
        C = _rms(C, lp["c_ln"], rms_eps)
    dt = jax.nn.softplus(
        dt_raw @ lp["dt_proj"]["w"].astype(jnp.float32) +
        lp["dt_proj"]["b"])  # [T, D]
    dt = jnp.where(pad_mask[:, None], 0.0, dt)
    A = -jnp.exp(lp["A_log"])  # [D, N]

    y, new_ssm = selective_scan_segmented(x, dt.astype(jnp.float32), A,
                                          B, C, seg, ssm_state,
                                          chunk_size=chunk)
    y = y.astype(jnp.float32) + x.astype(jnp.float32) * lp["D"]
    y = y * jax.nn.silu(z.astype(jnp.float32))
    return linear(y.astype(h.dtype), lp["out_proj"]), new_conv, new_ssm


class JambaForCausalLM:
    """Hybrid SSM/attention/MoE model; layer loop unrolled in the jit
    (types alternate irregularly, like Bamba)."""

    is_ssm = True

    def __init__(self, model_config: ModelConfig,
                 args: Optional[JambaArgs] = None) -> None:
        self.model_config = model_config
        hf = model_config.resolve_hf_config()
        self.args = args or JambaArgs.from_hf_config(hf)
        self.dtype = jnp.bfloat16 if model_config.dtype == "bfloat16" \
            else jnp.float32
        self.scale = 1.0 / math.sqrt(self.args.head_dim)
        self.layer_types = [
            self.args.layer_type(i) for i in range(self.args.num_layers)
        ]
        self.num_mamba_layers = self.layer_types.count("mamba")

    def embed(self, params: dict, input_ids: jnp.ndarray) -> jnp.ndarray:
        return embedding_lookup(input_ids, params["embed"]["w"])

    def init_states(self, num_slots: int):
        a = self.args
        return (jnp.zeros((self.num_mamba_layers, num_slots + 1,
                           a.d_conv - 1, a.d_inner), self.dtype),
                jnp.zeros((self.num_mamba_layers, num_slots + 1,
                           a.d_inner, a.d_state), jnp.float32))

    def _ffn(self, h, lp, li: int):
        a = self.args
        if not a.is_expert_layer(li):
            gate_up = linear(h, lp["gate_up"])
            g, u = jnp.split(gate_up, 2, axis=-1)
            return linear(jax.nn.silu(g) * u, lp["down"])
        # sparse MoE (reference: jamba.py JambaMoE): softmax over ALL
        # experts FIRST, then top-k of the probabilities WITHOUT
        # renormalizing (unlike Mixtral's norm_topk_prob)
        logits = linear(h, lp["router"])  # [T, E]
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        weights, sel = jax.lax.top_k(probs, a.num_experts_per_tok)
        gu = lp["experts_gate_up"]  # [E, H, 2I]
        dn = lp["experts_down"]  # [E, I, H]
        out = jnp.zeros_like(h, dtype=jnp.float32)
        for k in range(a.num_experts_per_tok):
            e = sel[:, k]
            gup = jnp.einsum("th,thi->ti", h, gu[e])
            g, u = jnp.split(gup, 2, axis=-1)
            o = jnp.einsum("ti,tih->th", (jax.nn.silu(g) * u).astype(
                h.dtype), dn[e])
            out = out + o.astype(jnp.float32) * weights[:, k:k + 1]
        return out.astype(h.dtype)

    def forward(self, params: dict, input_ids: jnp.ndarray, kv_caches,
                metadata: AttentionMetadata, lora=None,
                embed_override=None):
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
        chunk = _pick_chunk(T, 64)

        x = self.embed(params, input_ids)
        mi = ai = 0
        for li, ltype in enumerate(self.layer_types):
            lp = jax.tree.map(jnp.asarray, params["layers"][li])
            h = rms_norm(x, lp["input_ln"], a.rms_eps)
            if ltype == "mamba":
                out, new_conv, new_ssm = mamba1_mixer(
                    h, lp, conv_states[mi], ssm_states[mi], seg,
                    seg_start, pad_mask, d_inner=a.d_inner,
                    d_state=a.d_state, dt_rank=a.dt_rank,
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
                # Jamba attention uses NO positional embedding
                attn_kv = write_kv_cache(attn_kv, k, v,
                                         metadata.slot_mapping, layer=ai)
                o = attention(q, attn_kv, metadata, self.scale, layer=ai)
                out = linear(o.reshape(T, nq * d), lp["o"])
                ai += 1
            x = x + out

            h = rms_norm(x, lp["pre_ff_ln"], a.rms_eps)
            x = x + self._ffn(h, lp, li)

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
        conv_bytes = (a.d_conv - 1) * a.d_inner * el
        ssm_bytes = a.d_inner * a.d_state * 4
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
        experts: dict[int, dict] = {}
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
                # dense feed-forward
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
                # MoE feed-forward
                elif sub == "feed_forward.router.weight":
                    lp["router"] = {"w": w.T.astype(npd)}
                elif parts[3] == "feed_forward" and parts[4] == "experts":
                    ei = int(parts[5])
                    experts.setdefault(li, {}).setdefault(
                        ei, {})[parts[6]] = w.T.astype(npd)
                # mamba-1 mixer
                elif sub == "mamba.in_proj.weight":
                    lp["in_proj"] = {"w": w.T.astype(npd)}
                elif sub == "mamba.conv1d.weight":
                    lp["conv_w"] = w[:, 0, :].astype(npd)
                elif sub == "mamba.conv1d.bias":
                    lp["conv_b"] = w.astype(npd)
                elif sub == "mamba.x_proj.weight":
                    lp["x_proj"] = {"w": w.T.astype(npd)}
                elif sub == "mamba.dt_proj.weight":
                    lp.setdefault("dt_proj", {})["w"] = \
                        w.T.astype(np.float32)
                elif sub == "mamba.dt_proj.bias":
                    lp.setdefault("dt_proj", {})["b"] = \
                        w.astype(np.float32)
                elif sub == "mamba.dt_layernorm.weight":
                    lp["dt_ln"] = w.astype(np.float32)
                elif sub == "mamba.b_layernorm.weight":
                    lp["b_ln"] = w.astype(np.float32)
                elif sub == "mamba.c_layernorm.weight":
                    lp["c_ln"] = w.astype(np.float32)
                elif sub == "mamba.A_log":
                    lp["A_log"] = w.astype(np.float32)
                elif sub == "mamba.D":
                    lp["D"] = w.astype(np.float32)
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
        for li, emap in experts.items():
            E = len(emap)
            gus, dns = [], []
            for e in range(E):
                ew = emap[e]
                gus.append(np.concatenate([ew["gate_proj"],
                                           ew["up_proj"]], axis=1))
                dns.append(ew["down_proj"])
            layers[li]["experts_gate_up"] = np.stack(gus).astype(npd)
            layers[li]["experts_down"] = np.stack(dns).astype(npd)
        if a.tie_embeddings and "lm_head" not in params:
            params["lm_head"] = {"w": params["embed"]["w"].T.copy()}
        return params


class JambaForSequenceClassification(JambaForCausalLM):
    """Jamba + classification head (reference: models/jamba.py:564
    JambaForSequenceClassification): ``score`` linear (optional bias,
    config.score_bias) over the LAST token's hidden state, served via
    the pooling path (task="classify"/"score")."""

    def __init__(self, model_config: ModelConfig,
                 args: Optional[JambaArgs] = None) -> None:
        super().__init__(model_config, args)
        hf = model_config.resolve_hf_config()
        self.num_labels = int(getattr(hf, "num_labels", 2))
        self.score_bias = bool(getattr(hf, "score_bias", False))

    def classify(self, params, hidden, metadata):
        from vllm_tpu.ops.linear import linear

        qsl = metadata.query_start_loc
        last = hidden[jnp.maximum(qsl[1:] - 1, 0)]
        return linear(last, params["score"])

    def load_weights(self, weights_iter):
        extra = {}

        def tap(it):
            for name, w in it:
                if name.startswith("score."):
                    extra[name] = np.asarray(w)
                else:
                    yield name, w

        params = super().load_weights(tap(weights_iter))
        score = {"w": extra.get(
            "score.weight",
            np.zeros((self.num_labels, self.args.hidden_size),
                     np.float32)).T.astype(np.float32)}
        if self.score_bias:
            score["b"] = extra.get(
                "score.bias",
                np.zeros(self.num_labels, np.float32)).astype(np.float32)
        params["score"] = score
        return params
