"""Zamba2 — Zyphra's hybrid SSM model with SHARED transformer blocks
(reference behavior parity: vllm/model_executor/models/zamba2.py).

Every layer runs a Mamba2 mixer; "hybrid" layers additionally run one
of ``num_mem_blocks`` weight-tied transformer blocks (cycled over the
hybrid layers) whose input is concat([x, embedding_output]) in 2H.
Because the block weights are shared, each USE gets its own small
LoRA-style adapters on q/k/v (optional) and gate_up (always), and its
own KV cache layer (zamba2.py:166 — "KV cache is unique for every
attention layer"). The block output passes through a per-layer linear
and is added to the Mamba path input:

  t  = linear_li(block_b(rmsnorm_2H(cat(x, orig)), use=u))
  x += mamba(rmsnorm(x + t))              # hybrid layer
  x += mamba(rmsnorm(x))                  # plain mamba layer

Attention is MHA/GQA over head_dim = attention_hidden_size/num_heads
with the Zamba scale (head_dim/2)^-0.5 (zamba2.py:138) and optional
rope (``use_mem_rope``). MLP is gelu-gated. The mixer's gated RMSNorm
uses the HF-hardcoded eps 1e-5 (modeling_zamba2.py:558), not
rms_norm_eps."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vllm_tpu.config import ModelConfig
from vllm_tpu.core.kv_cache_interface import (FullAttentionSpec,
                                              KVCacheSpec, MambaSpec)
from vllm_tpu.models.bamba import BambaArgs, BambaForCausalLM
from vllm_tpu.models.mamba2 import _pick_chunk, mamba2_mixer, packed_segments
from vllm_tpu.ops.activation import gelu_and_mul
from vllm_tpu.ops.attention import attention, write_kv_cache
from vllm_tpu.ops.layernorm import rms_norm
from vllm_tpu.ops.linear import linear
from vllm_tpu.ops.rotary import RopeConfig, apply_rope

_MIXER_EPS = 1e-5  # Zamba2RMSNormGated hardcodes eps (not rms_norm_eps)


def _adapter(h, ad, key):
    """LoRA-style per-use adapter: h @ A^T @ B^T (rank-r)."""
    A = ad.get(key + "_A")
    if A is None:
        return 0.0
    return linear(linear(h, {"w": A}), {"w": ad[key + "_B"]})


class Zamba2ForCausalLM(BambaForCausalLM):

    def __init__(self, model_config: ModelConfig) -> None:
        hf = model_config.resolve_hf_config()
        L = hf.num_hidden_layers
        ltypes = list(hf.layers_block_type)
        head_dim = hf.attention_head_dim
        args = BambaArgs(
            vocab_size=hf.vocab_size,
            hidden_size=hf.hidden_size,
            num_layers=L,
            attn_layers=tuple(i for i, t in enumerate(ltypes)
                              if t == "hybrid"),
            num_heads=hf.num_attention_heads,
            num_kv_heads=getattr(hf, "num_key_value_heads", None)
            or hf.num_attention_heads,
            head_dim=head_dim,
            rope=RopeConfig.from_hf_config(hf, head_dim),
            mamba_heads=hf.n_mamba_heads,
            mamba_head_dim=hf.mamba_headdim,
            mamba_groups=getattr(hf, "mamba_ngroups", 1),
            state_size=hf.mamba_d_state,
            conv_kernel=getattr(hf, "mamba_d_conv", 4),
            mamba_inter=int(getattr(hf, "mamba_expand", 2) *
                            hf.hidden_size),
            chunk_size=int(getattr(hf, "chunk_size", 256)),
            intermediate_size=hf.intermediate_size,
            act=getattr(hf, "hidden_act", "gelu"),
            rms_eps=float(getattr(hf, "rms_norm_eps", 1e-5)),
            tie_embeddings=bool(getattr(hf, "tie_word_embeddings", True)),
        )
        super().__init__(model_config, args=args)
        self.layer_types = ltypes
        # every layer owns a mamba state; hybrids ALSO own a KV layer
        self.num_mamba_layers = L
        self.num_mem_blocks = int(getattr(hf, "num_mem_blocks", 2))
        self.num_hybrid = len(args.attn_layers)
        self.attn_hidden = int(getattr(hf, "attention_hidden_size",
                                       2 * hf.hidden_size))
        self.use_mem_rope = bool(getattr(hf, "use_mem_rope", False))
        self.scale = (head_dim / 2) ** -0.5  # zamba2.py:138

    # ------------------------------------------------------------- forward

    def forward(self, params, input_ids, kv_caches, metadata, lora=None,
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
        chunk = _pick_chunk(T, a.chunk_size)
        nq, nk, d = a.num_heads, a.num_kv_heads, a.head_dim

        x = self.embed(params, input_ids)
        orig = x
        ai = 0
        for li, ltype in enumerate(self.layer_types):
            lp = jax.tree.map(jnp.asarray, params["layers"][li])
            if ltype == "hybrid":
                u = ai
                bp = jax.tree.map(jnp.asarray,
                                  params["blocks"][u % self.num_mem_blocks])
                ad = jax.tree.map(jnp.asarray, params["adapters"][u])
                # shared transformer on concat([x, embeddings]) in 2H
                h = rms_norm(jnp.concatenate([x, orig], axis=-1),
                             bp["input_ln"], a.rms_eps)
                q = linear(h, bp["q"]) + _adapter(h, ad, "q")
                k = linear(h, bp["k"]) + _adapter(h, ad, "k")
                v = linear(h, bp["v"]) + _adapter(h, ad, "v")
                q = q.reshape(T, nq, d)
                k = k.reshape(T, nk, d)
                v = v.reshape(T, nk, d)
                if self.use_mem_rope:
                    q, k = apply_rope(q, k, metadata.positions,
                                      self.inv_freq, a.rope.is_neox_style,
                                      self.rope_mscale)
                attn_kv = write_kv_cache(attn_kv, k, v,
                                         metadata.slot_mapping, layer=ai)
                o = attention(q, attn_kv, metadata, self.scale, layer=ai)
                t = linear(o.reshape(T, nq * d), bp["o"])
                h2 = rms_norm(t, bp["pre_ff_ln"], a.rms_eps)
                gu = linear(h2, bp["gate_up"]) + _adapter(h2, ad, "gu")
                t = linear(gelu_and_mul(gu), bp["down"])
                t = linear(t, lp["linear"])  # per-layer projection
                h3 = rms_norm(x + t, lp["input_ln"], a.rms_eps)
                ai += 1
            else:
                h3 = rms_norm(x, lp["input_ln"], a.rms_eps)
            out, new_conv, new_ssm = mamba2_mixer(
                h3, lp, conv_states[li], ssm_states[li], seg, seg_start,
                pad_mask, num_heads=a.mamba_heads,
                head_dim=a.mamba_head_dim, n_groups=a.mamba_groups,
                state_size=a.state_size, intermediate_size=a.mamba_inter,
                rms_eps=_MIXER_EPS, chunk=chunk)
            conv_states = conv_states.at[li].set(new_conv)
            ssm_states = ssm_states.at[li].set(new_ssm)
            x = x + out

        x = rms_norm(x, params["final_ln"], a.rms_eps)
        new_caches = [None] * len(kv_caches)
        new_caches[ssm_gi] = (conv_states, ssm_states)
        if attn_gi is not None:
            new_caches[attn_gi] = attn_kv
        return x, new_caches

    # ------------------------------------------------------------ kv specs

    def get_kv_cache_specs(self, block_size: int,
                           cache_dtype: str) -> dict[str, KVCacheSpec]:
        a = self.args
        el = 2 if self.dtype == jnp.bfloat16 else 4
        conv_bytes = (a.conv_kernel - 1) * a.conv_dim * el
        ssm_bytes = a.mamba_heads * a.mamba_head_dim * a.state_size * 4
        specs: dict[str, KVCacheSpec] = {}
        for i, ltype in enumerate(self.layer_types):
            specs[f"layers.{i}.mamba"] = MambaSpec(
                block_size=block_size,
                state_size_bytes=conv_bytes + ssm_bytes)
            if ltype == "hybrid":
                specs[f"layers.{i}.attn"] = FullAttentionSpec(
                    block_size=block_size, num_kv_heads=a.num_kv_heads,
                    head_size=a.head_dim, dtype=cache_dtype)
        return specs

    # ------------------------------------------------------------- weights

    def load_weights(self, weights_iter) -> dict:
        a = self.args
        npd = np.float32 if self.dtype == jnp.float32 else np.dtype(
            "bfloat16")
        layers: list[dict] = [{} for _ in range(a.num_layers)]
        blocks: list[dict] = [{} for _ in range(self.num_mem_blocks)]
        adapters: list[dict] = [{} for _ in range(self.num_hybrid)]
        params: dict = {"layers": layers, "blocks": blocks,
                        "adapters": adapters}
        # layer index -> hybrid use index (for shared_transformer homing)
        use_of = {li: u for u, li in enumerate(a.attn_layers)}

        def mamba_key(sub: str, w, lp: dict) -> bool:
            if sub == "in_proj.weight":
                lp["in_proj"] = {"w": w.T.astype(npd)}
            elif sub == "conv1d.weight":
                lp["conv_w"] = w[:, 0, :].astype(npd)
            elif sub == "conv1d.bias":
                lp["conv_b"] = w.astype(npd)
            elif sub == "dt_bias":
                lp["dt_bias"] = w.astype(np.float32)
            elif sub == "A_log":
                lp["A_log"] = w.astype(np.float32)
            elif sub == "D":
                lp["D"] = w.astype(np.float32)
            elif sub == "norm.weight":
                lp["mixer_norm"] = w.astype(npd)
            elif sub == "out_proj.weight":
                lp["out_proj"] = {"w": w.T.astype(npd)}
            else:
                return False
            return True

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
                if sub in ("input_layernorm.weight",
                           "mamba_decoder.input_layernorm.weight"):
                    lp["input_ln"] = w.astype(npd)
                elif sub == "linear.weight":
                    lp["linear"] = {"w": w.T.astype(npd)}
                elif sub.startswith("mamba."):
                    mamba_key(sub[len("mamba."):], w, lp)
                elif sub.startswith("mamba_decoder.mamba."):
                    mamba_key(sub[len("mamba_decoder.mamba."):], w, lp)
                elif sub.startswith("shared_transformer."):
                    st = sub[len("shared_transformer."):]
                    bp = blocks[use_of[li] % self.num_mem_blocks]
                    if st == "input_layernorm.weight":
                        bp["input_ln"] = w.astype(npd)
                    elif st == "pre_ff_layernorm.weight":
                        bp["pre_ff_ln"] = w.astype(npd)
                    elif st in ("self_attn.q_proj.weight",
                                "self_attn.k_proj.weight",
                                "self_attn.v_proj.weight"):
                        bp[st.split(".")[1][0]] = {"w": w.T.astype(npd)}
                    elif st == "self_attn.o_proj.weight":
                        bp["o"] = {"w": w.T.astype(npd)}
                    elif st == "feed_forward.gate_up_proj.weight":
                        bp["gate_up"] = {"w": w.T.astype(npd)}
                    elif st == "feed_forward.down_proj.weight":
                        bp["down"] = {"w": w.T.astype(npd)}
                    elif "adapter_list." in st:
                        # {q,k,v,gu}_A: Sequential .0 ; _B: .1  (names:
                        # self_attn.linear_q_adapter_list.U.{0,1}.weight,
                        # feed_forward.gate_up_proj_adapter_list.U....)
                        ps = st.split(".")[1:]  # drop self_attn/ffw
                        u = int(ps[1])
                        which = ("gu" if ps[0].startswith("gate_up")
                                 else ps[0].split("_")[1][0])
                        ab = "_A" if ps[2] == "0" else "_B"
                        adapters[u][which + ab] = w.T.astype(npd)
        if a.tie_embeddings and "lm_head" not in params:
            params["lm_head"] = {"w": params["embed"]["w"].T.copy()}
        return params
