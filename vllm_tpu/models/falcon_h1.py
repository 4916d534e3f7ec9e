"""FalconH1 — TII's parallel-hybrid attention+Mamba2 LM (reference
behavior parity: vllm/model_executor/models/falcon_h1.py).

Every layer runs the SAME normalized input through BOTH a GQA attention
branch and a Mamba2 SSM branch (falcon_h1.py:307 "in parallel through
both the self-attention branch and the SSM") and sums them into the
residual. The model family's muP multipliers — embedding, lm_head,
attention in/out, key, ssm in/out, per-block zxbcdt (ssm_multipliers),
mlp gate/down — are ALL static scalars, so they fold into the weights
at load time (falcon_h1.py:119 _init_mup_vector becomes a row scaling
of in_proj) and the forward pass stays multiplier-free.
"""

from __future__ import annotations

from typing import Optional

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
from vllm_tpu.ops.rotary import RopeConfig, apply_rope


class FalconH1ForCausalLM(BambaForCausalLM):

    def __init__(self, model_config: ModelConfig) -> None:
        hf = model_config.resolve_hf_config()
        head_dim = getattr(hf, "head_dim", None) or \
            hf.hidden_size // hf.num_attention_heads
        d_ssm = int(getattr(hf, "mamba_d_ssm", None)
                    or getattr(hf, "mamba_expand", 2) * hf.hidden_size)
        args = BambaArgs(
            vocab_size=hf.vocab_size,
            hidden_size=hf.hidden_size,
            num_layers=hf.num_hidden_layers,
            attn_layers=tuple(range(hf.num_hidden_layers)),
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
            mamba_inter=d_ssm,
            chunk_size=int(getattr(hf, "mamba_chunk_size", 256)),
            intermediate_size=hf.intermediate_size,
            act=getattr(hf, "hidden_act", "silu"),
            rms_eps=float(getattr(hf, "rms_norm_eps", 1e-5)),
            tie_embeddings=bool(getattr(hf, "tie_word_embeddings",
                                        False)),
        )
        super().__init__(model_config, args=args)
        self.mamba_rms_norm = bool(getattr(hf, "mamba_rms_norm", False))
        # both branches on every layer
        self.layer_types = ["parallel"] * args.num_layers
        self.num_attn_layers = args.num_layers
        self.num_mamba_layers = args.num_layers
        self._hf = hf

    # ------------------------------------------------------------- forward

    def forward(self, params, input_ids, kv_caches, metadata, lora=None,
                embed_override=None):
        a = self.args
        T = input_ids.shape[0]
        ssm_gi = next(i for i, c in enumerate(kv_caches)
                      if isinstance(c, tuple))
        attn_gi = next(i for i, c in enumerate(kv_caches)
                       if not isinstance(c, tuple))
        conv_states, ssm_states = kv_caches[ssm_gi]
        attn_kv = kv_caches[attn_gi]
        num_slots = conv_states.shape[1] - 1
        seg, seg_start, pad_mask = packed_segments(metadata, T, num_slots)
        chunk = _pick_chunk(T, a.chunk_size)

        x = self.embed(params, input_ids)
        if embed_override is not None:
            idx, vecs = embed_override
            x = x.at[idx].set(vecs.astype(x.dtype))
        for li in range(a.num_layers):
            lp = jax.tree.map(jnp.asarray, params["layers"][li])
            h = rms_norm(x, lp["input_ln"], a.rms_eps)

            # SSM branch
            ssm_out, new_conv, new_ssm = mamba2_mixer(
                h, lp, conv_states[li], ssm_states[li], seg, seg_start,
                pad_mask, num_heads=a.mamba_heads,
                head_dim=a.mamba_head_dim, n_groups=a.mamba_groups,
                state_size=a.state_size, intermediate_size=a.mamba_inter,
                rms_eps=a.rms_eps, chunk=chunk)
            conv_states = conv_states.at[li].set(new_conv)
            ssm_states = ssm_states.at[li].set(new_ssm)

            # attention branch (same h — parallel formulation)
            nq, nk, d = a.num_heads, a.num_kv_heads, a.head_dim
            qkv = linear(h, lp["qkv"])
            q, k, v = jnp.split(qkv, [nq * d, (nq + nk) * d], axis=-1)
            q = q.reshape(T, nq, d)
            k = k.reshape(T, nk, d)
            v = v.reshape(T, nk, d)
            q, k = apply_rope(q, k, metadata.positions, self.inv_freq,
                              a.rope.is_neox_style, self.rope_mscale)
            attn_kv = write_kv_cache(attn_kv, k, v,
                                     metadata.slot_mapping, layer=li)
            o = attention(q, attn_kv, metadata, self.scale, layer=li)
            attn_out = linear(o.reshape(T, nq * d), lp["o"])

            x = x + attn_out + ssm_out

            h = rms_norm(x, lp["pre_ff_ln"], a.rms_eps)
            gate_up = linear(h, lp["gate_up"])
            x = x + linear(GATED_ACTIVATIONS[a.act](gate_up), lp["down"])

        x = rms_norm(x, params["final_ln"], a.rms_eps)
        new_caches = [None] * len(kv_caches)
        new_caches[ssm_gi] = (conv_states, ssm_states)
        new_caches[attn_gi] = attn_kv
        return x, new_caches

    def get_kv_cache_specs(self, block_size: int,
                           cache_dtype: str) -> dict[str, KVCacheSpec]:
        a = self.args
        el = 2 if self.dtype == jnp.bfloat16 else 4
        conv_bytes = (a.conv_kernel - 1) * a.conv_dim * el
        ssm_bytes = a.mamba_heads * a.mamba_head_dim * a.state_size * 4
        specs: dict[str, KVCacheSpec] = {}
        for i in range(a.num_layers):
            specs[f"layers.{i}.attn"] = FullAttentionSpec(
                block_size=block_size, num_kv_heads=a.num_kv_heads,
                head_size=a.head_dim, dtype=cache_dtype)
            specs[f"layers.{i}.mamba"] = MambaSpec(
                block_size=block_size,
                state_size_bytes=conv_bytes + ssm_bytes)
        return specs

    # ------------------------------------------------------------- weights

    def load_weights(self, weights_iter) -> dict:
        hf = self._hf
        a = self.args
        assert not a.tie_embeddings, \
            "FalconH1 muP folding assumes untied embeddings"
        d_ssm = a.mamba_inter
        gs = a.mamba_groups * a.state_size
        m = list(getattr(hf, "ssm_multipliers", None) or [1.0] * 5)
        mlp_m = list(getattr(hf, "mlp_multipliers", None) or [1.0, 1.0])
        emb_m = float(getattr(hf, "embedding_multiplier", 1.0))
        head_m = float(getattr(hf, "lm_head_multiplier", 1.0))
        attn_in = float(getattr(hf, "attention_in_multiplier", 1.0))
        attn_out = float(getattr(hf, "attention_out_multiplier", 1.0))
        key_m = float(getattr(hf, "key_multiplier", 1.0))
        ssm_in = float(getattr(hf, "ssm_in_multiplier", 1.0))
        ssm_out = float(getattr(hf, "ssm_out_multiplier", 1.0))
        # zxbcdt block row-scales (reference _init_mup_vector):
        # z[0:d] x[d:2d] B C dt
        mup = np.concatenate([
            np.full(d_ssm, m[0]), np.full(d_ssm, m[1]),
            np.full(gs, m[2]), np.full(gs, m[3]),
            np.full(a.mamba_heads, m[4]),
        ]).astype(np.float64)
        inter = a.intermediate_size

        def fold(it):
            for name, w in it:
                w = np.asarray(w)
                if name == "model.embed_tokens.weight":
                    w = w * emb_m
                elif name == "lm_head.weight":
                    w = w * head_m
                elif name.endswith("self_attn.q_proj.weight") or \
                        name.endswith("self_attn.v_proj.weight"):
                    w = w * attn_in
                elif name.endswith("self_attn.k_proj.weight"):
                    w = w * (attn_in * key_m)
                elif name.endswith("self_attn.o_proj.weight"):
                    w = w * attn_out
                elif name.endswith("mamba.in_proj.weight"):
                    # input-side ssm_in scales the whole matrix; the
                    # output-side mup vector scales rows
                    w = w * ssm_in * mup[:, None]
                elif name.endswith("mamba.in_proj.bias"):
                    w = w * mup
                elif name.endswith("mamba.out_proj.weight"):
                    w = w * ssm_out
                elif name.endswith("mamba.out_proj.bias"):
                    w = w * ssm_out
                elif name.endswith("feed_forward.gate_proj.weight"):
                    w = w * mlp_m[0]
                elif name.endswith("feed_forward.down_proj.weight"):
                    w = w * mlp_m[1]
                elif name.endswith("feed_forward.down_proj.bias"):
                    w = w * mlp_m[1]
                yield name, w

        return super().load_weights(fold(weights_iter))
