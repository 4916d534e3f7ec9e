"""Gemma family (reference parity: vllm/model_executor/models/gemma.py,
gemma2.py, gemma3.py).

Gemma quirks handled:
- RMSNorm computes x * (1 + w); folded by adding 1 to norm weights at load
  so the shared rms_norm op applies unchanged.
- embeddings scaled by sqrt(hidden); lm_head always tied.
- Gemma-2: 4 norms per layer (pre/post attn + pre/post ffw), attention and
  final-logit soft caps, alternating sliding-window/full layers (handled
  with the layer_pattern group scan), query_pre_attn_scalar.
- Gemma-3: qk-norm, 5-local:1-global layer pattern with different RoPE
  bases for local vs global layers.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from vllm_tpu.models.llama import (LlamaForCausalLM, ModelArgs, _np_dtype,
                                   dataclass_replace)
from vllm_tpu.ops.attention import AttentionMetadata, attention, \
    write_kv_cache
from vllm_tpu.ops.layernorm import rms_norm
from vllm_tpu.ops.linear import linear
from vllm_tpu.ops.rotary import RopeConfig, apply_rope, compute_inv_freq
from vllm_tpu.ops.activation import GATED_ACTIVATIONS

_NORM_KEYS = ("input_ln", "post_ln", "pre_ffw_ln", "post_ffw_ln",
              "q_norm", "k_norm")


class GemmaForCausalLM(LlamaForCausalLM):

    def parse_args(self, hf) -> ModelArgs:
        args = ModelArgs.from_hf_config(hf)
        act = getattr(hf, "hidden_activation", None) or \
            getattr(hf, "hidden_act", "gelu_pytorch_tanh")
        return dataclass_replace(
            args,
            act=act,
            tie_embeddings=True,
            embedding_multiplier=math.sqrt(hf.hidden_size),
        )

    def load_weights(self, weights_iter):
        params = super().load_weights(weights_iter)

        # Gemma norm convention: y = x * (1 + w).
        def fold(tree):
            for key, v in tree.items():
                if isinstance(v, dict):
                    fold(v)
                elif key in _NORM_KEYS:
                    tree[key] = v + np.asarray(1.0, v.dtype)
        fold(params["layers"])
        params["final_ln"] = params["final_ln"] + np.asarray(
            1.0, params["final_ln"].dtype)
        return params


class Gemma2ForCausalLM(GemmaForCausalLM):

    def parse_args(self, hf) -> ModelArgs:
        args = super().parse_args(hf)
        qpas = getattr(hf, "query_pre_attn_scalar", None)
        return dataclass_replace(
            args,
            attn_soft_cap=getattr(hf, "attn_logit_softcapping", 50.0),
            logit_soft_cap=getattr(hf, "final_logit_softcapping", 30.0),
            attn_scale=(qpas**-0.5) if qpas else None,
            sliding_window=getattr(hf, "sliding_window", 4096),
        )

    @property
    def layer_pattern(self) -> list[dict]:
        # even layers sliding-window, odd layers global
        if self.args.num_layers % 2:
            return [{}]
        return [{"sliding_window": self.args.sliding_window},
                {"sliding_window": None}]

    def _alloc_layer_stack(self, np_dtype) -> dict:
        layers = super()._alloc_layer_stack(np_dtype)
        a = self.args
        layers["pre_ffw_ln"] = np.empty((a.num_layers, a.hidden_size),
                                        np_dtype)
        layers["post_ffw_ln"] = np.empty((a.num_layers, a.hidden_size),
                                         np_dtype)
        return layers

    def _hf_layer_map(self):
        m = super()._hf_layer_map()
        m["pre_feedforward_layernorm.weight"] = ("pre_ffw_ln", "", False)
        m["post_feedforward_layernorm.weight"] = ("post_ffw_ln", "", False)
        return m

    def _decoder_layer(self, lp, x, kv, li, metadata,
                       sliding_window="default", inv_freq=None,
                       lora_ctx=None):
        from vllm_tpu.lora.ops import apply_lora

        args = self.args
        T = x.shape[0]
        nq, nk, d = args.num_heads, args.num_kv_heads, args.head_dim
        if sliding_window == "default":
            sliding_window = args.sliding_window
        if inv_freq is None:
            inv_freq = self.inv_freq

        h = rms_norm(x, lp["input_ln"][li], args.rms_eps)
        qkv = apply_lora(h, linear(h, lp["qkv"], layer=li), lora_ctx,
                         "qkv")
        q, k, v = jnp.split(qkv, [nq * d, (nq + nk) * d], axis=-1)
        q = q.reshape(T, nq, d)
        k = k.reshape(T, nk, d)
        v = v.reshape(T, nk, d)
        if args.qk_norm:
            q = rms_norm(q, lp["q_norm"][li], args.rms_eps)
            k = rms_norm(k, lp["k_norm"][li], args.rms_eps)
        q, k = apply_rope(q, k, metadata.positions, inv_freq,
                          args.rope.is_neox_style, self.rope_mscale)
        attn_out, kv = self._cached_attention(
            lp, li, q, k, v, kv, metadata,
            sliding_window=sliding_window,
            logits_soft_cap=args.attn_soft_cap)
        attn_flat = attn_out.reshape(T, nq * d)
        attn_out = apply_lora(attn_flat, linear(attn_flat, lp["o"],
                                                layer=li), lora_ctx, "o")
        # Gemma2: post-attention norm applies to the BRANCH output.
        x = x + rms_norm(attn_out, lp["post_ln"][li], args.rms_eps)

        h = rms_norm(x, lp["pre_ffw_ln"][li], args.rms_eps)
        gate_up = apply_lora(h, linear(h, lp["gate_up"], layer=li),
                             lora_ctx, "gate_up")
        act = GATED_ACTIVATIONS[args.act](gate_up)
        ffw = apply_lora(act, linear(act, lp["down"], layer=li),
                         lora_ctx, "down")
        x = x + rms_norm(ffw, lp["post_ffw_ln"][li], args.rms_eps)
        return x, kv


class Gemma3ForCausalLM(Gemma2ForCausalLM):

    def parse_args(self, hf) -> ModelArgs:
        args = super().parse_args(hf)
        args = dataclass_replace(
            args,
            qk_norm=True,
            attn_soft_cap=None,
            logit_soft_cap=getattr(hf, "final_logit_softcapping", None),
            sliding_window=getattr(hf, "sliding_window", 1024),
        )
        # layer kinds: explicit layer_types list wins; else layer i is
        # sliding unless (i+1) % sliding_window_pattern == 0 (HF
        # Gemma3Attention.is_sliding; default pattern 6 = 5 local + 1
        # global)
        lt = getattr(hf, "layer_types", None)
        if lt:
            self._is_global = [t == "full_attention" for t in lt]
        else:
            p = int(getattr(hf, "sliding_window_pattern", 6) or 6)
            self._is_global = [(i + 1) % p == 0
                               for i in range(hf.num_hidden_layers)]
        # local layers: rope_local_base_freq (default 10k); global layers:
        # rope_theta (1M) with rope_scaling.
        local_base = float(getattr(hf, "rope_local_base_freq", 10000.0))
        local_rope = RopeConfig(
            head_size=args.head_dim,
            rotary_dim=args.rope.rotary_dim,
            max_position=args.rope.max_position,
            base=local_base,
            scaling=None)
        self.local_inv_freq, _ = compute_inv_freq(local_rope)
        return args

    @property
    def layer_pattern(self) -> list[dict]:
        local = {"sliding_window": self.args.sliding_window,
                 "inv_freq": self.local_inv_freq}
        glob = {"sliding_window": None}
        flags = list(self._is_global)
        # compress to the smallest repeating cycle so lax.scan still
        # folds the layer stack (a 62-layer unrolled body would explode
        # compile time)
        L = len(flags)
        for p in range(1, L + 1):
            if L % p == 0 and flags == flags[:p] * (L // p):
                flags = flags[:p]
                break
        return [dict(glob) if g else dict(local) for g in flags]

    def _alloc_layer_stack(self, np_dtype) -> dict:
        layers = super()._alloc_layer_stack(np_dtype)
        a = self.args
        layers["q_norm"] = np.empty((a.num_layers, a.head_dim), np_dtype)
        layers["k_norm"] = np.empty((a.num_layers, a.head_dim), np_dtype)
        return layers
