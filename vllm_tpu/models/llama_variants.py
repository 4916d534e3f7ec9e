"""Llama-skeleton variants: OLMo-2, Granite, GLM-4, Nemotron
(reference parity: vllm/model_executor/models/{olmo2,granite,glm4,
nemotron}.py; each is a small reshuffle of the Llama block)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vllm_tpu.models.llama import (LlamaForCausalLM, ModelArgs, _np_dtype,
                                   dataclass_replace)
from vllm_tpu.models.neox import GPTNeoXForCausalLM, NeoxArgs
from vllm_tpu.ops.activation import GATED_ACTIVATIONS
from vllm_tpu.ops.attention import KVSlabs, attention, write_kv_cache
from vllm_tpu.ops.layernorm import rms_norm
from vllm_tpu.ops.linear import linear
from vllm_tpu.ops.rotary import RopeConfig, apply_rope


class Olmo2ForCausalLM(LlamaForCausalLM):
    """OLMo-2 (reference: models/olmo2.py): NO pre-norms — norms apply to
    the attention/MLP BRANCH OUTPUTS; full-width qk-norm before head
    split."""

    def parse_args(self, hf) -> ModelArgs:
        return ModelArgs.from_hf_config(hf)

    def _hf_layer_map(self):
        m = super()._hf_layer_map()
        del m["input_layernorm.weight"]
        # olmo2 q/k norms are full projection width
        m["self_attn.q_norm.weight"] = ("q_norm", "", False)
        m["self_attn.k_norm.weight"] = ("k_norm", "", False)
        m["post_feedforward_layernorm.weight"] = ("post_ffw_ln", "",
                                                  False)
        return m

    def _alloc_layer_stack(self, np_dtype) -> dict:
        a = self.args
        layers = super()._alloc_layer_stack(np_dtype)
        del layers["input_ln"]
        L = a.num_layers
        layers["q_norm"] = np.empty((L, a.num_heads * a.head_dim),
                                    np_dtype)
        layers["k_norm"] = np.empty((L, a.num_kv_heads * a.head_dim),
                                    np_dtype)
        layers["post_ffw_ln"] = np.empty((L, a.hidden_size), np_dtype)
        return layers

    def _decoder_layer(self, lp, x, kv, li, metadata,
                       sliding_window="default", inv_freq=None,
                       lora_ctx=None):
        args = self.args
        T = x.shape[0]
        nq, nk, d = args.num_heads, args.num_kv_heads, args.head_dim
        if inv_freq is None:
            inv_freq = self.inv_freq

        qkv = linear(x, lp["qkv"], layer=li)
        q, k, v = jnp.split(qkv, [nq * d, (nq + nk) * d], axis=-1)
        q = rms_norm(q, lp["q_norm"][li], args.rms_eps).reshape(T, nq, d)
        k = rms_norm(k, lp["k_norm"][li], args.rms_eps).reshape(T, nk, d)
        v = v.reshape(T, nk, d)
        q, k = apply_rope(q, k, metadata.positions, inv_freq,
                          args.rope.is_neox_style, self.rope_mscale)
        attn, kv = self._cached_attention(lp, li, q, k, v, kv,
                                          metadata)
        attn = linear(attn.reshape(T, nq * d), lp["o"], layer=li)
        x = x + rms_norm(attn, lp["post_ln"][li], args.rms_eps)

        gate_up = linear(x, lp["gate_up"], layer=li)
        ffw = linear(GATED_ACTIVATIONS[args.act](gate_up), lp["down"],
                     layer=li)
        x = x + rms_norm(ffw, lp["post_ffw_ln"][li], args.rms_eps)
        return x, kv


class GraniteForCausalLM(LlamaForCausalLM):
    """IBM Granite (reference: models/granite.py): Llama with embedding/
    residual/attention multipliers and logits scaling (divisor)."""

    def parse_args(self, hf) -> ModelArgs:
        args = ModelArgs.from_hf_config(hf)
        return dataclass_replace(
            args,
            embedding_multiplier=float(
                getattr(hf, "embedding_multiplier", 1.0)),
            attn_scale=float(getattr(hf, "attention_multiplier",
                                     args.head_dim ** -0.5)),
            residual_multiplier=float(
                getattr(hf, "residual_multiplier", 1.0)),
            logits_scale=1.0 / float(getattr(hf, "logits_scaling", 1.0)),
        )


class Exaone4ForCausalLM(LlamaForCausalLM):
    """EXAONE 4.0 (HF models/exaone4): post-norm residual branches (no
    input norms — like OLMo-2), per-head QK-norm before rope, and a
    hybrid attention schedule where sliding layers use rope + window
    and GLOBAL layers use NoPE (no rotary) whenever a sliding window is
    configured."""

    def parse_args(self, hf) -> ModelArgs:
        args = ModelArgs.from_hf_config(hf)
        self._sw = getattr(hf, "sliding_window", None)
        lt = list(getattr(hf, "layer_types", None) or [])
        if not lt:
            lt = ["full_attention"] * hf.num_hidden_layers
        self._layer_types = lt
        return dataclass_replace(args, qk_norm=True)

    @property
    def layer_pattern(self) -> list[dict]:
        cfgs = []
        for t in self._layer_types:
            sliding = t == "sliding_attention"
            cfgs.append({
                "sliding_window": self._sw if sliding else None,
                "rope_on": self._sw is None or sliding,
            })
        for p in range(1, len(cfgs) + 1):
            if len(cfgs) % p == 0 and all(
                    cfgs[i] == cfgs[i % p] for i in range(len(cfgs))):
                return cfgs[:p]
        return cfgs

    def _hf_layer_map(self):
        m = super()._hf_layer_map()
        del m["input_layernorm.weight"]
        m["self_attn.q_norm.weight"] = ("q_norm", "", False)
        m["self_attn.k_norm.weight"] = ("k_norm", "", False)
        m["post_feedforward_layernorm.weight"] = ("post_ffw_ln", "",
                                                  False)
        return m

    def _alloc_layer_stack(self, np_dtype) -> dict:
        layers = super()._alloc_layer_stack(np_dtype)
        del layers["input_ln"]
        a = self.args
        layers["post_ffw_ln"] = np.empty((a.num_layers, a.hidden_size),
                                         np_dtype)
        return layers

    def _decoder_layer(self, lp, x, kv, li, metadata,
                       sliding_window="default", inv_freq=None,
                       lora_ctx=None, rope_on: bool = True):
        args = self.args
        T = x.shape[0]
        nq, nk, d = args.num_heads, args.num_kv_heads, args.head_dim

        qkv = linear(x, lp["qkv"], layer=li)
        q, k, v = jnp.split(qkv, [nq * d, (nq + nk) * d], axis=-1)
        q = rms_norm(q.reshape(T, nq, d), lp["q_norm"][li], args.rms_eps)
        k = rms_norm(k.reshape(T, nk, d), lp["k_norm"][li], args.rms_eps)
        v = v.reshape(T, nk, d)
        if rope_on:
            q, k = self._apply_rope_qk(q, k, metadata, inv_freq)
        attn, kv = self._cached_attention(lp, li, q, k, v, kv, metadata,
                                          sliding_window=sliding_window)
        attn = linear(attn.reshape(T, nq * d), lp["o"], layer=li)
        x = x + rms_norm(attn, lp["post_ln"][li], args.rms_eps)

        ffw = self._mlp(lp, x, li, lora_ctx)
        x = x + rms_norm(ffw, lp["post_ffw_ln"][li], args.rms_eps)
        return x, kv


class MiniCPMForCausalLM(LlamaForCausalLM):
    """MiniCPM 1/2 dense (reference: models/minicpm.py): Llama block with
    muP-style scalings — embeddings x scale_emb, each residual branch x
    scale_depth/sqrt(L), logits x dim_model_base/hidden_size. Remote-
    code-only on HF, so the config loads through the generic
    PretrainedConfig fallback."""

    def parse_args(self, hf) -> ModelArgs:
        args = ModelArgs.from_hf_config(hf)
        return dataclass_replace(
            args,
            embedding_multiplier=float(getattr(hf, "scale_emb", 1.0)),
            residual_multiplier=float(getattr(hf, "scale_depth", 1.0)) /
            float(hf.num_hidden_layers) ** 0.5,
            logits_scale=float(getattr(hf, "dim_model_base",
                                       hf.hidden_size)) / hf.hidden_size,
        )


class Glm4ForCausalLM(LlamaForCausalLM):
    """GLM-4 0414 (reference: models/glm4.py): partial rotary, qkv bias,
    gemma2-style sandwich norms (post_self_attn / post_mlp branch
    norms)."""

    def parse_args(self, hf) -> ModelArgs:
        args = ModelArgs.from_hf_config(hf)
        # GLM-4 rope is GPT-J interleaved over the partial rotary dims
        # (HF repeat_interleaves the half-width cos/sin, pairing
        # (2i, 2i+1) with the standard inv_freq[i]).
        rope = dataclass_replace(args.rope, is_neox_style=False)
        # GLM-4 attention_bias covers qkv only (o_proj is bias-free)
        return dataclass_replace(args, rope=rope, o_bias=False,
                                 attn_bias=bool(
                                     getattr(hf, "attention_bias", True)))

    def _hf_layer_map(self):
        m = super()._hf_layer_map()
        del m["mlp.gate_proj.weight"]
        del m["mlp.up_proj.weight"]
        # fused gate|up in one tensor, same order as our layout
        m["mlp.gate_up_proj.weight"] = ("gate_up.w", "", True)
        m["post_self_attn_layernorm.weight"] = ("post_attn_ln", "", False)
        m["post_mlp_layernorm.weight"] = ("post_mlp_ln", "", False)
        return m

    def _alloc_layer_stack(self, np_dtype) -> dict:
        layers = super()._alloc_layer_stack(np_dtype)
        a = self.args
        L = a.num_layers
        layers["post_attn_ln"] = np.empty((L, a.hidden_size), np_dtype)
        layers["post_mlp_ln"] = np.empty((L, a.hidden_size), np_dtype)
        return layers

    def _decoder_layer(self, lp, x, kv, li, metadata,
                       sliding_window="default", inv_freq=None,
                       lora_ctx=None):
        args = self.args
        T = x.shape[0]
        nq, nk, d = args.num_heads, args.num_kv_heads, args.head_dim
        if inv_freq is None:
            inv_freq = self.inv_freq

        h = rms_norm(x, lp["input_ln"][li], args.rms_eps)
        qkv = linear(h, lp["qkv"], layer=li)
        q, k, v = jnp.split(qkv, [nq * d, (nq + nk) * d], axis=-1)
        q = q.reshape(T, nq, d)
        k = k.reshape(T, nk, d)
        v = v.reshape(T, nk, d)
        q, k = self._apply_rope_qk(q, k, metadata, inv_freq)
        attn, kv = self._cached_attention(lp, li, q, k, v, kv,
                                          metadata)
        attn = linear(attn.reshape(T, nq * d), lp["o"], layer=li)
        x = x + rms_norm(attn, lp["post_attn_ln"][li], args.rms_eps)

        h = rms_norm(x, lp["post_ln"][li], args.rms_eps)
        gate_up = linear(h, lp["gate_up"], layer=li)
        ffw = linear(GATED_ACTIVATIONS[args.act](gate_up), lp["down"],
                     layer=li)
        x = x + rms_norm(ffw, lp["post_mlp_ln"][li], args.rms_eps)
        return x, kv


class NemotronForCausalLM(GPTNeoXForCausalLM):
    """Nemotron (reference: models/nemotron.py): layernorm1p ((1+w) LN),
    squared-relu dense MLP, partial rotary, sequential residual."""

    _EMBED = "model.embed_tokens.weight"
    _FINAL_W = "model.norm.weight"
    _FINAL_B = "model.norm.bias"
    _LM_HEAD = "lm_head.weight"
    _LM_HEAD_B = None
    _LAYER_PREFIX = "model.layers"

    def parse_args(self, hf) -> NeoxArgs:
        head_dim = getattr(hf, "head_dim", None) or \
            hf.hidden_size // hf.num_attention_heads
        rope = RopeConfig(
            head_size=head_dim,
            rotary_dim=int(head_dim *
                           getattr(hf, "partial_rotary_factor", 0.5)),
            max_position=getattr(hf, "max_position_embeddings", 4096),
            base=float(getattr(hf, "rope_theta", 10000.0)),
        )
        return NeoxArgs(
            vocab_size=hf.vocab_size,
            hidden_size=hf.hidden_size,
            num_layers=hf.num_hidden_layers,
            num_heads=hf.num_attention_heads,
            num_kv_heads=getattr(hf, "num_key_value_heads",
                                 hf.num_attention_heads),
            head_dim=head_dim,
            intermediate_size=hf.intermediate_size,
            ln_eps=float(getattr(hf, "norm_eps", 1e-5)),
            rope=rope,
            parallel_residual=False,
            gated_mlp=False,
            act="relu2",
            qkv_bias=bool(getattr(hf, "attention_bias", False)),
            o_bias=False,
            mlp_bias=bool(getattr(hf, "mlp_bias", False)),
            tie_embeddings=bool(getattr(hf, "tie_word_embeddings",
                                        False)),
            max_position=getattr(hf, "max_position_embeddings", 4096),
        )

    def _hf_layer_map(self):
        return {
            "input_layernorm.weight": ("input_ln_w", "", False),
            "input_layernorm.bias": ("input_ln_b", "", False),
            "post_attention_layernorm.weight": ("post_ln_w", "", False),
            "post_attention_layernorm.bias": ("post_ln_b", "", False),
            "self_attn.q_proj.weight": ("qkv.w", "q", True),
            "self_attn.k_proj.weight": ("qkv.w", "k", True),
            "self_attn.v_proj.weight": ("qkv.w", "v", True),
            "self_attn.o_proj.weight": ("o.w", "", True),
            "mlp.up_proj.weight": ("up.w", "", True),
            "mlp.down_proj.weight": ("down.w", "", True),
        }

    def load_weights(self, weights_iter):
        params = super().load_weights(weights_iter)
        # layernorm1p: y = LN(x) * (1 + w) + b — fold the +1 into w
        L = params["layers"]
        L["input_ln_w"] = L["input_ln_w"] + np.asarray(
            1.0, L["input_ln_w"].dtype)
        L["post_ln_w"] = L["post_ln_w"] + np.asarray(
            1.0, L["post_ln_w"].dtype)
        params["final_ln_w"] = params["final_ln_w"] + np.asarray(
            1.0, params["final_ln_w"].dtype)
        return params


class Ernie4_5ForCausalLM(LlamaForCausalLM):
    """ERNIE 4.5 dense (reference: models/ernie45.py): Llama skeleton
    with GLM-style interleaved RoPE over the full head dim and an
    optional use_bias on every projection."""

    def parse_args(self, hf) -> ModelArgs:
        args = ModelArgs.from_hf_config(hf)
        rope = dataclass_replace(args.rope, is_neox_style=False)
        use_bias = bool(getattr(hf, "use_bias", False))
        return dataclass_replace(args, rope=rope, attn_bias=use_bias,
                                 o_bias=use_bias, mlp_bias=use_bias)


class SmolLM3ForCausalLM(LlamaForCausalLM):
    """SmolLM3 (reference: models/transformers fallback; HF
    models/smollm3): Llama with periodic NoPE layers —
    config.no_rope_layers[i] == 0 means layer i skips rotary."""

    def parse_args(self, hf) -> ModelArgs:
        interval = getattr(hf, "no_rope_layer_interval", 4) or 4
        self._rope_flags = list(
            getattr(hf, "no_rope_layers", None) or
            [int((i + 1) % interval != 0)
             for i in range(hf.num_hidden_layers)])
        return ModelArgs.from_hf_config(hf)

    @property
    def layer_pattern(self) -> list[dict]:
        flags = self._rope_flags
        # smallest period that divides num_layers keeps the scan body
        # small (the default interval-4 pattern reduces to length 4)
        for p in range(1, len(flags) + 1):
            if len(flags) % p:
                continue
            if all(flags[i] == flags[i % p] for i in range(len(flags))):
                break
        return [{"rope_on": bool(flags[i])} for i in range(p)]


class SeedOssForCausalLM(LlamaForCausalLM):
    """Seed-OSS (HF models/seed_oss): Llama with qkv bias (default on),
    optional o/mlp bias, and an explicit head_dim."""

    def parse_args(self, hf) -> ModelArgs:
        args = ModelArgs.from_hf_config(hf)
        return dataclass_replace(
            args,
            attn_bias=bool(getattr(hf, "attention_bias", True)),
            o_bias=bool(getattr(hf, "attention_out_bias", False)))


class ArceeForCausalLM(LlamaForCausalLM):
    """Arcee AFM (reference: models/arcee.py): Llama skeleton with an
    UNGATED relu-squared MLP (up_proj -> relu^2 -> down_proj)."""

    def _hf_layer_map(self):
        m = super()._hf_layer_map()
        del m["mlp.gate_proj.weight"]
        del m["mlp.gate_proj.bias"]
        m["mlp.up_proj.weight"] = ("gate_up.w", "", True)
        m["mlp.up_proj.bias"] = ("gate_up.b", "", False)
        return m

    def _alloc_layer_stack(self, np_dtype) -> dict:
        layers = super()._alloc_layer_stack(np_dtype)
        a = self.args
        L, H, I = a.num_layers, a.hidden_size, a.intermediate_size
        layers["gate_up"]["w"] = np.empty((L, H, I), np_dtype)
        if "b" in layers["gate_up"]:
            layers["gate_up"]["b"] = np.empty((L, I), np_dtype)
        return layers

    def _mlp(self, lp, h, li, lora_ctx=None):
        from vllm_tpu.ops.activation import ACTIVATIONS

        up = linear(h, lp["gate_up"], layer=li)
        return linear(ACTIVATIONS[self.args.act](up), lp["down"],
                      layer=li)


class ApertusForCausalLM(ArceeForCausalLM):
    """Apertus (Swiss AI; reference: models/apertus.py): Llama skeleton
    with per-head-dim qk-norm, UNGATED xIELU MLP with learnable
    per-layer alpha_p/alpha_n, and attention_layernorm /
    feedforward_layernorm pre-norm names."""

    def parse_args(self, hf) -> ModelArgs:
        args = ModelArgs.from_hf_config(hf)
        use_bias = bool(getattr(hf, "attention_bias", False))
        return dataclass_replace(args, qk_norm=True, attn_bias=use_bias,
                                 o_bias=use_bias)

    def _hf_layer_map(self):
        m = super()._hf_layer_map()
        del m["input_layernorm.weight"]
        del m["post_attention_layernorm.weight"]
        m["attention_layernorm.weight"] = ("input_ln", "", False)
        m["feedforward_layernorm.weight"] = ("post_ln", "", False)
        # xIELU learnable parameters, stored raw (pre-softplus), shape (1,)
        m["mlp.act_fn.alpha_p"] = ("xielu_ap", "", False)
        m["mlp.act_fn.alpha_n"] = ("xielu_an", "", False)
        m["mlp.act_fn.beta"] = ("xielu_beta", "", False)
        m["mlp.act_fn.eps"] = ("xielu_eps", "", False)
        return m

    def _alloc_layer_stack(self, np_dtype) -> dict:
        layers = super()._alloc_layer_stack(np_dtype)
        L = self.args.num_layers
        # keep fp32: these are scalars that pass through softplus/expm1
        for k in ("xielu_ap", "xielu_an", "xielu_beta", "xielu_eps"):
            layers[k] = np.empty((L, 1), np.float32)
        return layers

    def _mlp(self, lp, h, li, lora_ctx=None):
        import ml_dtypes

        up = linear(h, lp["gate_up"], layer=li)
        # HF computes softplus on bfloat16 parameters; round the
        # resulting coefficients to bf16 for logit-exact parity
        # (transformers activations.XIELUActivation._xielu_python).
        bf16 = jnp.dtype(ml_dtypes.bfloat16)
        beta = lp["xielu_beta"][li].astype(jnp.float32)
        eps = lp["xielu_eps"][li].astype(jnp.float32)
        ap = jax.nn.softplus(lp["xielu_ap"][li]).astype(bf16).astype(
            jnp.float32).astype(up.dtype)
        an = (beta + jax.nn.softplus(lp["xielu_an"][li]).astype(
            bf16).astype(jnp.float32)).astype(up.dtype)
        beta = beta.astype(up.dtype)
        pos = ap * jnp.square(up) + beta * up
        neg = (jnp.expm1(jnp.minimum(up, eps.astype(up.dtype))) - up) \
            * an + beta * up
        return linear(jnp.where(up > 0, pos, neg), lp["down"], layer=li)


class HunYuanDenseV1ForCausalLM(LlamaForCausalLM):
    """Hunyuan-V1 dense (reference: models/hunyuan_v1.py): Llama with
    per-head-dim q/k RMSNorm (query_layernorm/key_layernorm names)."""

    def parse_args(self, hf) -> ModelArgs:
        args = ModelArgs.from_hf_config(hf)
        return dataclass_replace(args, qk_norm=True)

    def _hf_layer_map(self):
        m = super()._hf_layer_map()
        m["self_attn.query_layernorm.weight"] = ("q_norm", "", False)
        m["self_attn.key_layernorm.weight"] = ("k_norm", "", False)
        return m


class TeleFLMForCausalLM(LlamaForCausalLM):
    """TeleFLM / FLM-2 (reference: models/teleflm.py): Llama with muP
    scalings — embeddings scaled by ``input_mult``, logits by
    ``output_mult / mup_scale_factor`` — when ``use_mup`` is set."""

    def parse_args(self, hf) -> ModelArgs:
        args = ModelArgs.from_hf_config(hf)
        if getattr(hf, "use_mup", False):
            args = dataclass_replace(
                args,
                embedding_multiplier=float(hf.input_mult),
                logits_scale=float(hf.output_mult) /
                float(hf.mup_scale_factor),
            )
        return args


class SolarForCausalLM(LlamaForCausalLM):
    """Upstage Solar (reference: models/solar.py): Llama plus static
    backbone skip connections (bskcn) — hidden states are saved BEFORE
    the layers listed in ``bskcn_1``/``bskcn_2`` and blended back in
    with weight ``tv = bskcn_tv[1]`` (the inference entry) before the
    layers in ``bskcn_3``/``bskcn_4``. The save/blend points are static
    config, so the stack runs as an unrolled layer loop instead of the
    uniform scan."""

    def parse_args(self, hf) -> ModelArgs:
        self._bskcn = tuple(
            frozenset(getattr(hf, k, None) or ())
            for k in ("bskcn_1", "bskcn_2", "bskcn_3", "bskcn_4"))
        tv = getattr(hf, "bskcn_tv", None) or (0.9, 0.8)
        self._bskcn_tv = float(tv[1])  # eval entry; [0] is training
        return ModelArgs.from_hf_config(hf)

    def kv_slab_plan(self, num_layers, layer_bytes):
        return None  # unrolled loop below handles one stacked cache

    def _run_layers(self, layer_params, kv_stack, x, metadata,
                    lora=None):
        assert not isinstance(kv_stack, KVSlabs)
        assert lora is None, "LoRA not wired for Solar's bskcn loop"
        layer_params = jax.tree.map(jnp.asarray, layer_params)
        s1, s2, s3, s4 = self._bskcn
        tv = self._bskcn_tv
        kv = kv_stack
        saved1 = saved2 = None
        for li in range(self.args.num_layers):
            if li in s1:
                saved1 = x
            if li in s2:
                saved2 = x
            if li in s3 and saved1 is not None:
                x = saved1 * tv + x * (1 - tv)
            if li in s4 and saved2 is not None:
                x = saved2 * tv + x * (1 - tv)
            x, kv = self._decoder_layer(layer_params, x, kv, li, metadata)
        return x, kv


class TeleChat2ForCausalLM(LlamaForCausalLM):
    """TeleAI TeleChat2 (reference: models/telechat2.py +
    transformers_utils/configs/telechat2.py): a Llama block under GPT-2
    style naming (``transformer.h``) with raw config attrs (``n_layer``,
    ``n_head``, ``ffn_hidden_size``), MHA with an interleaved per-head
    fused ``key_value`` projection, and biases on o_proj ("dense") and
    down_proj only."""

    _EMBED = "transformer.word_embeddings.weight"
    _FINAL_NORM = "transformer.ln_f.weight"
    _LM_HEAD = "lm_head.weight"
    _LAYER_PREFIX = "transformer.h"

    def parse_args(self, hf) -> ModelArgs:
        from vllm_tpu.ops.rotary import RopeConfig

        hidden = getattr(hf, "n_embed", None) or hf.hidden_size
        heads = getattr(hf, "n_head", None) or hf.num_attention_heads
        layers = getattr(hf, "n_layer", None) or hf.num_hidden_layers
        inter = getattr(hf, "ffn_hidden_size", None) or \
            hf.intermediate_size
        head_dim = hidden // heads
        return ModelArgs(
            vocab_size=hf.vocab_size,
            hidden_size=hidden,
            num_layers=layers,
            num_heads=heads,
            num_kv_heads=heads,
            head_dim=head_dim,
            intermediate_size=inter,
            rms_eps=float(getattr(hf, "layer_norm_epsilon", 1e-5)),
            rope=RopeConfig(
                head_size=head_dim, rotary_dim=head_dim,
                max_position=getattr(hf, "training_seqlen", 8192),
                base=float(getattr(hf, "rope_theta", 10000.0))),
            act=getattr(hf, "hidden_act", "silu"),
            o_bias=True,
            mlp_bias=True,  # down_proj bias (gate/up have none)
            tie_embeddings=bool(getattr(hf, "tie_word_embeddings",
                                        False)),
            max_position=getattr(hf, "training_seqlen", 8192),
        )

    def _hf_layer_map(self):
        m = super()._hf_layer_map()
        m["self_attention.query.weight"] = ("qkv.w", "q", True)
        m["self_attention.k_split.weight"] = ("qkv.w", "k", True)
        m["self_attention.v_split.weight"] = ("qkv.w", "v", True)
        m["self_attention.dense.weight"] = ("o.w", "", True)
        m["self_attention.dense.bias"] = ("o.b", "", False)
        return m

    def load_weights(self, weights_iter):
        nq, d = self.args.num_heads, self.args.head_dim

        def adapt(it):
            for name, w in it:
                if name.endswith("self_attention.key_value.weight"):
                    w = np.asarray(w).reshape(nq, 2, d, -1)
                    yield (name.replace("key_value", "k_split"),
                           w[:, 0].reshape(nq * d, -1))
                    yield (name.replace("key_value", "v_split"),
                           w[:, 1].reshape(nq * d, -1))
                else:
                    yield name, w

        return super().load_weights(adapt(weights_iter))


class DeciLMForCausalLM(LlamaForCausalLM):
    """DeciLM (reference: models/decilm.py): Llama whose GQA ratio
    varies per layer (``num_key_value_heads_per_layer``). The stacked
    scan needs one uniform KV width, so the loader replicates each
    layer's K/V head projections up to full MHA width — numerically
    identical to grouped attention with repeated KV heads, at the cost
    of a wider KV cache."""

    def parse_args(self, hf) -> ModelArgs:
        self._kv_per_layer = list(
            getattr(hf, "num_key_value_heads_per_layer", None) or
            [getattr(hf, "num_key_value_heads", hf.num_attention_heads)]
            * hf.num_hidden_layers)
        args = ModelArgs.from_hf_config(hf)
        return dataclass_replace(args, num_kv_heads=args.num_heads)

    def load_weights(self, weights_iter):
        nq, d = self.args.num_heads, self.args.head_dim
        prefix = self._LAYER_PREFIX + "."

        def adapt(it):
            for name, w in it:
                if name.startswith(prefix) and (
                        name.endswith("self_attn.k_proj.weight") or
                        name.endswith("self_attn.v_proj.weight")):
                    li = int(name[len(prefix):].split(".", 1)[0])
                    nk = self._kv_per_layer[li]
                    if nk != nq:
                        w = np.repeat(
                            np.asarray(w).reshape(nk, d, -1),
                            nq // nk, axis=0).reshape(nq * d, -1)
                    yield name, w
                else:
                    yield name, w

        return super().load_weights(adapt(weights_iter))


class ExaoneForCausalLM(LlamaForCausalLM):
    """LG EXAONE 3.x (reference: models/exaone.py +
    transformers_utils/configs/exaone.py): the Llama block under GPT-2
    style naming — ``transformer.h.{i}.ln_1/ln_2`` RMSNorms,
    ``attn.attention.{q,k,v,out}_proj``, ``mlp.c_fc_0/c_fc_1/c_proj``
    (gate/up/down) — with raw config attrs (``num_layers``,
    ``activation_function``)."""

    _EMBED = "transformer.wte.weight"
    _FINAL_NORM = "transformer.ln_f.weight"
    _LM_HEAD = "lm_head.weight"
    _LAYER_PREFIX = "transformer.h"

    def parse_args(self, hf) -> ModelArgs:
        # the remote-code ExaoneConfig maps num_hidden_layers ->
        # num_layers; the generic fallback config has only the raw name
        if not hasattr(hf, "num_hidden_layers"):
            hf.num_hidden_layers = hf.num_layers
        args = ModelArgs.from_hf_config(hf)
        return dataclass_replace(
            args,
            rms_eps=float(getattr(hf, "layer_norm_epsilon", 1e-5)),
            act=getattr(hf, "activation_function", "silu"),
        )

    def _hf_layer_map(self):
        return {
            "ln_1.weight": ("input_ln", "", False),
            "ln_2.weight": ("post_ln", "", False),
            "attn.attention.q_proj.weight": ("qkv.w", "q", True),
            "attn.attention.k_proj.weight": ("qkv.w", "k", True),
            "attn.attention.v_proj.weight": ("qkv.w", "v", True),
            "attn.attention.out_proj.weight": ("o.w", "", True),
            "mlp.c_fc_0.weight": ("gate_up.w", "gate", True),
            "mlp.c_fc_1.weight": ("gate_up.w", "up", True),
            "mlp.c_proj.weight": ("down.w", "", True),
        }


class InternLM2ForCausalLM(LlamaForCausalLM):
    """InternLM2/2.5 in NATIVE checkpoint naming (reference:
    models/internlm2.py): ``model.tok_embeddings``, per-layer
    ``attention.wqkv`` (kv-group-interleaved fused qkv),
    ``attention.wo``, ``feed_forward.w1/w3/w2`` (gate/up/down),
    ``attention_norm``/``ffn_norm``, lm head ``output``. Llama-named
    conversions keep working — the base map's suffixes stay in place
    and only one naming scheme appears per checkpoint."""

    def parse_args(self, hf) -> ModelArgs:
        args = ModelArgs.from_hf_config(hf)
        b = bool(getattr(hf, "bias", False))
        return dataclass_replace(args, attn_bias=b, o_bias=b)

    def _hf_layer_map(self):
        m = super()._hf_layer_map()
        m["attention_norm.weight"] = ("input_ln", "", False)
        m["ffn_norm.weight"] = ("post_ln", "", False)
        m["attention.wo.weight"] = ("o.w", "", True)
        m["attention.wo.bias"] = ("o.b", "", False)
        m["feed_forward.w1.weight"] = ("gate_up.w", "gate", True)
        m["feed_forward.w3.weight"] = ("gate_up.w", "up", True)
        m["feed_forward.w2.weight"] = ("down.w", "", True)
        return m

    def load_weights(self, weights_iter):
        a = self.args
        nq, nk, d = a.num_heads, a.num_kv_heads, a.head_dim
        g = nq // nk

        def adapt(it):
            for name, w in it:
                if name == "model.tok_embeddings.weight":
                    yield "model.embed_tokens.weight", w
                elif name == "output.weight":
                    yield "lm_head.weight", w
                elif name.endswith("attention.wqkv.weight") or \
                        name.endswith("attention.wqkv.bias"):
                    # [nk, g+2, d, ...]: g q-heads, then k, then v per
                    # kv group (group-major == plain head order)
                    w = np.asarray(w)
                    trail = w.shape[1:]
                    wr = w.reshape(nk, g + 2, d, *trail)
                    base = name[:name.rindex("wqkv")]
                    sfx = name.rsplit(".", 1)[1]
                    yield (base.replace("attention.", "self_attn.") +
                           "q_proj." + sfx,
                           wr[:, :g].reshape(nq * d, *trail))
                    yield (base.replace("attention.", "self_attn.") +
                           "k_proj." + sfx,
                           wr[:, g].reshape(nk * d, *trail))
                    yield (base.replace("attention.", "self_attn.") +
                           "v_proj." + sfx,
                           wr[:, g + 1].reshape(nk * d, *trail))
                else:
                    yield name, w

        return super().load_weights(adapt(weights_iter))


class InternLM2ForRewardModel(InternLM2ForCausalLM):
    """InternLM2 reward model (reference: internlm2.py:404): the
    decoder plus a bias-free scalar ``v_head`` scored from each
    request's last token via the pooling path."""

    def classify(self, params, hidden, metadata):
        qsl = metadata.query_start_loc
        last = hidden[jnp.maximum(qsl[1:] - 1, 0)]
        return last @ params["v_head"]

    def load_weights(self, weights_iter):
        extra = {}

        def tap(it):
            for name, w in it:
                if name.startswith("v_head."):
                    extra[name] = np.asarray(w)
                else:
                    yield name, w

        params = super().load_weights(tap(weights_iter))
        H = self.args.hidden_size
        params["v_head"] = extra.get(
            "v_head.weight", np.zeros((1, H), np.float32)).T.astype(
                params["final_ln"].dtype)
        return params


class Fairseq2LlamaForCausalLM(LlamaForCausalLM):
    """Llama weights in fairseq2 serialization (reference:
    models/fairseq2_llama.py): a ``model.pt`` whose state dict is
    wrapped as {"model_key": name, name: state_dict}, fairseq2 module
    names, and q/k projections stored in interleaved rotary layout
    (permuted here to neox, fairseq2_llama.py:108)."""

    _FS2_PREFIX = {
        "decoder_frontend.embed.": "model.embed_tokens.",
        "decoder.": "model.",
        "final_proj.": "lm_head.",
    }
    _FS2_SUBSTR = {
        ".self_attn_layer_norm.": ".input_layernorm.",
        ".ffn_layer_norm.": ".post_attention_layernorm.",
        ".self_attn.output_proj.": ".self_attn.o_proj.",
        ".ffn.gate_proj.": ".mlp.gate_proj.",
        ".ffn.inner_proj.": ".mlp.up_proj.",
        ".ffn.output_proj.": ".mlp.down_proj.",
        ".layer_norm.": ".norm.",
    }

    def load_weights(self, weights_iter) -> dict:
        a = self.args

        def permute(w: np.ndarray, n_heads: int) -> np.ndarray:
            # interleaved rotary -> neox half-split layout
            attn_in = a.head_dim * n_heads
            attn_out = w.shape[-1]
            return w.reshape(n_heads, attn_in // n_heads // 2, 2,
                             attn_out).transpose(0, 2, 1, 3).reshape(
                                 attn_in, attn_out)

        blob = dict(weights_iter)
        if "model_key" in blob:  # fairseq2 wrapper
            blob = dict(blob[str(blob["model_key"])])

        def remap():
            for name, w in blob.items():
                if not hasattr(w, "shape"):
                    continue
                for old, new in self._FS2_PREFIX.items():
                    if name.startswith(old):
                        name = new + name[len(old):]
                        break
                for old, new in self._FS2_SUBSTR.items():
                    name = name.replace(old, new)
                w = np.asarray(w)
                if name.endswith("q_proj.weight"):
                    w = permute(w, a.num_heads)
                elif name.endswith("k_proj.weight"):
                    w = permute(w, a.num_kv_heads)
                yield name, w

        return super().load_weights(remap())
