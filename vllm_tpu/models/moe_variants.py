"""LayerNorm-family MoE archs: DBRX and Phi-3.5-MoE (reference parity:
vllm/model_executor/models/{dbrx,phimoe}.py; built on the Mixtral base
with LayerNorm blocks instead of RMSNorm)."""

from __future__ import annotations

from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np

from vllm_tpu.models.llama import ModelArgs, dataclass_replace
from vllm_tpu.models.mixtral import MixtralForCausalLM
from vllm_tpu.ops.attention import AttentionMetadata
from vllm_tpu.ops.layernorm import layer_norm, rms_norm
from vllm_tpu.ops.linear import linear
from vllm_tpu.ops.moe import topk_routing
from vllm_tpu.ops.rotary import RopeConfig, apply_rope


class DbrxForCausalLM(MixtralForCausalLM):
    """DBRX (reference: models/dbrx.py): bias-free LayerNorm blocks,
    fused Wqkv with clip_qkv clamping, experts stored as three fused
    [E*I, H] tensors (w1=gate, v1=up, w2=down used untransposed)."""

    _EMBED = "transformer.wte.weight"
    _FINAL_NORM = "transformer.norm_f.weight"
    _LM_HEAD = "lm_head.weight"
    _LAYER_PREFIX = "transformer.blocks"

    def parse_args(self, hf) -> ModelArgs:
        attn = getattr(hf, "attn_config", None) or SimpleNamespace()
        ffn = getattr(hf, "ffn_config", None) or SimpleNamespace()
        self.num_experts = int(getattr(ffn, "moe_num_experts", 16))
        self.top_k = int(getattr(ffn, "moe_top_k", 4))
        self.moe_intermediate = int(getattr(ffn, "ffn_hidden_size",
                                            4 * hf.d_model))
        self.norm_p = getattr(ffn, "moe_normalize_expert_weights", 1)
        self.clip_qkv = getattr(attn, "clip_qkv", None)
        head_dim = hf.d_model // hf.n_heads
        rope_shim = SimpleNamespace(
            rope_theta=float(getattr(attn, "rope_theta", 10000.0)),
            rope_scaling=None,
            max_position_embeddings=int(getattr(hf, "max_seq_len", 2048)))
        return ModelArgs(
            vocab_size=hf.vocab_size,
            hidden_size=hf.d_model,
            num_layers=hf.n_layers,
            num_heads=hf.n_heads,
            num_kv_heads=int(getattr(attn, "kv_n_heads", hf.n_heads)),
            head_dim=head_dim,
            intermediate_size=self.moe_intermediate,
            rms_eps=1e-5,  # nn.LayerNorm default
            rope=RopeConfig.from_hf_config(rope_shim, head_dim),
            max_position=int(getattr(hf, "max_seq_len", 2048)),
        )

    def _decoder_layer(self, lp: dict, x: jnp.ndarray, kv: jnp.ndarray,
                       li, metadata: AttentionMetadata, lora_ctx=None,
                       **_cfg) -> tuple[jnp.ndarray, jnp.ndarray]:
        a = self.args
        T = x.shape[0]
        nq, nk, d = a.num_heads, a.num_kv_heads, a.head_dim

        h = layer_norm(x, lp["input_ln"][li], None, a.rms_eps)
        qkv = linear(h, lp["qkv"], layer=li)
        if self.clip_qkv is not None:
            qkv = jnp.clip(qkv, -self.clip_qkv, self.clip_qkv)
        q, k, v = jnp.split(qkv, [nq * d, (nq + nk) * d], axis=-1)
        q = q.reshape(T, nq, d)
        k = k.reshape(T, nk, d)
        v = v.reshape(T, nk, d)
        q, k = apply_rope(q, k, metadata.positions, self.inv_freq,
                          a.rope.is_neox_style, self.rope_mscale)
        attn_out, kv = self._cached_attention(lp, li, q, k, v, kv,
                                              metadata)
        x = x + linear(attn_out.reshape(T, nq * d), lp["o"], layer=li)

        h = layer_norm(x, lp["post_ln"][li], None, a.rms_eps)
        router_logits = linear(h, lp["router"], layer=li)
        weights, expert_ids = self._route(router_logits)
        lp_l = {k2: jax.tree.map(lambda leaf: leaf[li], v2)
                for k2, v2 in lp.items() if k2.startswith("experts")}
        moe_out = self._moe(h, lp_l, weights, expert_ids, a.act)
        return x + moe_out, kv

    def _route(self, router_logits):
        if self.norm_p in (None, 1, 1.0):
            return topk_routing(router_logits, self.top_k,
                                renormalize=self.norm_p is not None)
        probs = jax.nn.softmax(router_logits.astype(jnp.float32), -1)
        w, ids = jax.lax.top_k(probs, self.top_k)
        norm = jnp.sum(jnp.abs(w)**self.norm_p, -1,
                       keepdims=True)**(1.0 / self.norm_p)
        return w / norm, ids

    def forward(self, params, input_ids, kv_caches, metadata,
                lora=None, embed_override=None):
        x = self.embed(params, input_ids)
        x, new_kv = self._run_layers(params["layers"], kv_caches[0], x,
                                     metadata, lora)
        x = layer_norm(x, params["final_ln"], None, self.args.rms_eps)
        return x, [new_kv]

    def _hf_layer_map(self):
        return {
            "norm_attn_norm.norm_1.weight": ("input_ln", "", False),
            "norm_attn_norm.attn.Wqkv.weight": ("qkv.w", "", True),
            "norm_attn_norm.attn.out_proj.weight": ("o.w", "", True),
            "norm_attn_norm.norm_2.weight": ("post_ln", "", False),
            "ffn.router.layer.weight": ("router.w", "", True),
        }

    def load_weights(self, weights_iter):
        """Intercept the fused [E*I, H] expert tensors (w1/v1/w2) that
        arrive as single parameters instead of per-expert names."""
        a = self.args
        E, I, H = self.num_experts, self.moe_intermediate, a.hidden_size
        fused: dict[tuple[int, str], np.ndarray] = {}
        prefix = self._LAYER_PREFIX + "."

        def wrap():
            for name, w in weights_iter:
                if name.startswith(prefix) and ".ffn.experts.mlp." \
                        in name:
                    li = int(name[len(prefix):].split(".", 1)[0])
                    fused[(li, name.rsplit(".", 1)[-1])] = np.asarray(w)
                    continue
                yield name, w

        params = super().load_weights(wrap())
        L = params["layers"]
        for (li, kind), w in fused.items():
            per = w.reshape(E, I, H)
            if kind == "w1":  # gate: used as x @ w1_e.T -> [H, I]
                L["experts_gate_up"][li, :, :, :I] = per.transpose(
                    0, 2, 1).astype(L["experts_gate_up"].dtype)
            elif kind == "v1":  # up
                L["experts_gate_up"][li, :, :, I:] = per.transpose(
                    0, 2, 1).astype(L["experts_gate_up"].dtype)
            elif kind == "w2":  # down: used untransposed [I, H]
                L["experts_down"][li] = per.astype(
                    L["experts_down"].dtype)
        return params


class PhiMoEForCausalLM(MixtralForCausalLM):
    """Phi-3.5-MoE (reference: models/phimoe.py): biased LayerNorm
    blocks, optional qkv/o bias, sparsemixer top-2 routing (eval path:
    thresholded-softmax weights at the two successive argmaxes)."""

    supports_pp_stream = False  # LN final norm, not the base's rms

    def parse_args(self, hf) -> ModelArgs:
        args = super().parse_args(hf)
        bias = bool(getattr(hf, "attention_bias", False))
        self.jitter_eps = float(getattr(hf, "router_jitter_noise", 0.01))
        self.lm_head_bias = bool(getattr(hf, "lm_head_bias", False))
        return dataclass_replace(args, attn_bias=bias, o_bias=bias)

    def _decoder_layer(self, lp: dict, x: jnp.ndarray, kv: jnp.ndarray,
                       li, metadata: AttentionMetadata, lora_ctx=None,
                       **_cfg) -> tuple[jnp.ndarray, jnp.ndarray]:
        a = self.args
        T = x.shape[0]
        nq, nk, d = a.num_heads, a.num_kv_heads, a.head_dim

        h = layer_norm(x, lp["input_ln_w"][li], lp["input_ln_b"][li],
                       a.rms_eps)
        qkv = linear(h, lp["qkv"], layer=li)
        q, k, v = jnp.split(qkv, [nq * d, (nq + nk) * d], axis=-1)
        q = q.reshape(T, nq, d)
        k = k.reshape(T, nk, d)
        v = v.reshape(T, nk, d)
        q, k = apply_rope(q, k, metadata.positions, self.inv_freq,
                          a.rope.is_neox_style, self.rope_mscale)
        attn_out, kv = self._cached_attention(lp, li, q, k, v, kv,
                                              metadata)
        x = x + linear(attn_out.reshape(T, nq * d), lp["o"], layer=li)

        h = layer_norm(x, lp["post_ln_w"][li], lp["post_ln_b"][li],
                       a.rms_eps)
        router_logits = linear(h, lp["router"], layer=li)
        weights, expert_ids = self._sparsemixer(router_logits)
        lp_l = {k2: jax.tree.map(lambda leaf: leaf[li], v2)
                for k2, v2 in lp.items() if k2.startswith("experts")}
        moe_out = self._moe(h, lp_l, weights, expert_ids, a.act)
        return x + moe_out, kv

    def _sparsemixer(self, scores):
        """Eval-time sparsemixer (HF modeling_phimoe.sparsemixer):
        expert i = i-th successive argmax; weight i = softmax of the
        jitter-thresholded mask evaluated at that expert."""
        s = scores.astype(jnp.float32)
        eps = self.jitter_eps

        def pick(cur):
            m = jnp.max(cur, -1, keepdims=True)
            factor = jnp.maximum(jnp.abs(s), m)
            mask = ((m - s) / factor) > (2 * eps)
            gates = jax.nn.softmax(jnp.where(mask, -jnp.inf, cur), -1)
            e = jnp.argmax(cur, -1)
            w = jnp.take_along_axis(gates, e[..., None], -1)[..., 0]
            return e, w

        e1, w1 = pick(s)
        masked = jnp.where(
            jax.nn.one_hot(e1, s.shape[-1], dtype=bool), -jnp.inf, s)
        e2, w2 = pick(masked)
        return (jnp.stack([w1, w2], -1),
                jnp.stack([e1, e2], -1).astype(jnp.int32))

    def forward(self, params, input_ids, kv_caches, metadata,
                lora=None, embed_override=None):
        x = self.embed(params, input_ids)
        x, new_kv = self._run_layers(params["layers"], kv_caches[0], x,
                                     metadata, lora)
        x = layer_norm(x, params["final_ln"], params["final_ln_b"],
                       self.args.rms_eps)
        return x, [new_kv]

    def _alloc_layer_stack(self, np_dtype) -> dict:
        a = self.args
        layers = super()._alloc_layer_stack(np_dtype)
        del layers["input_ln"]
        del layers["post_ln"]
        L, H = a.num_layers, a.hidden_size
        for key in ("input_ln_w", "input_ln_b", "post_ln_w",
                    "post_ln_b"):
            layers[key] = np.empty((L, H), np_dtype)
        if a.attn_bias:
            nq, nk, d = a.num_heads, a.num_kv_heads, a.head_dim
            layers["qkv"]["b"] = np.empty((L, (nq + 2 * nk) * d),
                                          np_dtype)
        if a.o_bias:
            layers["o"]["b"] = np.empty((L, H), np_dtype)
        return layers

    def _hf_layer_map(self):
        m = super()._hf_layer_map()
        m["input_layernorm.weight"] = ("input_ln_w", "", False)
        m["input_layernorm.bias"] = ("input_ln_b", "", False)
        m["post_attention_layernorm.weight"] = ("post_ln_w", "", False)
        m["post_attention_layernorm.bias"] = ("post_ln_b", "", False)
        m["self_attn.o_proj.bias"] = ("o.b", "", False)
        return m

    def load_weights(self, weights_iter):
        extra: dict[str, np.ndarray] = {}
        wanted = {"model.norm.bias", "lm_head.bias"}

        def wrap():
            for name, w in weights_iter:
                if name in wanted:
                    extra[name] = np.asarray(w)
                yield name, w

        params = super().load_weights(wrap())
        params["final_ln_b"] = extra["model.norm.bias"].astype(
            params["final_ln"].dtype)
        if self.lm_head_bias and "lm_head.bias" in extra:
            params["lm_head"]["b"] = extra["lm_head.bias"].astype(
                params["lm_head"]["w"].dtype)
        return params


class HunYuanMoEV1ForCausalLM(MixtralForCausalLM):
    """Hunyuan-V1 MoE (reference: models/hunyuan_v1.py MoE path): dense
    HunYuan attention (per-head-dim q/k RMSNorm under
    query_layernorm/key_layernorm names) + softmax top-k renormalized
    routing over experts of the FULL intermediate width, plus an
    always-on shared MLP (mlp.shared_mlp) added to the routed output."""

    def parse_args(self, hf) -> ModelArgs:
        args = ModelArgs.from_hf_config(hf)
        ne = getattr(hf, "num_experts", 1)
        self.num_experts = int(ne if isinstance(ne, int) else ne[0])
        tk = getattr(hf, "moe_topk", 1)
        self.top_k = int(tk if isinstance(tk, int) else tk[0])
        self.moe_intermediate = int(hf.intermediate_size)
        return dataclass_replace(args, qk_norm=True)

    def _alloc_layer_stack(self, np_dtype) -> dict:
        layers = super()._alloc_layer_stack(np_dtype)
        a = self.args
        L, H, I = a.num_layers, a.hidden_size, self.moe_intermediate
        layers["shared_gate_up"] = {"w": np.empty((L, H, 2 * I),
                                                  np_dtype)}
        layers["shared_down"] = {"w": np.empty((L, I, H), np_dtype)}
        return layers

    def _hf_layer_map(self):
        from vllm_tpu.models.llama import LlamaForCausalLM

        m = LlamaForCausalLM._hf_layer_map(self)
        m["self_attn.query_layernorm.weight"] = ("q_norm", "", False)
        m["self_attn.key_layernorm.weight"] = ("k_norm", "", False)
        m["mlp.gate.wg.weight"] = ("router.w", "", True)
        m["mlp.shared_mlp.gate_proj.weight"] = ("shared_gate_up.w",
                                                "gate", True)
        m["mlp.shared_mlp.up_proj.weight"] = ("shared_gate_up.w", "up",
                                              True)
        m["mlp.shared_mlp.down_proj.weight"] = ("shared_down.w", "",
                                                True)
        for e in range(self.num_experts):
            m[f"mlp.experts.{e}.gate_proj.weight"] = (
                f"experts_gate_up@{e}", "gate", True)
            m[f"mlp.experts.{e}.up_proj.weight"] = (
                f"experts_gate_up@{e}", "up", True)
            m[f"mlp.experts.{e}.down_proj.weight"] = (
                f"experts_down@{e}", "", True)
        return m

    def _mlp(self, lp, h, li, lora_ctx=None):
        from vllm_tpu.ops.activation import GATED_ACTIVATIONS

        out = super()._mlp(lp, h, li, lora_ctx)
        gate_up = linear(h, lp["shared_gate_up"], layer=li)
        return out + linear(
            GATED_ACTIVATIONS[self.args.act](gate_up),
            lp["shared_down"], layer=li)


class Grok1ModelForCausalLM(MixtralForCausalLM):
    """xAI Grok-1 (reference: models/grok1.py): Mixtral-style MoE with
    sandwich norms (pre/post attention AND pre/post MoE), tanh-capped
    router logits (30), attention logit soft cap (30), an attention
    output multiplier, and muP-style embedding/output scales. Community
    HF checkpoints name the blocks ``attn``/``moe_block`` with experts
    ``linear`` (gate) / ``linear_v`` (up) / ``linear_1`` (down)."""

    _ROUTER_CAP = 30.0

    def parse_args(self, hf) -> ModelArgs:
        args = ModelArgs.from_hf_config(hf)
        self.num_experts = int(getattr(hf, "num_experts", None) or
                               getattr(hf, "num_local_experts", 8))
        self.top_k = int(getattr(hf, "num_experts_per_tok", 2))
        self.moe_intermediate = int(
            getattr(hf, "intermediate_size", args.intermediate_size))
        self.attn_multiplier = float(
            getattr(hf, "attn_output_multiplier", 1.0))
        emb = float(getattr(hf, "embedding_multiplier_scale", 1.0))
        out = float(getattr(hf, "output_multiplier_scale", 1.0))
        return dataclass_replace(
            args,
            act=getattr(hf, "hidden_act", "gelu"),
            attn_soft_cap=float(getattr(hf, "attn_logit_softcapping",
                                        30.0) or 0) or None,
            embedding_multiplier=emb if emb != 1.0 else None,
            logits_scale=out if out != 1.0 else None,
            tie_embeddings=bool(getattr(hf, "tie_word_embeddings",
                                        True)),
        )

    def _route(self, router_logits):
        capped = self._ROUTER_CAP * jnp.tanh(
            router_logits.astype(jnp.float32) / self._ROUTER_CAP)
        return topk_routing(capped, self.top_k, renormalize=True)

    def _alloc_layer_stack(self, np_dtype) -> dict:
        layers = super()._alloc_layer_stack(np_dtype)
        a = self.args
        L, H = a.num_layers, a.hidden_size
        layers["post_attn_ln"] = np.empty((L, H), np_dtype)
        layers["post_ffw_ln"] = np.empty((L, H), np_dtype)
        return layers

    def _hf_layer_map(self):
        m = {
            "pre_attn_norm.weight": ("input_ln", "", False),
            "post_attn_norm.weight": ("post_attn_ln", "", False),
            "pre_moe_norm.weight": ("post_ln", "", False),
            "post_moe_norm.weight": ("post_ffw_ln", "", False),
            "attn.q_proj.weight": ("qkv.w", "q", True),
            "attn.k_proj.weight": ("qkv.w", "k", True),
            "attn.v_proj.weight": ("qkv.w", "v", True),
            "attn.o_proj.weight": ("o.w", "", True),
            "moe_block.gate.weight": ("router.w", "", True),
        }
        for e in range(self.num_experts):
            m[f"moe_block.experts.{e}.linear.weight"] = (
                f"experts_gate_up@{e}", "gate", True)
            m[f"moe_block.experts.{e}.linear_v.weight"] = (
                f"experts_gate_up@{e}", "up", True)
            m[f"moe_block.experts.{e}.linear_1.weight"] = (
                f"experts_down@{e}", "", True)
        return m

    def _decoder_layer(self, lp, x, kv, li, metadata, lora_ctx=None,
                       **_cfg):
        from vllm_tpu.ops.rotary import apply_rope

        args = self.args
        T = x.shape[0]
        nq, nk, d = args.num_heads, args.num_kv_heads, args.head_dim

        h = rms_norm(x, lp["input_ln"][li], args.rms_eps)
        qkv = linear(h, lp["qkv"], layer=li)
        q, k, v = jnp.split(qkv, [nq * d, (nq + nk) * d], axis=-1)
        q, k = apply_rope(q.reshape(T, nq, d), k.reshape(T, nk, d),
                          metadata.positions, self.inv_freq,
                          args.rope.is_neox_style, self.rope_mscale)
        attn, kv = self._cached_attention(
            lp, li, q, k, v.reshape(T, nk, d), kv, metadata,
            logits_soft_cap=args.attn_soft_cap)
        attn = linear(attn.reshape(T, nq * d), lp["o"], layer=li)
        attn = attn * jnp.asarray(self.attn_multiplier, attn.dtype)
        x = x + rms_norm(attn, lp["post_attn_ln"][li], args.rms_eps)

        h = rms_norm(x, lp["post_ln"][li], args.rms_eps)
        ffw = self._mlp(lp, h, li, lora_ctx)
        x = x + rms_norm(ffw, lp["post_ffw_ln"][li], args.rms_eps)
        return x, kv
