"""DeepSeek-style routed-MoE archs with standard GQA attention:
dots.llm1, GLM-4.5 (Glm4Moe), ERNIE 4.5 MoE.

(Reference behavior parity: vllm/model_executor/models/{dots1,glm4_moe,
ernie45_moe}.py — all three pair a llama-like GQA attention block with
the DeepSeek fine-grained-MoE MLP: sigmoid/softmax routing with an
e_score_correction_bias, optional node-limited group top-k, shared
experts, and a dense prefix/suffix of first/last layers.)

TPU design: like models/deepseek.py, the dense prefix, the MoE middle,
and the dense tail each run as their own jax.lax.scan over a stacked
parameter pytree; the KV cache is the standard stacked
[L, N, 2K, page, D] layout indexed with the GLOBAL layer index so all
three stacks share one cache.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vllm_tpu.models.deepseek import deepseek_routing
from vllm_tpu.models.llama import (LlamaForCausalLM, ModelArgs, _np_dtype,
                                   dataclass_replace)
from vllm_tpu.ops.activation import GATED_ACTIVATIONS
from vllm_tpu.ops.attention import attention, write_kv_cache
from vllm_tpu.ops.layernorm import rms_norm
from vllm_tpu.ops.linear import linear
from vllm_tpu.ops.moe import fused_moe
from vllm_tpu.ops.rotary import apply_rope


class GqaMoEForCausalLM(LlamaForCausalLM):
    """Shared base: GQA attention + DeepSeek-style routed MoE MLP.

    Subclass ``parse_args`` must set: n_experts, moe_top_k, moe_inter,
    n_shared, first_k_dense, last_k_dense, scoring, topk_method,
    n_group, topk_group, norm_topk_prob, routed_scaling.
    """

    # split parameter stacks (dense/moe/tail) — the loader's stacked
    # per-layer KV-scale calibration assumes a single stack; opt out.
    kv_scale_calibration = False

    def kv_slab_plan(self, num_layers, layer_bytes):
        # dense/moe split scans index the stacked cache with a global
        # offset; not yet adapted to KVSlabs
        return None

    # ------------------------------------------------------------- fwd

    def forward(self, params, input_ids, kv_caches, metadata, lora=None):
        x = self.embed(params, input_ids)
        kv = kv_caches[0]
        off = 0
        for stack_name, moe in (("dense_layers", False),
                                ("layers", True),
                                ("dense_tail", False)):
            stack = params.get(stack_name)
            if stack is None:
                continue
            x, kv, off = self._scan_stack(stack, kv, x, metadata, moe,
                                          off)
        x = rms_norm(x, params["final_ln"], self.args.rms_eps)
        return x, [kv]

    def _scan_stack(self, layers, kv_full, x, metadata, moe: bool,
                    offset: int):
        layers = jax.tree.map(jnp.asarray, layers)
        stack_len = jax.tree.leaves(layers)[0].shape[0]
        idxs = jnp.arange(stack_len, dtype=jnp.int32)

        def body(carry, lidx):
            h, kv = carry
            h, kv = self._layer(layers, h, kv, lidx, lidx + offset,
                                metadata, moe)
            return (h, kv), None

        (x, kv_full), _ = jax.lax.scan(body, (x, kv_full), idxs)
        return x, kv_full, offset + stack_len

    def _layer(self, lp, x, kv, li, li_kv, metadata, moe: bool):
        args = self.args
        T = x.shape[0]
        nq, nk, d = args.num_heads, args.num_kv_heads, args.head_dim

        h = rms_norm(x, lp["input_ln"][li], args.rms_eps)
        qkv = linear(h, lp["qkv"], layer=li)
        q, k, v = jnp.split(qkv, [nq * d, (nq + nk) * d], axis=-1)
        q = q.reshape(T, nq, d)
        k = k.reshape(T, nk, d)
        v = v.reshape(T, nk, d)
        if args.qk_norm:
            q = rms_norm(q, lp["q_norm"][li], args.rms_eps)
            k = rms_norm(k, lp["k_norm"][li], args.rms_eps)
        q, k = apply_rope(q, k, metadata.positions, self.inv_freq,
                          args.rope.is_neox_style, self.rope_mscale)
        kv = write_kv_cache(kv, k, v, metadata.slot_mapping, layer=li_kv)
        attn = attention(q, kv, metadata, self.scale, layer=li_kv)
        x = x + linear(attn.reshape(T, nq * d), lp["o"], layer=li)

        h = rms_norm(x, lp["post_ln"][li], args.rms_eps)
        if moe:
            ffw = self._moe_ffw(lp, h, li)
        else:
            gate_up = linear(h, lp["gate_up"], layer=li)
            ffw = linear(GATED_ACTIVATIONS[args.act](gate_up),
                         lp["down"], layer=li)
        return x + ffw, kv

    def _moe_ffw(self, lp, h, li):
        e_bias = lp.get("e_bias")
        weights, ids = deepseek_routing(
            linear(h, lp["router"], layer=li), self.moe_top_k,
            self.scoring, e_bias[li] if e_bias is not None else None,
            self.n_group, self.topk_group, self.topk_method,
            self.norm_topk_prob, self.routed_scaling)
        out = fused_moe(h, lp["experts_gate_up"][li],
                        lp["experts_down"][li], weights, ids,
                        act=self.args.act)
        if self.n_shared:
            gate_up = linear(h, lp["shared_gate_up"], layer=li)
            out = out + linear(
                GATED_ACTIVATIONS[self.args.act](gate_up),
                lp["shared_down"], layer=li)
        return out

    # --------------------------------------------------------- weights

    def _stack_shapes(self, num_layers: int, moe: bool) -> dict:
        a = self.args
        H = a.hidden_size
        nq, nk, d = a.num_heads, a.num_kv_heads, a.head_dim
        shapes: dict[str, Any] = {
            "input_ln": (num_layers, H),
            "post_ln": (num_layers, H),
            "qkv": {"w": (num_layers, H, (nq + 2 * nk) * d)},
            "o": {"w": (num_layers, nq * d, H)},
        }
        if a.attn_bias:
            shapes["qkv"]["b"] = (num_layers, (nq + 2 * nk) * d)
        if a.qk_norm:
            shapes["q_norm"] = (num_layers, d)
            shapes["k_norm"] = (num_layers, d)
        if moe:
            E, mi = self.n_experts, self.moe_inter
            shapes["router"] = {"w": (num_layers, H, E)}
            shapes["e_bias"] = (num_layers, E)
            shapes["experts_gate_up"] = (num_layers, E, H, 2 * mi)
            shapes["experts_down"] = (num_layers, E, mi, H)
            if self.n_shared:
                si = mi * self.n_shared
                shapes["shared_gate_up"] = {"w": (num_layers, H, 2 * si)}
                shapes["shared_down"] = {"w": (num_layers, si, H)}
        else:
            shapes["gate_up"] = {"w": (num_layers, H,
                                       2 * a.intermediate_size)}
            shapes["down"] = {"w": (num_layers, a.intermediate_size, H)}
        return shapes

    def _stack_splits(self) -> list[tuple[str, int, bool]]:
        """(stack name, num layers, is_moe) in layer order."""
        L = self.args.num_layers
        kd, kt = self.first_k_dense, self.last_k_dense
        splits = []
        if kd > 0:
            splits.append(("dense_layers", kd, False))
        if L - kd - kt > 0:
            splits.append(("layers", L - kd - kt, True))
        if kt > 0:
            splits.append(("dense_tail", kt, False))
        return splits

    def init_dummy_params(self, seed: int = 0) -> dict:
        rng = np.random.default_rng(seed)
        a = self.args

        def mk(shape):
            return (rng.standard_normal(shape).astype(np.float32) *
                    (0.6 / np.sqrt(shape[-2] if len(shape) > 1 else 1)))

        def build(shapes):
            out: dict[str, Any] = {}
            for k, v in shapes.items():
                if isinstance(v, dict):
                    out[k] = {k2: (mk(s) if k2 == "w" else
                                   np.zeros(s, np.float32))
                              for k2, s in v.items()}
                elif "ln" in k or "norm" in k:
                    out[k] = np.ones(v, np.float32)
                elif k == "e_bias":
                    out[k] = np.zeros(v, np.float32)
                else:
                    out[k] = mk(v)
            return out

        params = {
            "embed": {"w": mk((a.vocab_size, a.hidden_size))},
            "final_ln": np.ones((a.hidden_size,), np.float32),
            "lm_head": {"w": mk((a.hidden_size, a.vocab_size))},
        }
        for name, n, moe in self._stack_splits():
            params[name] = build(self._stack_shapes(n, moe))
        return params

    def load_weights(self, weights_iter) -> dict:
        a = self.args
        np_dtype = _np_dtype(self.model_config.dtype)

        def alloc(shapes):
            out: dict[str, Any] = {}
            for k, v in shapes.items():
                if isinstance(v, dict):
                    out[k] = {k2: np.zeros(s, np_dtype)
                              for k2, s in v.items()}
                else:
                    out[k] = np.zeros(v, np_dtype)
            return out

        params: dict[str, Any] = {
            "embed": {"w": np.zeros((a.vocab_size, a.hidden_size),
                                    np_dtype)},
            "final_ln": np.zeros((a.hidden_size,), np_dtype),
            "lm_head": {"w": np.zeros((a.hidden_size, a.vocab_size),
                                      np_dtype)},
        }
        splits = self._stack_splits()
        for name, n, moe in splits:
            params[name] = alloc(self._stack_shapes(n, moe))

        def dest(gli: int):
            off = 0
            for name, n, _moe in splits:
                if gli < off + n:
                    return params[name], gli - off
                off += n
            raise ValueError(f"layer {gli} out of range")

        nq, nk, d = a.num_heads, a.num_kv_heads, a.head_dim
        mi, I = self.moe_inter, a.intermediate_size
        si = mi * self.n_shared if self.n_shared else 0
        qkv_off = {"q": 0, "k": nq * d, "v": (nq + nk) * d}
        seen_lm_head = False
        for name, w in weights_iter:
            w = np.asarray(w)
            if name == "model.embed_tokens.weight":
                params["embed"]["w"][...] = w.astype(np_dtype)
                continue
            if name == "model.norm.weight":
                params["final_ln"][...] = w.astype(np_dtype)
                continue
            if name == "lm_head.weight":
                params["lm_head"]["w"][...] = w.T.astype(np_dtype)
                seen_lm_head = True
                continue
            if not name.startswith("model.layers."):
                continue
            li_s, suffix = name[len("model.layers."):].split(".", 1)
            stack, li = dest(int(li_s))

            if suffix == "input_layernorm.weight":
                stack["input_ln"][li] = w.astype(np_dtype)
            elif suffix == "post_attention_layernorm.weight":
                stack["post_ln"][li] = w.astype(np_dtype)
            elif suffix in ("self_attn.q_proj.weight",
                            "self_attn.k_proj.weight",
                            "self_attn.v_proj.weight"):
                part = suffix[len("self_attn."):len("self_attn.") + 1]
                start = qkv_off[part]
                stack["qkv"]["w"][li, :, start:start + w.shape[0]] = \
                    w.T.astype(np_dtype)
            elif suffix in ("self_attn.q_proj.bias",
                            "self_attn.k_proj.bias",
                            "self_attn.v_proj.bias"):
                part = suffix[len("self_attn."):len("self_attn.") + 1]
                start = qkv_off[part]
                stack["qkv"]["b"][li, start:start + w.shape[0]] = \
                    w.astype(np_dtype)
            elif suffix == "self_attn.o_proj.weight":
                stack["o"]["w"][li] = w.T.astype(np_dtype)
            elif suffix == "self_attn.q_norm.weight":
                stack["q_norm"][li] = w.astype(np_dtype)
            elif suffix == "self_attn.k_norm.weight":
                stack["k_norm"][li] = w.astype(np_dtype)
            elif suffix == "mlp.gate_proj.weight":
                stack["gate_up"]["w"][li, :, :I] = w.T.astype(np_dtype)
            elif suffix == "mlp.up_proj.weight":
                stack["gate_up"]["w"][li, :, I:] = w.T.astype(np_dtype)
            elif suffix == "mlp.down_proj.weight":
                stack["down"]["w"][li] = w.T.astype(np_dtype)
            elif suffix in ("mlp.gate.weight", "mlp.gate.wg.weight"):
                stack["router"]["w"][li] = w.T.astype(np_dtype)
            elif suffix in ("mlp.gate.e_score_correction_bias",
                            "mlp.moe_statics.e_score_correction_bias"):
                stack["e_bias"][li] = w.reshape(-1).astype(np_dtype)
            elif suffix.startswith("mlp.shared_experts."):
                part = suffix[len("mlp.shared_experts."):]
                if part == "gate_proj.weight":
                    stack["shared_gate_up"]["w"][li, :, :si] = \
                        w.T.astype(np_dtype)
                elif part == "up_proj.weight":
                    stack["shared_gate_up"]["w"][li, :, si:] = \
                        w.T.astype(np_dtype)
                elif part == "down_proj.weight":
                    stack["shared_down"]["w"][li] = w.T.astype(np_dtype)
            elif suffix.startswith("mlp.experts."):
                e_s, pname = suffix[len("mlp.experts."):].split(".", 1)
                e = int(e_s)
                if pname == "gate_proj.weight":
                    stack["experts_gate_up"][li, e, :, :mi] = \
                        w.T.astype(np_dtype)
                elif pname == "up_proj.weight":
                    stack["experts_gate_up"][li, e, :, mi:] = \
                        w.T.astype(np_dtype)
                elif pname == "down_proj.weight":
                    stack["experts_down"][li, e] = w.T.astype(np_dtype)
        if a.tie_embeddings and not seen_lm_head:
            params["lm_head"]["w"][...] = params["embed"]["w"].T
        return params


class Dots1ForCausalLM(GqaMoEForCausalLM):
    """dots.llm1 (reference: models/dots1.py): per-head-dim qk-norm,
    sigmoid routing with e-bias group top-k (DeepSeek-V3 style),
    optional shared experts, dense first_k layers."""

    def parse_args(self, hf) -> ModelArgs:
        args = ModelArgs.from_hf_config(hf)
        self.n_experts = int(hf.n_routed_experts)
        self.moe_top_k = int(hf.num_experts_per_tok)
        self.moe_inter = int(hf.moe_intermediate_size)
        self.n_shared = int(getattr(hf, "n_shared_experts", 0) or 0)
        self.first_k_dense = int(getattr(hf, "first_k_dense_replace", 0))
        self.last_k_dense = 0
        self.scoring = "sigmoid"
        self.topk_method = "noaux_tc"
        self.n_group = int(getattr(hf, "n_group", 1) or 1)
        self.topk_group = int(getattr(hf, "topk_group", 1) or 1)
        self.norm_topk_prob = bool(getattr(hf, "norm_topk_prob", False))
        self.routed_scaling = float(
            getattr(hf, "routed_scaling_factor", 1.0))
        lt = getattr(hf, "layer_types", None)
        if lt and any(t == "sliding_attention" for t in lt):
            raise NotImplementedError(
                "dots1 sliding-attention layer_types not supported")
        return dataclass_replace(args, qk_norm=True)


class Glm4MoeForCausalLM(Dots1ForCausalLM):
    """GLM-4.5 MoE (reference: models/glm4_moe.py): dots1 routing with
    partial rotary (partial_rotary_factor) and OPTIONAL qk-norm."""

    def parse_args(self, hf) -> ModelArgs:
        args = super().parse_args(hf)
        return dataclass_replace(
            args, qk_norm=bool(getattr(hf, "use_qk_norm", False)),
            attn_bias=bool(getattr(hf, "attention_bias", False)),
            o_bias=False)


class Ernie45MoeForCausalLM(GqaMoEForCausalLM):
    """ERNIE 4.5 MoE (reference: models/ernie45_moe.py): GLM-interleaved
    rope, softmax routing with the moe_statics e-score bias applied to
    the softmaxed probabilities at selection, shared experts, dense
    layers outside [moe_layer_start_index, moe_layer_end_index]."""

    def parse_args(self, hf) -> ModelArgs:
        args = ModelArgs.from_hf_config(hf)
        L = hf.num_hidden_layers
        self.n_experts = int(hf.moe_num_experts)
        self.moe_top_k = int(hf.moe_k)
        self.moe_inter = int(hf.moe_intermediate_size)
        self.n_shared = int(getattr(hf, "moe_num_shared_experts", 0) or 0)
        start = int(getattr(hf, "moe_layer_start_index", 0))
        end = int(getattr(hf, "moe_layer_end_index", L - 1))
        interval = int(getattr(hf, "moe_layer_interval", 1))
        if interval != 1:
            raise NotImplementedError("moe_layer_interval != 1")
        self.first_k_dense = start
        self.last_k_dense = L - 1 - end
        self.scoring = "softmax"
        self.topk_method = "noaux_tc"  # select on probs + e-bias
        self.n_group = 1
        self.topk_group = 1
        self.norm_topk_prob = True
        self.routed_scaling = 1.0
        if bool(getattr(hf, "use_bias", False)):
            raise NotImplementedError("ernie45-moe use_bias projections")
        rope = dataclass_replace(args.rope, is_neox_style=False)
        return dataclass_replace(args, rope=rope)


class DeepseekForCausalLM(GqaMoEForCausalLM):
    """DeepSeek V1 MoE (reference: models/deepseek.py): standard GQA/MHA
    llama attention with softmax greedy top-k routing (no e-bias, no
    group limits), shared experts, and a dense prefix
    (``first_k_dense_replace``). Only ``moe_layer_freq == 1`` layouts
    are supported (every published V1 MoE checkpoint uses 1)."""

    def parse_args(self, hf) -> ModelArgs:
        args = ModelArgs.from_hf_config(hf)
        if int(getattr(hf, "moe_layer_freq", 1)) != 1:
            raise NotImplementedError("deepseek moe_layer_freq != 1")
        self.n_experts = int(hf.n_routed_experts)
        self.moe_top_k = int(hf.num_experts_per_tok)
        self.moe_inter = int(hf.moe_intermediate_size)
        self.n_shared = int(getattr(hf, "n_shared_experts", 0) or 0)
        self.first_k_dense = int(getattr(hf, "first_k_dense_replace", 1))
        self.last_k_dense = 0
        self.scoring = "softmax"
        self.topk_method = "greedy"
        self.n_group = 1
        self.topk_group = 1
        self.norm_topk_prob = bool(getattr(hf, "norm_topk_prob", False))
        self.routed_scaling = 1.0
        return args


class BailingMoeForCausalLM(GqaMoEForCausalLM):
    """inclusionAI Ling / BailingMoe (reference: models/bailing_moe.py):
    GQA attention with one fused ``attention.query_key_value``
    projection, softmax greedy routing (renormalize per
    ``norm_topk_prob``), shared experts, every layer MoE. Checkpoint
    names ride the GqaMoE loader via a name adapter."""

    def parse_args(self, hf) -> ModelArgs:
        args = ModelArgs.from_hf_config(hf)
        self.n_experts = int(hf.num_experts)
        self.moe_top_k = int(hf.num_experts_per_tok)
        self.moe_inter = int(hf.moe_intermediate_size)
        self.n_shared = int(getattr(hf, "num_shared_experts", 0) or 0)
        self.first_k_dense = int(getattr(hf, "first_k_dense_replace", 0))
        self.last_k_dense = 0
        self.scoring = "softmax"
        self.topk_method = "greedy"
        self.n_group = 1
        self.topk_group = 1
        self.norm_topk_prob = bool(getattr(hf, "norm_topk_prob", True))
        self.routed_scaling = 1.0
        if bool(getattr(hf, "use_bias", False)):
            # the GqaMoE stack has no o/mlp bias slots
            raise NotImplementedError("bailing_moe use_bias projections")
        return dataclass_replace(
            args,
            attn_bias=bool(getattr(hf, "use_qkv_bias", False)))

    def load_weights(self, weights_iter):
        a = self.args
        nq, nk, d = a.num_heads, a.num_kv_heads, a.head_dim

        def adapt(it):
            for name, w in it:
                if name == "model.word_embeddings.weight":
                    yield "model.embed_tokens.weight", w
                elif name.endswith("attention.query_key_value.weight") \
                        or name.endswith("attention.query_key_value.bias"):
                    w = np.asarray(w)
                    base = name[:name.rindex("attention.")] + "self_attn."
                    sfx = name.rsplit(".", 1)[1]
                    q, k, v = np.split(w, [nq * d, (nq + nk) * d])
                    yield base + "q_proj." + sfx, q
                    yield base + "k_proj." + sfx, k
                    yield base + "v_proj." + sfx, v
                elif name.endswith("attention.dense.weight"):
                    yield name.replace("attention.dense.",
                                       "self_attn.o_proj."), w
                elif name.endswith("attention.dense.bias"):
                    yield name.replace("attention.dense.",
                                       "self_attn.o_proj."), w
                else:
                    yield name, w

        return super().load_weights(adapt(weights_iter))
