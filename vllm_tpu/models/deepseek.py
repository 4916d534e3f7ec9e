"""DeepSeek V2/V3 family — Multi-head Latent Attention + fine-grained MoE
(reference behavior parity: vllm/model_executor/models/deepseek_v2.py;
architecture re-derived for TPU).

MLA is served in the ABSORBED form end-to-end: the paged KV cache stores
only the rank-compressed latent c_kv (kv_lora_rank) plus the shared
rotary key k_pe per token, as a single-KV-head cache of width
kv_lora_rank + qk_rope_head_dim. Queries are projected into latent space
(q_nope @ W_UK per head) so attention runs directly against the latent
cache, and the output latent is expanded with W_UV afterwards — decode
reads ~576 instead of ~16k bytes per token of context.

MoE: first_k_dense_replace dense layers run as their own stacked scan,
then the MoE stack; routing supports softmax (V2) and sigmoid +
e_score_correction_bias with node-limited group top-k (V3), shared
experts, routed_scaling_factor.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vllm_tpu.core.kv_cache_interface import KVCacheSpec
from vllm_tpu.models.llama import LlamaForCausalLM, ModelArgs, _np_dtype
from vllm_tpu.ops.activation import GATED_ACTIVATIONS
from vllm_tpu.ops.attention import AttentionMetadata
from vllm_tpu.ops.layernorm import rms_norm
from vllm_tpu.ops.linear import linear
from vllm_tpu.ops.moe import fused_moe, topk_routing
from vllm_tpu.ops.rotary import apply_rope


def deepseek_routing(router_logits: jnp.ndarray, top_k: int,
                     scoring: str, e_bias: Optional[jnp.ndarray],
                     n_group: int, topk_group: int, topk_method: str,
                     norm_topk_prob: bool,
                     routed_scaling_factor: float
                     ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """DeepSeek router (reference: deepseek_v2.py grouped_topk /
    noaux_tc); returns (weights [T,K] f32, ids [T,K] i32)."""
    logits = router_logits.astype(jnp.float32)
    if scoring == "sigmoid":
        scores = jax.nn.sigmoid(logits)
    else:
        scores = jax.nn.softmax(logits, axis=-1)
    select = scores if e_bias is None else scores + e_bias

    if topk_method in ("group_limited_greedy", "noaux_tc") and n_group > 1:
        T, E = select.shape
        g = select.reshape(T, n_group, E // n_group)
        if topk_method == "noaux_tc":
            top2 = jax.lax.top_k(g, min(2, E // n_group))[0]
            group_scores = top2.sum(axis=-1)  # [T, n_group]
        else:
            group_scores = g.max(axis=-1)
        _, top_groups = jax.lax.top_k(group_scores, topk_group)
        group_mask = jnp.zeros((T, n_group), bool).at[
            jnp.arange(T)[:, None], top_groups].set(True)
        select = jnp.where(
            jnp.repeat(group_mask, E // n_group, axis=1), select,
            -jnp.inf)

    _, ids = jax.lax.top_k(select, top_k)
    weights = jnp.take_along_axis(scores, ids, axis=-1)
    if norm_topk_prob:
        weights = weights / jnp.maximum(
            weights.sum(axis=-1, keepdims=True), 1e-20)
    return weights * routed_scaling_factor, ids.astype(jnp.int32)


class DeepseekV2ForCausalLM(LlamaForCausalLM):

    # MLA latent cache, not the standard [L, N, 2K, page, D] layout —
    # the loader's per-kv-head scale calibration does not apply.
    kv_scale_calibration = False

    def kv_slab_plan(self, num_layers, layer_bytes):
        # dense/moe split scans index the stacked latent cache with a
        # global offset; not yet adapted to KVSlabs
        return None

    def parse_args(self, hf) -> ModelArgs:
        self.qk_nope = int(getattr(hf, "qk_nope_head_dim", 128))
        self.qk_rope = int(getattr(hf, "qk_rope_head_dim", 64))
        self.v_head = int(getattr(hf, "v_head_dim", 128))
        self.kv_lora = int(getattr(hf, "kv_lora_rank", 512))
        self.q_lora = getattr(hf, "q_lora_rank", None)
        self.q_lora = int(self.q_lora) if self.q_lora else None
        self.n_experts = getattr(hf, "n_routed_experts", None)
        self.n_shared = int(getattr(hf, "n_shared_experts", 0) or 0)
        self.moe_top_k = int(getattr(hf, "num_experts_per_tok", 0) or 0)
        self.moe_inter = int(getattr(hf, "moe_intermediate_size", 0) or 0)
        self.first_k_dense = int(getattr(hf, "first_k_dense_replace", 0))
        if self.n_experts is None:
            self.first_k_dense = hf.num_hidden_layers
        self.scoring = getattr(hf, "scoring_func", None) or "softmax"
        self.topk_method = getattr(hf, "topk_method", None) or "greedy"
        self.n_group = int(getattr(hf, "n_group", 1) or 1)
        self.topk_group = int(getattr(hf, "topk_group", 1) or 1)
        self.norm_topk_prob = bool(getattr(hf, "norm_topk_prob", False))
        self.routed_scaling = float(
            getattr(hf, "routed_scaling_factor", 1.0))

        q_head_dim = self.qk_nope + self.qk_rope
        args = ModelArgs.from_hf_config(hf)
        # rope over the shared k_pe only
        from dataclasses import replace as dc_replace

        rope = dc_replace(args.rope, head_size=self.qk_rope,
                          rotary_dim=self.qk_rope, is_neox_style=False)
        args = dc_replace(args, head_dim=q_head_dim, rope=rope)

        # softmax scale with yarn mscale_all_dim correction
        # (reference: deepseek_v2.py:~DeepseekV2Attention softmax_scale)
        scale = q_head_dim ** -0.5
        s = getattr(hf, "rope_scaling", None)
        self._rope_ratio_mscale = 1.0
        if s and s.get("type", s.get("rope_type")) == "yarn":
            factor = float(s.get("factor", 1.0))

            def yarn_mscale(scale_f, m):
                return (0.1 * m * math.log(scale_f) + 1.0
                        if scale_f > 1 and m else 1.0)

            m_all = float(s.get("mscale_all_dim", 0) or 0)
            m = float(s.get("mscale", 1.0) or 1.0)
            ms = yarn_mscale(factor, m_all)
            scale = scale * ms * ms
            self._rope_ratio_mscale = (yarn_mscale(factor, m) /
                                       yarn_mscale(factor, m_all))
        self._softmax_scale = scale
        return args

    def __init__(self, model_config, args=None) -> None:
        super().__init__(model_config, args)
        self.scale = self._softmax_scale
        # our yarn computes a generic attn-factor mscale for cos/sin;
        # deepseek uses the mscale/mscale_all_dim ratio instead
        self.rope_mscale = self._rope_ratio_mscale

    # --------------------------------------------------------------- fwd

    @property
    def latent_dim(self) -> int:
        return self.kv_lora + self.qk_rope

    @property
    def latent_dim_padded(self) -> int:
        # Mosaic DMA slices need 128-aligned lane dims; the padded tail
        # is zeros in both q and cache so the score dot is unchanged.
        d = self.latent_dim
        return d + (-d) % 128

    def forward(self, params, input_ids, kv_caches, metadata, lora=None):
        x = self.embed(params, input_ids)
        kv = kv_caches[0]
        kd = self.first_k_dense
        if kd > 0:
            x, kv = self._scan_stack(params["dense_layers"], kv, x,
                                     metadata, moe=False, offset=0)
        if kd < self.args.num_layers:
            x, kv = self._scan_stack(params["layers"], kv, x, metadata,
                                     moe=self.n_experts is not None,
                                     offset=kd)
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
        return x, kv_full

    def _layer(self, lp, x, kv, li, li_kv, metadata, moe: bool):
        args = self.args
        rm = (jnp.asarray(args.residual_multiplier, x.dtype)
              if args.residual_multiplier else None)
        h = rms_norm(x, lp["input_ln"][li], args.rms_eps)
        attn_out, kv = self._mla(lp, h, kv, li, li_kv, metadata)
        x = x + (attn_out if rm is None else attn_out * rm)
        h = rms_norm(x, lp["post_ln"][li], args.rms_eps)
        if moe:
            ffw = self._moe_ffw(lp, h, li)
        else:
            gate_up = linear(h, lp["gate_up"], layer=li)
            ffw = linear(GATED_ACTIVATIONS[args.act](gate_up), lp["down"],
                         layer=li)
        return x + (ffw if rm is None else ffw * rm), kv

    def _mla(self, lp, h, kv, li, li_kv, metadata):
        args = self.args
        T = h.shape[0]
        nh = args.num_heads
        nope, rope, v_h = self.qk_nope, self.qk_rope, self.v_head

        if self.q_lora:
            q_c = rms_norm(linear(h, lp["q_a"], layer=li),
                           lp["q_a_ln"][li], args.rms_eps)
            q = linear(q_c, lp["q_b"], layer=li)
        else:
            q = linear(h, lp["q"], layer=li)
        q = q.reshape(T, nh, nope + rope)
        q_nope, q_pe = q[..., :nope], q[..., nope:]

        kv_a = linear(h, lp["kv_a"], layer=li)  # [T, kv_lora + rope]
        c = rms_norm(kv_a[:, :self.kv_lora], lp["kv_a_ln"][li],
                     args.rms_eps)
        k_pe = kv_a[:, self.kv_lora:].reshape(T, 1, rope)

        q_pe, k_pe = apply_rope(q_pe, k_pe, metadata.positions,
                                self.inv_freq,
                                args.rope.is_neox_style,
                                self.rope_mscale)

        # latent-space queries: q_abs = q_nope @ W_UK  [T, nh, kv_lora]
        q_abs = jnp.einsum("thn,hnk->thk", q_nope,
                           lp["wk_t"][li].astype(q_nope.dtype))
        q_eff = jnp.concatenate([q_abs, q_pe], axis=-1)  # [T, nh, D]

        from vllm_tpu.ops.pallas.mla_attention import (mla_paged_attention,
                                                       write_mla_cache)

        # single-copy latent cache: one D-wide row per token; V is the
        # kv_lora prefix of K (MLASpec — half the bytes of K+V). Both q
        # and the cached rows zero-pad D up to a 128 multiple (Mosaic
        # DMA lane alignment); zeros contribute nothing to the dot.
        Dp = self.latent_dim_padded
        pad = Dp - self.latent_dim
        k_cat = jnp.concatenate([c, k_pe.reshape(T, rope)], axis=-1)
        if pad:
            k_cat = jnp.pad(k_cat, ((0, 0), (0, pad)))
            q_eff = jnp.pad(q_eff, ((0, 0), (0, 0), (0, pad)))
        kv = write_mla_cache(kv, k_cat, metadata.slot_mapping,
                             layer=li_kv)

        latent = mla_paged_attention(q_eff, kv, metadata, self.scale,
                                     v_dim=self.kv_lora,
                                     layer=li_kv)  # [T, nh, kv_lora]
        out = jnp.einsum("thk,hkv->thv", latent,
                         lp["wv"][li].astype(latent.dtype))
        return linear(out.reshape(T, nh * v_h), lp["o"], layer=li), kv

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
            out = out + linear(GATED_ACTIVATIONS[self.args.act](gate_up),
                               lp["shared_down"], layer=li)
        return out

    # ------------------------------------------------------------ kv spec

    def get_kv_cache_specs(self, block_size: int,
                           cache_dtype: str) -> dict[str, KVCacheSpec]:
        # single-copy latent cache (V aliases K's kv_lora prefix);
        # served by the dedicated Pallas MLA kernel
        from vllm_tpu.core.kv_cache_interface import MLASpec

        return {
            f"layers.{i}": MLASpec(block_size=block_size,
                                   num_kv_heads=1,
                                   head_size=self.latent_dim_padded,
                                   dtype=cache_dtype)
            for i in range(self.args.num_layers)
        }

    # ------------------------------------------------------------ weights

    def _stack_shapes(self, num_layers: int, moe: bool) -> dict:
        a = self.args
        H = a.hidden_size
        nh = a.num_heads
        nope, rope, v_h = self.qk_nope, self.qk_rope, self.v_head
        shapes: dict[str, Any] = {
            "input_ln": (num_layers, H),
            "post_ln": (num_layers, H),
            "kv_a": {"w": (num_layers, H, self.kv_lora + rope)},
            "kv_a_ln": (num_layers, self.kv_lora),
            "wk_t": (num_layers, nh, nope, self.kv_lora),
            "wv": (num_layers, nh, self.kv_lora, v_h),
            "o": {"w": (num_layers, nh * v_h, H)},
        }
        if self.q_lora:
            shapes["q_a"] = {"w": (num_layers, H, self.q_lora)}
            shapes["q_a_ln"] = (num_layers, self.q_lora)
            shapes["q_b"] = {"w": (num_layers, self.q_lora,
                                   nh * (nope + rope))}
        else:
            shapes["q"] = {"w": (num_layers, H, nh * (nope + rope))}
        if moe:
            E, mi = self.n_experts, self.moe_inter
            shapes["router"] = {"w": (num_layers, H, E)}
            if self.topk_method == "noaux_tc":
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

    def init_dummy_params(self, seed: int = 0) -> dict:
        rng = np.random.default_rng(seed)
        a = self.args

        def mk(shape):
            if len(shape) <= 2 and "ln" not in "":
                pass
            if len(shape) == 1 or (len(shape) == 2 and
                                   shape[-1] <= a.hidden_size * 4):
                # per-layer norm vectors
                return np.ones(shape, np.float32)
            return (rng.standard_normal(shape).astype(np.float32) *
                    (0.6 / np.sqrt(shape[-2] if len(shape) > 1 else 1)))

        def build(shapes):
            out = {}
            for k, v in shapes.items():
                if isinstance(v, dict):
                    out[k] = {"w": mk(v["w"])}
                elif "ln" in k or k == "e_bias":
                    out[k] = (np.ones(v, np.float32) if "ln" in k else
                              np.zeros(v, np.float32))
                else:
                    out[k] = mk(v)
            return out

        kd = self.first_k_dense
        params = {
            "embed": {"w": mk((a.vocab_size, a.hidden_size))},
            "final_ln": np.ones((a.hidden_size,), np.float32),
            "lm_head": {"w": mk((a.hidden_size, a.vocab_size))},
        }
        if kd > 0:
            params["dense_layers"] = build(self._stack_shapes(kd, False))
        if kd < a.num_layers:
            params["layers"] = build(
                self._stack_shapes(a.num_layers - kd,
                                   self.n_experts is not None))
        return params

    def load_weights(self, weights_iter) -> dict:
        a = self.args
        np_dtype = _np_dtype(self.model_config.dtype)
        kd = self.first_k_dense
        nh = a.num_heads
        nope, v_h = self.qk_nope, self.v_head

        def alloc(shapes):
            out: dict[str, Any] = {}
            for k, v in shapes.items():
                if isinstance(v, dict):
                    out[k] = {"w": np.zeros(v["w"], np_dtype)}
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
        if kd > 0:
            params["dense_layers"] = alloc(self._stack_shapes(kd, False))
        if kd < a.num_layers:
            params["layers"] = alloc(
                self._stack_shapes(a.num_layers - kd,
                                   self.n_experts is not None))

        def dest(li: int):
            if li < kd:
                return params["dense_layers"], li
            return params["layers"], li - kd

        mi = self.moe_inter
        I = a.intermediate_size
        si = mi * self.n_shared if self.n_shared else 0
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
            rest = name[len("model.layers."):]
            li_s, suffix = rest.split(".", 1)
            stack, li = dest(int(li_s))

            if suffix == "input_layernorm.weight":
                stack["input_ln"][li] = w.astype(np_dtype)
            elif suffix == "post_attention_layernorm.weight":
                stack["post_ln"][li] = w.astype(np_dtype)
            elif suffix == "self_attn.q_proj.weight":
                stack["q"]["w"][li] = w.T.astype(np_dtype)
            elif suffix == "self_attn.q_a_proj.weight":
                stack["q_a"]["w"][li] = w.T.astype(np_dtype)
            elif suffix == "self_attn.q_a_layernorm.weight":
                stack["q_a_ln"][li] = w.astype(np_dtype)
            elif suffix == "self_attn.q_b_proj.weight":
                stack["q_b"]["w"][li] = w.T.astype(np_dtype)
            elif suffix == "self_attn.kv_a_proj_with_mqa.weight":
                stack["kv_a"]["w"][li] = w.T.astype(np_dtype)
            elif suffix == "self_attn.kv_a_layernorm.weight":
                stack["kv_a_ln"][li] = w.astype(np_dtype)
            elif suffix == "self_attn.kv_b_proj.weight":
                # [(nh*(nope+v)), kv_lora] -> absorbed W_UK / W_UV
                wb = w.reshape(nh, nope + v_h, self.kv_lora)
                stack["wk_t"][li] = wb[:, :nope, :].astype(np_dtype)
                stack["wv"][li] = wb[:, nope:, :].transpose(0, 2, 1) \
                    .astype(np_dtype)
            elif suffix == "self_attn.o_proj.weight":
                stack["o"]["w"][li] = w.T.astype(np_dtype)
            elif suffix == "mlp.gate_proj.weight":
                stack["gate_up"]["w"][li, :, :I] = w.T.astype(np_dtype)
            elif suffix == "mlp.up_proj.weight":
                stack["gate_up"]["w"][li, :, I:] = w.T.astype(np_dtype)
            elif suffix == "mlp.down_proj.weight":
                stack["down"]["w"][li] = w.T.astype(np_dtype)
            elif suffix == "mlp.gate.weight":
                stack["router"]["w"][li] = w.T.astype(np_dtype)
            elif suffix == "mlp.gate.e_score_correction_bias":
                stack["e_bias"][li] = w.astype(np_dtype)
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
                part = suffix[len("mlp.experts."):]
                e_s, pname = part.split(".", 1)
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


class DeepseekV3ForCausalLM(DeepseekV2ForCausalLM):
    """V3: sigmoid scoring + aux-free group-limited routing with
    e_score_correction_bias (reference: deepseek_v2.py handles both)."""

    def parse_args(self, hf) -> ModelArgs:
        args = super().parse_args(hf)
        self.scoring = getattr(hf, "scoring_func", None) or "sigmoid"
        self.topk_method = getattr(hf, "topk_method", None) or "noaux_tc"
        return args


class MiniCPM3ForCausalLM(DeepseekV2ForCausalLM):
    """MiniCPM3 (reference: models/minicpm3.py): MLA attention in the
    DeepSeek-V2 layout (q/kv low-rank projections, shared rope key)
    combined with MiniCPM's muP scalings — embeddings x scale_emb,
    residual branches x scale_depth/sqrt(L), logits x
    dim_model_base/hidden. Dense MLP (no MoE); NEOX-style rotary over
    the rope dims (DeepSeek itself uses the interleaved style)."""

    def parse_args(self, hf) -> "ModelArgs":
        from dataclasses import replace as dc_replace

        args = super().parse_args(hf)
        rope = dc_replace(args.rope, is_neox_style=True)
        return dc_replace(
            args,
            rope=rope,
            embedding_multiplier=float(getattr(hf, "scale_emb", 1.0)),
            residual_multiplier=float(getattr(hf, "scale_depth", 1.0)) /
            float(hf.num_hidden_layers) ** 0.5,
            logits_scale=float(getattr(hf, "dim_model_base",
                                       hf.hidden_size)) / hf.hidden_size,
        )
