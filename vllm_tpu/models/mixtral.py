"""Mixtral-style MoE causal LM (reference parity:
vllm/model_executor/models/mixtral.py; built on the Llama skeleton with
the MLP swapped for fused MoE)."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from vllm_tpu.models.llama import LlamaForCausalLM, ModelArgs, \
    dataclass_replace
from vllm_tpu.ops.attention import AttentionMetadata
from vllm_tpu.ops.layernorm import rms_norm
from vllm_tpu.ops.linear import linear
from vllm_tpu.ops.moe import fused_moe, fused_moe_ep, topk_routing


class MixtralForCausalLM(LlamaForCausalLM):

    def parse_args(self, hf) -> ModelArgs:
        args = ModelArgs.from_hf_config(hf)
        self.num_experts = int(getattr(hf, "num_local_experts", 8))
        self.top_k = int(getattr(hf, "num_experts_per_tok", 2))
        self.moe_intermediate = int(
            getattr(hf, "intermediate_size", args.intermediate_size))
        return args

    # ---- forward: the MoE replaces the gated MLP via the llama base's
    # _mlp hook; attention stays the shared LlamaForCausalLM layer.

    def _mlp(self, lp: dict, h: jnp.ndarray, li, lora_ctx=None):
        router_logits = linear(h, lp["router"], layer=li)
        weights, expert_ids = self._route(router_logits)
        if getattr(self, "eplb_enabled", False):
            # redundancy-aware routing: logical -> physical slot via
            # the device-resident placement tables (reference:
            # eplb_state.py wired into the MoE layer), plus the
            # in-graph per-layer load counts the engine loop records
            from vllm_tpu.distributed.eplb.rebalance_execute import \
                map_to_physical

            T = h.shape[0]
            token_idx = jnp.arange(T, dtype=jnp.int32)
            expert_ids = map_to_physical(
                expert_ids, token_idx, lp["eplb_log2phy"],
                lp["eplb_logcnt"], layer=li)
            if self._eplb_stats is not None:
                counts = jnp.bincount(
                    expert_ids.reshape(-1),
                    length=self.num_physical_experts).astype(jnp.int32)
                self._eplb_stats = self._eplb_stats.at[li].set(counts)
        lp_l = {k2: jax.tree.map(lambda leaf: leaf[li], v2)
                for k2, v2 in lp.items()
                if k2.startswith("experts")}
        return self._moe(h, lp_l, weights, expert_ids, self.args.act)

    def _route(self, router_logits):
        return topk_routing(router_logits, self.top_k, renormalize=True)

    def _moe(self, h, lp, weights, expert_ids, act):
        """EP-sharded when expert parallelism is enabled, else dense
        grouped GEMM over all resident experts."""
        if getattr(self, "ep_enabled", False) and \
                getattr(self, "mesh", None) is not None:
            return fused_moe_ep(h, lp["experts_gate_up"],
                                lp["experts_down"], weights, expert_ids,
                                act=act, mesh=self.mesh)
        return fused_moe(h, lp["experts_gate_up"], lp["experts_down"],
                         weights, expert_ids, act=act)

    # ------------------------------------------------------------- EPLB

    def _init_eplb_stats(self):
        if not getattr(self, "eplb_enabled", False):
            return None
        return jnp.zeros((self.args.num_layers,
                          self.num_physical_experts), jnp.int32)

    def init_eplb(self, params: dict, parallel_config):
        """Enable EPLB serving: expand the logical expert stacks to
        physical slots, install the routing tables as (small) params,
        and hand back the host-side state machine (reference:
        vllm/distributed/eplb/eplb_state.py build + model wiring)."""
        from vllm_tpu.distributed.eplb.eplb_state import (EplbConfig,
                                                          EplbState)
        from vllm_tpu.distributed.eplb.rebalance_execute import \
            expand_to_physical

        pc = parallel_config
        ep_ranks = 1
        if getattr(self, "ep_enabled", False) and \
                getattr(self, "mesh", None) is not None:
            from vllm_tpu.parallel.mesh import EP_AXES
            for a in EP_AXES:
                ep_ranks *= self.mesh.shape[a]
        state = EplbState(
            num_layers=self.args.num_layers,
            num_logical=self.num_experts,
            config=EplbConfig(
                window_size=pc.eplb_window_size,
                step_interval=pc.eplb_step_interval,
                num_redundant_experts=pc.eplb_num_redundant_experts,
                log_balancedness=pc.eplb_log_balancedness),
            num_ranks=ep_ranks)
        self.eplb_enabled = True
        self.num_physical_experts = state.num_physical
        stacks = {k: v for k, v in params["layers"].items()
                  if k.startswith("experts")}
        params["layers"].update(
            expand_to_physical(stacks, state.phy2log))
        self.install_eplb_tables(params, state)
        return params, state

    def install_eplb_tables(self, params: dict, state) -> None:
        """(Re)upload the placement tables, padded to the static
        max-replica width so rearrangements never change shapes."""
        l2p, logcnt = state.physical_routing_tables()
        width = state.config.num_redundant_experts + 1
        pad = width - l2p.shape[-1]
        if pad > 0:
            l2p = np.concatenate(
                [l2p, np.repeat(l2p[..., :1], pad, axis=-1)], axis=-1)
        params["layers"]["eplb_log2phy"] = jnp.asarray(
            l2p[..., :width], jnp.int32)
        params["layers"]["eplb_logcnt"] = jnp.asarray(logcnt, jnp.int32)

    # ---- weights

    def _alloc_layer_stack(self, np_dtype) -> dict:
        # llama alloc (handles attn_bias / qk_norm) with the dense MLP
        # swapped for router + expert-stacked weights
        layers = super()._alloc_layer_stack(np_dtype)
        del layers["gate_up"]
        del layers["down"]
        a = self.args
        L, H = a.num_layers, a.hidden_size
        I = self.moe_intermediate
        E = self.num_experts
        layers["router"] = {"w": np.empty((L, H, E), np_dtype)}
        layers["experts_gate_up"] = np.empty((L, E, H, 2 * I), np_dtype)
        layers["experts_down"] = np.empty((L, E, I, H), np_dtype)
        return layers

    def _hf_layer_map(self):
        m = super()._hf_layer_map()
        # Mixtral: block_sparse_moe.gate + experts.N.w{1,2,3}
        m["block_sparse_moe.gate.weight"] = ("router.w", "", True)
        for e in range(self.num_experts):
            # w1 = gate, w3 = up, w2 = down
            m[f"block_sparse_moe.experts.{e}.w1.weight"] = (
                f"experts_gate_up@{e}", "gate", True)
            m[f"block_sparse_moe.experts.{e}.w3.weight"] = (
                f"experts_gate_up@{e}", "up", True)
            m[f"block_sparse_moe.experts.{e}.w2.weight"] = (
                f"experts_down@{e}", "", True)
        return m

    def load_weights(self, weights_iter):
        """Extends the Llama loader with expert-indexed destinations
        (keys containing '@e')."""
        from vllm_tpu.models.llama import _np_dtype

        a = self.args
        np_dtype = _np_dtype(self.model_config.dtype)
        layers = self._alloc_layer_stack(np_dtype)
        params: dict[str, Any] = {
            "embed": {"w": np.empty((a.vocab_size, a.hidden_size),
                                    np_dtype)},
            "layers": layers,
            "final_ln": np.empty((a.hidden_size,), np_dtype),
            "lm_head": {"w": np.empty((a.hidden_size, a.vocab_size),
                                      np_dtype)},
        }
        lmap = self._hf_layer_map()
        prefix = self._LAYER_PREFIX + "."
        I = self.moe_intermediate
        seen_lm_head = False
        for name, w in weights_iter:
            w = np.asarray(w)
            if name == self._EMBED:
                params["embed"]["w"][...] = w.astype(np_dtype)
                continue
            if name == self._FINAL_NORM:
                params["final_ln"][...] = w.astype(np_dtype)
                continue
            if name == self._LM_HEAD:
                params["lm_head"]["w"][...] = w.T.astype(np_dtype)
                seen_lm_head = True
                continue
            if not name.startswith(prefix):
                continue
            layer_str, suffix = name[len(prefix):].split(".", 1)
            li = int(layer_str)
            entry = lmap.get(suffix)
            if entry is None:
                continue
            key, part, transpose = entry
            if transpose:
                w = w.T
            if part == "granite_in":
                # HF [E, 2I, H] fused gate|up -> [E, H, 2I]
                layers[key][li] = w.transpose(0, 2, 1).astype(np_dtype)
                continue
            if part == "granite_out":
                # HF [E, H, I] -> [E, I, H]
                layers[key][li] = w.transpose(0, 2, 1).astype(np_dtype)
                continue
            if "@" in key:
                base, e = key.split("@")
                e = int(e)
                if base == "experts_gate_up":
                    start = 0 if part == "gate" else I
                    layers[base][li, e, :, start:start + I] = \
                        w.astype(np_dtype)
                else:
                    layers[base][li, e] = w.astype(np_dtype)
            else:
                dest: Any = layers
                *path, leaf = key.split(".")
                for p_ in path:
                    dest = dest[p_]
                if part:
                    start, length = self._fused_offset(part)
                    if leaf == "b":  # fused bias is [L, dim]
                        dest[leaf][li, start:start + length] = \
                            w.astype(np_dtype)
                    else:
                        dest[leaf][li, :, start:start + length] = \
                            w.astype(np_dtype)
                else:
                    dest[leaf][li] = w.astype(np_dtype)
        if a.tie_embeddings and not seen_lm_head:
            params["lm_head"]["w"][...] = params["embed"]["w"].T
        return params


class Qwen2MoeForCausalLM(MixtralForCausalLM):
    """Qwen1.5/2-MoE (reference: models/qwen2_moe.py): Mixtral-style
    routed MoE plus an always-on shared expert whose output is scaled
    by a sigmoid ``shared_expert_gate``; router does NOT renormalize
    by default (``norm_topk_prob``)."""

    def parse_args(self, hf) -> ModelArgs:
        args = ModelArgs.from_hf_config(hf)
        args = dataclass_replace(args, attn_bias=True)
        self.num_experts = int(getattr(hf, "num_experts", 60))
        self.top_k = int(getattr(hf, "num_experts_per_tok", 4))
        self.moe_intermediate = int(
            getattr(hf, "moe_intermediate_size", 1408))
        self.shared_inter = int(
            getattr(hf, "shared_expert_intermediate_size", 0) or 0)
        self.norm_topk = bool(getattr(hf, "norm_topk_prob", False))
        return args

    def _route(self, router_logits):
        return topk_routing(router_logits, self.top_k,
                            renormalize=self.norm_topk)

    def _alloc_layer_stack(self, np_dtype) -> dict:
        layers = super()._alloc_layer_stack(np_dtype)
        if self.shared_inter:
            a = self.args
            L, H, S = a.num_layers, a.hidden_size, self.shared_inter
            layers["shared_gate_up"] = {"w": np.empty((L, H, 2 * S),
                                                      np_dtype)}
            layers["shared_down"] = {"w": np.empty((L, S, H), np_dtype)}
            layers["shared_gate"] = {"w": np.empty((L, H, 1), np_dtype)}
        return layers

    def _fused_offset(self, part: str) -> tuple[int, int]:
        if part in ("sgate", "sup"):
            S = self.shared_inter
            return (0, S) if part == "sgate" else (S, S)
        return super()._fused_offset(part)

    def _hf_layer_map(self):
        m = LlamaForCausalLM._hf_layer_map(self)
        m["mlp.gate.weight"] = ("router.w", "", True)
        if self.shared_inter:
            m["mlp.shared_expert.gate_proj.weight"] = (
                "shared_gate_up.w", "sgate", True)
            m["mlp.shared_expert.up_proj.weight"] = (
                "shared_gate_up.w", "sup", True)
            m["mlp.shared_expert.down_proj.weight"] = (
                "shared_down.w", "", True)
            m["mlp.shared_expert_gate.weight"] = (
                "shared_gate.w", "", True)
        for e in range(self.num_experts):
            m[f"mlp.experts.{e}.gate_proj.weight"] = (
                f"experts_gate_up@{e}", "gate", True)
            m[f"mlp.experts.{e}.up_proj.weight"] = (
                f"experts_gate_up@{e}", "up", True)
            m[f"mlp.experts.{e}.down_proj.weight"] = (
                f"experts_down@{e}", "", True)
        return m

    def _mlp(self, lp: dict, h: jnp.ndarray, li, lora_ctx=None):
        out = super()._mlp(lp, h, li, lora_ctx)
        if self.shared_inter:
            from vllm_tpu.ops.activation import GATED_ACTIVATIONS

            gate_up = linear(h, lp["shared_gate_up"], layer=li)
            shared = linear(GATED_ACTIVATIONS[self.args.act](gate_up),
                            lp["shared_down"], layer=li)
            gate = jax.nn.sigmoid(
                linear(h, lp["shared_gate"], layer=li).astype(
                    jnp.float32)).astype(out.dtype)
            out = out + gate * shared
        return out


class OlmoeForCausalLM(MixtralForCausalLM):
    """OLMoE (reference: models/olmoe.py): Mixtral-style MoE with
    FULL-WIDTH q/k RMSNorm applied before rope; router does not
    renormalize top-k weights."""

    def parse_args(self, hf) -> ModelArgs:
        args = ModelArgs.from_hf_config(hf)
        self.num_experts = int(getattr(hf, "num_experts", 64))
        self.top_k = int(getattr(hf, "num_experts_per_tok", 8))
        self.moe_intermediate = int(getattr(hf, "intermediate_size", 1024))
        self.norm_topk = bool(getattr(hf, "norm_topk_prob", False))
        return args

    def _alloc_layer_stack(self, np_dtype) -> dict:
        layers = super()._alloc_layer_stack(np_dtype)
        a = self.args
        L = a.num_layers
        layers["q_norm"] = np.empty((L, a.num_heads * a.head_dim),
                                    np_dtype)
        layers["k_norm"] = np.empty((L, a.num_kv_heads * a.head_dim),
                                    np_dtype)
        return layers

    def _hf_layer_map(self):
        m = LlamaForCausalLM._hf_layer_map(self)
        m["self_attn.q_norm.weight"] = ("q_norm", "", False)
        m["self_attn.k_norm.weight"] = ("k_norm", "", False)
        m["mlp.gate.weight"] = ("router.w", "", True)
        for e in range(self.num_experts):
            m[f"mlp.experts.{e}.gate_proj.weight"] = (
                f"experts_gate_up@{e}", "gate", True)
            m[f"mlp.experts.{e}.up_proj.weight"] = (
                f"experts_gate_up@{e}", "up", True)
            m[f"mlp.experts.{e}.down_proj.weight"] = (
                f"experts_down@{e}", "", True)
        return m

    def _route(self, router_logits):
        return topk_routing(router_logits, self.top_k,
                            renormalize=self.norm_topk)

    def _decoder_layer(self, lp, x, kv, li, metadata, lora_ctx=None,
                       **_cfg):
        args = self.args
        T = x.shape[0]
        nq, nk, d = args.num_heads, args.num_kv_heads, args.head_dim

        from vllm_tpu.ops.rotary import apply_rope

        h = rms_norm(x, lp["input_ln"][li], args.rms_eps)
        qkv = linear(h, lp["qkv"], layer=li)
        q, k, v = jnp.split(qkv, [nq * d, (nq + nk) * d], axis=-1)
        # full-projection-width q/k norm BEFORE the head split
        q = rms_norm(q, lp["q_norm"][li], args.rms_eps)
        k = rms_norm(k, lp["k_norm"][li], args.rms_eps)
        q = q.reshape(T, nq, d)
        k = k.reshape(T, nk, d)
        v = v.reshape(T, nk, d)
        q, k = apply_rope(q, k, metadata.positions, self.inv_freq,
                          args.rope.is_neox_style, self.rope_mscale)
        attn_out, kv = self._cached_attention(lp, li, q, k, v, kv,
                                              metadata)
        x = x + linear(attn_out.reshape(T, nq * d), lp["o"], layer=li)

        h = rms_norm(x, lp["post_ln"][li], args.rms_eps)
        return x + self._mlp(lp, h, li), kv


class GraniteMoeForCausalLM(MixtralForCausalLM):
    """Granite 3.x MoE (reference: models/granitemoe.py): granite's
    embedding/residual/attention/logits multipliers + MoE with
    expert-stacked fused input_linear/output_linear weights."""

    def parse_args(self, hf) -> ModelArgs:
        args = ModelArgs.from_hf_config(hf)
        self.num_experts = int(getattr(hf, "num_local_experts", 8))
        self.top_k = int(getattr(hf, "num_experts_per_tok", 2))
        self.moe_intermediate = int(getattr(hf, "intermediate_size", 1024))
        emb_mult = float(getattr(hf, "embedding_multiplier", 1.0))
        res_mult = float(getattr(hf, "residual_multiplier", 1.0))
        logits_scaling = float(getattr(hf, "logits_scaling", 1.0))
        args = dataclass_replace(
            args,
            embedding_multiplier=(emb_mult if emb_mult != 1.0 else None),
            residual_multiplier=res_mult,
            logits_scale=(1.0 / logits_scaling
                          if logits_scaling != 1.0 else None))
        return args

    def __init__(self, model_config, args=None) -> None:
        super().__init__(model_config, args)
        hf = model_config.resolve_hf_config()
        am = getattr(hf, "attention_multiplier", None)
        if am is not None:
            self.scale = float(am)

    def _hf_layer_map(self):
        m = LlamaForCausalLM._hf_layer_map(self)
        m["block_sparse_moe.router.layer.weight"] = ("router.w", "", True)
        # expert-stacked fused weights land directly (see load_weights)
        m["block_sparse_moe.input_linear.weight"] = (
            "experts_gate_up", "granite_in", False)
        m["block_sparse_moe.output_linear.weight"] = (
            "experts_down", "granite_out", False)
        return m

    # attention + residual multipliers ride the llama base layer;
    # only the routed MLP (inherited Mixtral _mlp) differs.


class Qwen3MoeForCausalLM(Qwen2MoeForCausalLM):

    def parse_args(self, hf) -> ModelArgs:
        args = super().parse_args(hf)
        self.norm_topk = bool(getattr(hf, "norm_topk_prob", True))
        return dataclass_replace(args, qk_norm=True, attn_bias=False)

    def _route(self, router_logits):
        return topk_routing(router_logits, self.top_k,
                            renormalize=self.norm_topk)


class GraniteMoeSharedForCausalLM(GraniteMoeForCausalLM):
    """Granite 4.0-style MoE with a dense shared MLP added to every
    routed-MoE output (reference: models/granitemoeshared.py —
    ``shared_mlp.input_linear`` is a fused gate|up projection of width
    ``shared_intermediate_size``)."""

    def parse_args(self, hf) -> ModelArgs:
        args = super().parse_args(hf)
        self.shared_inter = int(
            getattr(hf, "shared_intermediate_size", 0) or 0)
        return args

    def _alloc_layer_stack(self, np_dtype) -> dict:
        layers = super()._alloc_layer_stack(np_dtype)
        if self.shared_inter:
            a = self.args
            L, H, S = a.num_layers, a.hidden_size, self.shared_inter
            layers["shared_gate_up"] = {"w": np.empty((L, H, 2 * S),
                                                      np_dtype)}
            layers["shared_down"] = {"w": np.empty((L, S, H), np_dtype)}
        return layers

    def _hf_layer_map(self):
        m = super()._hf_layer_map()
        if self.shared_inter:
            m["shared_mlp.input_linear.weight"] = (
                "shared_gate_up.w", "", True)
            m["shared_mlp.output_linear.weight"] = (
                "shared_down.w", "", True)
        return m

    def _mlp(self, lp: dict, h: jnp.ndarray, li, lora_ctx=None):
        out = super()._mlp(lp, h, li, lora_ctx)
        if self.shared_inter:
            from vllm_tpu.ops.activation import GATED_ACTIVATIONS

            gate_up = linear(h, lp["shared_gate_up"], layer=li)
            out = out + linear(GATED_ACTIVATIONS[self.args.act](gate_up),
                               lp["shared_down"], layer=li)
        return out
