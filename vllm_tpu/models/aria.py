"""Aria — rhymes-ai's MoE VLM (reference behavior parity:
vllm/model_executor/models/aria.py).

Text: llama attention + grouped-expert MoE (fused fc1 [E, H, 2I],
silu(first half) * second half — the same layout as fused_moe) with
top-k + softmax-over-selected routing and a dense shared-experts MLP
added to every token. Vision: Idefics3-class SigLIP tower. Projector: a
learned-query resampler — queries cross-attend to the image features
through BOTH the explicit q/k/v projections AND a torch
nn.MultiheadAttention's packed in/out projections (HF keeps the
double projection, modeling_aria.py AriaCrossAttention), then
LN -> gelu_new MLP into the text embedding space."""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp

from vllm_tpu.config import ModelConfig
from vllm_tpu.models.clip import ClipVisionArgs, SiglipVisionTower
from vllm_tpu.models.llama import LlamaForCausalLM, ModelArgs, _np_dtype
from vllm_tpu.models.mixtral import MixtralForCausalLM
from vllm_tpu.ops.activation import GATED_ACTIVATIONS
from vllm_tpu.ops.linear import linear


class AriaTextForCausalLM(MixtralForCausalLM):

    def parse_args(self, hf) -> ModelArgs:
        args = ModelArgs.from_hf_config(hf)
        self.num_experts = int(getattr(hf, "moe_num_experts", 8))
        self.top_k = int(getattr(hf, "moe_topk", 2))
        self.moe_intermediate = int(hf.intermediate_size)
        self.n_shared = int(getattr(hf, "moe_num_shared_experts", 0))
        self.shared_inter = self.moe_intermediate * self.n_shared
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

    def _fused_offset(self, part: str):
        if part == "sgate":
            return (0, self.shared_inter)
        if part == "sup":
            return (self.shared_inter, self.shared_inter)
        return super()._fused_offset(part)

    def _hf_layer_map(self):
        m = LlamaForCausalLM._hf_layer_map(self)
        m["mlp.router.weight"] = ("router.w", "", True)
        # HF stores the expert stacks in the kernel layout directly:
        # fc1 [E, H, 2I] (silu-half first), fc2 [E, I, H]
        m["mlp.experts.fc1.weight"] = ("experts_gate_up", "", False)
        m["mlp.experts.fc2.weight"] = ("experts_down", "", False)
        m["mlp.shared_experts.gate_proj.weight"] = (
            "shared_gate_up.w", "sgate", True)
        m["mlp.shared_experts.up_proj.weight"] = (
            "shared_gate_up.w", "sup", True)
        m["mlp.shared_experts.down_proj.weight"] = (
            "shared_down.w", "", True)
        return m

    def _mlp(self, lp: dict, h: jnp.ndarray, li, lora_ctx=None):
        out = super()._mlp(lp, h, li, lora_ctx)
        if self.shared_inter:
            gate_up = linear(h, lp["shared_gate_up"], layer=li)
            out = out + linear(GATED_ACTIVATIONS[self.args.act](gate_up),
                               lp["shared_down"], layer=li)
        return out


def _ln(x, w, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


class AriaForConditionalGeneration:

    def __init__(self, model_config: ModelConfig) -> None:
        self.model_config = model_config
        hf = model_config.resolve_hf_config()
        self.image_token_index = int(getattr(hf, "image_token_index",
                                             9))
        self.patch_to_query = {
            int(k): int(v)
            for k, v in (getattr(hf, "projector_patch_to_query_dict",
                                 None) or {1225: 128, 4900: 256}).items()
        }
        self.vision_args = ClipVisionArgs.from_hf_config(hf.vision_config)
        self.vision = SiglipVisionTower(self.vision_args,
                                        feature_layer=-1, post_ln=True)
        self.v_heads = hf.vision_config.num_attention_heads

        lm_config = ModelConfig(model=model_config.model,
                                dtype=model_config.dtype,
                                hf_config=hf.text_config)
        self.language = AriaTextForCausalLM(lm_config)
        self.args = self.language.args
        self.dtype = self.language.dtype

    # ---------------------------------------------------------- vision

    def encode_image(self, params: dict,
                     pixel_values: jnp.ndarray) -> jnp.ndarray:
        """[B, C, H, W] -> [B, query_num, H_text]"""
        feats = self.vision.forward(params["vision"], pixel_values)
        B, n_patches, D = feats.shape
        query_num = self.patch_to_query.get(n_patches, None)
        p = params["projector"]
        q_all = p["query"]
        queries = (q_all[:query_num] if query_num is not None
                   else q_all)[None]
        queries = jnp.broadcast_to(
            queries, (B,) + queries.shape[1:]).astype(feats.dtype)

        # AriaCrossAttention: explicit q/k/v projections feed a packed
        # torch MultiheadAttention (double projection, kept for parity)
        q1 = _ln(queries, p["ln_q_w"], p["ln_q_b"]) @ p["q_proj"]
        kvn = _ln(feats, p["ln_kv_w"], p["ln_kv_b"])
        k1 = kvn @ p["k_proj"]
        v1 = kvn @ p["v_proj"]
        q2 = q1 @ p["in_q"]["w"] + p["in_q"]["b"]
        k2 = k1 @ p["in_k"]["w"] + p["in_k"]["b"]
        v2 = v1 @ p["in_v"]["w"] + p["in_v"]["b"]
        h = self.v_heads
        d = D // h
        qh = q2.reshape(B, -1, h, d)
        kh = k2.reshape(B, -1, h, d)
        vh = v2.reshape(B, -1, h, d)
        scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / math.sqrt(d)
        probs = jax.nn.softmax(scores.astype(jnp.float32),
                               -1).astype(feats.dtype)
        att = jnp.einsum("bhqk,bkhd->bqhd", probs, vh).reshape(
            B, -1, D)
        att = att @ p["out"]["w"] + p["out"]["b"]
        att = att @ p["linear"]["w"] + p["linear"]["b"]

        hmid = _ln(att, p["ln_mid_w"], p["ln_mid_b"])
        f = jax.nn.gelu((hmid @ p["ff_in"]).astype(jnp.float32),
                        approximate=True).astype(hmid.dtype)
        return f @ p["ff_out"]

    # ------------------------------------------------------------- forward

    def forward(self, params, input_ids, kv_caches, metadata, lora=None,
                embed_override=None):
        return self.language.forward(params["language"], input_ids,
                                     kv_caches, metadata, lora=lora,
                                     embed_override=embed_override)

    def compute_logits(self, params, hidden):
        return self.language.compute_logits(params["language"], hidden)

    def get_kv_cache_specs(self, block_size: int, cache_dtype: str):
        return self.language.get_kv_cache_specs(block_size, cache_dtype)

    # ------------------------------------------------------------- weights

    def load_weights(self, weights_iter) -> dict:
        npd = _np_dtype(self.model_config.dtype)
        D = self.vision_args.hidden_size
        Ht = self.args.hidden_size
        hf = self.model_config.resolve_hf_config()
        max_q = int(getattr(hf, "max_value_projector_patch_to_query_dict",
                            None) or max(self.patch_to_query.values()))
        proj = {
            "query": np.zeros((max_q, D), npd),
            "q_proj": np.zeros((D, D), npd),
            "k_proj": np.zeros((D, D), npd),
            "v_proj": np.zeros((D, D), npd),
            "in_q": {"w": np.zeros((D, D), npd), "b": np.zeros(D, npd)},
            "in_k": {"w": np.zeros((D, D), npd), "b": np.zeros(D, npd)},
            "in_v": {"w": np.zeros((D, D), npd), "b": np.zeros(D, npd)},
            "out": {"w": np.zeros((D, D), npd), "b": np.zeros(D, npd)},
            "linear": {"w": np.zeros((D, D), npd),
                       "b": np.zeros(D, npd)},
            "ln_q_w": np.zeros(D, npd), "ln_q_b": np.zeros(D, npd),
            "ln_kv_w": np.zeros(D, npd), "ln_kv_b": np.zeros(D, npd),
            "ln_mid_w": np.zeros(D, npd), "ln_mid_b": np.zeros(D, npd),
            "ff_in": np.zeros((D, Ht), npd),
            "ff_out": np.zeros((Ht, Ht), npd),
        }
        vision = self.vision.alloc(npd)
        lm_weights = []
        pmap = {
            "query": ("query", False, None),
            "cross_attn.q_proj.weight": ("q_proj", True, None),
            "cross_attn.k_proj.weight": ("k_proj", True, None),
            "cross_attn.v_proj.weight": ("v_proj", True, None),
            "cross_attn.multihead_attn.out_proj.weight": ("out", True,
                                                          "w"),
            "cross_attn.multihead_attn.out_proj.bias": ("out", False,
                                                        "b"),
            "cross_attn.linear.weight": ("linear", True, "w"),
            "cross_attn.linear.bias": ("linear", False, "b"),
            "cross_attn.layer_norm.weight": ("ln_q_w", False, None),
            "cross_attn.layer_norm.bias": ("ln_q_b", False, None),
            "cross_attn.layer_norm_kv.weight": ("ln_kv_w", False, None),
            "cross_attn.layer_norm_kv.bias": ("ln_kv_b", False, None),
            "layer_norm.weight": ("ln_mid_w", False, None),
            "layer_norm.bias": ("ln_mid_b", False, None),
            "feed_forward.linear_in.weight": ("ff_in", True, None),
            "feed_forward.linear_out.weight": ("ff_out", True, None),
        }
        for name, w in weights_iter:
            w = np.asarray(w)
            name = name.removeprefix("model.")
            if name.startswith("vision_tower."):
                self.vision.load_one(vision, name[len("vision_tower."):],
                                     w, npd)
            elif name.startswith("multi_modal_projector."):
                sub = name[len("multi_modal_projector."):]
                if sub == "cross_attn.multihead_attn.in_proj_weight":
                    for i, key in enumerate(("in_q", "in_k", "in_v")):
                        proj[key]["w"][...] = w[i * D:(i + 1) * D].T
                elif sub == "cross_attn.multihead_attn.in_proj_bias":
                    for i, key in enumerate(("in_q", "in_k", "in_v")):
                        proj[key]["b"][...] = w[i * D:(i + 1) * D]
                elif sub in pmap:
                    key, transpose, leaf = pmap[sub]
                    dst = proj[key] if leaf is None else proj[key][leaf]
                    dst[...] = (w.T if transpose else w).astype(npd)
            elif name.startswith("language_model."):
                sub = name[len("language_model."):]
                if not sub.startswith(("model.", "lm_head.")):
                    sub = "model." + sub
                lm_weights.append((sub, w))
            elif name == "lm_head.weight":
                lm_weights.append((name, w))
        return {"language": self.language.load_weights(iter(lm_weights)),
                "vision": vision, "projector": proj}
