"""InternVL 3 — vision-language model (reference behavior parity:
vllm/model_executor/models/internvl.py).

Composition: InternViT tower (CLS token, absolute positions, layer-scale
(lambda_1/lambda_2) pre-LN ViT) -> drop CLS -> 0.5x pixel shuffle
(space-to-depth) -> LayerNorm + 2-layer GELU projector -> image
embeddings substituted at placeholder positions; the language model is
Qwen2 (or any registered arch from text_config)."""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp

from vllm_tpu.config import ModelConfig
from vllm_tpu.core.kv_cache_interface import KVCacheSpec
from vllm_tpu.models.bert import layer_norm
from vllm_tpu.models.llama import _np_dtype


def _dim(v):
    return v[0] if isinstance(v, (list, tuple)) else v


class InternVLForConditionalGeneration:

    def __init__(self, model_config: ModelConfig) -> None:
        self.model_config = model_config
        hf = model_config.resolve_hf_config()
        self.image_token_index = int(getattr(hf, "image_token_id", None)
                                     or 151667)
        self.downsample = float(getattr(hf, "downsample_ratio", 0.5))
        vc = hf.vision_config
        self.v_hidden = vc.hidden_size
        self.v_layers = vc.num_hidden_layers
        self.v_heads = vc.num_attention_heads
        self.v_inter = vc.intermediate_size
        self.v_image = _dim(vc.image_size)
        self.v_patch = _dim(vc.patch_size)
        self.v_eps = float(getattr(vc, "layer_norm_eps", 1e-6))
        self.v_scale = 1.0 / math.sqrt(self.v_hidden // self.v_heads)

        from vllm_tpu.models.registry import (arch_for_text_config,
                                              resolve_model_cls)

        text_arch = arch_for_text_config(hf.text_config,
                                         "Qwen2ForCausalLM")
        lm_cls = resolve_model_cls(text_arch)
        lm_config = ModelConfig(model=model_config.model,
                                dtype=model_config.dtype,
                                hf_config=hf.text_config)
        self.language = lm_cls(lm_config)
        self.args = self.language.args
        self.dtype = self.language.dtype

    # ---------------------------------------------------------- multimodal

    @property
    def num_image_tokens(self) -> int:
        n = (self.v_image // self.v_patch) ** 2
        return int(n * self.downsample * self.downsample)

    def _vit(self, p: dict, pixel_values: jnp.ndarray) -> jnp.ndarray:
        B = pixel_values.shape[0]
        P = self.v_patch
        ns = self.v_image // P
        x = pixel_values.reshape(B, 3, ns, P, ns, P)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(B, ns * ns, 3 * P * P)
        x = x.astype(p["patch_embed"].dtype) @ p["patch_embed"] \
            + p["patch_bias"]
        cls = jnp.broadcast_to(p["cls_token"][None, None, :],
                               (B, 1, self.v_hidden)).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)
        x = x + p["pos_embed"][None].astype(x.dtype)
        nh = self.v_heads
        hd = self.v_hidden // nh
        for li in range(self.v_layers):
            lp = p["layers"][li]
            h = layer_norm(x, lp["ln1_w"], lp["ln1_b"], self.v_eps)
            T = h.shape[1]
            q = (h @ lp["q_w"]).reshape(B, T, nh, hd).transpose(0, 2, 1, 3)
            k = (h @ lp["k_w"]).reshape(B, T, nh, hd).transpose(0, 2, 1, 3)
            v = (h @ lp["v_w"]).reshape(B, T, nh, hd).transpose(0, 2, 1, 3)
            s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                           k.astype(jnp.float32)) * self.v_scale
            probs = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("bhqk,bhkd->bhqd", probs,
                           v.astype(jnp.float32)).astype(x.dtype)
            o = o.transpose(0, 2, 1, 3).reshape(B, T, self.v_hidden)
            o = o @ lp["o_w"] + lp["o_b"]
            x = x + o * lp["lambda1"]
            h = layer_norm(x, lp["ln2_w"], lp["ln2_b"], self.v_eps)
            h = jax.nn.gelu((h @ lp["fc1_w"] + lp["fc1_b"]).astype(
                jnp.float32), approximate=False).astype(x.dtype)
            h = h @ lp["fc2_w"] + lp["fc2_b"]
            x = x + h * lp["lambda2"]
        return x

    def encode_image(self, params: dict,
                     pixel_values: jnp.ndarray) -> jnp.ndarray:
        feats = self._vit(params["vision"], pixel_values)[:, 1:]  # no CLS
        B, seq, C = feats.shape
        hw = int(round(seq**0.5))
        r = self.downsample
        # HF InternVLModel.pixel_shuffle (scale 0.5 space-to-depth with
        # two transposes), then flatten
        x = feats.reshape(B, hw, hw, C)
        x = x.reshape(B, hw, int(hw * r), int(C / r))
        x = x.transpose(0, 2, 1, 3)
        x = x.reshape(B, int(hw * r), int(hw * r), int(C / (r * r)))
        x = x.transpose(0, 2, 1, 3)
        x = x.reshape(B, -1, int(C / (r * r)))
        p = params["projector"]
        x = layer_norm(x, p["ln_w"], p["ln_b"], 1e-5)
        h = jax.nn.gelu((x @ p["w1"] + p["b1"]).astype(jnp.float32),
                        approximate=False).astype(x.dtype)
        return h @ p["w2"] + p["b2"]

    # ------------------------------------------------------------- forward

    def forward(self, params, input_ids, kv_caches, metadata, lora=None,
                embed_override=None):
        return self.language.forward(params["language"], input_ids,
                                     kv_caches, metadata, lora=lora,
                                     embed_override=embed_override)

    def compute_logits(self, params, hidden):
        return self.language.compute_logits(params["language"], hidden)

    def get_kv_cache_specs(self, block_size: int,
                           cache_dtype: str) -> dict[str, KVCacheSpec]:
        return self.language.get_kv_cache_specs(block_size, cache_dtype)

    # ------------------------------------------------------------- weights

    def _alloc_top(self, np_dtype) -> dict:
        D, L, I = self.v_hidden, self.v_layers, self.v_inter
        n_pos = (self.v_image // self.v_patch) ** 2 + 1
        D_in = int(D / (self.downsample * self.downsample))
        D_t = self.args.hidden_size
        layer = lambda: {  # noqa: E731
            "ln1_w": np.zeros(D, np_dtype), "ln1_b": np.zeros(D, np_dtype),
            "ln2_w": np.zeros(D, np_dtype), "ln2_b": np.zeros(D, np_dtype),
            "q_w": np.zeros((D, D), np_dtype),
            "k_w": np.zeros((D, D), np_dtype),
            "v_w": np.zeros((D, D), np_dtype),
            "o_w": np.zeros((D, D), np_dtype),
            "o_b": np.zeros(D, np_dtype),
            "fc1_w": np.zeros((D, I), np_dtype),
            "fc1_b": np.zeros(I, np_dtype),
            "fc2_w": np.zeros((I, D), np_dtype),
            "fc2_b": np.zeros(D, np_dtype),
            "lambda1": np.ones(D, np_dtype),
            "lambda2": np.ones(D, np_dtype),
        }
        return {
            "vision": {
                "cls_token": np.zeros(D, np_dtype),
                "pos_embed": np.zeros((n_pos, D), np_dtype),
                "patch_embed": np.zeros((3 * self.v_patch**2, D),
                                        np_dtype),
                "patch_bias": np.zeros(D, np_dtype),
                "layers": [layer() for _ in range(L)],
            },
            "projector": {
                "ln_w": np.ones(D_in, np_dtype),
                "ln_b": np.zeros(D_in, np_dtype),
                "w1": np.zeros((D_in, D_t), np_dtype),
                "b1": np.zeros(D_t, np_dtype),
                "w2": np.zeros((D_t, D_t), np_dtype),
                "b2": np.zeros(D_t, np_dtype),
            },
        }

    def load_weights(self, weights_iter) -> dict:
        np_dtype = _np_dtype(self.model_config.dtype)
        top = self._alloc_top(np_dtype)
        vis = top["vision"]
        proj_map = {
            "layer_norm.weight": ("ln_w", False),
            "layer_norm.bias": ("ln_b", False),
            "linear_1.weight": ("w1", True),
            "linear_1.bias": ("b1", False),
            "linear_2.weight": ("w2", True),
            "linear_2.bias": ("b2", False),
        }
        lmap = {
            "layernorm_before.weight": ("ln1_w", False),
            "layernorm_before.bias": ("ln1_b", False),
            "layernorm_after.weight": ("ln2_w", False),
            "layernorm_after.bias": ("ln2_b", False),
            "attention.q_proj.weight": ("q_w", True),
            "attention.k_proj.weight": ("k_w", True),
            "attention.v_proj.weight": ("v_w", True),
            "attention.projection_layer.weight": ("o_w", True),
            "attention.projection_layer.bias": ("o_b", False),
            "mlp.fc1.weight": ("fc1_w", True),
            "mlp.fc1.bias": ("fc1_b", False),
            "mlp.fc2.weight": ("fc2_w", True),
            "mlp.fc2.bias": ("fc2_b", False),
            "lambda_1": ("lambda1", False),
            "lambda_2": ("lambda2", False),
        }
        lm_weights: list[tuple[str, np.ndarray]] = []
        D = self.v_hidden
        for name, w in weights_iter:
            w = np.asarray(w)
            name = name.removeprefix("model.")
            if name == "vision_tower.embeddings.cls_token":
                vis["cls_token"][...] = w.reshape(D).astype(np_dtype)
            elif name == "vision_tower.embeddings.position_embeddings":
                vis["pos_embed"][...] = w[0].astype(np_dtype)
            elif name == ("vision_tower.embeddings.patch_embeddings."
                          "projection.weight"):
                vis["patch_embed"][...] = \
                    w.reshape(D, -1).T.astype(np_dtype)
            elif name == ("vision_tower.embeddings.patch_embeddings."
                          "projection.bias"):
                vis["patch_bias"][...] = w.astype(np_dtype)
            elif name.startswith("vision_tower.encoder.layer."):
                parts = name.split(".")
                li = int(parts[3])
                sub = ".".join(parts[4:])
                if sub in lmap:
                    key, transpose = lmap[sub]
                    vis["layers"][li][key][...] = \
                        (w.T if transpose else w).astype(np_dtype)
            elif name.startswith("multi_modal_projector."):
                key = name[len("multi_modal_projector."):]
                if key in proj_map:
                    dest, transpose = proj_map[key]
                    top["projector"][dest][...] = \
                        (w.T if transpose else w).astype(np_dtype)
            elif name.startswith("language_model."):
                sub = name[len("language_model."):]
                if not sub.startswith(("model.", "lm_head.")):
                    sub = "model." + sub
                lm_weights.append((sub, w))
            elif name.startswith("lm_head."):
                lm_weights.append((name, w))
        params = {"language": self.language.load_weights(iter(lm_weights))}
        params.update(top)
        return params

    def init_dummy_params(self, seed: int = 0) -> dict:
        rng = np.random.default_rng(seed)
        top = self._alloc_top(np.float32)

        def fill(leaf):
            if getattr(leaf, "ndim", 0) >= 2:
                return (rng.standard_normal(leaf.shape) * 0.4 /
                        np.sqrt(leaf.shape[-1])).astype(np.float32)
            return leaf

        top = jax.tree.map(fill, top)
        for lp in top["vision"]["layers"]:
            for k in ("ln1_w", "ln2_w"):
                lp[k] = np.ones_like(lp[k])
        params = {"language": self.language.init_dummy_params(seed)}
        params.update(top)
        return params
