"""LLaVA — vision-language model (reference behavior parity:
vllm/model_executor/models/llava.py LlavaForConditionalGeneration).

Composition: CLIP vision tower (models/clip.py, feature layer -2, CLS
dropped) -> 2-layer GELU projector -> image embeddings substituted at
<image> placeholder positions in the language model's token embedding
stream (embed_override mechanism in llama.py). The language model is any
registered causal LM built from config.text_config."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vllm_tpu.config import ModelConfig
from vllm_tpu.core.kv_cache_interface import KVCacheSpec
from vllm_tpu.models.clip import ClipVisionArgs, ClipVisionTower
from vllm_tpu.models.llama import _np_dtype


class LlavaForConditionalGeneration:

    def __init__(self, model_config: ModelConfig) -> None:
        self.model_config = model_config
        hf = model_config.resolve_hf_config()
        self.image_token_index = int(getattr(hf, "image_token_index",
                                             32000))
        self.select_strategy = getattr(hf, "vision_feature_select_strategy",
                                       "default")
        self.projector_act = getattr(hf, "projector_hidden_act", "gelu")
        self.vision_args = ClipVisionArgs.from_hf_config(hf.vision_config)
        self.vision = ClipVisionTower(
            self.vision_args,
            feature_layer=int(getattr(hf, "vision_feature_layer", -2)))

        # language model from text_config via the registry
        from vllm_tpu.models.registry import resolve_model_cls

        from vllm_tpu.models.registry import arch_for_text_config

        text_arch = arch_for_text_config(hf.text_config,
                                         "LlamaForCausalLM")
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
        n = self.vision_args.num_patches
        return n if self.select_strategy == "default" else n + 1

    def encode_image(self, params: dict,
                     pixel_values: jnp.ndarray) -> jnp.ndarray:
        """[B, C, H, W] -> [B, num_image_tokens, H_text]"""
        feats = self.vision.forward(params["vision"], pixel_values)
        if self.select_strategy == "default":
            feats = feats[:, 1:]  # drop CLS
        x = feats @ params["projector"]["w1"] + params["projector"]["b1"]
        x = jax.nn.gelu(x.astype(jnp.float32)).astype(x.dtype)
        return x @ params["projector"]["w2"] + params["projector"]["b2"]

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
        D_v = self.vision_args.hidden_size
        D_t = self.args.hidden_size
        return {
            "vision": self.vision.alloc(np_dtype),
            "projector": {
                "w1": np.zeros((D_v, D_t), np_dtype),
                "b1": np.zeros((D_t,), np_dtype),
                "w2": np.zeros((D_t, D_t), np_dtype),
                "b2": np.zeros((D_t,), np_dtype),
            },
        }

    def load_weights(self, weights_iter) -> dict:
        np_dtype = _np_dtype(self.model_config.dtype)
        top = self._alloc_top(np_dtype)
        lm_weights: list[tuple[str, np.ndarray]] = []
        proj_map = {
            "linear_1.weight": ("w1", True),
            "linear_1.bias": ("b1", False),
            "linear_2.weight": ("w2", True),
            "linear_2.bias": ("b2", False),
        }
        for name, w in weights_iter:
            w = np.asarray(w)
            # transformers >=4.52 nests under "model."
            name = name.removeprefix("model.") \
                if name.startswith(("model.vision_tower",
                                    "model.multi_modal_projector",
                                    "model.language_model")) else name
            if name.startswith("vision_tower.vision_model."):
                self.vision.load_one(
                    top["vision"],
                    name[len("vision_tower.vision_model."):], w, np_dtype)
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
            if leaf.ndim >= 2:
                return (rng.standard_normal(leaf.shape) * 0.4 /
                        np.sqrt(leaf.shape[-1])).astype(np.float32)
            if leaf.ndim == 1 and leaf.shape[0]:
                return np.zeros_like(leaf)
            return leaf

        top = jax.tree.map(fill, top)
        for k in ("ln1_w", "ln2_w"):
            top["vision"]["layers"][k] = np.ones_like(
                top["vision"]["layers"][k])
        top["vision"]["pre_ln_w"] = np.ones_like(top["vision"]["pre_ln_w"])
        params = {"language": self.language.init_dummy_params(seed)}
        params.update(top)
        return params
