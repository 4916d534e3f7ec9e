"""PaliGemma and Gemma3 multimodal — Google's SigLIP+Gemma VLMs
(reference behavior parity: vllm/model_executor/models/paligemma.py,
gemma3_mm.py).

PaliGemma is a PREFIX-LM: the whole prompt (image + text prefix)
attends bidirectionally, generation is causal — served via
bidir_attention="prompt" (AttentionMetadata.bidir_spans). Gemma3's VLM
restricts bidirectional attention to each image's token span
(bidir_attention="mm_span"). Prefill-shaped batches of these models
route to the jnp attention path for the span mask; decode uses the
Pallas kernel (causal-equivalent).

Caveat (documented, matches the mask's span granularity): one
bidirectional span per request — multi-image Gemma3 prompts mask only
the span from first to last placeholder."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from vllm_tpu.config import ModelConfig
from vllm_tpu.core.kv_cache_interface import KVCacheSpec
from vllm_tpu.models.clip import ClipVisionArgs, SiglipVisionTower
from vllm_tpu.models.llama import _np_dtype


class PaliGemmaForConditionalGeneration:

    bidir_attention = "prompt"
    _default_lm = "GemmaForCausalLM"

    def __init__(self, model_config: ModelConfig) -> None:
        self.model_config = model_config
        hf = model_config.resolve_hf_config()
        self.image_token_index = int(getattr(hf, "image_token_index",
                                             None) or 257152)
        self.vision_args = ClipVisionArgs.from_hf_config(hf.vision_config)
        self.vision = SiglipVisionTower(self.vision_args,
                                        feature_layer=-1, post_ln=True)
        self.proj_dim = int(getattr(hf.vision_config, "projection_dim",
                                    hf.text_config.hidden_size))

        from vllm_tpu.models.registry import (arch_for_text_config,
                                              resolve_model_cls)

        text_arch = arch_for_text_config(hf.text_config, self._default_lm)
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
        return self.vision_args.num_patches

    def encode_image(self, params: dict,
                     pixel_values: jnp.ndarray) -> jnp.ndarray:
        feats = self.vision.forward(params["vision"], pixel_values)
        x = feats @ params["projector"]["w"] + params["projector"]["b"]
        # HF PaliGemmaModel.get_image_features scale
        return x / jnp.asarray(self.args.hidden_size**0.5, x.dtype)

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
        return {
            "vision": self.vision.alloc(np_dtype),
            "projector": {
                "w": np.zeros((self.vision_args.hidden_size,
                               self.proj_dim), np_dtype),
                "b": np.zeros(self.proj_dim, np_dtype),
            },
        }

    def load_weights(self, weights_iter) -> dict:
        np_dtype = _np_dtype(self.model_config.dtype)
        top = self._alloc_top(np_dtype)
        lm_weights: list[tuple[str, np.ndarray]] = []
        for name, w in weights_iter:
            w = np.asarray(w)
            name = name.removeprefix("model.")
            if name.startswith("vision_tower.vision_model."):
                self.vision.load_one(
                    top["vision"],
                    name[len("vision_tower.vision_model."):], w, np_dtype)
            elif name == "multi_modal_projector.linear.weight":
                top["projector"]["w"][...] = w.T.astype(np_dtype)
            elif name == "multi_modal_projector.linear.bias":
                top["projector"]["b"][...] = w.astype(np_dtype)
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
        for k in ("ln1_w", "ln2_w"):
            top["vision"]["layers"][k] = np.ones_like(
                top["vision"]["layers"][k])
        top["vision"]["post_ln_w"] = np.ones_like(
            top["vision"]["post_ln_w"])
        params = {"language": self.language.init_dummy_params(seed)}
        params.update(top)
        return params


class Gemma3ForConditionalGeneration(PaliGemmaForConditionalGeneration):
    """Gemma3 VLM (reference: vllm models/gemma3_mm.py): SigLIP tower ->
    4x4 average pool down to mm_tokens_per_image -> Gemma-style RMSNorm
    -> bias-free projection; image spans attend bidirectionally."""

    bidir_attention = "mm_span"
    _default_lm = "Gemma3ForCausalLM"

    def __init__(self, model_config: ModelConfig) -> None:
        hf = model_config.resolve_hf_config()
        self.mm_tokens = int(getattr(hf, "mm_tokens_per_image", 256))
        super().__init__(model_config)
        self.image_token_index = int(getattr(hf, "image_token_index",
                                             None) or 262144)

    @property
    def num_image_tokens(self) -> int:
        return self.mm_tokens

    def encode_image(self, params: dict,
                     pixel_values: jnp.ndarray) -> jnp.ndarray:
        from vllm_tpu.ops.layernorm import rms_norm

        feats = self.vision.forward(params["vision"], pixel_values)
        B, seq, C = feats.shape
        pside = int(round(seq**0.5))
        tside = int(round(self.mm_tokens**0.5))
        k = pside // tside  # avg-pool kernel/stride
        x = feats.transpose(0, 2, 1).reshape(B, C, pside, pside)
        x = x.reshape(B, C, tside, k, tside, k).mean(axis=(3, 5))
        x = x.reshape(B, C, tside * tside).transpose(0, 2, 1)
        x = rms_norm(x, params["projector"]["norm"],
                     float(getattr(self.model_config.resolve_hf_config()
                                   .vision_config, "layer_norm_eps",
                                   1e-6)))
        return x @ params["projector"]["w"]

    def _alloc_top(self, np_dtype) -> dict:
        top = {
            "vision": self.vision.alloc(np_dtype),
            "projector": {
                "w": np.zeros((self.vision_args.hidden_size,
                               self.args.hidden_size), np_dtype),
                "norm": np.zeros(self.vision_args.hidden_size, np_dtype),
            },
        }
        return top

    def load_weights(self, weights_iter) -> dict:
        np_dtype = _np_dtype(self.model_config.dtype)
        top = self._alloc_top(np_dtype)
        lm_weights: list[tuple[str, np.ndarray]] = []
        for name, w in weights_iter:
            w = np.asarray(w)
            name = name.removeprefix("model.")
            if name.startswith("vision_tower.vision_model."):
                self.vision.load_one(
                    top["vision"],
                    name[len("vision_tower.vision_model."):], w, np_dtype)
            elif name == ("multi_modal_projector."
                          "mm_input_projection_weight"):
                top["projector"]["w"][...] = w.astype(np_dtype)
            elif name == ("multi_modal_projector.mm_soft_emb_norm."
                          "weight"):
                # Gemma norm convention: y = x * (1 + w); fold at load
                top["projector"]["norm"][...] = (w + 1.0).astype(np_dtype)
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
