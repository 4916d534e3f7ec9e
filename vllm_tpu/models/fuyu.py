"""Fuyu-8B — Adept's tower-less VLM (reference behavior parity:
vllm/model_executor/models/fuyu.py).

No vision tower at all: raw image patches (patch_size x patch_size x 3,
flattened) go through ONE linear projection (``vision_embed_tokens``,
fuyu.py:54 FuyuImagePatchInputs) straight into the Persimmon language
model's embedding space, substituted at |SPEAKER| placeholder positions
(config.image_token_id = 71011)."""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from vllm_tpu.config import ModelConfig
from vllm_tpu.core.kv_cache_interface import KVCacheSpec
from vllm_tpu.models.llama import _np_dtype
from vllm_tpu.models.misc_archs import PersimmonForCausalLM


class FuyuForCausalLM:

    def __init__(self, model_config: ModelConfig) -> None:
        self.model_config = model_config
        hf = model_config.resolve_hf_config()
        self.image_token_index = int(getattr(hf, "image_token_id", 71011))
        self.patch_size = int(getattr(hf, "patch_size", 30))
        self.num_channels = int(getattr(hf, "num_channels", 3))
        self.patch_dim = self.patch_size ** 2 * self.num_channels

        lm_config = ModelConfig(model=model_config.model,
                                dtype=model_config.dtype,
                                hf_config=hf.text_config)
        self.language = PersimmonForCausalLM(lm_config)
        self.args = self.language.args
        self.dtype = self.language.dtype

    # ---------------------------------------------------------- multimodal

    def encode_image_mm(self, params: dict, mm: dict) -> np.ndarray:
        """mm["image_patches"]: [N, patch_dim] flattened raster patches
        -> [N, H_text] (one linear, fuyu.py vision_embed_tokens)."""
        patches = jnp.asarray(np.asarray(mm["image_patches"],
                                         np.float32), self.dtype)
        if patches.ndim == 3:
            patches = patches.reshape(-1, patches.shape[-1])
        p = params["vision_embed"]
        return np.asarray(
            (patches @ p["w"] + p["b"]).astype(jnp.float32))

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

    def load_weights(self, weights_iter) -> dict:
        npd = _np_dtype(self.model_config.dtype)
        H = self.args.hidden_size
        ve = {"w": np.zeros((self.patch_dim, H), npd),
              "b": np.zeros((H,), npd)}
        lm_weights: list[tuple[str, np.ndarray]] = []
        for name, w in weights_iter:
            w = np.asarray(w)
            if name.endswith("vision_embed_tokens.weight"):
                ve["w"][...] = w.T.astype(npd)
            elif name.endswith("vision_embed_tokens.bias"):
                ve["b"][...] = w.astype(npd)
            elif name.startswith("model.language_model."):
                lm_weights.append(
                    ("model." + name[len("model.language_model."):], w))
            elif name.startswith("language_model."):
                sub = name[len("language_model."):]
                if not sub.startswith(("model.", "lm_head.")):
                    sub = "model." + sub
                lm_weights.append((sub, w))
            else:
                lm_weights.append((name, w))
        return {"language": self.language.load_weights(iter(lm_weights)),
                "vision_embed": ve}

    def init_dummy_params(self, seed: int = 0) -> dict:
        rng = np.random.default_rng(seed)
        H = self.args.hidden_size
        return {
            "language": self.language.init_dummy_params(seed),
            "vision_embed": {
                "w": (rng.standard_normal((self.patch_dim, H)) * 0.02
                      ).astype(np.float32),
                "b": np.zeros((H,), np.float32),
            },
        }
