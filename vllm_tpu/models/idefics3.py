"""Idefics3 / SmolVLM — vision-language models (reference behavior
parity: vllm/model_executor/models/idefics3.py, smolvlm.py).

Composition: SigLIP-style vision transformer (models/clip.py
SiglipVisionTower; Idefics3's vision encoder is structurally SigLIP)
-> pixel-shuffle connector (space-to-depth by ``scale_factor``) -> a
single bias-free modality projection -> image embeddings substituted at
<image> placeholder positions (embed_override, like LLaVA). SmolVLM is
the same graph under a different HF class name."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from vllm_tpu.config import ModelConfig
from vllm_tpu.core.kv_cache_interface import KVCacheSpec
from vllm_tpu.models.clip import ClipVisionArgs, SiglipVisionTower
from vllm_tpu.models.llama import _np_dtype


class Idefics3ForConditionalGeneration:

    def __init__(self, model_config: ModelConfig) -> None:
        self.model_config = model_config
        hf = model_config.resolve_hf_config()
        self.image_token_index = int(getattr(hf, "image_token_id",
                                             None) or 128257)
        self.scale_factor = int(getattr(hf, "scale_factor", 2))
        self.vision_args = ClipVisionArgs.from_hf_config(hf.vision_config)
        # Idefics3's embeddings BUCKETIZE patch coordinates into
        # num_patches_per_side bins with a (1 - 1e-6) shrink factor, so
        # even a full-size image maps per axis to [0, 0, 1, .., n-2] —
        # replicate HF exactly (modeling_idefics3.py
        # Idefics3VisionEmbeddings.forward).
        nps = self.vision_args.image_size // self.vision_args.patch_size
        boundaries = np.arange(1, nps) / nps
        frac = np.arange(nps) / nps * (1 - 1e-6)
        bucket = np.searchsorted(boundaries, frac, side="right")
        pos_ids = (bucket[:, None] * nps + bucket[None, :]).reshape(-1)
        self.vision = SiglipVisionTower(self.vision_args,
                                        feature_layer=-1,
                                        pos_ids=pos_ids.astype(np.int32))

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
        return self.vision_args.num_patches // self.scale_factor**2

    def _pixel_shuffle(self, x: jnp.ndarray) -> jnp.ndarray:
        """[B, h*w, D] -> [B, h*w/sf^2, D*sf^2] (HF Idefics3Connector
        pixel_shuffle, space-to-depth)."""
        sf = self.scale_factor
        B, seq, D = x.shape
        h = w = int(round(seq**0.5))
        x = x.reshape(B, h, w // sf, D * sf)
        x = x.transpose(0, 2, 1, 3)
        x = x.reshape(B, w // sf, h // sf, D * sf * sf)
        x = x.transpose(0, 2, 1, 3)
        return x.reshape(B, seq // (sf * sf), D * sf * sf)

    def encode_image(self, params: dict,
                     pixel_values: jnp.ndarray) -> jnp.ndarray:
        """[B, C, H, W] -> [B, num_image_tokens, H_text]"""
        feats = self.vision.forward(params["vision"], pixel_values)
        x = self._pixel_shuffle(feats)
        return x @ params["projector"]["w"]

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
        D_v = self.vision_args.hidden_size * self.scale_factor**2
        D_t = self.args.hidden_size
        return {
            "vision": self.vision.alloc(np_dtype),
            "projector": {"w": np.zeros((D_v, D_t), np_dtype)},
        }

    def load_weights(self, weights_iter) -> dict:
        np_dtype = _np_dtype(self.model_config.dtype)
        top = self._alloc_top(np_dtype)
        lm_weights: list[tuple[str, np.ndarray]] = []
        for name, w in weights_iter:
            w = np.asarray(w)
            name = name.removeprefix("model.")
            if name.startswith("vision_model."):
                self.vision.load_one(top["vision"],
                                     name[len("vision_model."):], w,
                                     np_dtype)
            elif name == "connector.modality_projection.proj.weight":
                top["projector"]["w"][...] = w.T.astype(np_dtype)
            elif name.startswith("text_model."):
                lm_weights.append(("model." + name[len("text_model."):],
                                   w))
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
