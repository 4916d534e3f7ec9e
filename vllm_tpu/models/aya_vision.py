"""AyaVision — Cohere's vision-language model (reference behavior
parity: vllm/model_executor/models/aya_vision.py).

Composition: SigLIP vision tower (full feature, post-LN) -> pixel
shuffle (downsample_factor) -> LayerNorm -> SwiGLU projector -> image
embeddings substituted at placeholder positions; the language model is
Cohere2 (or any registered arch from text_config)."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from vllm_tpu.config import ModelConfig
from vllm_tpu.core.kv_cache_interface import KVCacheSpec
from vllm_tpu.models.bert import layer_norm
from vllm_tpu.models.clip import ClipVisionArgs, SiglipVisionTower
from vllm_tpu.models.llama import _np_dtype


class AyaVisionForConditionalGeneration:

    def __init__(self, model_config: ModelConfig) -> None:
        self.model_config = model_config
        hf = model_config.resolve_hf_config()
        self.image_token_index = int(getattr(hf, "image_token_index",
                                             255036))
        self.downsample = int(getattr(hf, "downsample_factor", 2))
        self.align_inter = int(
            getattr(hf, "alignment_intermediate_size", None)
            or hf.text_config.hidden_size)
        self.adapter_ln_eps = float(getattr(hf, "adapter_layer_norm_eps",
                                            1e-6))
        self.vision_args = ClipVisionArgs.from_hf_config(hf.vision_config)
        # HF get_image_features reads hidden_states[-1]: the last
        # encoder layer BEFORE the post-LN
        self.vision = SiglipVisionTower(self.vision_args,
                                        feature_layer=-1, post_ln=False)

        from vllm_tpu.models.registry import resolve_model_cls

        from vllm_tpu.models.registry import arch_for_text_config

        text_arch = arch_for_text_config(hf.text_config,
                                         "Cohere2ForCausalLM")
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
        return self.vision_args.num_patches // self.downsample**2

    def _pixel_shuffle(self, x: jnp.ndarray) -> jnp.ndarray:
        """HF AyaVisionMultiModalProjector.pixel_shuffle (space-to-depth
        with the w/h axis naming quirk kept verbatim)."""
        d = self.downsample
        B, seq, D = x.shape
        w = h = int(round(seq**0.5))
        x = x.reshape(B, w, h // d, D * d)
        x = x.transpose(0, 2, 1, 3)
        x = x.reshape(B, h // d, w // d, D * d * d)
        x = x.transpose(0, 2, 1, 3)
        return x.reshape(B, seq // (d * d), D * d * d)

    def encode_image(self, params: dict,
                     pixel_values: jnp.ndarray) -> jnp.ndarray:
        feats = self.vision.forward(params["vision"], pixel_values)
        x = self._pixel_shuffle(feats)
        p = params["projector"]
        x = layer_norm(x, p["ln_w"], p["ln_b"], self.adapter_ln_eps)
        h = x @ p["w1"] + p["b1"]
        val, gate = jnp.split(h, 2, axis=-1)
        h = jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype) * val
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
        D_in = self.vision_args.hidden_size * self.downsample**2
        D_t = self.args.hidden_size
        return {
            "vision": self.vision.alloc(np_dtype),
            "projector": {
                "ln_w": np.ones(D_in, np_dtype),
                "ln_b": np.zeros(D_in, np_dtype),
                "w1": np.zeros((D_in, self.align_inter), np_dtype),
                "b1": np.zeros(self.align_inter, np_dtype),
                "w2": np.zeros((self.align_inter // 2, D_t), np_dtype),
                "b2": np.zeros(D_t, np_dtype),
            },
        }

    def load_weights(self, weights_iter) -> dict:
        np_dtype = _np_dtype(self.model_config.dtype)
        top = self._alloc_top(np_dtype)
        proj_map = {
            "layernorm.weight": ("ln_w", False),
            "layernorm.bias": ("ln_b", False),
            "linear_1.weight": ("w1", True),
            "linear_1.bias": ("b1", False),
            "linear_2.weight": ("w2", True),
            "linear_2.bias": ("b2", False),
        }
        lm_weights: list[tuple[str, np.ndarray]] = []
        for name, w in weights_iter:
            w = np.asarray(w)
            name = name.removeprefix("model.")
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
