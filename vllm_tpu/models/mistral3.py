"""Mistral 3 (Pixtral tower) — vision-language model (reference behavior
parity: vllm/model_executor/models/mistral3.py, pixtral.py).

Pixtral vision tower: bias-free patch conv, RMS pre-norm, 2-D rotary
positions (interleaved height/width frequency table), RMS-normed
attention blocks with gated-SiLU MLPs. Mistral3 projector: RMSNorm ->
spatial patch merger (space-to-depth by spatial_merge_size + linear) ->
2-layer GELU MLP into the Mistral hidden size. One image per request;
variable image sizes ride mm_inputs["image_sizes"]."""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp

from vllm_tpu.config import ModelConfig
from vllm_tpu.core.kv_cache_interface import KVCacheSpec
from vllm_tpu.models.llama import _np_dtype
from vllm_tpu.ops.layernorm import rms_norm


class Mistral3ForConditionalGeneration:

    def __init__(self, model_config: ModelConfig) -> None:
        self.model_config = model_config
        hf = model_config.resolve_hf_config()
        self.image_token_index = int(getattr(hf, "image_token_index",
                                             None) or 10)
        self.merge = int(getattr(hf, "spatial_merge_size", 2))
        vc = hf.vision_config
        self.v_hidden = vc.hidden_size
        self.v_layers = vc.num_hidden_layers
        self.v_heads = vc.num_attention_heads
        self.v_inter = vc.intermediate_size
        self.v_patch = vc.patch_size
        self.v_side = vc.image_size // vc.patch_size  # max patches/side
        self.v_head_dim = getattr(vc, "head_dim",
                                  vc.hidden_size // vc.num_attention_heads)
        self.v_eps = 1e-5
        # 2-D rope table [side*side, head_dim]: even lanes carry height
        # frequencies, odd lanes width (HF PixtralRotaryEmbedding)
        base = float(getattr(vc, "rope_theta", 10000.0))
        d = self.v_head_dim
        freqs = 1.0 / base**(np.arange(0, d, 2) / d)
        h = np.arange(self.v_side)
        fh = np.outer(h, freqs[::2])
        fw = np.outer(h, freqs[1::2])
        inv = np.concatenate([
            np.repeat(fh[:, None, :], self.v_side, axis=1),
            np.repeat(fw[None, :, :], self.v_side, axis=0),
        ], axis=-1).reshape(-1, d // 2)
        self.rope_table = np.concatenate([inv, inv], axis=-1)  # [P², d]

        from vllm_tpu.models.registry import (arch_for_text_config,
                                              resolve_model_cls)

        text_arch = arch_for_text_config(hf.text_config,
                                         "MistralForCausalLM")
        lm_cls = resolve_model_cls(text_arch)
        lm_config = ModelConfig(model=model_config.model,
                                dtype=model_config.dtype,
                                hf_config=hf.text_config)
        self.language = lm_cls(lm_config)
        self.args = self.language.args
        self.dtype = self.language.dtype

    # ---------------------------------------------------------- multimodal

    def _vit(self, p: dict, pixel_values: np.ndarray) -> jnp.ndarray:
        """ONE image [C, H, W] -> [h*w, v_hidden] (h = H // patch)."""
        C, H, W = pixel_values.shape
        P = self.v_patch
        h, w = H // P, W // P
        x = jnp.asarray(pixel_values).reshape(C, h, P, w, P)
        x = x.transpose(1, 3, 0, 2, 4).reshape(h * w, C * P * P)
        x = x.astype(p["patch_conv"].dtype) @ p["patch_conv"]
        x = rms_norm(x, p["ln_pre"], self.v_eps)

        # meshgrid position ids into the precomputed 2-D rope table
        pos = (np.arange(h)[:, None] * self.v_side +
               np.arange(w)[None, :]).reshape(-1)
        ang = jnp.asarray(self.rope_table[pos], jnp.float32)  # [T, d]
        cos, sin = jnp.cos(ang), jnp.sin(ang)

        nh, hd = self.v_heads, self.v_head_dim
        scale = 1.0 / math.sqrt(hd)

        def rot(t):  # rotate_half, [T, nh, d]
            t1, t2 = jnp.split(t, 2, axis=-1)
            return jnp.concatenate([-t2, t1], axis=-1)

        T = h * w
        for li in range(self.v_layers):
            lp = p["layers"][li]
            hn = rms_norm(x, lp["attn_norm"], self.v_eps)
            q = (hn @ lp["q_w"]).reshape(T, nh, hd)
            k = (hn @ lp["k_w"]).reshape(T, nh, hd)
            v = (hn @ lp["v_w"]).reshape(T, nh, hd)
            q = q * cos[:, None, :] + rot(q) * sin[:, None, :]
            k = k * cos[:, None, :] + rot(k) * sin[:, None, :]
            s = jnp.einsum("qhd,khd->hqk", q.astype(jnp.float32),
                           k.astype(jnp.float32)) * scale
            probs = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("hqk,khd->qhd", probs,
                           v.astype(jnp.float32)).astype(x.dtype)
            x = x + o.reshape(T, nh * hd) @ lp["o_w"]
            hn = rms_norm(x, lp["ffn_norm"], self.v_eps)
            g = hn @ lp["gate_w"]
            u = hn @ lp["up_w"]
            act = jax.nn.silu(g.astype(jnp.float32)).astype(x.dtype) * u
            x = x + act @ lp["down_w"]
        return x

    def encode_image_mm(self, params, mm_inputs: dict) -> np.ndarray:
        pv = np.asarray(mm_inputs["pixel_values"], np.float32)
        if pv.ndim == 4:
            pv = pv[0]
        feats = self._vit(params["vision"], pv)  # [h*w, D]
        C_img, H, W = pv.shape
        h, w = H // self.v_patch, W // self.v_patch
        m = self.merge
        pr = params["projector"]
        x = rms_norm(feats, pr["norm"], self.v_eps)
        # patch merger: 2-D unfold(kernel=stride=m) == space-to-depth
        # with CHANNEL-major concat of the m*m window (torch unfold
        # layout: [d*m*m] = channel-major over the window)
        D = x.shape[-1]
        g = x.reshape(h, w, D)
        g = g.reshape(h // m, m, w // m, m, D)
        # -> [h/m, w/m, D, m, m] so the last three dims flatten
        # channel-major like torch unfold
        g = g.transpose(0, 2, 4, 1, 3)  # [h/m, w/m, D, m_h, m_w]
        g = g.transpose(0, 1, 2, 3, 4).reshape(h // m * (w // m),
                                               D * m * m)
        x = g @ pr["merge_w"]
        hdn = jax.nn.gelu((x @ pr["w1"]).astype(jnp.float32),
                          approximate=False).astype(x.dtype)
        return np.asarray(hdn @ pr["w2"], np.float32)

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
        nh, hd = self.v_heads, self.v_head_dim
        D_t = self.args.hidden_size
        m = self.merge
        layer = lambda: {  # noqa: E731
            "attn_norm": np.ones(D, np_dtype),
            "ffn_norm": np.ones(D, np_dtype),
            "q_w": np.zeros((D, nh * hd), np_dtype),
            "k_w": np.zeros((D, nh * hd), np_dtype),
            "v_w": np.zeros((D, nh * hd), np_dtype),
            "o_w": np.zeros((nh * hd, D), np_dtype),
            "gate_w": np.zeros((D, I), np_dtype),
            "up_w": np.zeros((D, I), np_dtype),
            "down_w": np.zeros((I, D), np_dtype),
        }
        return {
            "vision": {
                "patch_conv": np.zeros((3 * self.v_patch**2, D),
                                       np_dtype),
                "ln_pre": np.ones(D, np_dtype),
                "layers": [layer() for _ in range(L)],
            },
            "projector": {
                "norm": np.ones(D, np_dtype),
                "merge_w": np.zeros((D * m * m, D), np_dtype),
                "w1": np.zeros((D, D_t), np_dtype),
                "w2": np.zeros((D_t, D_t), np_dtype),
            },
        }

    def load_weights(self, weights_iter) -> dict:
        np_dtype = _np_dtype(self.model_config.dtype)
        top = self._alloc_top(np_dtype)
        vis = top["vision"]
        D = self.v_hidden
        lmap = {
            "attention_norm.weight": ("attn_norm", False),
            "ffn_norm.weight": ("ffn_norm", False),
            "attention.q_proj.weight": ("q_w", True),
            "attention.k_proj.weight": ("k_w", True),
            "attention.v_proj.weight": ("v_w", True),
            "attention.o_proj.weight": ("o_w", True),
            "feed_forward.gate_proj.weight": ("gate_w", True),
            "feed_forward.up_proj.weight": ("up_w", True),
            "feed_forward.down_proj.weight": ("down_w", True),
        }
        lm_weights: list[tuple[str, np.ndarray]] = []
        for name, w in weights_iter:
            w = np.asarray(w)
            name = name.removeprefix("model.")
            if name == "vision_tower.patch_conv.weight":
                vis["patch_conv"][...] = w.reshape(D, -1).T.astype(
                    np_dtype)
            elif name == "vision_tower.ln_pre.weight":
                vis["ln_pre"][...] = w.astype(np_dtype)
            elif name.startswith("vision_tower.transformer.layers."):
                parts = name.split(".")
                li = int(parts[3])
                sub = ".".join(parts[4:])
                if sub in lmap:
                    key, transpose = lmap[sub]
                    vis["layers"][li][key][...] = \
                        (w.T if transpose else w).astype(np_dtype)
            elif name == "multi_modal_projector.norm.weight":
                top["projector"]["norm"][...] = w.astype(np_dtype)
            elif name == ("multi_modal_projector.patch_merger."
                          "merging_layer.weight"):
                top["projector"]["merge_w"][...] = w.T.astype(np_dtype)
            elif name == "multi_modal_projector.linear_1.weight":
                top["projector"]["w1"][...] = w.T.astype(np_dtype)
            elif name == "multi_modal_projector.linear_2.weight":
                top["projector"]["w2"][...] = w.T.astype(np_dtype)
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
        params = {"language": self.language.init_dummy_params(seed)}
        params.update(top)
        return params
