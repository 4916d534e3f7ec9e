"""GLM-4.1V — GLM-4V vision-language model with GLM-flavored MRoPE
(reference behavior parity: vllm/model_executor/models/glm4_1v.py
Glm4vForConditionalGeneration; architecture re-derived).

Vision: Qwen-style packed patches through a ViT with RMSNorm blocks,
2D rotary over (h, w), LEARNED position embeddings bicubically
grid-sampled to each image's grid (Glm4vVisionEmbeddings), then
post-LN -> 2x2 stride-2 downsample conv -> gated-MLP merger. Text:
GLM-4 decoder (sandwich norms, fused gate_up, interleaved partial
rotary) whose rope consumes 3D MRoPE positions with the GLM twist —
section-merged angles applied to interleaved (2i, 2i+1) pairs over the
partial rotary width (modeling_glm4v.py
apply_multimodal_rotary_pos_emb)."""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from vllm_tpu.config import ModelConfig
from vllm_tpu.core.kv_cache_interface import KVCacheSpec
from vllm_tpu.models.llama import _np_dtype
from vllm_tpu.models.llama_variants import Glm4ForCausalLM
from vllm_tpu.models.qwen2_vl import Qwen2VLForConditionalGeneration
from vllm_tpu.ops.rotary import apply_mrope


def _cubic_weights(t: np.ndarray, a: float = -0.75) -> list[np.ndarray]:
    """Cubic-convolution tap weights for offsets (-1, 0, 1, 2) — the
    kernel torch grid_sample(mode="bicubic") uses (A = -0.75)."""
    w0 = ((a * (t + 1) - 5 * a) * (t + 1) + 8 * a) * (t + 1) - 4 * a
    w1 = ((a + 2) * t - (a + 3)) * t * t + 1
    u = 1 - t
    w2 = ((a + 2) * u - (a + 3)) * u * u + 1
    w3 = 1 - w0 - w1 - w2
    return [w0, w1, w2, w3]


def bicubic_grid_sample_border(img: np.ndarray, gx: np.ndarray,
                               gy: np.ndarray) -> np.ndarray:
    """torch.grid_sample(mode="bicubic", align_corners=False,
    padding_mode="border") over img [H, W, C] at normalized coords
    gx/gy [N] in [-1, 1] -> [N, C]."""
    H, W, _ = img.shape
    ix = ((gx + 1) * W - 1) / 2
    iy = ((gy + 1) * H - 1) / 2
    ix0 = np.floor(ix)
    iy0 = np.floor(iy)
    wx = _cubic_weights((ix - ix0).astype(np.float32))
    wy = _cubic_weights((iy - iy0).astype(np.float32))
    out = 0.0
    for j in range(4):
        yy = np.clip(iy0.astype(np.int64) - 1 + j, 0, H - 1)
        row = 0.0
        for i in range(4):
            xx = np.clip(ix0.astype(np.int64) - 1 + i, 0, W - 1)
            row = row + img[yy, xx] * wx[i][:, None]
        out = out + row * wy[j][:, None]
    return out


class _Glm4TextWithMRoPE(Glm4ForCausalLM):
    """GLM-4 backbone whose rope hook consumes 3D MRoPE positions,
    applied interleaved over the partial rotary width."""

    mrope_section: tuple[int, ...] = ()

    def _apply_rope_qk(self, q, k, metadata, inv_freq=None):
        if metadata.mrope_positions is None:
            return super()._apply_rope_qk(q, k, metadata, inv_freq)
        if inv_freq is None:
            inv_freq = self.inv_freq
        return apply_mrope(q, k, metadata.mrope_positions, inv_freq,
                           self.mrope_section, self.rope_mscale,
                           interleaved=True)


class Glm4vForConditionalGeneration(Qwen2VLForConditionalGeneration):

    uses_mrope = True

    def __init__(self, model_config: ModelConfig) -> None:
        self.model_config = model_config
        hf = model_config.resolve_hf_config()
        self.image_token_index = int(getattr(hf, "image_token_id",
                                             151363))
        v = hf.vision_config
        self.v_embed = int(v.hidden_size)
        self.v_depth = int(v.depth)
        self.v_heads = int(v.num_heads)
        self.v_head_dim = self.v_embed // self.v_heads
        # Glm4VisionMlp intermediate is out_hidden_size
        # (modeling_glm4v.py:70)
        self.v_mlp = int(v.out_hidden_size)
        self.v_inter = int(v.intermediate_size)
        self.patch_size = int(v.patch_size)
        self.temporal_patch = int(getattr(v, "temporal_patch_size", 2))
        self.merge = int(getattr(v, "spatial_merge_size", 2))
        self.in_ch = int(getattr(v, "in_channels", 3))
        self.v_out = int(v.out_hidden_size)
        self.v_eps = float(getattr(v, "rms_norm_eps", 1e-5))
        self.num_pos = (int(v.image_size) // self.patch_size) ** 2
        self.patch_in = (self.in_ch * self.temporal_patch *
                         self.patch_size ** 2)

        txt = hf.text_config
        lm_config = ModelConfig(model=model_config.model,
                                dtype=model_config.dtype, hf_config=txt)
        self.language = _Glm4TextWithMRoPE(lm_config)
        scaling = getattr(txt, "rope_scaling", None) or {}
        sec = scaling.get("mrope_section") or [8, 12, 12]
        self.language.mrope_section = tuple(int(x) for x in sec)
        self.mrope_section = self.language.mrope_section
        self.args = self.language.args
        self.dtype = self.language.dtype

    # ------------------------------------------------------------- vision

    def _pos_embed_adapted(self, pos_w: np.ndarray,
                           grid: tuple[int, int, int]) -> np.ndarray:
        """Bicubic interpolation of the learned [S*S, E] position table
        to this image's (h, w) patch coords, in the merge-window patch
        order (Glm4vVisionEmbeddings.forward)."""
        t, h, w = grid
        ms = self.merge
        S = int(round(math.sqrt(pos_w.shape[0])))
        img = pos_w.reshape(S, S, -1).astype(np.float32)

        def blockify(x):
            return x.reshape(h // ms, ms, w // ms, ms).transpose(
                0, 2, 1, 3).reshape(-1)

        hc = np.tile(blockify(np.arange(h)[:, None].repeat(w, 1)), t)
        wc = np.tile(blockify(np.arange(w)[None, :].repeat(h, 0)), t)
        gx = ((wc + 0.5) / w) * 2 - 1
        gy = ((hc + 0.5) / h) * 2 - 1
        return bicubic_grid_sample_border(img, gx.astype(np.float32),
                                          gy.astype(np.float32))

    def _encode_one(self, params, patches: jnp.ndarray,
                    grid: tuple[int, int, int]) -> jnp.ndarray:
        vp = params["visual"]
        x = patches @ vp["patch_embed"] + vp["patch_embed_b"]
        n = x.shape[0]
        nh, hd = self.v_heads, self.v_head_dim
        ms = self.merge

        def rms(v, wt, eps=self.v_eps):
            vf = v.astype(jnp.float32)
            out = vf * jax.lax.rsqrt(
                jnp.mean(vf * vf, -1, keepdims=True) + eps)
            return (out * wt).astype(v.dtype)

        x = rms(x, vp["post_conv_ln"])
        x = x + jnp.asarray(
            self._pos_embed_adapted(np.asarray(vp["pos_embed"]), grid),
            x.dtype)

        angles = self._vision_rotary(grid)  # [n, head_dim/2]
        cos = jnp.cos(angles)[:, None, :].astype(jnp.float32)
        sin = jnp.sin(angles)[:, None, :].astype(jnp.float32)

        frame_mask = None
        if grid[0] > 1:  # attention within each temporal frame
            seg = jnp.arange(n, dtype=jnp.int32) // (grid[1] * grid[2])
            frame_mask = jnp.where(seg[:, None] == seg[None, :], 0.0,
                                   -jnp.inf).astype(jnp.float32)

        def rot(v):
            vf = v.astype(jnp.float32)
            v1, v2 = jnp.split(vf, 2, axis=-1)
            return jnp.concatenate(
                [v1 * cos - v2 * sin, v2 * cos + v1 * sin],
                axis=-1).astype(v.dtype)

        lp = vp["layers"]
        for li in range(self.v_depth):
            h1 = rms(x, lp["ln1_w"][li])
            qkv = h1 @ lp["qkv_w"][li] + lp["qkv_b"][li]
            q, k, v = jnp.split(qkv.reshape(n, 3, nh, hd), 3, axis=1)
            q = rot(q[:, 0])
            k = rot(k[:, 0])
            v = v[:, 0]
            scores = jnp.einsum("qhd,khd->hqk", q.astype(jnp.float32),
                                k.astype(jnp.float32)) / math.sqrt(hd)
            if frame_mask is not None:
                scores = scores + frame_mask[None]
            probs = jax.nn.softmax(scores, axis=-1)
            o = jnp.einsum("hqk,khd->qhd", probs,
                           v.astype(jnp.float32)).astype(x.dtype)
            x = x + o.reshape(n, nh * hd) @ lp["proj_w"][li]
            h2 = rms(x, lp["ln2_w"][li])
            gate = h2 @ lp["gate_w"][li]
            up = h2 @ lp["up_w"][li]
            act = (jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype)
                   * up)
            x = x + act @ lp["down_w"][li]

        x = rms(x, vp["post_ln"])
        # 2x2 downsample conv over each merge window (stride=merge)
        x = x.reshape(-1, ms * ms * self.v_embed)
        x = x @ vp["downsample_w"] + vp["downsample_b"]

        # merger: proj -> LayerNorm -> GELU -> gated MLP
        mg = vp["merger"]
        x = x @ mg["proj_w"]
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = xf.var(-1, keepdims=True)
        x = ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * mg["ln_w"] +
             mg["ln_b"]).astype(x.dtype)
        x = jax.nn.gelu(x.astype(jnp.float32),
                        approximate=False).astype(x.dtype)
        gate = x @ mg["gate_w"]
        up = x @ mg["up_w"]
        act = (jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype) *
               up)
        return act @ mg["down_w"]

    # ------------------------------------------------------------- weights

    def _alloc_visual(self, npd) -> dict:
        E, D, M = self.v_embed, self.v_depth, self.v_mlp
        out, inter = self.v_out, self.v_inter
        return {
            "patch_embed": np.zeros((self.patch_in, E), npd),
            "patch_embed_b": np.zeros((E,), npd),
            "pos_embed": np.zeros((self.num_pos, E), np.float32),
            "post_conv_ln": np.zeros((E,), npd),
            "post_ln": np.zeros((E,), npd),
            "downsample_w": np.zeros((self.merge ** 2 * E, out), npd),
            "downsample_b": np.zeros((out,), npd),
            "layers": {
                "ln1_w": np.zeros((D, E), npd),
                "ln2_w": np.zeros((D, E), npd),
                "qkv_w": np.zeros((D, E, 3 * E), npd),
                "qkv_b": np.zeros((D, 3 * E), npd),
                "proj_w": np.zeros((D, E, E), npd),
                "gate_w": np.zeros((D, E, M), npd),
                "up_w": np.zeros((D, E, M), npd),
                "down_w": np.zeros((D, M, E), npd),
            },
            "merger": {
                "proj_w": np.zeros((out, out), npd),
                "ln_w": np.zeros((out,), npd),
                "ln_b": np.zeros((out,), npd),
                "gate_w": np.zeros((out, inter), npd),
                "up_w": np.zeros((out, inter), npd),
                "down_w": np.zeros((inter, out), npd),
            },
        }

    _V_MAP = {
        "norm1.weight": ("ln1_w", False),
        "norm2.weight": ("ln2_w", False),
        "attn.qkv.weight": ("qkv_w", True),
        "attn.qkv.bias": ("qkv_b", False),
        "attn.proj.weight": ("proj_w", True),
        "mlp.gate_proj.weight": ("gate_w", True),
        "mlp.up_proj.weight": ("up_w", True),
        "mlp.down_proj.weight": ("down_w", True),
    }

    def load_weights(self, weights_iter) -> dict:
        npd = _np_dtype(self.model_config.dtype)
        visual = self._alloc_visual(npd)
        mg_map = {
            "proj.weight": "proj_w",
            "post_projection_norm.weight": "ln_w",
            "post_projection_norm.bias": "ln_b",
            "gate_proj.weight": "gate_w",
            "up_proj.weight": "up_w",
            "down_proj.weight": "down_w",
        }
        lm_weights: list[tuple[str, Any]] = []
        for name, w in weights_iter:
            w = np.asarray(w)
            name = name.removeprefix("model.") if name.startswith(
                ("model.visual", "model.language_model")) else name
            if name.startswith("visual."):
                sub = name[len("visual."):]
                if sub == "patch_embed.proj.weight":
                    visual["patch_embed"][...] = \
                        w.reshape(self.v_embed, -1).T.astype(npd)
                elif sub == "patch_embed.proj.bias":
                    visual["patch_embed_b"][...] = w.astype(npd)
                elif sub == "embeddings.position_embedding.weight":
                    visual["pos_embed"][...] = w.astype(np.float32)
                elif sub == "post_conv_layernorm.weight":
                    visual["post_conv_ln"][...] = w.astype(npd)
                elif sub == "post_layernorm.weight":
                    visual["post_ln"][...] = w.astype(npd)
                elif sub == "downsample.weight":
                    # conv [out, E, ms, ms] over the (ms, ms) window of
                    # E-dim patches laid out row-major -> linear over
                    # the flattened (ms*ms*E) window
                    out = w.shape[0]
                    visual["downsample_w"][...] = w.transpose(
                        2, 3, 1, 0).reshape(-1, out).astype(npd)
                elif sub == "downsample.bias":
                    visual["downsample_b"][...] = w.astype(npd)
                elif sub.startswith("merger."):
                    key = sub[len("merger."):]
                    if key in mg_map:
                        dest = mg_map[key]
                        visual["merger"][dest][...] = \
                            (w.T if dest.endswith("_w") else
                             w).astype(npd)
                elif sub.startswith("blocks."):
                    parts = sub.split(".")
                    li = int(parts[1])
                    leaf = ".".join(parts[2:])
                    if leaf in self._V_MAP:
                        dest, tr = self._V_MAP[leaf]
                        visual["layers"][dest][li] = \
                            (w.T if tr else w).astype(npd)
            elif name.startswith("language_model."):
                sub = name[len("language_model."):]
                if not sub.startswith(("model.", "lm_head.")):
                    sub = "model." + sub
                lm_weights.append((sub, w))
            else:
                lm_weights.append((name, w))
        return {
            "language": self.language.load_weights(iter(lm_weights)),
            "visual": visual,
        }

    def init_dummy_params(self, seed: int = 0) -> dict:
        rng = np.random.default_rng(seed)
        visual = self._alloc_visual(np.float32)

        def fill(leaf):
            if leaf.ndim >= 2:
                return (rng.standard_normal(leaf.shape) * 0.4 /
                        np.sqrt(leaf.shape[-1])).astype(np.float32)
            return np.zeros_like(leaf)

        visual = jax.tree.map(fill, visual)
        for k in ("ln1_w", "ln2_w"):
            visual["layers"][k] = np.ones_like(visual["layers"][k])
        for k in ("post_conv_ln", "post_ln"):
            visual[k] = np.ones_like(visual[k])
        visual["merger"]["ln_w"] = np.ones_like(visual["merger"]["ln_w"])
        return {
            "language": self.language.init_dummy_params(seed),
            "visual": visual,
        }
