"""Qwen2-VL — vision-language model with MRoPE
(reference behavior parity: vllm/model_executor/models/qwen2_vl.py
Qwen2VLForConditionalGeneration; architecture re-derived).

Composition: Qwen2 ViT (conv-patchify as a linear over the flattened
[3 x temporal x ps x ps] patch, 2D rotary over (h, w) patch coordinates,
LayerNorm blocks with quick-GELU MLP, full attention within each image)
-> 2x2 spatial PatchMerger -> image embeddings substituted at
<|image_pad|> placeholders. The text backbone is Qwen2 with MRoPE: every
head's rotary bands split into (temporal, height, width) sections whose
angles come from 3D token positions (get_rope_index semantics replicated
in compute_mrope below).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vllm_tpu.config import ModelConfig
from vllm_tpu.core.kv_cache_interface import KVCacheSpec
from vllm_tpu.models.llama import Qwen2ForCausalLM, _np_dtype
from vllm_tpu.ops.rotary import apply_mrope, apply_rope


def _quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    return (xf * jax.nn.sigmoid(1.702 * xf)).astype(x.dtype)


class _Qwen2TextWithMRoPE(Qwen2ForCausalLM):
    """Qwen2 backbone whose rope hook consumes 3D MRoPE positions."""

    mrope_section: tuple[int, ...] = ()

    def _apply_rope_qk(self, q, k, metadata, inv_freq=None):
        if metadata.mrope_positions is None:
            return super()._apply_rope_qk(q, k, metadata, inv_freq)
        if inv_freq is None:
            inv_freq = self.inv_freq
        return apply_mrope(q, k, metadata.mrope_positions, inv_freq,
                           self.mrope_section, self.rope_mscale)


class Qwen2VLForConditionalGeneration:

    uses_mrope = True

    def __init__(self, model_config: ModelConfig) -> None:
        self.model_config = model_config
        hf = model_config.resolve_hf_config()
        self.image_token_index = int(getattr(hf, "image_token_id", 151655))
        v = hf.vision_config
        self.v_embed = int(getattr(v, "embed_dim",
                                   getattr(v, "hidden_size", 1280)))
        self.v_depth = int(v.depth)
        self.v_heads = int(v.num_heads)
        self.v_head_dim = self.v_embed // self.v_heads
        self.v_mlp = int(
            getattr(v, "mlp_ratio", 4) * self.v_embed
            if not hasattr(v, "intermediate_size") else v.intermediate_size)
        self.patch_size = int(v.patch_size)
        self.temporal_patch = int(getattr(v, "temporal_patch_size", 2))
        self.merge = int(getattr(v, "spatial_merge_size", 2))
        self.in_ch = int(getattr(v, "in_channels", 3))
        self.v_out = int(getattr(v, "hidden_size", hf.hidden_size))
        self.patch_in = (self.in_ch * self.temporal_patch *
                         self.patch_size ** 2)

        lm_config = ModelConfig(model=model_config.model,
                                dtype=model_config.dtype, hf_config=hf)
        self.language = _Qwen2TextWithMRoPE(lm_config)
        scaling = getattr(hf, "rope_scaling", None) or {}
        sec = scaling.get("mrope_section") or [16, 24, 24]
        self.language.mrope_section = tuple(int(x) for x in sec)
        self.mrope_section = self.language.mrope_section
        self.args = self.language.args
        self.dtype = self.language.dtype

    # -------------------------------------------------------------- mrope

    def compute_mrope(self, prompt_ids, mm_inputs
                      ) -> tuple[np.ndarray, int]:
        """3D positions for one prompt + decode delta (reference:
        Qwen2-VL get_rope_index / MRotaryEmbedding.get_input_positions).
        Text tokens advance all three rows together; each image span is
        a (t, h/merge, w/merge) grid offset at the running position, and
        the running position then jumps past max(t, lh, lw)."""
        ids = list(prompt_ids)
        P = len(ids)
        pos = np.zeros((3, P), np.int64)
        grids = None
        if mm_inputs is not None and mm_inputs.get(
                "image_grid_thw") is not None:
            grids = np.asarray(mm_inputs["image_grid_thw"]).reshape(-1, 3)
        cur = 0
        img_i = 0
        i = 0
        while i < P:
            if (grids is not None and img_i < len(grids)
                    and ids[i] == self.image_token_index):
                t, h, w = (int(x) for x in grids[img_i])
                img_i += 1
                lh, lw = h // self.merge, w // self.merge
                n = t * lh * lw
                tt = np.repeat(np.arange(t), lh * lw)
                hh = np.tile(np.repeat(np.arange(lh), lw), t)
                ww = np.tile(np.arange(lw), t * lh)
                pos[0, i:i + n] = cur + tt
                pos[1, i:i + n] = cur + hh
                pos[2, i:i + n] = cur + ww
                cur += max(t, lh, lw)
                i += n
            else:
                pos[:, i] = cur
                cur += 1
                i += 1
        return pos.astype(np.int32), int(cur - P)

    # ------------------------------------------------------------- vision

    def _vision_rotary(self, grid: tuple[int, int, int]) -> jnp.ndarray:
        """Per-patch rotary angles [n, head_dim/2]: first half from the
        h coordinate, second from w, with the 2x2 merge-window patch
        ordering the Qwen2-VL image processor emits."""
        t, h, w = grid
        ms = self.merge
        dim = self.v_head_dim // 2  # rotary half-dim per patch
        inv_freq = 1.0 / (10000.0 ** (
            np.arange(0, dim, 2, dtype=np.float32) / dim))
        hpos = np.arange(h)[:, None].repeat(w, 1)
        wpos = np.arange(w)[None, :].repeat(h, 0)

        def blockify(x):
            return x.reshape(h // ms, ms, w // ms, ms).transpose(
                0, 2, 1, 3).reshape(-1)

        hpos = np.tile(blockify(hpos), t)
        wpos = np.tile(blockify(wpos), t)
        ang_h = hpos[:, None].astype(np.float32) * inv_freq[None, :]
        ang_w = wpos[:, None].astype(np.float32) * inv_freq[None, :]
        return jnp.asarray(np.concatenate([ang_h, ang_w], axis=1))

    def encode_image_mm(self, params: dict, mm_inputs: dict) -> np.ndarray:
        """Encode all images of one request -> [total_merged_tokens, H]."""
        pv = np.asarray(mm_inputs["pixel_values"], np.float32)
        grids = np.asarray(mm_inputs["image_grid_thw"]).reshape(-1, 3)
        outs = []
        off = 0
        for g in grids:
            t, h, w = (int(x) for x in g)
            n = t * h * w
            outs.append(np.asarray(
                self._encode_one(params, jnp.asarray(pv[off:off + n],
                                                     self.dtype),
                                 (t, h, w)), np.float32))
            off += n
        return np.concatenate(outs, axis=0)

    def _encode_one(self, params, patches: jnp.ndarray,
                    grid: tuple[int, int, int]) -> jnp.ndarray:
        """[n_patches, patch_in] -> [n_patches / merge^2, H_text]."""
        vp = params["visual"]
        x = patches @ vp["patch_embed"]  # conv-as-linear, no bias
        angles = self._vision_rotary(grid)  # [n, head_dim/2]
        cos = jnp.cos(angles)[:, None, :].astype(jnp.float32)
        sin = jnp.sin(angles)[:, None, :].astype(jnp.float32)
        nh, hd = self.v_heads, self.v_head_dim
        n = x.shape[0]
        # ViT attention is restricted WITHIN each temporal frame (HF
        # cu_seqlens per t; patches are frame-major after blockify), so
        # video inputs (t>1) don't attend across frames (ADVICE r02).
        frame_mask = None
        t_frames = grid[0]
        if t_frames > 1:
            seg = jnp.arange(n, dtype=jnp.int32) // (grid[1] * grid[2])
            frame_mask = jnp.where(seg[:, None] == seg[None, :], 0.0,
                                   -jnp.inf).astype(jnp.float32)

        def rot(v):
            vf = v.astype(jnp.float32)
            v1, v2 = jnp.split(vf, 2, axis=-1)
            return jnp.concatenate(
                [v1 * cos - v2 * sin, v2 * cos + v1 * sin],
                axis=-1).astype(v.dtype)

        def ln(v, w, b):
            vf = v.astype(jnp.float32)
            mean = vf.mean(-1, keepdims=True)
            var = vf.var(-1, keepdims=True)
            out = (vf - mean) * jax.lax.rsqrt(var + 1e-6)
            return (out * w + b).astype(v.dtype)

        lp = vp["layers"]
        for li in range(self.v_depth):
            h1 = ln(x, lp["ln1_w"][li], lp["ln1_b"][li])
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
            o = o.reshape(n, nh * hd) @ lp["proj_w"][li] + \
                lp["proj_b"][li]
            x = x + o
            h2 = ln(x, lp["ln2_w"][li], lp["ln2_b"][li])
            m = _quick_gelu(h2 @ lp["fc1_w"][li] + lp["fc1_b"][li])
            x = x + (m @ lp["fc2_w"][li] + lp["fc2_b"][li])

        mg = vp["merger"]
        x = ln(x, mg["ln_q_w"], mg["ln_q_b"])
        x = x.reshape(-1, self.v_embed * self.merge ** 2)
        x = jax.nn.gelu(
            (x @ mg["fc1_w"] + mg["fc1_b"]).astype(jnp.float32),
            approximate=False).astype(x.dtype)
        return x @ mg["fc2_w"] + mg["fc2_b"]

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

    def _alloc_visual(self, npd) -> dict:
        E, D, M = self.v_embed, self.v_depth, self.v_mlp
        out = self.v_out
        merged = E * self.merge ** 2
        return {
            "patch_embed": np.zeros((self.patch_in, E), npd),
            "layers": {
                "ln1_w": np.zeros((D, E), npd),
                "ln1_b": np.zeros((D, E), npd),
                "ln2_w": np.zeros((D, E), npd),
                "ln2_b": np.zeros((D, E), npd),
                "qkv_w": np.zeros((D, E, 3 * E), npd),
                "qkv_b": np.zeros((D, 3 * E), npd),
                "proj_w": np.zeros((D, E, E), npd),
                "proj_b": np.zeros((D, E), npd),
                "fc1_w": np.zeros((D, E, M), npd),
                "fc1_b": np.zeros((D, M), npd),
                "fc2_w": np.zeros((D, M, E), npd),
                "fc2_b": np.zeros((D, E), npd),
            },
            "merger": {
                "ln_q_w": np.zeros((E,), npd),
                "ln_q_b": np.zeros((E,), npd),
                "fc1_w": np.zeros((merged, merged), npd),
                "fc1_b": np.zeros((merged,), npd),
                "fc2_w": np.zeros((merged, out), npd),
                "fc2_b": np.zeros((out,), npd),
            },
        }

    _V_MAP = {
        "norm1.weight": ("ln1_w", False),
        "norm1.bias": ("ln1_b", False),
        "norm2.weight": ("ln2_w", False),
        "norm2.bias": ("ln2_b", False),
        "attn.qkv.weight": ("qkv_w", True),
        "attn.qkv.bias": ("qkv_b", False),
        "attn.proj.weight": ("proj_w", True),
        "attn.proj.bias": ("proj_b", False),
        "mlp.fc1.weight": ("fc1_w", True),
        "mlp.fc1.bias": ("fc1_b", False),
        "mlp.fc2.weight": ("fc2_w", True),
        "mlp.fc2.bias": ("fc2_b", False),
    }

    def load_weights(self, weights_iter) -> dict:
        npd = _np_dtype(self.model_config.dtype)
        visual = self._alloc_visual(npd)
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
                elif sub.startswith("merger."):
                    mg = visual["merger"]
                    key = sub[len("merger."):]
                    mm = {
                        "ln_q.weight": ("ln_q_w", False),
                        "ln_q.bias": ("ln_q_b", False),
                        "mlp.0.weight": ("fc1_w", True),
                        "mlp.0.bias": ("fc1_b", False),
                        "mlp.2.weight": ("fc2_w", True),
                        "mlp.2.bias": ("fc2_b", False),
                    }
                    if key in mm:
                        dest, tr = mm[key]
                        mg[dest][...] = (w.T if tr else w).astype(npd)
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
        params = {
            "language": self.language.load_weights(iter(lm_weights)),
            "visual": visual,
        }
        return params

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
        visual["merger"]["ln_q_w"] = np.ones_like(
            visual["merger"]["ln_q_w"])
        return {
            "language": self.language.init_dummy_params(seed),
            "visual": visual,
        }


class Qwen25VLForConditionalGeneration(Qwen2VLForConditionalGeneration):
    """Qwen2.5-VL (reference parity: vllm .../models/qwen2_5_vl.py):
    same MRoPE text stack; the ViT swaps LayerNorm->RMSNorm, the MLP for
    SwiGLU, and runs WINDOW attention in most blocks (full attention only
    at fullatt_block_indexes), with patches reordered into merged-unit
    windows and restored before the merger output is consumed."""

    def __init__(self, model_config: ModelConfig) -> None:
        super().__init__(model_config)
        hf = model_config.resolve_hf_config()
        v = hf.vision_config
        self.v_embed = int(v.hidden_size)
        self.v_head_dim = self.v_embed // self.v_heads
        self.v_mlp = int(v.intermediate_size)
        self.v_out = int(getattr(v, "out_hidden_size", hf.hidden_size))
        self.patch_in = (self.in_ch * self.temporal_patch *
                         self.patch_size ** 2)
        self.window_size = int(getattr(v, "window_size", 112))
        self.fullatt_idx = set(
            getattr(v, "fullatt_block_indexes", None) or [])

    # ----------------------------------------------------- window layout

    def _window_index(self, grid: tuple[int, int, int]
                      ) -> tuple[np.ndarray, np.ndarray]:
        """(window_index over merged units, cu_window_seqlens in PATCHES)
        — replicates Qwen2_5_VisionTransformer.get_window_index."""
        t, h, w = grid
        ms = self.merge
        lh, lw = h // ms, w // ms
        unit = ms * ms
        vit_mw = self.window_size // ms // self.patch_size
        pad_h = (-lh) % vit_mw
        pad_w = (-lw) % vit_mw
        idx = np.arange(t * lh * lw).reshape(t, lh, lw)
        idx = np.pad(idx, ((0, 0), (0, pad_h), (0, pad_w)),
                     constant_values=-100)
        nh, nw = (lh + pad_h) // vit_mw, (lw + pad_w) // vit_mw
        idx = idx.reshape(t, nh, vit_mw, nw, vit_mw)
        idx = idx.transpose(0, 1, 3, 2, 4).reshape(t, nh * nw,
                                                   vit_mw * vit_mw)
        seqlens = (idx != -100).sum(axis=-1).reshape(-1) * unit
        flat = idx.reshape(-1)
        window_index = flat[flat != -100]
        cu = np.concatenate([[0], np.cumsum(seqlens)])
        cu = np.unique(cu)  # drop empty windows
        return window_index.astype(np.int64), cu.astype(np.int64)

    def _encode_one(self, params, patches: jnp.ndarray,
                    grid: tuple[int, int, int]) -> jnp.ndarray:
        vp = params["visual"]
        t, h, w = grid
        ms = self.merge
        unit = ms * ms
        n = patches.shape[0]
        x = patches @ vp["patch_embed"]
        angles = np.asarray(self._vision_rotary(grid))  # [n, hd/2]

        window_index, cu_win = self._window_index(grid)
        # reorder patches (and their rotary angles) by merged unit
        perm = (window_index[:, None] * unit +
                np.arange(unit)[None, :]).reshape(-1)
        x = x[jnp.asarray(perm)]
        angles = angles[perm]
        cos = jnp.asarray(np.cos(angles))[:, None, :].astype(jnp.float32)
        sin = jnp.asarray(np.sin(angles))[:, None, :].astype(jnp.float32)

        # segment ids: windows for windowed blocks, whole image for full
        win_seg = np.zeros(n, np.int32)
        for i in range(len(cu_win) - 1):
            win_seg[cu_win[i]:cu_win[i + 1]] = i
        win_seg = jnp.asarray(win_seg)
        full_seg = jnp.zeros(n, jnp.int32)

        nh, hd = self.v_heads, self.v_head_dim

        def rot(v):
            vf = v.astype(jnp.float32)
            v1, v2 = jnp.split(vf, 2, axis=-1)
            return jnp.concatenate(
                [v1 * cos - v2 * sin, v2 * cos + v1 * sin],
                axis=-1).astype(v.dtype)

        def rms(v, wt):
            vf = v.astype(jnp.float32)
            out = vf * jax.lax.rsqrt(
                jnp.mean(vf * vf, -1, keepdims=True) + 1e-6)
            return (out * wt).astype(v.dtype)

        lp = vp["layers"]
        for li in range(self.v_depth):
            seg = full_seg if li in self.fullatt_idx else win_seg
            h1 = rms(x, lp["ln1_w"][li])
            qkv = h1 @ lp["qkv_w"][li] + lp["qkv_b"][li]
            q, k, v = jnp.split(qkv.reshape(n, 3, nh, hd), 3, axis=1)
            q = rot(q[:, 0])
            k = rot(k[:, 0])
            v = v[:, 0]
            scores = jnp.einsum("qhd,khd->hqk", q.astype(jnp.float32),
                                k.astype(jnp.float32)) / math.sqrt(hd)
            mask = (seg[:, None] == seg[None, :])[None]
            scores = jnp.where(mask, scores, -1e30)
            probs = jax.nn.softmax(scores, axis=-1)
            o = jnp.einsum("hqk,khd->qhd", probs,
                           v.astype(jnp.float32)).astype(x.dtype)
            o = o.reshape(n, nh * hd) @ lp["proj_w"][li] + \
                lp["proj_b"][li]
            x = x + o
            h2 = rms(x, lp["ln2_w"][li])
            gate = h2 @ lp["gate_w"][li] + lp["gate_b"][li]
            up = h2 @ lp["up_w"][li] + lp["up_b"][li]
            act = (jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype)
                   * up)
            x = x + (act @ lp["down_w"][li] + lp["down_b"][li])

        mg = vp["merger"]
        x = rms(x, mg["ln_q_w"])
        x = x.reshape(-1, self.v_embed * unit)
        x = jax.nn.gelu(
            (x @ mg["fc1_w"] + mg["fc1_b"]).astype(jnp.float32),
            approximate=False).astype(x.dtype)
        x = x @ mg["fc2_w"] + mg["fc2_b"]
        # restore original merged-unit order
        inv = np.argsort(window_index)
        return x[jnp.asarray(inv)]

    # ------------------------------------------------------------ weights

    def _alloc_visual(self, npd) -> dict:
        E, D, M = self.v_embed, self.v_depth, self.v_mlp
        merged = E * self.merge ** 2
        return {
            "patch_embed": np.zeros((self.patch_in, E), npd),
            "layers": {
                "ln1_w": np.zeros((D, E), npd),
                "ln2_w": np.zeros((D, E), npd),
                "qkv_w": np.zeros((D, E, 3 * E), npd),
                "qkv_b": np.zeros((D, 3 * E), npd),
                "proj_w": np.zeros((D, E, E), npd),
                "proj_b": np.zeros((D, E), npd),
                "gate_w": np.zeros((D, E, M), npd),
                "gate_b": np.zeros((D, M), npd),
                "up_w": np.zeros((D, E, M), npd),
                "up_b": np.zeros((D, M), npd),
                "down_w": np.zeros((D, M, E), npd),
                "down_b": np.zeros((D, E), npd),
            },
            "merger": {
                "ln_q_w": np.zeros((E,), npd),
                "fc1_w": np.zeros((merged, merged), npd),
                "fc1_b": np.zeros((merged,), npd),
                "fc2_w": np.zeros((merged, self.v_out), npd),
                "fc2_b": np.zeros((self.v_out,), npd),
            },
        }

    _V_MAP = {
        "norm1.weight": ("ln1_w", False),
        "norm2.weight": ("ln2_w", False),
        "attn.qkv.weight": ("qkv_w", True),
        "attn.qkv.bias": ("qkv_b", False),
        "attn.proj.weight": ("proj_w", True),
        "attn.proj.bias": ("proj_b", False),
        "mlp.gate_proj.weight": ("gate_w", True),
        "mlp.gate_proj.bias": ("gate_b", False),
        "mlp.up_proj.weight": ("up_w", True),
        "mlp.up_proj.bias": ("up_b", False),
        "mlp.down_proj.weight": ("down_w", True),
        "mlp.down_proj.bias": ("down_b", False),
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
        visual["merger"]["ln_q_w"] = np.ones_like(
            visual["merger"]["ln_q_w"])
        return {
            "language": self.language.init_dummy_params(seed),
            "visual": visual,
        }
