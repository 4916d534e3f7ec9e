"""CLIP vision encoder, functional JAX (reference behavior parity:
vllm/model_executor/models/clip.py CLIPVisionModel; used as the LLaVA
vision tower).

TPU notes: the patch conv is lowered to unfold+matmul (one MXU GEMM);
the encoder is a stacked lax.scan like the decoder stacks; attention is
plain bidirectional SDPA over <=1k tokens so XLA fusion is enough — no
paged KV involved."""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class ClipVisionArgs:
    hidden_size: int
    num_layers: int
    num_heads: int
    intermediate_size: int
    image_size: int
    patch_size: int
    num_channels: int = 3
    ln_eps: float = 1e-5
    act: str = "quick_gelu"

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def num_positions(self) -> int:
        return self.num_patches + 1  # + CLS

    @staticmethod
    def from_hf_config(v) -> "ClipVisionArgs":
        return ClipVisionArgs(
            hidden_size=v.hidden_size,
            num_layers=v.num_hidden_layers,
            num_heads=v.num_attention_heads,
            intermediate_size=v.intermediate_size,
            image_size=v.image_size,
            patch_size=v.patch_size,
            num_channels=getattr(v, "num_channels", 3),
            ln_eps=float(getattr(v, "layer_norm_eps", 1e-5)),
            act=getattr(v, "hidden_act", "quick_gelu"),
        )


def _act(x: jnp.ndarray, name: str) -> jnp.ndarray:
    if name == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    return jax.nn.gelu(x, approximate=name != "gelu")


def _ln(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


class ClipVisionTower:

    def __init__(self, args: ClipVisionArgs,
                 feature_layer: int = -2) -> None:
        self.args = args
        # vision_feature_layer: hidden states AFTER this many encoder
        # layers (-2 => skip the final layer, llava default)
        self.num_run_layers = args.num_layers + 1 + feature_layer \
            if feature_layer < 0 else feature_layer
        self.scale = 1.0 / math.sqrt(args.hidden_size // args.num_heads)

    # ------------------------------------------------------------ forward

    def forward(self, p: dict, pixel_values: jnp.ndarray) -> jnp.ndarray:
        """pixel_values: [B, C, H, W] -> hidden [B, num_positions, D]
        at the selected feature layer."""
        a = self.args
        B = pixel_values.shape[0]
        P = a.patch_size
        n_side = a.image_size // P
        # unfold into patches -> one GEMM (conv stride=kernel=patch)
        x = pixel_values.reshape(B, a.num_channels, n_side, P, n_side, P)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(
            B, n_side * n_side, a.num_channels * P * P)
        x = x.astype(p["patch_embed"].dtype) @ p["patch_embed"]
        cls = jnp.broadcast_to(p["class_embed"][None, None, :],
                               (B, 1, a.hidden_size)).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)
        x = x + p["pos_embed"][None, :, :].astype(x.dtype)
        x = _ln(x, p["pre_ln_w"], p["pre_ln_b"], a.ln_eps)

        layers = jax.tree.map(
            lambda leaf: leaf[:self.num_run_layers], p["layers"])

        def body(h, lp):
            return self._layer(lp, h), None

        x, _ = jax.lax.scan(body, x, layers)
        return x

    def _layer(self, lp: dict, x: jnp.ndarray) -> jnp.ndarray:
        a = self.args
        B, T, D = x.shape
        nh = a.num_heads
        hd = D // nh
        h = _ln(x, lp["ln1_w"], lp["ln1_b"], a.ln_eps)
        qkv = h @ lp["qkv_w"] + lp["qkv_b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, T, nh, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, T, nh, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, nh, hd).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                            k.astype(jnp.float32)) * self.scale
        probs = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("bhqk,bhkd->bhqd", probs,
                          v.astype(jnp.float32)).astype(x.dtype)
        attn = attn.transpose(0, 2, 1, 3).reshape(B, T, D)
        x = x + (attn @ lp["o_w"] + lp["o_b"])
        h = _ln(x, lp["ln2_w"], lp["ln2_b"], a.ln_eps)
        h = _act(h @ lp["fc1_w"] + lp["fc1_b"], a.act)
        return x + (h @ lp["fc2_w"] + lp["fc2_b"])

    # ------------------------------------------------------------ weights

    def alloc(self, np_dtype) -> dict:
        a = self.args
        L, D, I = a.num_layers, a.hidden_size, a.intermediate_size
        return {
            "patch_embed": np.zeros(
                (a.num_channels * a.patch_size ** 2, D), np_dtype),
            "class_embed": np.zeros((D,), np_dtype),
            "pos_embed": np.zeros((a.num_positions, D), np_dtype),
            "pre_ln_w": np.zeros((D,), np_dtype),
            "pre_ln_b": np.zeros((D,), np_dtype),
            "layers": {
                "ln1_w": np.zeros((L, D), np_dtype),
                "ln1_b": np.zeros((L, D), np_dtype),
                "qkv_w": np.zeros((L, D, 3 * D), np_dtype),
                "qkv_b": np.zeros((L, 3 * D), np_dtype),
                "o_w": np.zeros((L, D, D), np_dtype),
                "o_b": np.zeros((L, D), np_dtype),
                "ln2_w": np.zeros((L, D), np_dtype),
                "ln2_b": np.zeros((L, D), np_dtype),
                "fc1_w": np.zeros((L, D, I), np_dtype),
                "fc1_b": np.zeros((L, I), np_dtype),
                "fc2_w": np.zeros((L, I, D), np_dtype),
                "fc2_b": np.zeros((L, D), np_dtype),
            },
        }

    def load_one(self, p: dict, name: str, w: np.ndarray,
                 np_dtype) -> bool:
        """Consume one `vision_model.`-relative tensor; True if taken."""
        a = self.args
        D = a.hidden_size
        if name == "embeddings.patch_embedding.weight":
            # conv [D, C, P, P] -> unfold layout [C*P*P, D] matching
            # x.transpose(..., C, P, P) flattening
            p["patch_embed"][...] = w.reshape(D, -1).T.astype(np_dtype)
        elif name == "embeddings.class_embedding":
            p["class_embed"][...] = w.astype(np_dtype)
        elif name == "embeddings.position_embedding.weight":
            p["pos_embed"][...] = w.astype(np_dtype)
        elif name == "pre_layrnorm.weight":  # sic, HF typo is canonical
            p["pre_ln_w"][...] = w.astype(np_dtype)
        elif name == "pre_layrnorm.bias":
            p["pre_ln_b"][...] = w.astype(np_dtype)
        elif name.startswith("encoder.layers."):
            rest = name[len("encoder.layers."):]
            li_s, suffix = rest.split(".", 1)
            li = int(li_s)
            lmap = {
                "layer_norm1.weight": ("ln1_w", False),
                "layer_norm1.bias": ("ln1_b", False),
                "layer_norm2.weight": ("ln2_w", False),
                "layer_norm2.bias": ("ln2_b", False),
                "self_attn.out_proj.weight": ("o_w", True),
                "self_attn.out_proj.bias": ("o_b", False),
                "mlp.fc1.weight": ("fc1_w", True),
                "mlp.fc1.bias": ("fc1_b", False),
                "mlp.fc2.weight": ("fc2_w", True),
                "mlp.fc2.bias": ("fc2_b", False),
            }
            qkv = {"self_attn.q_proj": 0, "self_attn.k_proj": 1,
                   "self_attn.v_proj": 2}
            for prefix, slot in qkv.items():
                if suffix == f"{prefix}.weight":
                    p["layers"]["qkv_w"][li, :, slot * D:(slot + 1) *
                                         D] = w.T.astype(np_dtype)
                    return True
                if suffix == f"{prefix}.bias":
                    p["layers"]["qkv_b"][li, slot * D:(slot + 1) * D] = \
                        w.astype(np_dtype)
                    return True
            if suffix in lmap:
                key, transpose = lmap[suffix]
                p["layers"][key][li] = (w.T if transpose else w) \
                    .astype(np_dtype)
            else:
                return False
        else:
            return False
        return True


class SiglipVisionTower(ClipVisionTower):
    """SigLIP vision encoder (reference: vllm models/siglip.py; used by
    Idefics3/SmolVLM, Gemma3, PaliGemma, AyaVision towers).

    vs CLIP: no CLS token, biased patch conv, no pre-LN, learned
    positions over exactly num_patches, gelu_pytorch_tanh MLP, and a
    post-LN applied to the LAST hidden state (feature_layer=-1 keeps
    every encoder layer and applies it; earlier feature layers skip it,
    matching HF's vision_feature_layer semantics)."""

    def __init__(self, args: ClipVisionArgs,
                 feature_layer: int = -1,
                 pos_ids: Optional[np.ndarray] = None,
                 post_ln: Optional[bool] = None) -> None:
        super().__init__(args, feature_layer=feature_layer)
        # post-LN convention differs by consumer: Idefics3 reads
        # last_hidden_state (post-LN applied); AyaVision/LLaVA-style
        # consumers read hidden_states[-1] (pre-post-LN)
        self.apply_post_ln = (feature_layer == -1 if post_ln is None
                              else post_ln)
        # non-trivial position-id mapping (Idefics3's bucketized ids);
        # None = identity (plain SigLIP)
        self.pos_ids = pos_ids

    def forward(self, p: dict, pixel_values: jnp.ndarray) -> jnp.ndarray:
        a = self.args
        B = pixel_values.shape[0]
        P = a.patch_size
        n_side = a.image_size // P
        x = pixel_values.reshape(B, a.num_channels, n_side, P, n_side, P)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(
            B, n_side * n_side, a.num_channels * P * P)
        x = x.astype(p["patch_embed"].dtype) @ p["patch_embed"] \
            + p["patch_bias"]
        pos = p["pos_embed"]
        if self.pos_ids is not None:
            pos = pos[jnp.asarray(self.pos_ids)]
        x = x + pos[None, :, :].astype(x.dtype)

        layers = jax.tree.map(
            lambda leaf: leaf[:self.num_run_layers], p["layers"])

        def body(h, lp):
            return self._layer(lp, h), None

        x, _ = jax.lax.scan(body, x, layers)
        if self.apply_post_ln:
            x = _ln(x, p["post_ln_w"], p["post_ln_b"], a.ln_eps)
        return x

    def alloc(self, np_dtype) -> dict:
        a = self.args
        p = super().alloc(np_dtype)
        del p["class_embed"], p["pre_ln_w"], p["pre_ln_b"]
        p["patch_bias"] = np.zeros((a.hidden_size,), np_dtype)
        p["pos_embed"] = np.zeros((a.num_patches, a.hidden_size),
                                  np_dtype)
        p["post_ln_w"] = np.zeros((a.hidden_size,), np_dtype)
        p["post_ln_b"] = np.zeros((a.hidden_size,), np_dtype)
        return p

    def load_one(self, p: dict, name: str, w: np.ndarray,
                 np_dtype) -> bool:
        a = self.args
        if name == "embeddings.patch_embedding.bias":
            p["patch_bias"][...] = w.astype(np_dtype)
        elif name == "post_layernorm.weight":
            p["post_ln_w"][...] = w.astype(np_dtype)
        elif name == "post_layernorm.bias":
            p["post_ln_b"][...] = w.astype(np_dtype)
        elif name == "embeddings.position_embedding.weight":
            p["pos_embed"][...] = w.astype(np_dtype)
        else:
            return super().load_one(p, name, w, np_dtype)
        return True
