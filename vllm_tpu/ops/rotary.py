"""Rotary position embeddings (reference: vllm/model_executor/layers/rotary_embedding.py).

Computed on the fly from absolute positions — pure jnp, fused by XLA into
the attention prologue (no precomputed cos/sin cache transfer needed; the
VPU recomputes cheaply relative to HBM traffic). Supports the variants the
supported model families need: base (GPT-NeoX layout), linear scaling,
Llama-3 scaling, YaRN (DeepSeek/Qwen long-context), and GPT-J interleaved
layout.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, NamedTuple, Optional

import jax.numpy as jnp


class LongRopeFreqs(NamedTuple):
    """LongRoPE (Phi-3 long-context, MiniCPM3; reference:
    rotary_embedding.py Phi3LongRoPEScaledRotaryEmbedding): per-dim
    frequency rescale factors, selected PER POSITION — positions below
    original_max_position_embeddings use the short factors, the rest
    the long factors; cos/sin are magnitude-scaled by the regime's
    mscale."""

    short: jnp.ndarray  # [rot/2]
    long: jnp.ndarray  # [rot/2]
    threshold: int  # original_max_position_embeddings
    short_mscale: float
    long_mscale: float


@dataclass(frozen=True)
class RopeConfig:
    head_size: int
    rotary_dim: int
    max_position: int
    base: float = 10000.0
    is_neox_style: bool = True  # True: half-split layout; False: interleaved
    scaling: Optional[dict[str, Any]] = None  # HF rope_scaling dict

    @staticmethod
    def from_hf_config(hf_config, head_size: int) -> "RopeConfig":
        rope_theta = float(getattr(hf_config, "rope_theta", 10000.0))
        scaling = getattr(hf_config, "rope_scaling", None)
        if scaling:
            scaling = dict(scaling)
            # Phi-3 keeps original_max_position_embeddings at the top
            # level of the config, not inside rope_scaling
            scaling.setdefault(
                "original_max_position_embeddings",
                getattr(hf_config, "original_max_position_embeddings",
                        None) or getattr(hf_config,
                                         "max_position_embeddings",
                                         2048))
        partial = float(getattr(hf_config, "partial_rotary_factor", 1.0))
        rotary_dim = int(head_size * partial)
        return RopeConfig(
            head_size=head_size,
            rotary_dim=rotary_dim,
            max_position=int(getattr(hf_config, "max_position_embeddings",
                                     2048)),
            base=rope_theta,
            scaling=dict(scaling) if scaling else None,
        )


def _base_inv_freq(cfg: RopeConfig) -> jnp.ndarray:
    exponents = jnp.arange(0, cfg.rotary_dim, 2, dtype=jnp.float32)
    return 1.0 / (cfg.base**(exponents / cfg.rotary_dim))


def _llama3_inv_freq(cfg: RopeConfig, inv_freq: jnp.ndarray) -> jnp.ndarray:
    """Llama-3.x rope scaling (reference: rotary_embedding.py Llama3RotaryEmbedding)."""
    s = cfg.scaling
    factor = float(s.get("factor", 8.0))
    low_factor = float(s.get("low_freq_factor", 1.0))
    high_factor = float(s.get("high_freq_factor", 4.0))
    orig_max = float(s.get("original_max_position_embeddings", 8192))
    low_wavelen = orig_max / low_factor
    high_wavelen = orig_max / high_factor
    wavelen = 2 * math.pi / inv_freq
    # Three regimes: high-freq unchanged, low-freq scaled, smooth in between.
    smooth = (orig_max / wavelen - low_factor) / (high_factor - low_factor)
    scaled = jnp.where(
        wavelen < high_wavelen, inv_freq,
        jnp.where(wavelen > low_wavelen, inv_freq / factor,
                  (1 - smooth) * inv_freq / factor + smooth * inv_freq))
    return scaled


def _yarn_find_dim(num_rot: float, cfg: RopeConfig, orig_max: float) -> float:
    return (cfg.rotary_dim *
            math.log(orig_max / (num_rot * 2 * math.pi))) / (
                2 * math.log(cfg.base))


def _yarn_inv_freq(cfg: RopeConfig,
                   inv_freq: jnp.ndarray) -> tuple[jnp.ndarray, float]:
    """YaRN (reference: rotary_embedding.py YaRNScalingRotaryEmbedding)."""
    s = cfg.scaling
    factor = float(s.get("factor", 1.0))
    orig_max = float(
        s.get("original_max_position_embeddings", cfg.max_position))
    beta_fast = float(s.get("beta_fast", 32.0))
    beta_slow = float(s.get("beta_slow", 1.0))
    lo = max(math.floor(_yarn_find_dim(beta_fast, cfg, orig_max)), 0)
    hi = min(math.ceil(_yarn_find_dim(beta_slow, cfg, orig_max)),
             cfg.rotary_dim - 1)
    dims = jnp.arange(cfg.rotary_dim // 2, dtype=jnp.float32)
    ramp = jnp.clip((dims - lo) / max(hi - lo, 1e-3), 0.0, 1.0)
    mask = 1.0 - ramp  # 1 where interpolation applies
    inv_freq_inter = inv_freq / factor
    blended = inv_freq * (1 - mask) + inv_freq_inter * mask
    attn_factor = float(s.get("attn_factor", 1.0))
    mscale = (0.1 * math.log(factor) + 1.0) * attn_factor if factor > 1 \
        else attn_factor
    return blended, mscale


def compute_inv_freq(cfg: RopeConfig) -> tuple[jnp.ndarray, float]:
    """Returns (inv_freq [rotary_dim//2], mscale)."""
    inv_freq = _base_inv_freq(cfg)
    mscale = 1.0
    if cfg.scaling:
        rope_type = cfg.scaling.get("rope_type",
                                    cfg.scaling.get("type", "default"))
        if rope_type == "llama3":
            inv_freq = _llama3_inv_freq(cfg, inv_freq)
        elif rope_type == "linear":
            inv_freq = inv_freq / float(cfg.scaling.get("factor", 1.0))
        elif rope_type == "yarn":
            inv_freq, mscale = _yarn_inv_freq(cfg, inv_freq)
        elif rope_type in ("longrope", "su"):
            s = cfg.scaling
            orig = int(s.get("original_max_position_embeddings",
                             cfg.max_position))
            scale = cfg.max_position / orig
            default_ms = 1.0 if scale <= 1.0 else math.sqrt(
                1 + math.log(scale) / math.log(orig))
            return LongRopeFreqs(
                short=inv_freq / jnp.asarray(s["short_factor"],
                                             jnp.float32),
                long=inv_freq / jnp.asarray(s["long_factor"],
                                            jnp.float32),
                threshold=orig,
                short_mscale=float(s.get("short_mscale") or default_ms),
                long_mscale=float(s.get("long_mscale") or default_ms),
            ), 1.0
        elif rope_type in ("default", "mrope"):
            pass
        else:
            raise NotImplementedError(f"rope_type {rope_type!r}")
    return inv_freq, mscale


def apply_mrope(
    q: jnp.ndarray,
    k: jnp.ndarray,
    positions3: jnp.ndarray,  # i32[3, T] (temporal, height, width)
    inv_freq: jnp.ndarray,
    mrope_section: tuple[int, ...],  # half-dim split (t, h, w)
    mscale: float = 1.0,
    interleaved: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Multimodal rotary (MRoPE; reference: rotary_embedding.py
    MRotaryEmbedding, Qwen2-VL family): each half-dim frequency band
    takes its angle from the temporal/height/width position row
    according to ``mrope_section``; text tokens carry identical rows so
    MRoPE degenerates to standard neox rope for them."""
    import numpy as np

    half = inv_freq.shape[0]
    assert sum(mrope_section) == half, (mrope_section, half)
    # static frequency-band -> position-row selector
    band = np.concatenate([
        np.full(s, i, np.int32) for i, s in enumerate(mrope_section)
    ])
    angles3 = (positions3.astype(jnp.float32)[:, :, None] *
               inv_freq[None, None, :])  # [3, T, half]
    sel = jnp.asarray(band)  # [half]
    angles = (angles3[0] * (sel == 0)[None, :] +
              angles3[1] * (sel == 1)[None, :] +
              angles3[2] * (sel == 2)[None, :])
    cos = (jnp.cos(angles) * mscale)[:, None, :]
    sin = (jnp.sin(angles) * mscale)[:, None, :]
    rotary_dim = 2 * half

    def rotate(x: jnp.ndarray) -> jnp.ndarray:
        x_rot, x_pass = x[..., :rotary_dim], x[..., rotary_dim:]
        xf = x_rot.astype(jnp.float32)
        if interleaved:
            # GLM-4V: pairs (2i, 2i+1) share angle i
            # (modeling_glm4v.py apply_multimodal_rotary_pos_emb)
            x1, x2 = xf[..., 0::2], xf[..., 1::2]
            out = jnp.stack([x1 * cos - x2 * sin, x2 * cos + x1 * sin],
                            axis=-1).reshape(xf.shape)
        else:
            x1, x2 = jnp.split(xf, 2, axis=-1)
            out = jnp.concatenate(
                [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
        out = out.astype(x.dtype)
        if x_pass.shape[-1]:
            out = jnp.concatenate([out, x_pass], axis=-1)
        return out

    return rotate(q), rotate(k)


def apply_rope(
    q: jnp.ndarray,
    k: jnp.ndarray,
    positions: jnp.ndarray,
    inv_freq: jnp.ndarray,
    is_neox_style: bool = True,
    mscale: float = 1.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Rotate q and k by position.

    q: [T, num_heads, head], k: [T, num_kv_heads, head],
    positions: i32[T]. Only the first `2 * len(inv_freq)` features of the
    head dim are rotated (partial rotary support).
    """
    if isinstance(inv_freq, LongRopeFreqs):
        lr = inv_freq
        rotary_dim = 2 * lr.short.shape[0]
        is_long = (positions >= lr.threshold)[:, None]
        inv = jnp.where(is_long, lr.long[None, :], lr.short[None, :])
        ms = jnp.where(is_long, lr.long_mscale, lr.short_mscale)
        angles = positions.astype(jnp.float32)[:, None] * inv
        cos = (jnp.cos(angles) * ms)[:, None, :]
        sin = (jnp.sin(angles) * ms)[:, None, :]
    else:
        rotary_dim = 2 * inv_freq.shape[0]
        angles = positions.astype(jnp.float32)[:, None] * \
            inv_freq[None, :]
        cos = (jnp.cos(angles) * mscale)[:, None, :]  # [T, 1, rot/2]
        sin = (jnp.sin(angles) * mscale)[:, None, :]

    def rotate(x: jnp.ndarray) -> jnp.ndarray:
        x_rot, x_pass = x[..., :rotary_dim], x[..., rotary_dim:]
        xf = x_rot.astype(jnp.float32)
        if is_neox_style:
            x1, x2 = jnp.split(xf, 2, axis=-1)
            o1 = x1 * cos - x2 * sin
            o2 = x2 * cos + x1 * sin
            out = jnp.concatenate([o1, o2], axis=-1)
        else:
            x1 = xf[..., 0::2]
            x2 = xf[..., 1::2]
            o1 = x1 * cos - x2 * sin
            o2 = x2 * cos + x1 * sin
            out = jnp.stack([o1, o2], axis=-1).reshape(xf.shape)
        out = out.astype(x.dtype)
        if x_pass.shape[-1]:
            out = jnp.concatenate([out, x_pass], axis=-1)
        return out

    return rotate(q), rotate(k)
