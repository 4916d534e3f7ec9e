"""Chameleon VQ-VAE image tokenizer — encoder + nearest-codebook
quantizer (reference behavior parity: vllm/model_executor/models/
chameleon.py ChameleonVQVAE; decoder omitted — serving only tokenizes).

Weights stay in the torch conv layout (OIHW) and feed
lax.conv_general_dilated with ("NCHW", "OIHW", "NCHW") numbers
directly; GroupNorm(32, eps=1e-6) + swish resnet blocks, optional
vanilla attention blocks at ``attn_resolutions``, asymmetric-padded
stride-2 downsampling, mid block with attention, then quant_conv and
an argmin over codebook distances."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def alloc_vq(cfg, npd) -> dict:
    del cfg, npd
    return {}  # flat name->array store filled by load_vq_one


def load_vq_one(vq: dict, name: str, w: np.ndarray) -> None:
    if name.startswith("decoder.") or name.startswith("post_quant"):
        return  # serving never decodes images
    vq[name] = w.astype(np.float32)


def _conv(vq, prefix, x, stride=1, padding=1):
    w = vq[prefix + ".weight"]
    kh = w.shape[-2]
    pad = [(padding, padding), (padding, padding)] if kh > 1 else \
        [(0, 0), (0, 0)]
    out = lax.conv_general_dilated(
        x, jnp.asarray(w), (stride, stride), pad,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    b = vq.get(prefix + ".bias")
    if b is not None:
        out = out + jnp.asarray(b)[None, :, None, None]
    return out


def _gn(vq, prefix, x, groups=32, eps=1e-6):
    B, C, H, W = x.shape
    g = x.reshape(B, groups, C // groups, H, W).astype(jnp.float32)
    mu = g.mean((2, 3, 4), keepdims=True)
    var = ((g - mu) ** 2).mean((2, 3, 4), keepdims=True)
    g = (g - mu) * lax.rsqrt(var + eps)
    g = g.reshape(B, C, H, W)
    return (g * jnp.asarray(vq[prefix + ".weight"])[None, :, None, None]
            + jnp.asarray(vq[prefix + ".bias"])[None, :, None, None]
            ).astype(x.dtype)


def _swish(x):
    return x * jax.nn.sigmoid(x.astype(jnp.float32)).astype(x.dtype)


def _resnet(vq, prefix, x, in_c, out_c):
    r = x
    h = _swish(_gn(vq, prefix + ".norm1", x))
    h = _conv(vq, prefix + ".conv1", h)
    h = _swish(_gn(vq, prefix + ".norm2", h))
    h = _conv(vq, prefix + ".conv2", h)
    if in_c != out_c:
        if prefix + ".conv_shortcut.weight" in vq:
            r = _conv(vq, prefix + ".conv_shortcut", r)
        else:
            r = _conv(vq, prefix + ".nin_shortcut", r, padding=0)
    return r + h


def _attn(vq, prefix, x):
    B, C, H, W = x.shape
    h = _gn(vq, prefix + ".norm", x)
    q = _conv(vq, prefix + ".q", h, padding=0).reshape(B, C, H * W)
    k = _conv(vq, prefix + ".k", h, padding=0).reshape(B, C, H * W)
    v = _conv(vq, prefix + ".v", h, padding=0).reshape(B, C, H * W)
    w = jnp.einsum("bcq,bck->bqk", q, k) * (C ** -0.5)
    w = jax.nn.softmax(w.astype(jnp.float32), axis=2).astype(x.dtype)
    out = jnp.einsum("bck,bqk->bcq", v, w).reshape(B, C, H, W)
    return x + _conv(vq, prefix + ".proj_out", out, padding=0)


def vq_encode_tokens(vq: dict, pv: jnp.ndarray, cfg) -> jnp.ndarray:
    """[B, C, H, W] pixels -> [B, latent_h*latent_w] codebook indices."""
    base = int(getattr(cfg, "base_channels"))
    mult = list(getattr(cfg, "channel_multiplier"))
    nrb = int(getattr(cfg, "num_res_blocks"))
    attn_res = set(getattr(cfg, "attn_resolutions", None) or ())
    res = int(getattr(cfg, "resolution"))

    x = _conv(vq, "encoder.conv_in", pv)
    in_mult = (1,) + tuple(mult)
    curr_res = res
    for lvl in range(len(mult)):
        cin = base * in_mult[lvl]
        cout = base * mult[lvl]
        for b in range(nrb):
            x = _resnet(vq, f"encoder.down.{lvl}.block.{b}", x,
                        cin if b == 0 else cout, cout)
            if curr_res in attn_res:
                x = _attn(vq, f"encoder.down.{lvl}.attn.{b}", x)
        if lvl != len(mult) - 1:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1)))
            x = _conv(vq, f"encoder.down.{lvl}.downsample.conv", x,
                      stride=2, padding=0)
            curr_res //= 2
    c_mid = base * mult[-1]
    x = _resnet(vq, "encoder.mid.block_1", x, c_mid, c_mid)
    if "encoder.mid.attn_1.norm.weight" in vq:
        x = _attn(vq, "encoder.mid.attn_1", x)
    x = _resnet(vq, "encoder.mid.block_2", x, c_mid, c_mid)
    x = _swish(_gn(vq, "encoder.norm_out", x))
    x = _conv(vq, "encoder.conv_out", x)
    x = _conv(vq, "quant_conv", x, padding=0)

    # nearest codebook entry (quantizer forward)
    B, D, H, W = x.shape
    flat = x.transpose(0, 2, 3, 1).reshape(-1, D).astype(jnp.float32)
    emb = jnp.asarray(vq["quantize.embedding.weight"])  # [N, D]
    dist = (jnp.sum(flat ** 2, 1, keepdims=True)
            + jnp.sum(emb ** 2, 1)[None]
            - 2.0 * flat @ emb.T)
    idx = jnp.argmin(dist, axis=1)
    return idx.reshape(B, H * W)
