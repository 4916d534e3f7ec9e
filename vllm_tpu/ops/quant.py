"""Quantized compute ops.

TPU-native answers to the reference's quant GEMM zoo (reference csrc:
quantization/gptq_marlin/, awq/, fp8/, cutlass_w8a8/ — see SURVEY.md §2.7):
- weight-only INT8/INT4 grouped dequant x bf16 matmul (jnp path here;
  fused Pallas kernel in ops/pallas/quant_matmul.py dispatched on TPU)
- FP8 W8A8 via the MXU's native fp8 dot with scale epilogue
- per-token / per-tensor quantize helpers for activations and KV cache
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

FP8_DTYPE = jnp.float8_e4m3fn
FP8_MAX = 448.0
INT8_MAX = 127.0


@functools.lru_cache(maxsize=1)
def _on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def pack_int4(w_q: jnp.ndarray, signed: bool = True) -> jnp.ndarray:
    """Split-K-half nibble packing: byte row r of the result holds K-row
    r in the low nibble and K-row r + K/2 in the high nibble, so the
    Pallas kernel unpacks with two shifts and zero sublane shuffling
    (layout consumed by fused_packed_int4_matmul; the load-time repack
    analog of the reference's gptq_marlin_repack / awq_marlin_repack).
    w_q: int [..., K, N] values in [-8, 7] (signed) or [0, 15]."""
    del signed  # same bit layout either way; kept for API symmetry
    K = w_q.shape[-2]
    assert K % 2 == 0, K
    lo = w_q[..., :K // 2, :].astype(jnp.int32) & 0xF
    hi = w_q[..., K // 2:, :].astype(jnp.int32) & 0xF
    b = (lo | (hi << 4)).astype(jnp.uint8)
    return jax.lax.bitcast_convert_type(b, jnp.int8)


def unpack_int4(w_p: jnp.ndarray, signed: bool = True) -> jnp.ndarray:
    """Inverse of pack_int4 -> int8 [..., K, N]."""
    w8 = w_p.astype(jnp.int32)
    if signed:
        lo = (w8 << 28) >> 28
        hi = w8 >> 4
    else:
        lo = w8 & 0xF
        hi = (w8 >> 4) & 0xF
    return jnp.concatenate([lo, hi], axis=-2).astype(jnp.int8)


def quant_matmul(x: jnp.ndarray, p: dict, layer=None) -> jnp.ndarray:
    """Weight-only quantized matmul: x [..., in] @ dequant(w_q) -> f32.

    p: {"w_q": int8 [in, out], "scale": [num_groups, out],
        "zero"?: [num_groups, out]}. int4 weights ride PACKED two per
    byte under the "w_p" key ([in/2, out]; see pack_int4) — halving
    weight HBM traffic is the point of int4 on a bandwidth-bound decode.
    With ``layer`` the params are layer-stacked ([L, ...]) and the Pallas
    kernel addresses the stack in place (no per-layer weight copies).
    """
    packed = "w_p" in p
    w_q, scale = p.get("w_q"), p["scale"]
    zero = p.get("zero")
    # Mosaic block shapes need the scale tile's group dim to be a
    # multiple of 8 (or the full dim): the kernels tile K in chunks of
    # 8*group_size, so they need >= 8 groups (16 for packed int4, whose
    # K-half split halves the reachable group count). Tiny test models
    # fall below that; real checkpoints (K >= 1024, group 128) never do.
    G = scale.shape[-2]
    kernel_ok = G % 16 == 0 if packed else G % 8 == 0
    if _on_tpu() and x.ndim == 2 and kernel_ok:
        try:
            from vllm_tpu.ops.pallas.quant_matmul import (
                fused_packed_int4_matmul, fused_quant_matmul)
        except ImportError:
            pass
        else:
            if packed:
                return fused_packed_int4_matmul(x, p["w_p"], scale, zero,
                                                layer=layer)
            return fused_quant_matmul(x, w_q, scale, zero, layer=layer)
    if packed:  # jnp fallback: unpack, then the grouped path below
        w_q = unpack_int4(p["w_p"], signed=zero is None)
    if layer is not None:  # reference path: slice the stack
        w_q = jax.lax.dynamic_index_in_dim(w_q, layer, 0, keepdims=False)
        scale = jax.lax.dynamic_index_in_dim(scale, layer, 0,
                                             keepdims=False)
        if zero is not None:
            zero = jax.lax.dynamic_index_in_dim(zero, layer, 0,
                                                keepdims=False)
    in_dim, out_dim = w_q.shape
    num_groups = scale.shape[0]
    group = in_dim // num_groups
    # Group-wise: (x_g @ w_g) * scale_g summed over groups keeps the MXU
    # in int8/bf16 without materializing a full dequantized weight.
    xg = x.reshape(*x.shape[:-1], num_groups, group)
    wg = w_q.reshape(num_groups, group, out_dim)
    partial = jnp.einsum(
        "...gk,gko->...go", xg.astype(jnp.float32),
        wg.astype(jnp.float32))
    if zero is not None:
        # sum_k x_k * (w - z) * s = (sum x*w - z * sum x) * s
        xsum = jnp.sum(xg.astype(jnp.float32), axis=-1)  # [..., g]
        partial = partial - xsum[..., None] * zero[None, :, :]
    out = jnp.sum(partial * scale[None, :, :], axis=-2)
    return out


def w8a8_matmul(x: jnp.ndarray, p: dict, layer=None) -> jnp.ndarray:
    """W8A8 int8 MXU matmul (reference analog: cutlass_w8a8 /
    tpu_int8): per-token dynamic activation quantization x per-channel
    int8 weights, int8 x int8 -> int32 via XLA dot_general (the TPU's
    int8 MXU mode runs at 2x the bf16 rate; XLA fuses the quantize and
    the scale epilogue, and fuses the layer-stack dynamic slice into the
    dot — measured 0.100 vs 0.182 ms/layer bf16 at [256, 4096, 14336]).

    p: {"w8": int8 [K, N] or [L, K, N], "chan_scale": f32 [N] or [L, N]}.
    Weights arrive here REQUANTIZED per-channel at load from int4/int8
    checkpoints (models/loader.py to_w8a8_stacked)."""
    w8, cs = p["w8"], p["chan_scale"]
    if layer is not None:
        w8 = jax.lax.dynamic_index_in_dim(w8, layer, 0, keepdims=False)
        cs = jax.lax.dynamic_index_in_dim(cs, layer, 0, keepdims=False)
    # amax directly on the input dtype (max is exact in bf16) so the
    # reduce has no f32 copy of x to read, and the quantize below is a
    # SINGLE fused bf16-read -> int8-write pass. x.astype(f32) with two
    # consumers (reduce + divide) materialized a full f32 activation
    # tensor — at prefill T=4096 that is a 235 MB HBM round trip per
    # gate_up, measured ~21 ms/step of convert+reduce self-time.
    amax = jnp.max(jnp.abs(x), axis=-1).astype(jnp.float32)
    ax = jnp.maximum(amax, 1e-6) / INT8_MAX
    inv = 1.0 / ax
    x8 = jnp.clip(jnp.round(x.astype(jnp.float32) * inv[..., None]),
                  -INT8_MAX, INT8_MAX).astype(jnp.int8)
    o32 = jax.lax.dot_general(x8, w8, (((x.ndim - 1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return o32.astype(jnp.float32) * ax[..., None] * cs


def w4a8_matmul(x: jnp.ndarray, p: dict, layer=None) -> jnp.ndarray:
    """W4A8: packed signed-int4 weights on the INT8 MXU (reference
    analog: gptq_marlin's whole premise — int4 bytes in HBM at the
    full-rate MXU). Activations quantize per token to int8 (same as
    w8a8_matmul); the Pallas kernel unpacks nibbles in-VMEM and
    accumulates int32; this epilogue applies per-token x per-channel
    scales (XLA fuses it into the consumer).

    p: {"w4": int8 packed [K/2, N] or [L, K/2, N] (split-K-half signed
    nibbles; see pack_int4), "chan_scale": f32 [N] or [L, N]}."""
    from vllm_tpu.ops.pallas.quant_matmul import fused_w4a8_matmul

    w4, cs = p["w4"], p["chan_scale"]
    if layer is not None:
        cs = jax.lax.dynamic_index_in_dim(cs, layer, 0, keepdims=False)
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    ax = jnp.maximum(amax, 1e-6) / INT8_MAX
    x8 = jnp.clip(jnp.round(xf / ax[..., None]), -INT8_MAX,
                  INT8_MAX).astype(jnp.int8)
    lay = None if layer is None else jnp.asarray(layer,
                                                 jnp.int32).reshape(1)
    import os
    acc = fused_w4a8_matmul(
        x8, w4, layer=lay,
        block_n=int(os.environ.get("VLLM_TPU_W4A8_BN", "1024")),
        block_k=int(os.environ.get("VLLM_TPU_W4A8_BK", "2048")))
    return acc.astype(jnp.float32) * ax[..., None] * cs


def fp8_linear(x: jnp.ndarray, p: dict) -> jnp.ndarray:
    """FP8 W8A8 matmul (reference: vllm fp8.py Fp8LinearMethod):
    quantize activations to e4m3 (static scale from checkpoint or dynamic
    per-tensor), fp8 x fp8 dot with fp32 accumulation, scale epilogue."""
    w_q, w_scale = p["w_q"], p["w_scale"]
    a_scale = p.get("a_scale")
    if a_scale is None:
        a_scale = jnp.max(jnp.abs(x.astype(jnp.float32))) / FP8_MAX
        a_scale = jnp.maximum(a_scale, 1e-12)
    x_q = jnp.clip(x.astype(jnp.float32) / a_scale, -FP8_MAX,
                   FP8_MAX).astype(FP8_DTYPE)
    out = jnp.dot(x_q, w_q, preferred_element_type=jnp.float32)
    return out * (a_scale * w_scale)


# ---------------------------------------------------------------------------
# Quantize helpers (activation / KV / weight repack at load time)


def quantize_fp8(x: jnp.ndarray,
                 scale: Optional[jnp.ndarray] = None
                 ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-tensor fp8 quantization (reference csrc:
    quantization/fp8/common.cu static/dynamic_scaled_fp8_quant)."""
    if scale is None:
        scale = jnp.maximum(
            jnp.max(jnp.abs(x.astype(jnp.float32))) / FP8_MAX, 1e-12)
    q = jnp.clip(x.astype(jnp.float32) / scale, -FP8_MAX, FP8_MAX)
    return q.astype(FP8_DTYPE), scale


def quantize_int8(x: jnp.ndarray,
                  scale: Optional[jnp.ndarray] = None
                  ) -> tuple[jnp.ndarray, jnp.ndarray]:
    if scale is None:
        scale = jnp.maximum(
            jnp.max(jnp.abs(x.astype(jnp.float32))) / INT8_MAX, 1e-12)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -128, 127)
    return q.astype(jnp.int8), scale


def quantize_weight_grouped(w: "jnp.ndarray", bits: int,
                            group_size: int) -> dict:
    """Load-time symmetric grouped weight quantization (for
    --quantization int8/int4 without a pre-quantized checkpoint).
    w: [in, out] float -> {"w_q", "scale"}."""
    in_dim, out_dim = w.shape
    if group_size <= 0 or in_dim % group_size:
        group_size = in_dim
    num_groups = in_dim // group_size
    qmax = 7.0 if bits == 4 else INT8_MAX
    wg = w.astype(jnp.float32).reshape(num_groups, group_size, out_dim)
    scale = jnp.maximum(jnp.max(jnp.abs(wg), axis=1) / qmax, 1e-10)
    q = jnp.clip(jnp.round(wg / scale[:, None, :]), -qmax - 1, qmax)
    return {
        "w_q": q.reshape(in_dim, out_dim).astype(jnp.int8),
        "scale": scale,
    }
