"""Fused weight-dequant x matmul Pallas kernel.

TPU-native answer to the reference's Marlin/Machete/AWQ/GPTQ GEMM zoo
(reference: csrc/quantization/gptq_marlin/gptq_marlin.cu:901,
csrc/quantization/machete/ — design re-derived for the MXU, not ported).

Weights are weight-only quantized int8/int4 (int4 carried in an int8
array) with grouped scales over the K dim (optionally asymmetric zero
points). The kernel tiles (T, N, K) with K innermost; each K step loads
an int8 weight tile HBM->VMEM (half the bytes of bf16 — the point of
weight-only quant), upcasts in VMEM, runs a bf16 MXU matmul, and applies
the group scale to the fp32 partial sum. Output is written once on the
last K step.

dequant math per group g:  out += (x_g @ w_g) * scale_g - (sum_k x_gk) *
zero_g * scale_g   — zero-point folded so the MXU sees only the raw
quantized weights.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = os.environ.get("VLLM_TPU_PALLAS_INTERPRET", "0") == "1"


def _kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, num_k: int,
            groups_per_block: int, group_size: int,
            has_zero: bool, z_ref=None):
    """Weight-side dequant: the int8 tile is upcast and scaled (and
    zero-shifted) in VMEM, so the MXU contracts a FULL block_k (multiple
    scale groups) per step and the f32 accumulator is touched once per
    K step instead of once per group."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    bk, bn = w_ref.shape
    # [gpb, group, bn] * [gpb, 1, bn] — dequantized weight tile; the
    # whole dequant stays in the int8/compute-dtype domain (int8 VPU ops
    # pack 4x denser than the f32 path and skip two converts — measured
    # dequant-VPU-bound at ~200 GB/s effective with the f32 chain).
    # scale/zero blocks are [gpb, bn] and broadcast over the group dim.
    # int4 magnitudes (<= 8) and 8-bit-mantissa scales keep the product
    # exact enough: error is ~0.4% of a weight ULP vs the fp32 chain,
    # far under the int4 quantization error itself.
    w = w_ref[...].astype(x.dtype).reshape(groups_per_block,
                                           group_size, bn)
    if has_zero:  # dequant: (q - z) * s
        w = w - z_ref[...].astype(x.dtype)[:, None, :]
    w = w * s_ref[...].astype(x.dtype)[:, None, :]
    w = w.reshape(bk, bn)
    acc_ref[...] += jnp.dot(x, w, preferred_element_type=jnp.float32)

    @pl.when(k == num_k - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _kernel_with_zero(x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, *,
                      num_k: int, groups_per_block: int, group_size: int):
    _kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, num_k=num_k,
            groups_per_block=groups_per_block, group_size=group_size,
            has_zero=True, z_ref=z_ref)


def _kernel_layered(li_ref, x_ref, w_ref, s_ref, o_ref, acc_ref, *,
                    num_k: int, groups_per_block: int, group_size: int):
    # blocks carry a leading singleton layer dim; index maps already
    # selected layer li_ref[0]
    _kernel(x_ref, w_ref.at[0], s_ref.at[0], o_ref, acc_ref,
            num_k=num_k, groups_per_block=groups_per_block,
            group_size=group_size, has_zero=False)


def _kernel_layered_zero(li_ref, x_ref, w_ref, s_ref, z_ref, o_ref,
                         acc_ref, *, num_k: int, groups_per_block: int,
                         group_size: int):
    _kernel(x_ref, w_ref.at[0], s_ref.at[0], o_ref, acc_ref,
            num_k=num_k, groups_per_block=groups_per_block,
            group_size=group_size, has_zero=True, z_ref=z_ref.at[0])


@functools.partial(jax.jit, static_argnames=("block_t", "block_n",
                                             "block_k"))
def fused_quant_matmul(
    x: jnp.ndarray,  # [T, K] bf16/f32
    w_q: jnp.ndarray,  # [K, N] int8, or [L, K, N] with layer=
    scale: jnp.ndarray,  # [G, N] f32 (or [L, G, N]), G groups over K
    zero: Optional[jnp.ndarray] = None,  # [G, N] f32 raw zero points
    layer: Optional[jnp.ndarray] = None,  # i32[1] — layer of the stack
    block_t: int = 256,
    block_n: int = 512,
    block_k: int = 2048,
) -> jnp.ndarray:
    """When ``layer`` is given the kernel addresses the layer-STACKED
    weight directly from HBM via a scalar-prefetched index — inside a
    decoder-layer scan this avoids XLA materializing a per-layer copy of
    the sliced weight for the custom call (~1.6 ms/layer for an 8B
    model), the same trick the attention kernel uses for its KV stack."""
    layered = layer is not None
    T, K = x.shape
    N = w_q.shape[-1]
    G = scale.shape[-2]
    assert K % G == 0, (K, G)
    group_size = K // G
    # K tiles in multiples of 8 groups: Mosaic requires the scale tile's
    # second-to-last dim (gpb) to be a multiple of 8 (or the full G) —
    # callers guarantee G % 8 == 0 (ops/quant.py quant_matmul gate).
    step = 8 * group_size
    bk = min(block_k, K)
    bk = max(bk - bk % step, min(step, K))
    gpb = bk // group_size
    bt = min(block_t, max(16, 1 << (T - 1).bit_length()))
    bn = min(block_n, N)
    num_k = pl.cdiv(K, bk)

    grid = (pl.cdiv(T, bt), pl.cdiv(N, bn), num_k)
    kw = dict(num_k=num_k, groups_per_block=gpb, group_size=group_size)

    if not layered:
        in_specs = [
            pl.BlockSpec((bt, bk), lambda t, n, k: (t, k)),
            pl.BlockSpec((bk, bn), lambda t, n, k: (k, n)),
            pl.BlockSpec((gpb, bn), lambda t, n, k: (k, n)),
        ]
        operands = [x, w_q, scale]
        if zero is not None:
            in_specs.append(
                pl.BlockSpec((gpb, bn), lambda t, n, k: (k, n)))
            operands.append(zero)
            kernel = functools.partial(_kernel_with_zero, **kw)
        else:
            kernel = functools.partial(_kernel, has_zero=False, **kw)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((bt, bn), lambda t, n, k: (t, n)),
            out_shape=jax.ShapeDtypeStruct((T, N), x.dtype),
            scratch_shapes=[pltpu.VMEM((bt, bn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
            interpret=_INTERPRET,
        )(*operands)

    in_specs = [
        pl.BlockSpec((bt, bk), lambda t, n, k, li: (t, k)),
        pl.BlockSpec((1, bk, bn), lambda t, n, k, li: (li[0], k, n)),
        pl.BlockSpec((1, gpb, bn), lambda t, n, k, li: (li[0], k, n)),
    ]
    operands = [x, w_q, scale]
    if zero is not None:
        in_specs.append(
            pl.BlockSpec((1, gpb, bn), lambda t, n, k, li: (li[0], k, n)))
        operands.append(zero)
        kernel = functools.partial(_kernel_layered_zero, **kw)
    else:
        kernel = functools.partial(_kernel_layered, **kw)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bt, bn), lambda t, n, k, li: (t, n)),
        scratch_shapes=[pltpu.VMEM((bt, bn), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, N), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_INTERPRET,
    )(jnp.asarray(layer, jnp.int32).reshape(1), *operands)


# ---------------------------------------------------------------- packed int4

def _packed_kernel(x_lo_ref, x_hi_ref, w_ref, s_lo_ref, s_hi_ref, o_ref,
                   acc_ref, *, num_k: int, groups_per_block: int,
                   group_size: int, signed: bool,
                   z_lo_ref=None, z_hi_ref=None):
    """Packed-int4 dequant-matmul step: one [bk2, bn] byte tile carries
    TWO K slabs (rows [k0, k0+bk2) in the low nibble, rows
    [K/2+k0, K/2+k0+bk2) in the high nibble — split-K-half packing, so
    unpack is two shifts with NO sublane data movement), each contracted
    with its own x slice and scale groups. Weight HBM traffic is half the
    int8 kernel's — the whole point of INT4 on a bandwidth-bound decode
    (reference analog: csrc/quantization/gptq_marlin/ 4-bit paths)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    bk2, bn = w_ref.shape
    # Nibble unpack in the INT32 domain: Mosaic on this libtpu legalizes
    # vector shifts/bitwise ops only at 32-bit (probed: i8/i16 shl, i8
    # and/xor all fail 'failed to legalize arith.shli'); the i8->i32
    # convert is one VPU pass and the dequant multiply below still runs
    # in the compute dtype.
    w8 = w_ref[...].astype(jnp.int32)
    if signed:
        lo = (w8 << 28) >> 28  # sign-extended low nibble
        hi = w8 >> 4  # arithmetic shift keeps the sign of the high nibble
    else:
        lo = w8 & 0xF
        hi = (w8 >> 4) & 0xF
    cdtype = x_lo_ref.dtype
    for x_ref, s_ref, z_ref, wv in ((x_lo_ref, s_lo_ref, z_lo_ref, lo),
                                    (x_hi_ref, s_hi_ref, z_hi_ref, hi)):
        # dequant stays in the compute dtype (see _kernel note): int4
        # magnitudes are exact in bf16 and scale rounding is ~2^-8
        w = wv.astype(cdtype).reshape(groups_per_block, group_size, bn)
        if z_ref is not None:
            w = w - z_ref[...].astype(cdtype)[:, None, :]
        w = w * s_ref[...].astype(cdtype)[:, None, :]
        w = w.reshape(bk2, bn)
        acc_ref[...] += jnp.dot(x_ref[...], w,
                                preferred_element_type=jnp.float32)

    @pl.when(k == num_k - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _packed_kernel_zero(x_lo_ref, x_hi_ref, w_ref, s_lo_ref, s_hi_ref,
                        z_lo_ref, z_hi_ref, o_ref, acc_ref, **kw):
    _packed_kernel(x_lo_ref, x_hi_ref, w_ref, s_lo_ref, s_hi_ref, o_ref,
                   acc_ref, z_lo_ref=z_lo_ref, z_hi_ref=z_hi_ref, **kw)


def _packed_kernel_layered(li_ref, x_lo_ref, x_hi_ref, w_ref, s_lo_ref,
                           s_hi_ref, o_ref, acc_ref, **kw):
    _packed_kernel(x_lo_ref, x_hi_ref, w_ref.at[0], s_lo_ref.at[0],
                   s_hi_ref.at[0], o_ref, acc_ref, **kw)


def _packed_kernel_layered_zero(li_ref, x_lo_ref, x_hi_ref, w_ref,
                                s_lo_ref, s_hi_ref, z_lo_ref, z_hi_ref,
                                o_ref, acc_ref, **kw):
    _packed_kernel(x_lo_ref, x_hi_ref, w_ref.at[0], s_lo_ref.at[0],
                   s_hi_ref.at[0], o_ref, acc_ref, z_lo_ref=z_lo_ref.at[0],
                   z_hi_ref=z_hi_ref.at[0], **kw)


@functools.partial(jax.jit, static_argnames=("block_t", "block_n",
                                             "block_k"))
def fused_packed_int4_matmul(
    x: jnp.ndarray,  # [T, K] bf16/f32
    w_p: jnp.ndarray,  # [K//2, N] int8: two nibbles per byte, or [L, ...]
    scale: jnp.ndarray,  # [G, N] f32 (or [L, G, N]), G groups over K
    zero: Optional[jnp.ndarray] = None,  # [G, N] (unsigned-nibble layout)
    layer: Optional[jnp.ndarray] = None,  # i32[1] — layer of the stack
    block_t: int = 256,
    block_n: int = 512,
    block_k: int = 1024,  # in packed (K/2) rows => 2048 logical K rows
) -> jnp.ndarray:
    """Split-K-half packed layout (see pack_int4 in ops/quant.py):
    byte row r of w_p holds K-row r (low nibble) and K-row r + K/2
    (high). Symmetric quant uses signed nibbles [-8, 7]; asymmetric
    (``zero`` given, GPTQ/AWQ-style) uses unsigned [0, 15]."""
    layered = layer is not None
    T, K = x.shape
    Kp = w_p.shape[-2]
    assert K == 2 * Kp, (K, Kp)
    N = w_p.shape[-1]
    G = scale.shape[-2]
    assert K % G == 0, (K, G)
    group_size = K // G
    assert Kp % group_size == 0, (Kp, group_size)
    # Packed block: a multiple of 8 groups (Mosaic scale-tile rule; the
    # quant_matmul gate guarantees G % 16 == 0 so Kp has >= 8 groups)
    # that divides Kp exactly so the hi half starts on a block boundary
    # (index offset num_k).
    step = 8 * group_size
    bk2 = min(block_k, Kp)
    bk2 = max(bk2 - bk2 % step, min(step, Kp))
    while Kp % bk2:
        bk2 -= step
    gpb = bk2 // group_size
    bt = min(block_t, max(16, 1 << (T - 1).bit_length()))
    bn = min(block_n, N)
    num_k = Kp // bk2

    grid = (pl.cdiv(T, bt), pl.cdiv(N, bn), num_k)
    kw = dict(num_k=num_k, groups_per_block=gpb, group_size=group_size,
              signed=zero is None)

    if not layered:
        in_specs = [
            pl.BlockSpec((bt, bk2), lambda t, n, k: (t, k)),
            pl.BlockSpec((bt, bk2), lambda t, n, k: (t, k + num_k)),
            pl.BlockSpec((bk2, bn), lambda t, n, k: (k, n)),
            pl.BlockSpec((gpb, bn), lambda t, n, k: (k, n)),
            pl.BlockSpec((gpb, bn), lambda t, n, k: (k + num_k, n)),
        ]
        operands = [x, x, w_p, scale, scale]
        if zero is not None:
            in_specs += [
                pl.BlockSpec((gpb, bn), lambda t, n, k: (k, n)),
                pl.BlockSpec((gpb, bn), lambda t, n, k: (k + num_k, n)),
            ]
            operands += [zero, zero]
            kernel = functools.partial(_packed_kernel_zero, **kw)
        else:
            kernel = functools.partial(_packed_kernel, **kw)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((bt, bn), lambda t, n, k: (t, n)),
            out_shape=jax.ShapeDtypeStruct((T, N), x.dtype),
            scratch_shapes=[pltpu.VMEM((bt, bn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
            interpret=_INTERPRET,
        )(*operands)

    in_specs = [
        pl.BlockSpec((bt, bk2), lambda t, n, k, li: (t, k)),
        pl.BlockSpec((bt, bk2), lambda t, n, k, li: (t, k + num_k)),
        pl.BlockSpec((1, bk2, bn), lambda t, n, k, li: (li[0], k, n)),
        pl.BlockSpec((1, gpb, bn), lambda t, n, k, li: (li[0], k, n)),
        pl.BlockSpec((1, gpb, bn),
                     lambda t, n, k, li: (li[0], k + num_k, n)),
    ]
    operands = [x, x, w_p, scale, scale]
    if zero is not None:
        in_specs += [
            pl.BlockSpec((1, gpb, bn), lambda t, n, k, li: (li[0], k, n)),
            pl.BlockSpec((1, gpb, bn),
                         lambda t, n, k, li: (li[0], k + num_k, n)),
        ]
        operands += [zero, zero]
        kernel = functools.partial(_packed_kernel_layered_zero, **kw)
    else:
        kernel = functools.partial(_packed_kernel_layered, **kw)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bt, bn), lambda t, n, k, li: (t, n)),
        scratch_shapes=[pltpu.VMEM((bt, bn), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, N), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_INTERPRET,
    )(jnp.asarray(layer, jnp.int32).reshape(1), *operands)


# ---------------------------------------------------------------- w4a8

def _w4a8_kernel(x_lo_ref, x_hi_ref, w_ref, o_ref, acc_ref, *,
                 num_k: int):
    """W4A8 step: int8 activations x packed-int4 weights on the INT8
    MXU with an int32 accumulator (reference intent:
    csrc/quantization/gptq_marlin — int4 bytes in HBM, full-rate MXU).

    Split-K-half byte tile [bk2, bn]: low nibble = K-row r, high =
    K-row r + K/2, both SIGNED. Unpack runs in the i32 domain (Mosaic
    vector shifts are 32-bit only) then narrows back to int8 so both
    dots hit the MXU at the int8 rate — no bf16 dequant pass and no
    per-element scale work; the single per-channel scale (x per-token
    scale) applies once in the epilogue outside the k loop."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w32 = w_ref[...].astype(jnp.int32)
    lo = ((w32 << 28) >> 28).astype(jnp.int8)  # sign-extended low nibble
    hi = (w32 >> 4).astype(jnp.int8)  # arithmetic shift keeps the sign
    acc_ref[...] += jax.lax.dot_general(
        x_lo_ref[...], lo, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    acc_ref[...] += jax.lax.dot_general(
        x_hi_ref[...], hi, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(k == num_k - 1)
    def _():
        o_ref[...] = acc_ref[...]


def _w4a8_kernel_layered(li_ref, x_lo_ref, x_hi_ref, w_ref, o_ref,
                         acc_ref, **kw):
    _w4a8_kernel(x_lo_ref, x_hi_ref, w_ref.at[0], o_ref, acc_ref, **kw)


@functools.partial(jax.jit, static_argnames=("block_t", "block_n",
                                             "block_k"))
def fused_w4a8_matmul(
    x8: jnp.ndarray,  # [T, K] int8 (per-token quantized activations)
    w_p: jnp.ndarray,  # [K//2, N] int8 packed signed nibbles, or [L,...]
    layer: Optional[jnp.ndarray] = None,  # i32[1]
    block_t: int = 256,
    block_n: int = 512,
    block_k: int = 512,  # packed (K/2) rows => 1024 logical K rows
) -> jnp.ndarray:
    """Returns the raw int32 accumulator [T, N]; the caller applies
    out = acc * ax[:, None] * chan_scale[None, :] (XLA fuses that
    epilogue into the consumer)."""
    layered = layer is not None
    T, K = x8.shape
    Kp = w_p.shape[-2]
    assert K == 2 * Kp, (K, Kp)
    N = w_p.shape[-1]
    bt = min(block_t, max(16, 1 << (T - 1).bit_length()))
    bn = min(block_n, N)
    bk2 = min(block_k, Kp)
    while Kp % bk2:
        bk2 //= 2
    num_k = Kp // bk2
    grid = (pl.cdiv(T, bt), pl.cdiv(N, bn), num_k)
    kw = dict(num_k=num_k)

    if not layered:
        return pl.pallas_call(
            functools.partial(_w4a8_kernel, **kw),
            grid=grid,
            in_specs=[
                pl.BlockSpec((bt, bk2), lambda t, n, k: (t, k)),
                pl.BlockSpec((bt, bk2), lambda t, n, k: (t, k + num_k)),
                pl.BlockSpec((bk2, bn), lambda t, n, k: (k, n)),
            ],
            out_specs=pl.BlockSpec((bt, bn), lambda t, n, k: (t, n)),
            out_shape=jax.ShapeDtypeStruct((T, N), jnp.int32),
            scratch_shapes=[pltpu.VMEM((bt, bn), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=_INTERPRET,
        )(x8, x8, w_p)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, bk2), lambda t, n, k, li: (t, k)),
            pl.BlockSpec((bt, bk2), lambda t, n, k, li: (t, k + num_k)),
            pl.BlockSpec((1, bk2, bn), lambda t, n, k, li: (li[0], k, n)),
        ],
        out_specs=pl.BlockSpec((bt, bn), lambda t, n, k, li: (t, n)),
        scratch_shapes=[pltpu.VMEM((bt, bn), jnp.int32)],
    )
    return pl.pallas_call(
        functools.partial(_w4a8_kernel_layered, **kw),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, N), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_INTERPRET,
    )(layer, x8, x8, w_p)
