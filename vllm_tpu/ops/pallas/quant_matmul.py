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
            has_zero: bool, z_ref=None):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    w = w_ref[...].astype(x.dtype)
    part = jnp.dot(x, w, preferred_element_type=jnp.float32)
    scale = s_ref[0].astype(jnp.float32)  # [1, BN]
    if has_zero:
        xsum = jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)
        part = part - xsum * z_ref[0].astype(jnp.float32)
    acc_ref[...] += part * scale

    @pl.when(k == num_k - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _kernel_with_zero(x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, *,
                      num_k: int):
    _kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, num_k=num_k,
            has_zero=True, z_ref=z_ref)


@functools.partial(jax.jit, static_argnames=("block_t", "block_n"))
def fused_quant_matmul(
    x: jnp.ndarray,  # [T, K] bf16/f32
    w_q: jnp.ndarray,  # [K, N] int8 (int4 values range [-8, 7])
    scale: jnp.ndarray,  # [G, N] f32, G groups over K
    zero: Optional[jnp.ndarray] = None,  # [G, N] f32
    block_t: int = 256,
    block_n: int = 512,
) -> jnp.ndarray:
    T, K = x.shape
    _, N = w_q.shape
    G = scale.shape[0]
    assert K % G == 0, (K, G)
    block_k = K // G  # one scale group per K step
    bt = min(block_t, max(16, 1 << (T - 1).bit_length()))
    bn = min(block_n, N)

    grid = (pl.cdiv(T, bt), pl.cdiv(N, bn), G)
    # Scales carried as [G, 1, N]: TPU block shapes need the trailing two
    # dims to be (full, 128-multiple); (1, 1, bn) satisfies that.
    in_specs = [
        pl.BlockSpec((bt, block_k), lambda t, n, k: (t, k)),
        pl.BlockSpec((block_k, bn), lambda t, n, k: (k, n)),
        pl.BlockSpec((1, 1, bn), lambda t, n, k: (k, 0, n)),
    ]
    operands = [x, w_q, scale[:, None, :]]
    if zero is not None:
        in_specs.append(pl.BlockSpec((1, 1, bn), lambda t, n, k: (k, 0, n)))
        operands.append(zero[:, None, :])
        kernel = functools.partial(_kernel_with_zero, num_k=G)
    else:
        kernel = functools.partial(_kernel, num_k=G, has_zero=False)

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
