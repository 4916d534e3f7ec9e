"""Normalization ops.

XLA fuses these into surrounding ops on TPU; no hand-written kernel is
needed for the bf16 path (reference csrc analog: layernorm_kernels.cu
rms_norm / fused_add_rms_norm). The quantized fused rmsnorm+quant variant
lives in ops/quant.py.
"""

from __future__ import annotations

import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray,
             eps: float = 1e-6) -> jnp.ndarray:
    """RMSNorm in fp32 accumulation, cast back to input dtype."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    normed = x32 * jnp.reciprocal(jnp.sqrt(var + eps))
    return (normed * weight.astype(jnp.float32)).astype(dtype)


def fused_add_rms_norm(
        x: jnp.ndarray, residual: jnp.ndarray, weight: jnp.ndarray,
        eps: float = 1e-6) -> tuple[jnp.ndarray, jnp.ndarray]:
    """residual += x; return (rms_norm(residual), residual)."""
    residual = residual + x
    return rms_norm(residual, weight, eps), residual


def layer_norm(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray,
               eps: float = 1e-5) -> jnp.ndarray:
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    normed = (x32 - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    out = normed * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(dtype)
