"""Linear-layer application with per-layer quant-method dispatch.

TPU-native analog of the reference's LinearMethodBase/QuantizeMethodBase
split (reference: vllm/model_executor/layers/linear.py:150,
layers/quantization/base_config.py): a weight is a dict whose structure
encodes the quantization method; `linear()` dispatches on it.

Layouts (all math is x @ w with w [in, out]; torch checkpoints transpose
at load):
  bf16/f32:   {"w": [in, out], "b"?: [out]}
  int8/int4 weight-only (grouped): {"w_q": int8 [in, out], "scale":
              f32 [num_groups, out], "zero"?: f32 [num_groups, out],
              "group_size": static int}  (int4 stored unpacked in int8
              for the jnp path; the Pallas fused kernel consumes a packed
              tile layout — see ops/pallas/quant_matmul.py)
  fp8 w8a8:   {"w_q": float8_e4m3fn [in, out], "w_scale": f32 [] or [out],
              "a_scale"?: f32 [] (static activation scale; None = dynamic)}
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _dequant_grouped(w_q: jnp.ndarray, scale: jnp.ndarray,
                     zero: Optional[jnp.ndarray],
                     dtype: jnp.dtype) -> jnp.ndarray:
    in_dim, out_dim = w_q.shape
    num_groups = scale.shape[0]
    group_size = in_dim // num_groups
    w = w_q.astype(jnp.float32).reshape(num_groups, group_size, out_dim)
    if zero is not None:
        w = w - zero[:, None, :]
    w = w * scale[:, None, :]
    return w.reshape(in_dim, out_dim).astype(dtype)


def linear(x: jnp.ndarray, p: dict, layer=None) -> jnp.ndarray:
    """Apply a (possibly quantized) linear layer; x: [..., in].

    ``layer`` selects a layer from layer-STACKED params ([L, ...]) —
    quantized weights stay in HBM and the Pallas kernel indexes the
    stack directly; other formats dynamic-slice (XLA fuses the slice
    into the consumer for plain dots)."""
    if "w" in p:
        w = p["w"] if layer is None else jax.lax.dynamic_index_in_dim(
            p["w"], layer, 0, keepdims=False)
        out = jnp.dot(x, w, preferred_element_type=jnp.float32)
    elif "w8" in p:
        # W8A8 execution layout (int8 MXU; see ops/quant.w8a8_matmul)
        from vllm_tpu.ops.quant import w8a8_matmul

        out = w8a8_matmul(x, p, layer=layer)
    elif "w4" in p:
        # W4A8: packed int4 weights on the int8 MXU (half the HBM of
        # w8a8; see ops/quant.w4a8_matmul)
        from vllm_tpu.ops.quant import w4a8_matmul

        out = w4a8_matmul(x, p, layer=layer)
    elif ("w_p" in p) or ("w_q" in p and p["w_q"].dtype == jnp.int8
                          and "scale" in p):
        # Weight-only int8 / packed-int4 ("w_p"): dequant then matmul. On
        # TPU the Pallas fused dequant-matmul kernel replaces this (same
        # contract).
        from vllm_tpu.ops.quant import quant_matmul

        out = quant_matmul(x, p, layer=layer)
    elif "w_q" in p and "w_scale" in p:
        # fp8 W8A8: quantize activations (static or dynamic scale), use the
        # native fp8 MXU path, rescale the fp32 accumulator.
        from vllm_tpu.ops.quant import fp8_linear

        if layer is not None:
            p = jax.tree.map(
                lambda leaf: jax.lax.dynamic_index_in_dim(
                    leaf, layer, 0, keepdims=False), p)
        out = fp8_linear(x, p)
    else:
        raise ValueError(f"unrecognized linear param struct: {list(p)}")
    out = out.astype(x.dtype)
    b = p.get("b")
    if b is not None:
        if layer is not None and b.ndim > 1:
            b = jax.lax.dynamic_index_in_dim(b, layer, 0, keepdims=False)
        out = out + b
    return out


def embedding_lookup(token_ids: jnp.ndarray, embed: jnp.ndarray
                     ) -> jnp.ndarray:
    """Embedding gather; embed: [V, H]."""
    return jnp.take(embed, token_ids, axis=0)


def lm_head_logits(hidden: jnp.ndarray, p: dict,
                   soft_cap: Optional[float] = None) -> jnp.ndarray:
    """hidden [R, H] -> logits f32[R, V]
    (reference: vllm/model_executor/layers/logits_processor.py)."""
    if "w" in p:
        logits = jnp.dot(hidden, p["w"], preferred_element_type=jnp.float32)
        if p.get("b") is not None:
            logits = logits + p["b"].astype(jnp.float32)
    else:
        logits = linear(hidden, p).astype(jnp.float32)
    if soft_cap is not None:
        logits = soft_cap * jnp.tanh(logits / soft_cap)
    return logits
