"""Multi-LoRA batched delta op, TPU-native.

Reference computes per-token adapter GEMVs with punica SGMV/BGMV CUDA /
Pallas kernels (vllm/lora/ops/, lora/punica_wrapper/punica_tpu.py). On TPU
the idiomatic formulation for a small slot pool S is *masked-dense*: run
the shrink matmul for ALL slots at once (one big MXU matmul), zero out the
slots a token does not use with a one-hot mask, then run the expand
matmul. For S<=8 and rank<=64 the extra FLOPs are a few percent of the
base projection while keeping everything static-shaped, gather-free, and
fully fused by XLA — no scalar loops, no dynamic shapes.

Layout per target module (stacked over layers like model params):
  a: [L, S, in,  R]   shrink weights (R = n_sub * max_rank for fused
  b: [L, S, R, out]   targets like qkv/gate_up; sub-adapters live in
                      disjoint rank ranges with block-diagonal b)
Scaling (alpha/r) is folded into ``b`` at load time.

Tokens carry a slot index in [0, S]; index S means "no adapter"
(``jax.nn.one_hot`` of an out-of-range index is all-zero).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lora_delta(x: jnp.ndarray, lora_l: dict,
               token_lora: jnp.ndarray) -> jnp.ndarray:
    """Per-token LoRA delta for one layer of one target module.

    x: [T, in]; lora_l = {"a": [S, in, R], "b": [S, R, out]};
    token_lora: i32[T] slot index (S = none). Returns [T, out].
    """
    a, b = lora_l["a"], lora_l["b"]
    S = a.shape[0]
    # shrink for every slot: [T, S, R] — one reshaped MXU matmul
    xa = jnp.einsum("ti,sir->tsr", x, a.astype(x.dtype),
                    preferred_element_type=jnp.float32)
    mask = jax.nn.one_hot(token_lora, S, dtype=jnp.float32)  # [T, S]
    xa = (xa * mask[:, :, None]).astype(x.dtype)
    # expand: [T, S, R] x [S, R, out] -> [T, out]
    return jnp.einsum("tsr,sro->to", xa, b.astype(x.dtype),
                      preferred_element_type=jnp.float32).astype(x.dtype)


def apply_lora(x: jnp.ndarray, base_out: jnp.ndarray, lora_ctx,
               name: str) -> jnp.ndarray:
    """base_out + lora_delta when the target has adapters; lora_ctx is
    ``None`` or ``(lora_layer_params: dict, token_lora: i32[T])``."""
    if lora_ctx is None:
        return base_out
    lora_l, token_lora = lora_ctx
    if name not in lora_l:
        return base_out
    return base_out + lora_delta(x, lora_l[name], token_lora)
