"""Activation ops (reference csrc analog: activation_kernels.cu).

All pure jnp: XLA fuses the gated-activation pattern into the surrounding
matmuls on TPU, so the CUDA silu_and_mul kernel needs no Pallas analog.
Inputs follow the fused gate_up convention: x = [..., 2 * d] where the
first half is the gate and the second half the up projection.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def silu_and_mul(x: jnp.ndarray) -> jnp.ndarray:
    gate, up = jnp.split(x, 2, axis=-1)
    return jax.nn.silu(gate) * up


def gelu_and_mul(x: jnp.ndarray) -> jnp.ndarray:
    gate, up = jnp.split(x, 2, axis=-1)
    return jax.nn.gelu(gate, approximate=False) * up


def gelu_tanh_and_mul(x: jnp.ndarray) -> jnp.ndarray:
    gate, up = jnp.split(x, 2, axis=-1)
    return jax.nn.gelu(gate, approximate=True) * up


def mul_and_silu(x: jnp.ndarray) -> jnp.ndarray:
    gate, up = jnp.split(x, 2, axis=-1)
    return gate * jax.nn.silu(up)


def fatrelu_and_mul(x: jnp.ndarray, threshold: float = 0.0) -> jnp.ndarray:
    gate, up = jnp.split(x, 2, axis=-1)
    return jnp.where(gate > threshold, gate, 0.0) * up


def gelu_new(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(x, approximate=True)


def gelu_fast(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(x, approximate=True)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


def relu2(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.square(jax.nn.relu(x))


ACTIVATIONS = {
    "silu": jax.nn.silu,
    "gelu": jax.nn.gelu,
    "gelu_new": gelu_new,
    "gelu_fast": gelu_fast,
    "gelu_pytorch_tanh": gelu_new,
    "quick_gelu": quick_gelu,
    "relu": jax.nn.relu,
    "relu2": relu2,
}

GATED_ACTIVATIONS = {
    "silu": silu_and_mul,
    "gelu": gelu_and_mul,
    "gelu_new": gelu_tanh_and_mul,
    "gelu_pytorch_tanh": gelu_tanh_and_mul,
}
