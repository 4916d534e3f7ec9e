"""Quant-matmul kernel microbench at bench decode shapes.

Prints achieved GB/s (weight bytes / time) for the packed-int4 and int8
kernels next to a plain bf16 jnp.dot of the same logical shape IN THE
SAME RUN — the bf16 ratio is meaningful even when the shared chip is
loaded (absolute numbers are not; see memory: chip contention swings 4x).

python tools/bench_quant_matmul.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _time(fn, *args, iters=30):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0][0, 0])  # sync (fetch!)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0][0, 0])
    return (time.perf_counter() - t0) / iters


def run(T, K, N, group_size=128):
    from vllm_tpu.ops.pallas.quant_matmul import (fused_packed_int4_matmul,
                                                  fused_quant_matmul)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((T, K)), jnp.bfloat16)
    w8 = jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8)
    wp = jnp.asarray(rng.integers(-128, 127, (K // 2, N)), jnp.int8)
    G = K // group_size
    s = jnp.asarray(rng.standard_normal((G, N)) * 0.01, jnp.float32)
    wb = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)

    dot = jax.jit(lambda a, b: jnp.dot(a, b))
    t_bf16 = _time(dot, x, wb)
    t_int8 = _time(jax.jit(fused_quant_matmul), x, w8, s)
    t_int4 = _time(jax.jit(fused_packed_int4_matmul), x, wp, s)

    def gbs(nbytes, t):
        return nbytes / t / 1e9

    print(f"[{T},{K}]x[{K},{N}]  "
          f"bf16 {t_bf16 * 1e6:7.1f}us {gbs(2 * K * N, t_bf16):4.0f}GB/s | "
          f"int8 {t_int8 * 1e6:7.1f}us {gbs(K * N, t_int8):4.0f}GB/s "
          f"({t_bf16 / t_int8:.2f}x bf16) | "
          f"int4 {t_int4 * 1e6:7.1f}us {gbs(K * N // 2, t_int4):4.0f}GB/s "
          f"({t_bf16 / t_int4:.2f}x bf16)", flush=True)


def main():
    print("# backend:", jax.default_backend(), file=sys.stderr)
    run(256, 4096, 14336)  # gate_up decode
    run(256, 14336, 4096)  # down decode
    run(256, 4096, 6144)  # qkv decode
    run(1024, 4096, 14336)  # small-prefill shape


if __name__ == "__main__":
    main()
