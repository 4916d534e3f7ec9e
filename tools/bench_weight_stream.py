"""Does the big-allocation bandwidth penalty (tools/bench_dma_bw.py:
one >2GB buffer streams at ~190 GB/s vs ~420 from <=512MB slabs) also
hit XLA matmul weight streaming?

Compares a decode-shaped int8 W8A8 matmul sweep over 32 layers:
  (a) lax.scan indexing ONE stacked [32, K, N] int8 array (3.7 GB),
  (b) Python-unrolled groups of G layers, each group its own
      [G, K, N] slab (<=512MB), lax.scan inside the group.

python tools/bench_weight_stream.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

M, K, N = 256, 4096, 14336
L = 32
INNER = 2


def timeit(fn, x, iters=8):
    x = fn(x, jnp.int32(10**6))
    np.asarray(x[0, :1])
    t0 = time.perf_counter()
    for i in range(iters):
        x = fn(x, jnp.int32(i))
    np.asarray(x[0, :1])
    return (time.perf_counter() - t0) / iters / INNER / L


def quant_act(x):
    s = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0
    xi = jnp.round(x / s).astype(jnp.int8)
    return xi, s


def bench_stacked():
    w = jnp.ones((L, K, N), jnp.int8)

    @jax.jit
    def f(x, i):
        for k in range(INNER):
            def body(carry, li):
                xi, s = quant_act(carry)
                wl = jax.lax.dynamic_index_in_dim(w, li, keepdims=False)
                y = jax.lax.dot_general(
                    xi, wl, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                y = (y.astype(jnp.float32) * s)[:, :K].astype(jnp.bfloat16)
                return carry + y * 1e-6, None

            x, _ = jax.lax.scan(body, x, jnp.arange(L))
            x = x + (i + k).astype(jnp.bfloat16) * 1e-9
        return x

    x = jnp.ones((M, K), jnp.bfloat16)
    dt = timeit(f, x)
    gb = K * N / 1e9
    print(f"stacked 1x{L}: {dt * 1e6:8.1f} us/layer  "
          f"{gb / dt:6.0f} GB/s weight stream", flush=True)


def bench_grouped(G):
    ngrp = L // G
    ws = [jnp.ones((G, K, N), jnp.int8) for _ in range(ngrp)]

    @jax.jit
    def f(x, i):
        for k in range(INNER):
            for wg in ws:
                def body(carry, li):
                    xi, s = quant_act(carry)
                    wl = jax.lax.dynamic_index_in_dim(wg, li,
                                                      keepdims=False)
                    y = jax.lax.dot_general(
                        xi, wl, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    y = (y.astype(jnp.float32) * s)[:, :K].astype(
                        jnp.bfloat16)
                    return carry + y * 1e-6, None

                x, _ = jax.lax.scan(body, x, jnp.arange(G))
            x = x + (i + k).astype(jnp.bfloat16) * 1e-9
        return x

    x = jnp.ones((M, K), jnp.bfloat16)
    dt = timeit(f, x)
    gb = K * N / 1e9
    mb = G * K * N // 2**20
    print(f"grouped {ngrp}x{G} ({mb} MB/slab): {dt * 1e6:8.1f} us/layer  "
          f"{gb / dt:6.0f} GB/s weight stream", flush=True)


def main():
    print(f"# devices: {jax.devices()}  dot [{M},{K}]x[{K},{N}] int8",
          flush=True)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "stacked"):
        bench_stacked()
        bench_stacked()
    if which in ("all", "grouped"):
        bench_grouped(8)   # 448 MB slabs
        bench_grouped(4)   # 224 MB slabs


if __name__ == "__main__":
    sys.exit(main())
