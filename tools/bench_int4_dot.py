"""Does XLA expose a fast native-int4 dot on this chip? (VERDICT r04 #2)

Times lax.dot_general for every (activation, weight) dtype combo at the
bench decode + prefill shapes, plus the weight-layout variants we could
serve from:
  - w8a8 int8 x int8 -> int32 (current execution layout)
  - w4a8 int8 x int4 -> int32 (weights stored jnp.int4: XLA packs two
    nibbles/byte in HBM; the unpack rides the dot if the backend
    supports it)
  - w4a4 int4 x int4 -> int32
  - bf16 x bf16 (baseline)
  - bf16 x int4 (weight-only: convert-in-dot)

Ratios within one run are meaningful on the shared chip; absolutes swing.
python tools/bench_int4_dot.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _time(fn, *args, iters=30):
    out = fn(*args)
    np.asarray(out[0, 0])  # sync (fetch)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out[0, 0])
    return (time.perf_counter() - t0) / iters


def dot(pt):
    def f(a, b):
        return lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=pt)
    return jax.jit(f)


def run(T, K, N):
    rng = np.random.default_rng(0)
    x8 = jnp.asarray(rng.integers(-127, 127, (T, K)), jnp.int8)
    w8 = jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8)
    xb = jnp.asarray(rng.standard_normal((T, K)), jnp.bfloat16)
    wb = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)
    results = {}
    results["bf16xbf16"] = _time(dot(jnp.float32), xb, wb)
    results["i8xi8"] = _time(dot(jnp.int32), x8, w8)
    try:
        w4 = w8.astype(jnp.int4)
        results["i8xi4"] = _time(dot(jnp.int32), x8, w4)
        results["bf16xi4"] = _time(
            jax.jit(lambda a, b: jnp.dot(a, b.astype(jnp.bfloat16))),
            xb, w4)
        x4 = x8.astype(jnp.int4)
        results["i4xi4"] = _time(dot(jnp.int32), x4, w4)
    except Exception as e:  # noqa: BLE001
        results["int4_error"] = str(e)[:200]
    base = results["i8xi8"]
    line = f"[{T},{K}]x[{K},{N}] "
    for k, v in results.items():
        if isinstance(v, float):
            line += f"| {k} {v * 1e6:7.1f}us ({base / v:4.2f}x i8) "
        else:
            line += f"| {k}: {v} "
    print(line, flush=True)


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    for shape in [(256, 4096, 14336), (256, 14336, 4096),
                  (256, 4096, 6144), (4096, 4096, 14336)]:
        run(*shape)


if __name__ == "__main__":
    main()
