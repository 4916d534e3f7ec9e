"""Microbench: rotate-through PP ring vs resident-ring streaming.

Runs the two pipeline schedules in vllm_tpu/parallel/pipeline.py over an
8-virtual-device CPU mesh (or a real TPU slice when available) on a
synthetic stacked-layer MLP and reports wall time per COMPLETED batch.

- pipeline_layers: one live batch rotates through all pp stages inside a
  single call; every stage executes pp iterations per completed batch,
  so per-device work = L layers.
- pipeline_stream_layers: pp disjoint batches in flight, one hop per
  call, one batch exits per call; per-device work = L/pp layers.

Expected steady-state ratio ~= pp (VERDICT r02 item 6 target >= 1.7x at
pp=2).  Reference analog being beaten: vllm/v1/engine/core.py:290
step_with_batch_queue.

Usage:  python tools/bench_pp_stream.py [pp] [iters]
"""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    "--xla_force_host_platform_device_count=8 "
    + os.environ.get("XLA_FLAGS", ""))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402

from vllm_tpu.parallel.pipeline import (pipeline_layers,  # noqa: E402
                                        pipeline_stream_layers)


def main() -> None:
    pp = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    L, T, H, F = 8, 64, 512, 2048

    devs = jax.devices()[:pp]
    mesh = Mesh(np.array(devs).reshape(pp), ("pp",))
    rng = np.random.default_rng(0)
    shard = NamedSharding(mesh, P("pp"))

    layers = {
        "w1": jax.device_put(
            rng.standard_normal((L, H, F), np.float32) * 0.02, shard),
        "w2": jax.device_put(
            rng.standard_normal((L, F, H), np.float32) * 0.02, shard),
    }
    kv = jax.device_put(jnp.zeros((L, 1), jnp.float32), shard)
    x = jnp.asarray(rng.standard_normal((T, H), np.float32))
    resident = jax.device_put(jnp.zeros((pp, T, H), jnp.float32), shard)
    md = jax.device_put(jnp.zeros((pp, 1), jnp.int32), shard)

    def run_layers(chunk, kv_chunk, x, metadata, lora):
        def body(h, w):
            h = jnp.tanh(h @ w["w1"]) @ w["w2"] + h
            return h, None

        h, _ = jax.lax.scan(body, x, chunk)
        return h, kv_chunk

    rotate = jax.jit(lambda ls, kv, x: pipeline_layers(
        run_layers, ls, kv, x, jnp.zeros((1,), jnp.int32), None, mesh,
        pp)[0])
    stream = jax.jit(lambda ls, kv, x, res, md: pipeline_stream_layers(
        run_layers, ls, kv, x, res, md, mesh, pp)[::2])

    def timeit(fn, *args):
        fn(*args)[0].block_until_ready()  # compile + warm
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        jax.tree.map(
            lambda a: a.block_until_ready()
            if hasattr(a, "block_until_ready") else a, out)
        return (time.perf_counter() - t0) / iters

    t_rot = timeit(rotate, layers, kv, x)
    # steady-state stream: one hop = one completed batch
    t_str = timeit(stream, layers, kv, x, resident, md)

    ratio = t_rot / t_str
    import json
    print(json.dumps({
        "metric": "pp_stream_speedup", "pp": pp,
        "rotate_ms_per_batch": round(t_rot * 1e3, 3),
        "stream_ms_per_batch": round(t_str * 1e3, 3),
        "value": round(ratio, 3), "unit": "x",
    }))


if __name__ == "__main__":
    main()
