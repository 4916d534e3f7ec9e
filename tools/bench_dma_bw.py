"""HBM->VMEM DMA bandwidth microbench (round 4).

Question: the decode kernel's manual page DMAs stream at ~217 GB/s
effective (round-3 finding) while v5e HBM peak is ~819 GB/s. Is the cap
(a) the chip (tunnel artifact / real per-queue limit) — measure what a
plain XLA HBM-bound reduction achieves on the same array;
(b) the manual-copy path — measure a Pallas kernel that double-buffers
big contiguous copies (the best case for make_async_copy);
(c) copy-count / size — sweep count x size at fixed total bytes;
(d) fixable with DMA priorities — issue half the copies at priority 0
and half at priority 1 (separate hardware queues would run them
concurrently).

All cases chain data through iterations (the axon tunnel replays
byte-identical executions from cache, so repeated identical calls
measure dispatch RTT, not the kernel).

python tools/bench_dma_bw.py
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


INNER = 8  # repeats inside one jit (amortize tunnel dispatch)


def timeit(fn, x, iters=30):
    # chain an iteration counter through fn so no two executions are
    # byte-identical (the axon tunnel replays identical executions from
    # cache), and END with a real device->host fetch (block_until_ready
    # returns early under the tunnel).
    x = fn(x, jnp.int32(10**6))
    np.asarray(x[0, :1])
    t0 = time.perf_counter()
    for i in range(iters):
        x = fn(x, jnp.int32(i))
    np.asarray(x[0, :1])
    return (time.perf_counter() - t0) / iters / INNER


def bench_xla_reduce(total_mb=512):
    """Ground truth: XLA int8 row-reduction, HBM-read-bound."""
    n = total_mb * 1024 * 1024
    a = jnp.arange(n, dtype=jnp.int8).reshape(-1, 1024)

    @jax.jit
    def f(a, i):
        # keep output tiny; chain by adding the scalar back in
        for k in range(INNER):
            s = jnp.sum(a.astype(jnp.int32))
            a = a.at[0, 0].add(((s + i + k) % 5).astype(jnp.int8))
        return a

    dt = timeit(f, a, iters=10)
    gbs = n / dt / 1e9
    print(f"xla int8 sum      {total_mb:5d} MB: {dt * 1e3:8.2f} ms  "
          f"{gbs:6.0f} GB/s", flush=True)


def _copy_kernel(x_hbm, o_ref, buf, sems, *, n_copies, rows_per_copy,
                 n_chunks, priorities):
    """Double-buffered streaming read of x_hbm; per chunk issue
    n_copies copies of rows_per_copy rows each."""

    def dma(slot, ci, c):
        r0 = ci * (n_copies * rows_per_copy) + c * rows_per_copy
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(r0, rows_per_copy)],
            buf.at[slot, pl.ds(c * rows_per_copy, rows_per_copy)],
            sems.at[slot, c])

    for c in range(n_copies):
        dma(0, 0, c).start(priority=priorities[c % len(priorities)])

    def body(ci, acc):
        slot = ci % 2

        @pl.when(ci + 1 < n_chunks)
        def _():
            for c in range(n_copies):
                dma(1 - slot, ci + 1, c).start(
                    priority=priorities[c % len(priorities)])

        for c in range(n_copies):
            dma(slot, ci, c).wait()
        # touch a small fixed slice so the reads aren't dead
        return acc + buf[slot, :8, :].astype(jnp.int32).sum()

    acc = jax.lax.fori_loop(0, n_chunks, body, jnp.int32(0))
    o_ref[0, 0] = acc


def bench_pallas_copies(total_mb, n_copies, copy_kb, priorities=(0,),
                        label=""):
    row_bytes = 512  # int8 lane-major rows
    rows_per_copy = copy_kb * 1024 // row_bytes
    chunk_rows = n_copies * rows_per_copy
    total_rows = total_mb * 1024 * 1024 // row_bytes
    n_chunks = total_rows // chunk_rows
    total_rows = n_chunks * chunk_rows
    x = jnp.arange(total_rows * row_bytes, dtype=jnp.int8).reshape(
        total_rows, row_bytes)

    kern = functools.partial(_copy_kernel, n_copies=n_copies,
                             rows_per_copy=rows_per_copy,
                             n_chunks=n_chunks, priorities=priorities)
    call = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((2, chunk_rows, row_bytes), jnp.int8),
            pltpu.SemaphoreType.DMA((2, n_copies)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )

    @jax.jit
    def f(x, i):
        for k in range(INNER):
            s = call(x)[0, 0]
            x = x.at[0, 0].add(((s + i + k) % 5).astype(jnp.int8))
        return x

    nbytes = total_rows * row_bytes
    dt = timeit(f, x, iters=10)
    gbs = nbytes / dt / 1e9
    print(f"pallas {label:22s} {nbytes // 2**20:5d} MB "
          f"{n_copies:3d}x{copy_kb:5d}KB prio={priorities}: "
          f"{dt * 1e3:8.2f} ms  {gbs:6.0f} GB/s", flush=True)


def _scatter_kernel(pages_ref, x_hbm, o_ref, buf, sems, *, n_copies,
                    rows_per_copy, n_chunks, layer_stride):
    """Like _copy_kernel but the source offset of each copy comes from a
    prefetched page-id table (emulating block_tables), and an optional
    layer offset emulates the multi-GB KV footprint."""

    def dma(slot, ci, c):
        pid = pages_ref[ci * n_copies + c]
        r0 = pid * rows_per_copy + (ci % 32) * layer_stride
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(r0, rows_per_copy)],
            buf.at[slot, pl.ds(c * rows_per_copy, rows_per_copy)],
            sems.at[slot, c])

    for c in range(n_copies):
        dma(0, 0, c).start()

    def body(ci, acc):
        slot = ci % 2

        @pl.when(ci + 1 < n_chunks)
        def _():
            for c in range(n_copies):
                dma(1 - slot, ci + 1, c).start()

        for c in range(n_copies):
            dma(slot, ci, c).wait()
        return acc + buf[slot, :8, :].astype(jnp.int32).sum()

    acc = jax.lax.fori_loop(0, n_chunks, body, jnp.int32(0))
    o_ref[0, 0] = acc


def bench_scatter(total_mb, n_copies, copy_kb, buf_mb=4096, shuffle=True,
                  layers=1, label=""):
    row_bytes = 512
    rows_per_copy = copy_kb * 1024 // row_bytes
    chunk_rows = n_copies * rows_per_copy
    read_rows = total_mb * 1024 * 1024 // row_bytes
    n_chunks = read_rows // chunk_rows
    read_rows = n_chunks * chunk_rows

    buf_rows = buf_mb * 1024 * 1024 // row_bytes
    n_pages_buf = buf_rows // rows_per_copy // layers
    layer_stride = (buf_rows // layers) if layers > 1 else 0
    rng = np.random.default_rng(0)
    ids = rng.integers(0, n_pages_buf, n_chunks * n_copies) if shuffle \
        else (np.arange(n_chunks * n_copies) % n_pages_buf)
    pages = jnp.asarray(ids, jnp.int32)

    x = jnp.zeros((buf_rows, row_bytes), jnp.int8)

    kern = functools.partial(_scatter_kernel, n_copies=n_copies,
                             rows_per_copy=rows_per_copy,
                             n_chunks=n_chunks, layer_stride=layer_stride)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((2, chunk_rows, row_bytes), jnp.int8),
            pltpu.SemaphoreType.DMA((2, n_copies)),
        ],
    )
    call = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024),
    )

    # donate x: without donation every call COPIES the buffer for the
    # .at update (a buf_mb-sized copy that halves the apparent rate on
    # big buffers — the round-4 "big-alloc penalty" artifact)
    @functools.partial(jax.jit, donate_argnums=(0,))
    def f(x, i):
        for k in range(INNER):
            s = call(pages, x)[0, 0]
            x = x.at[0, 0].add(((s + i + k) % 5).astype(jnp.int8))
        return x

    nbytes = read_rows * row_bytes
    dt = timeit(f, x, iters=10)
    gbs = nbytes / dt / 1e9
    print(f"scatter {label:21s} {nbytes // 2**20:5d} MB of {buf_mb} MB "
          f"{n_copies:3d}x{copy_kb:5d}KB: {dt * 1e3:8.2f} ms  "
          f"{gbs:6.0f} GB/s", flush=True)


def bench_xla_reduce_bigbuf(buf_mb, read_mb):
    """XLA reduction over the first read_mb of a buf_mb buffer."""
    rows = buf_mb * 1024 * 1024 // 1024
    read_rows = read_mb * 1024 * 1024 // 1024
    a = jnp.zeros((rows, 1024), jnp.int8)

    @jax.jit
    def f(a, i):
        for k in range(INNER):
            s = jnp.sum(a[:read_rows].astype(jnp.int32))
            a = a.at[0, 0].add(((s + i + k) % 5).astype(jnp.int8))
        return a

    dt = timeit(f, a, iters=10)
    gbs = read_mb * 2**20 / dt / 1e9
    print(f"xla sum {read_mb} MB of {buf_mb:5d} MB buf: {dt * 1e3:8.2f} ms"
          f"  {gbs:6.0f} GB/s", flush=True)


def _multibuf_kernel(pages_ref, *refs, n_bufs, n_copies, rows_per_copy,
                     n_chunks):
    """Round-robin copies across n_bufs separate HBM buffers: same total
    footprint as one big buffer, but split across allocations."""
    bufs = refs[:n_bufs]
    o_ref = refs[n_bufs]
    buf = refs[n_bufs + 1]
    sems = refs[n_bufs + 2]

    def dma(slot, ci, c):
        pid = pages_ref[ci * n_copies + c]
        src = bufs[c % n_bufs]
        return pltpu.make_async_copy(
            src.at[pl.ds(pid * rows_per_copy, rows_per_copy)],
            buf.at[slot, pl.ds(c * rows_per_copy, rows_per_copy)],
            sems.at[slot, c])

    for c in range(n_copies):
        dma(0, 0, c).start()

    def body(ci, acc):
        slot = ci % 2

        @pl.when(ci + 1 < n_chunks)
        def _():
            for c in range(n_copies):
                dma(1 - slot, ci + 1, c).start()

        for c in range(n_copies):
            dma(slot, ci, c).wait()
        return acc + buf[slot, :8, :].astype(jnp.int32).sum()

    acc = jax.lax.fori_loop(0, n_chunks, body, jnp.int32(0))
    o_ref[0, 0] = acc


def bench_multibuf(total_mb, n_copies, copy_kb, n_bufs, buf_mb):
    row_bytes = 512
    rows_per_copy = copy_kb * 1024 // row_bytes
    chunk_rows = n_copies * rows_per_copy
    read_rows = total_mb * 1024 * 1024 // row_bytes
    n_chunks = read_rows // chunk_rows
    read_rows = n_chunks * chunk_rows
    buf_rows = buf_mb * 1024 * 1024 // row_bytes
    n_pages_buf = buf_rows // rows_per_copy
    rng = np.random.default_rng(0)
    pages = jnp.asarray(rng.integers(0, n_pages_buf, n_chunks * n_copies),
                        jnp.int32)
    xs = [jnp.zeros((buf_rows, row_bytes), jnp.int8) for _ in range(n_bufs)]

    kern = functools.partial(_multibuf_kernel, n_bufs=n_bufs,
                             n_copies=n_copies,
                             rows_per_copy=rows_per_copy, n_chunks=n_chunks)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_bufs,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((2, chunk_rows, row_bytes), jnp.int8),
            pltpu.SemaphoreType.DMA((2, n_copies)),
        ],
    )
    call = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024),
    )

    @jax.jit
    def f(x0, i, *rest):
        xs = (x0,) + rest
        for k in range(INNER):
            s = call(pages, *xs)[0, 0]
            x0 = x0.at[0, 0].add(((s + i + k) % 5).astype(jnp.int8))
            xs = (x0,) + rest
        return x0

    g = functools.partial(f, *(), **{})

    def fn(x, i):
        return g(x, i, *xs[1:])

    nbytes = read_rows * row_bytes
    dt = timeit(fn, xs[0], iters=10)
    gbs = nbytes / dt / 1e9
    print(f"multibuf {n_bufs}x{buf_mb}MB rand {nbytes // 2**20:5d} MB "
          f"{n_copies:3d}x{copy_kb:5d}KB: {dt * 1e3:8.2f} ms  "
          f"{gbs:6.0f} GB/s", flush=True)


def main():
    print(f"# devices: {jax.devices()}", flush=True)
    if "--cliff" in sys.argv:
        for buf_mb in (512, 1024, 2048, 3072, 4096, 6144):
            bench_scatter(512, 16, 512, buf_mb=buf_mb, shuffle=False,
                          label=f"seq {buf_mb}MB")
        bench_xla_reduce_bigbuf(4096, 512)
        bench_xla_reduce_bigbuf(512, 512)
        return
    if "--multibuf" in sys.argv:
        bench_multibuf(512, 16, 512, n_bufs=8, buf_mb=512)
        bench_multibuf(512, 16, 512, n_bufs=4, buf_mb=1024)
        bench_multibuf(512, 16, 512, n_bufs=1, buf_mb=512)
        bench_multibuf(512, 16, 512, n_bufs=1, buf_mb=4096)
        bench_xla_reduce_bigbuf(4096, 512)
        bench_xla_reduce_bigbuf(512, 512)
        return
    bench_xla_reduce(512)
    bench_xla_reduce(512)
    # best case: few huge copies
    bench_pallas_copies(512, 1, 4096, label="1 huge")
    bench_pallas_copies(512, 2, 2048, label="2 big")
    bench_pallas_copies(512, 4, 1024, label="4 big")
    bench_pallas_copies(512, 8, 512, label="8 page-sized")
    bench_pallas_copies(512, 16, 512, label="16 page-sized")
    bench_pallas_copies(512, 16, 128, label="16 small")
    # priority split: do two hw queues run concurrently?
    bench_pallas_copies(512, 2, 2048, priorities=(0, 1), label="2 big split")
    bench_pallas_copies(512, 8, 512, priorities=(0, 1), label="8 page split")
    bench_pallas_copies(512, 16, 512, priorities=(0, 1), label="16 page split")
    bench_pallas_copies(512, 16, 128, priorities=(0, 1), label="16 small split")
    # scattered (block-table-driven) reads: does locality explain 217?
    bench_scatter(512, 16, 512, buf_mb=512, shuffle=False, label="seq small-buf")
    bench_scatter(512, 16, 512, buf_mb=4096, shuffle=False, label="seq 4GB")
    bench_scatter(512, 16, 512, buf_mb=512, shuffle=True, label="rand small-buf")
    bench_scatter(512, 16, 512, buf_mb=4096, shuffle=True, label="rand 4GB")
    bench_scatter(512, 16, 512, buf_mb=6144, shuffle=True, label="rand 6GB")
    bench_scatter(512, 16, 128, buf_mb=4096, shuffle=True, label="rand 4GB 128K")


if __name__ == "__main__":
    sys.exit(main())
