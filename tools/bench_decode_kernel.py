"""Decode-attention kernel microbench: isolate fixed vs per-DMA vs
per-byte cost by sweeping context length and page size IN ONE RUN
(the shared chip makes cross-run numbers incomparable).

python tools/bench_decode_kernel.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def run_case(bs, ctx, page, nq=32, nk=8, d=128, iters=20, layers=8,
             mg=None):
    if mg is not None:
        os.environ["VLLM_TPU_DECODE_MG"] = str(mg)
    from vllm_tpu.ops.attention import AttentionMetadata
    from vllm_tpu.ops.pallas.ragged_paged_attention import (
        build_logical_blocks, ragged_paged_attention)

    rng = np.random.default_rng(0)
    nb_per = -(-ctx // page)
    num_blocks = 1 + bs * nb_per
    # KV generated ON DEVICE: a multi-GB host array would crawl through
    # the tunnel's host->device upload path
    key = jax.random.PRNGKey(0)
    kv = jax.random.randint(key, (layers, num_blocks, 2 * nk, page, d),
                            -100, 100, jnp.int8)
    q = (jax.random.normal(jax.random.fold_in(key, 1), (bs, nq, d),
                           jnp.float32) * 0.3).astype(jnp.bfloat16)
    qsl = np.arange(bs + 1, dtype=np.int32)
    seq_lens = np.full(bs, ctx, np.int32)
    positions = np.full(bs, ctx - 1, np.int32)
    bt = np.zeros((bs, 32), np.int32)
    for r in range(bs):
        bt[r, :nb_per] = 1 + r * nb_per + np.arange(nb_per)
    lb_seq, lb_q_start = build_logical_blocks(qsl, bs, bs)
    meta = AttentionMetadata(
        slot_mapping=jnp.zeros(bs, jnp.int32),
        block_tables=jnp.asarray(bt),
        query_start_loc=jnp.asarray(qsl),
        seq_lens=jnp.asarray(seq_lens),
        positions=jnp.asarray(positions),
        lb_seq=jnp.asarray(lb_seq),
        lb_q_start=jnp.asarray(lb_q_start),
    )

    @jax.jit
    def many(q, kv):
        out = q
        for li in range(layers):
            out = ragged_paged_attention(out, kv, meta, scale=0.0883,
                                         k_scale=0.05, v_scale=0.05,
                                         layer=li)
        return out

    # CHAIN q through each call: the axon remote runtime replays
    # cached results for byte-identical executions, so repeated calls
    # on the same inputs measure the dispatch RTT, not the kernel.
    q = many(q, kv)
    np.asarray(q[0, 0, 0])  # sync
    t0 = time.perf_counter()
    for _ in range(iters):
        q = many(q, kv)
    np.asarray(q[0, 0, 0])
    dt = (time.perf_counter() - t0) / iters / layers
    pages = -(-ctx // page)
    kv_mb = bs * pages * page * 2 * nk * d / 1e6
    print(f"bs={bs} ctx={ctx} page={page}: {dt * 1e6:8.1f} us/layer "
          f"({bs * pages:4d} page-DMAs, {kv_mb:.0f} MB, "
          f"{kv_mb / dt / 1e3:.0f} GB/s)", flush=True)
    return dt


def main():
    print("# backend:", jax.default_backend(), file=sys.stderr)
    # sweep ctx at page 32 (per-chunk C=256 -> 1 chunk until ctx>256)
    for ctx in (64, 128, 192, 256, 448):
        run_case(256, ctx, 32)
    # page-size sweep at fixed ctx
    for page in (32, 64, 128):
        run_case(256, 192, page)
    # batch sweep
    for bs in (64, 128, 256):
        run_case(bs, 192, 32)
    # block-diagonal group-size sweep (MG x redundant FLOPs vs fixed
    # per-dot MXU latency) at the flagship decode shape
    for mg in (1, 2, 4, 8, 16):
        print(f"# mg={mg}")
        run_case(256, 192, 32, mg=mg)


if __name__ == "__main__":
    main()
