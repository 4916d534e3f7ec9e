"""Pallas TPU ragged paged attention.

TPU-native replacement for the reference's paged_attention_v1/v2 +
flash-varlen CUDA kernels (reference: csrc/attention/attention_kernels.cuh:670,
vllm/v1/attention/backends/pallas.py:41-267 — design re-derived, not
ported). One kernel serves prefill, chunked prefill, decode and
spec-verify in a single ragged batch.

Design
------
The ragged token batch is tiled into *logical q blocks*: per-sequence
tiles of at most BQ query rows (a sequence with q_len queries contributes
ceil(q_len / BQ) blocks). The worst-case block count for a (T, R) bucket
is static: MAXLB = R + T // BQ, so the grid shape never depends on the
batch composition.

grid = (MAXLB,). Each program:
  1. reads its (seq, q_start) assignment from scalar-prefetched SMEM,
  2. DMAs its q tile HBM->VMEM,
  3. streams the sequence's KV pages in double-buffered chunks
     (CHUNK_PAGES pages per DMA round), maintaining an online-softmax
     accumulator per KV head,
  4. writes the normalized output tile back to HBM.

Decode buckets (T == R) use BQ=16 so the per-sequence FLOP waste stays
under the HBM-streaming cost; prefill buckets use BQ=128 for MXU
utilization. GQA is computed head-group-major: per KV head h, the q tile
is reshaped to [BQ*G, d] so the MXU sees tall matmuls.

The q/out arrays carry BQ rows of padding slack so partial tiles can be
written with full-tile DMAs (a later program in token order overwrites
any spill, and the grid is sequential on a TPU core).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vllm_tpu import envs
from vllm_tpu.ops.attention import AttentionMetadata

NEG_INF = -1e30
# CPU-interpret mode for kernel unit tests (reference test precedent:
# Pallas-kernel vs jnp-reference in interpret mode, SURVEY.md §4).
_INTERPRET = os.environ.get("VLLM_TPU_PALLAS_INTERPRET", "0") == "1"


def q_block_size(num_tokens: int, num_reqs: int) -> int:
    """Decode-ish buckets get small q tiles; prefill gets MXU-sized ones."""
    if num_tokens <= 2 * num_reqs:
        return 16
    return 128


def max_logical_blocks(num_tokens: int, num_reqs: int) -> int:
    bq = q_block_size(num_tokens, num_reqs)
    return num_reqs + num_tokens // bq


def build_logical_blocks(query_start_loc: np.ndarray, num_tokens: int,
                         num_reqs: int, skip_single: bool = False
                         ) -> tuple[np.ndarray, np.ndarray]:
    """Host-side: (lb_seq, lb_q_start) arrays, padded with -1.

    Called by InputBatch.prepare_inputs; the result rides in
    AttentionMetadata so the kernel never sees dynamic shapes.

    ``skip_single``: leave q_len==1 requests out (prefill-shaped buckets
    route them through the batched-row decode kernel instead — a decode
    row in a BQ=128 tile would compute at 1/BQ utilization). Only valid
    for the non-MLA GQA path whose dispatcher performs that split.
    """
    bq = q_block_size(num_tokens, num_reqs)
    maxlb = max_logical_blocks(num_tokens, num_reqs)
    lb_seq = np.full(maxlb, -1, np.int32)
    lb_q_start = np.zeros(maxlb, np.int32)
    skip = skip_single and bq != 16
    i = 0
    for s in range(num_reqs):
        start, end = int(query_start_loc[s]), int(query_start_loc[s + 1])
        if skip and end - start == 1:
            continue
        for q0 in range(start, end, bq):
            lb_seq[i] = s
            lb_q_start[i] = q0
            i += 1
    return lb_seq, lb_q_start


def _alibi_col(alibi: tuple, h: int, group: int, rows: int):
    """Per-row ALiBi slope column [rows, 1] built from scalar constants
    (Pallas kernels cannot capture array constants): row r serves query
    head h*group + r % group."""
    gidx = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) % group
    slope = jnp.zeros((rows, 1), jnp.float32)
    for g in range(group):
        slope = jnp.where(gidx == g, float(alibi[h * group + g]), slope)
    return slope


def _chunk_bounds(lb_seq_ref, lb_q_start_ref, cu_q_lens_ref, seq_lens_ref,
                  lb, bq: int, C: int):
    """(kv_len, num_chunks) for logical block lb (clamped to valid)."""
    s = jnp.maximum(lb_seq_ref[lb], 0)
    q_start = lb_q_start_ref[lb]
    q_end_seq = cu_q_lens_ref[s + 1]
    kv_len = seq_lens_ref[s]
    last_row_t = jnp.minimum(q_start + bq, q_end_seq) - 1
    kv_needed = jnp.minimum(kv_len, kv_len - (q_end_seq - last_row_t) + 1)
    kv_needed = jnp.maximum(kv_needed, 0)
    return kv_len, pl.cdiv(kv_needed, C)


def _kernel(
    # scalar prefetch
    lb_seq_ref,  # i32[MAXLB]
    lb_q_start_ref,  # i32[MAXLB]
    cu_q_lens_ref,  # i32[R+1]
    seq_lens_ref,  # i32[R]
    block_tables_ref,  # i32[R, MAXP]
    layer_ref,  # i32[1] — which layer of the stacked cache to read/DMA
    k_scale_ref,  # f32[nk] per-head K dequant scales (ones when unquantized)
    v_scale_ref,  # f32[nk]
    # tensors (HBM)
    q_hbm,  # [T + BQ, nq, d]
    kv_hbm,  # [L, N, 2*nk, ps, d] (head-major pages)
    out_hbm,  # [T + BQ, nq, d]
    # scratch (persists across grid programs — the pipeline rides on it)
    q_buf,  # VMEM [2, BQ, nq, d]
    kv_buf,  # VMEM [2, 2*nk, C, d]   C = CHUNK_PAGES * ps
    out_buf,  # VMEM [2, BQ, nq, d]
    pipe,  # SMEM [4]: [0]=kv chunk parity base, [1..2]=prev out q_start
    q_sems,  # DMA sems [2]
    out_sems,  # DMA sems [2]
    kv_sems,  # DMA sems [2, CHUNK_PAGES]
    *,
    bq: int,
    chunk_pages: int,
    page_size: int,
    num_kv_heads: int,
    group: int,
    head_dim: int,
    scale: float,
    sliding_window: Optional[int],
    soft_cap: Optional[float],
    kv_quant: bool,
    maxlb: int,
    alibi: Optional[tuple] = None,
):
    """Decode is DMA-LATENCY-bound, not bandwidth-bound: at bs=256 the
    grid runs ~270 sequential programs of ~1 chunk each, so per-program
    DMA round-trips dominate (measured 4.5us/program = 60% of the step).
    The fix is a software pipeline across grid programs (VMEM scratch and
    semaphores persist): each program prefetches its SUCCESSOR's q tile
    and first KV chunk while computing its own, and out-tile writeback is
    double-buffered so no program waits on its own output DMA."""
    lb = pl.program_id(0)
    s = lb_seq_ref[lb]
    C = chunk_pages * page_size

    def chunk_dma_for(blk, slot, ci):
        # CHUNK_PAGES page copies of logical block blk's chunk ci.
        sb = jnp.maximum(lb_seq_ref[blk], 0)
        kv_len_b = seq_lens_ref[sb]
        copies = []
        for p in range(chunk_pages):
            page_pos = ci * chunk_pages + p
            max_page = pl.cdiv(kv_len_b, page_size) - 1
            safe_pos = jnp.clip(page_pos, 0, jnp.maximum(max_page, 0))
            page_id = block_tables_ref[sb, safe_pos]
            copies.append(
                pltpu.make_async_copy(
                    kv_hbm.at[layer_ref[0], page_id],
                    kv_buf.at[slot, :, pl.ds(p * page_size, page_size)],
                    kv_sems.at[slot, p]))
        return copies

    @pl.when(lb == 0)
    def _prologue():
        pipe[0] = 0
        pipe[1] = -1
        pipe[2] = -1

        @pl.when(s >= 0)
        def _():
            pltpu.make_async_copy(
                q_hbm.at[pl.ds(lb_q_start_ref[0], bq)], q_buf.at[0],
                q_sems.at[0]).start()
            _, nc0 = _chunk_bounds(lb_seq_ref, lb_q_start_ref,
                                   cu_q_lens_ref, seq_lens_ref, 0, bq, C)

            @pl.when(nc0 > 0)
            def _():
                for cpy in chunk_dma_for(0, 0, 0):
                    cpy.start()

    @pl.when(s >= 0)
    def _run():
        q_start = lb_q_start_ref[lb]
        q_end_seq = cu_q_lens_ref[s + 1]
        kv_len = seq_lens_ref[s]
        nq = num_kv_heads * group
        base = pipe[0]  # kv ping-pong parity at this program's chunk 0
        qslot = jax.lax.rem(lb, 2)

        _, num_chunks = _chunk_bounds(lb_seq_ref, lb_q_start_ref,
                                      cu_q_lens_ref, seq_lens_ref, lb, bq,
                                      C)

        # ---- successor prefetch: q tile now; its first KV chunk after
        # our last chunk's DMA has been issued (below).
        nxt = jnp.minimum(lb + 1, maxlb - 1)
        s_next = jnp.where(lb + 1 < maxlb, lb_seq_ref[nxt], -1)

        @pl.when(s_next >= 0)
        def _():
            pltpu.make_async_copy(
                q_hbm.at[pl.ds(lb_q_start_ref[nxt], bq)],
                q_buf.at[1 - qslot], q_sems.at[1 - qslot]).start()

        _, nc_next = _chunk_bounds(lb_seq_ref, lb_q_start_ref,
                                   cu_q_lens_ref, seq_lens_ref, nxt, bq, C)
        next_slot = jax.lax.rem(base + num_chunks, 2)

        @pl.when((s_next >= 0) & (nc_next > 0) & (num_chunks <= 1))
        def _():
            # 0- or 1-chunk program: our only in-flight chunk DMA is done
            # being issued; launch the successor's chunk 0 immediately.
            for cpy in chunk_dma_for(nxt, next_slot, 0):
                cpy.start()

        pltpu.make_async_copy(
            q_hbm.at[pl.ds(q_start, bq)], q_buf.at[qslot],
            q_sems.at[qslot]).wait()
        qf = q_buf[qslot]  # model dtype; scale applied post-dot in fp32

        # row coordinates
        row_t = q_start + jax.lax.broadcasted_iota(
            jnp.int32, (bq * group, 1), 0) // group
        row_pos = kv_len - (q_end_seq - row_t)  # absolute position
        row_valid = row_t < q_end_seq

        def body(ci, carry):
            m_all, l_all, acc_all = carry
            slot = jax.lax.rem(base + ci, 2)

            @pl.when(ci + 1 < num_chunks)
            def _():
                for cpy in chunk_dma_for(lb, jax.lax.rem(base + ci + 1, 2),
                                         ci + 1):
                    cpy.start()

            @pl.when((ci + 1 == num_chunks) & (num_chunks >= 2)
                     & (s_next >= 0) & (nc_next > 0))
            def _():
                # last in-seq chunk issued: launch the successor's first
                # chunk so its data is landing while we finish computing.
                for cpy in chunk_dma_for(nxt, next_slot, 0):
                    cpy.start()

            for cpy in chunk_dma_for(lb, slot, ci):
                cpy.wait()

            col = ci * C + jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
            col_ok = (col < kv_len) & (col <= row_pos)
            if sliding_window is not None:
                col_ok &= col > row_pos - sliding_window

            kv = kv_buf[slot]  # [2nk, C, d]: per-head rows contiguous
            new_m, new_l, new_acc = [], [], []
            for h in range(num_kv_heads):
                # dequant folds: raw int8/fp8 -> bf16 convert (one VPU
                # pass); the per-head K scale folds into the f32 score
                # scale and the V scale applies once on the epilogue
                k = kv[h].astype(qf.dtype)
                v = kv[num_kv_heads + h].astype(qf.dtype)
                eff = scale * k_scale_ref[h] if kv_quant else scale
                qh = qf[:, h * group:(h + 1) * group, :].reshape(
                    bq * group, head_dim)
                scores = jax.lax.dot_general(
                    qh, k,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * eff
                if alibi is not None:
                    # ALiBi bias: slope_h * (col - pos), 0 at the query
                    # position (reference: csrc attention kernels'
                    # alibi path; Bloom/MPT/Baichuan-13B)
                    slope = _alibi_col(alibi, h, group, bq * group)
                    scores = scores + slope * (
                        col - row_pos).astype(jnp.float32)
                if soft_cap is not None:
                    scores = soft_cap * jnp.tanh(scores / soft_cap)
                scores = jnp.where(col_ok & row_valid, scores, NEG_INF)

                m_prev = m_all[h]
                l_prev = l_all[h]
                acc_prev = acc_all[h]
                m_cur = jnp.max(scores, axis=-1, keepdims=True)
                m_new = jnp.maximum(m_prev, m_cur)
                p = jnp.exp(scores - m_new)
                l_cur = jnp.sum(p, axis=-1, keepdims=True)
                alpha = jnp.exp(m_prev - m_new)
                l_new = l_prev * alpha + l_cur
                pv = jax.lax.dot_general(
                    p.astype(v.dtype), v,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc_new = acc_prev * alpha + pv
                new_m.append(m_new)
                new_l.append(l_new)
                new_acc.append(acc_new)
            return (jnp.stack(new_m), jnp.stack(new_l), jnp.stack(new_acc))

        init = (
            jnp.full((num_kv_heads, bq * group, 1), NEG_INF, jnp.float32),
            jnp.zeros((num_kv_heads, bq * group, 1), jnp.float32),
            jnp.zeros((num_kv_heads, bq * group, head_dim), jnp.float32),
        )
        m_all, l_all, acc_all = jax.lax.fori_loop(0, num_chunks, body, init)

        # normalize + scatter heads back to [BQ, nq, d]
        out = acc_all / jnp.maximum(l_all, 1e-20)  # [nk, BQ*G, d]
        if kv_quant:
            # per-head V dequant fold: scalar SMEM read x static slice
            # (Mosaic cannot shape-cast a stack of SMEM scalars)
            out = jnp.stack([out[h] * v_scale_ref[h]
                             for h in range(num_kv_heads)])
        out = out.reshape(num_kv_heads, bq, group, head_dim)
        out = out.transpose(1, 0, 2, 3).reshape(bq, nq, head_dim)

        # double-buffered writeback: drain the DMA issued on this slot
        # two programs ago, then hand off without waiting on our own.
        prev_qs = pipe[1 + qslot]

        @pl.when(prev_qs >= 0)
        def _():
            pltpu.make_async_copy(
                out_buf.at[qslot], out_hbm.at[pl.ds(prev_qs, bq)],
                out_sems.at[qslot]).wait()

        out_buf[qslot] = out.astype(out_buf.dtype)
        pltpu.make_async_copy(
            out_buf.at[qslot], out_hbm.at[pl.ds(q_start, bq)],
            out_sems.at[qslot]).start()
        pipe[1 + qslot] = q_start
        pipe[0] = jax.lax.rem(base + num_chunks, 2)

    @pl.when(lb == maxlb - 1)
    def _drain():
        # kernel-exit invariant: every started DMA waited. Each out slot
        # has at most one outstanding writeback.
        for oslot in (0, 1):
            prev_qs = pipe[1 + oslot]

            @pl.when(prev_qs >= 0)
            def _():
                pltpu.make_async_copy(
                    out_buf.at[oslot], out_hbm.at[pl.ds(prev_qs, bq)],
                    out_sems.at[oslot]).wait()


@functools.partial(
    jax.jit,
    static_argnames=("scale", "sliding_window", "logits_soft_cap",
                     "chunk_pages", "alibi"))
def _ragged_paged_attention_impl(
    q: jnp.ndarray,
    kv_cache: jnp.ndarray,  # [L, N, 2nk, ps, d]
    layer: jnp.ndarray,  # i32[1]
    lb_seq: jnp.ndarray,
    lb_q_start: jnp.ndarray,
    query_start_loc: jnp.ndarray,
    seq_lens: jnp.ndarray,
    block_tables: jnp.ndarray,
    k_scale_vec: jnp.ndarray,  # f32[nk] (ones when unquantized)
    v_scale_vec: jnp.ndarray,  # f32[nk]
    scale: float,
    sliding_window: Optional[int],
    logits_soft_cap: Optional[float],
    chunk_pages: int,
    alibi: Optional[tuple] = None,
) -> jnp.ndarray:
    T, nq, d = q.shape
    _, N, two_nk, ps, _ = kv_cache.shape
    nk = two_nk // 2
    group = nq // nk
    R = seq_lens.shape[0]
    bq = q_block_size(T, R)
    maxlb = lb_seq.shape[0]

    kv_quant = kv_cache.dtype != q.dtype

    q_pad = jnp.pad(q, ((0, bq), (0, 0), (0, 0)))

    C = chunk_pages * ps
    kernel = functools.partial(
        _kernel,
        bq=bq,
        chunk_pages=chunk_pages,
        page_size=ps,
        num_kv_heads=nk,
        group=group,
        head_dim=d,
        scale=scale,
        sliding_window=sliding_window,
        soft_cap=logits_soft_cap,
        kv_quant=kv_quant,
        maxlb=maxlb,
        alibi=alibi,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(maxlb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # q
            pl.BlockSpec(memory_space=pl.ANY),  # kv
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, bq, nq, d), q.dtype),
            pltpu.VMEM((2, two_nk, C, d), kv_cache.dtype),
            pltpu.VMEM((2, bq, nq, d), q.dtype),
            pltpu.SMEM((4,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, chunk_pages)),
        ],
    )
    out_pad = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T + bq, nq, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # operands are HBM-resident (memory_space=ANY) but XLA stages
            # the padded q through scoped vmem at large token buckets;
            # raise the scoped limit (v5e has 128M vmem) so T=4096-class
            # buckets compile (default 16M trips at ~1k tokens x 32 heads)
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(lb_seq, lb_q_start, query_start_loc, seq_lens, block_tables, layer,
      k_scale_vec, v_scale_vec, q_pad, kv_cache)
    return out_pad[:T]


# --------------------------------------------------------- decode kernel

def _decode_kernel(
    # scalar prefetch
    row_seq_ref,  # i32[Tpad] seq of each token row (-1 pad)
    cu_q_lens_ref,  # i32[R+1]
    seq_lens_ref,  # i32[R]
    block_tables_ref,  # i32[R, MAXP]
    layer_ref,  # i32[1]
    cascade_ref,  # i32[MAXP+1]: [0]=num shared pages, [1:]=page ids
    k_scale_ref,  # f32[nk] per-head K dequant scales (ones if unquantized)
    v_scale_ref,  # f32[nk]
    # tensors
    q_ref,  # [SB, nq, d] auto-pipelined block
    kv_hbm,  # [L, N, 2nk, ps, d] (ANY, head-major pages)
    out_ref,  # [SB, nq, d] block
    # scratch
    kv_buf,  # VMEM [2, SB, 2nk, C, d]
    kv_sems,  # DMA [2, SB, chunk_pages]
    sh_buf,  # VMEM [2, 2nk, C, d] shared-prefix chunks (cascade)
    sh_sems,  # DMA [2, chunk_pages]
    slot_smem,  # SMEM [1]: slot parity carried ACROSS programs
    *,
    sb: int,
    mg: int,
    chunk_pages: int,
    page_size: int,
    num_kv_heads: int,
    group: int,
    head_dim: int,
    scale: float,
    sliding_window: Optional[int],
    soft_cap: Optional[float],
    kv_quant: bool,
    cascade: bool,
    alibi: Optional[tuple] = None,
    cheap_wait: bool = True,
):
    """Decode-bucket kernel: SB token rows per program, each row
    streaming its own sequence's KV pages. A Pallas program has ~3us of
    fixed dispatch overhead (measured no-op kernel); the general kernel's
    one-sequence-per-program decode grid (R programs) pays it R times,
    this one R/SB times. All SB rows' chunk DMAs are issued in one batch
    per chunk with a shared double buffer.

    CROSS-PROGRAM software pipeline: at short decode contexts a program
    has a single KV chunk, so within-program double buffering never
    engages and every program serialized (issue + DMA wait) with its
    compute. Each program therefore issues the NEXT program's first
    chunk before computing; the slot parity rides across programs in
    SMEM scratch (programs on the 1-D "arbitrary" grid run
    sequentially, so the handoff is race-free)."""
    prog = pl.program_id(0)
    num_progs = pl.num_programs(0)
    C = chunk_pages * page_size
    nq = num_kv_heads * group
    # cascade: the first ns_pages of EVERY row's context are the same
    # blocks; they stream once per program (vs once per row) and the
    # per-row suffix streams start past them.
    ns_pages = cascade_ref[0] if cascade else jnp.int32(0)
    ns_tokens = ns_pages * page_size

    def row_params(j, dp=0):
        # clamped so the dp=1 lookahead never reads past the scalar ref
        r0 = jnp.minimum((prog + dp) * sb, num_progs * sb - sb)
        s = row_seq_ref[r0 + j]
        valid = s >= 0
        sc = jnp.maximum(s, 0)
        kv_len = jnp.where(valid, seq_lens_ref[sc], 0)
        # this row's absolute position (its own causal bound)
        row_t = r0 + j
        pos = kv_len - (cu_q_lens_ref[sc + 1] - row_t)
        kv_needed = jnp.where(valid, jnp.minimum(kv_len, pos + 1), 0)
        if cascade:
            kv_needed = jnp.maximum(kv_needed - ns_tokens, 0)
        return sc, kv_len, pos, kv_needed

    def chunk_dma(slot, ci, dp=0):
        copies = []
        for j in range(sb):
            sc, kv_len, _, kv_needed = row_params(j, dp)
            for p in range(chunk_pages):
                page_pos = ns_pages + ci * chunk_pages + p
                max_page = pl.cdiv(kv_len, page_size) - 1
                safe_pos = jnp.clip(page_pos, 0, jnp.maximum(max_page, 0))
                page_id = block_tables_ref[sc, safe_pos]
                copies.append(
                    pltpu.make_async_copy(
                        kv_hbm.at[layer_ref[0], page_id],
                        kv_buf.at[slot, j, :,
                                  pl.ds(p * page_size, page_size)],
                        kv_sems.at[slot, j, p]))
        return copies

    def shared_dma(slot, ci):
        copies = []
        for p in range(chunk_pages):
            page_pos = ci * chunk_pages + p
            safe_pos = jnp.clip(page_pos, 0, jnp.maximum(ns_pages - 1, 0))
            page_id = cascade_ref[1 + safe_pos]
            copies.append(
                pltpu.make_async_copy(
                    kv_hbm.at[layer_ref[0], page_id],
                    sh_buf.at[slot, :, pl.ds(p * page_size, page_size)],
                    sh_sems.at[slot, p]))
        return copies

    num_chunks = jnp.int32(0)
    for j in range(sb):
        _, _, _, kv_needed = row_params(j)
        num_chunks = jnp.maximum(num_chunks, pl.cdiv(kv_needed, C))
    num_sh_chunks = pl.cdiv(ns_tokens, C) if cascade else jnp.int32(0)

    if cascade:
        @pl.when(num_sh_chunks > 0)
        def _():
            for cpy in shared_dma(0, 0):
                cpy.start()

    # slot parity handoff: program 0 bootstraps its own first chunk;
    # later programs find it already in flight (issued by prog-1).
    @pl.when(prog == 0)
    def _():
        slot_smem[0] = 0

        @pl.when(num_chunks > 0)
        def _():
            for cpy in chunk_dma(0, 0):
                cpy.start()

    slot0 = slot_smem[0]
    # next program's first chunk 0 target slot continues the alternation
    slot_smem[0] = jax.lax.rem(slot0 + num_chunks, 2)
    # padding rows form a suffix: the next program has work iff its
    # first row is valid (and it then has >= 1 chunk unless cascade ate
    # the whole context — handled by the num_chunks==0 fallback below)
    nxt_has_work = jnp.logical_and(
        prog + 1 < num_progs,
        row_seq_ref[jnp.minimum((prog + 1) * sb,
                                num_progs * sb - 1)] >= 0)
    nxt_num_chunks = jnp.int32(0)
    for j in range(sb):
        _, _, _, kv_needed = row_params(j, dp=1)
        nxt_num_chunks = jnp.maximum(nxt_num_chunks,
                                     pl.cdiv(kv_needed, C))
    nxt_has_work = jnp.logical_and(nxt_has_work, nxt_num_chunks > 0)

    def eff_scale(h):
        # per-head dequant fold: K scale into the f32 score scale
        return scale * k_scale_ref[h] if kv_quant else scale

    # Block-diagonal batching: per KV head, contract a GROUP of MG rows'
    # queries against the concatenation of those rows' KV chunks in one
    # MXU pass ([MG*G, d] x [d, MG*C]) and mask the off-diagonal
    # row/chunk pairs. MGx redundant FLOPs; MG trades that waste against
    # per-dot fixed MXU latency (measured r2: per-row dots of M=G=4 made
    # the kernel compute-bound at ~1ms/layer; measured r3: MG=SB=16 made
    # redundant FLOPs dominate at ~0.5ms/layer — the sweet spot sits
    # between, sweep with tools/bench_decode_kernel.py).
    G = group
    ngrp = sb // mg
    assert sb % mg == 0, (sb, mg)

    # per-row coordinate columns, broadcast over the G query heads
    kv_len_rows, pos_rows = [], []
    for j in range(sb):
        _, kv_len_j, pos_j, _ = row_params(j)
        kv_len_rows.append(jnp.full((G, 1), kv_len_j, jnp.int32))
        pos_rows.append(jnp.full((G, 1), pos_j, jnp.int32))
    kv_len_row = jnp.concatenate(kv_len_rows)  # [SB*G, 1]
    pos_row = jnp.concatenate(pos_rows)  # [SB*G, 1]
    # group-local coordinates ([MG*G, 1] rows x [1, MG*C] cols)
    row_blk = jax.lax.broadcasted_iota(jnp.int32, (mg * G, 1), 0) // G
    col_blk = jax.lax.broadcasted_iota(jnp.int32, (1, mg * C), 1) // C
    col_off = jax.lax.broadcasted_iota(jnp.int32, (1, mg * C), 1) % C
    diag = row_blk == col_blk
    kv_len_grp = [
        kv_len_row[ig * mg * G:(ig + 1) * mg * G] for ig in range(ngrp)
    ]
    pos_grp = [
        pos_row[ig * mg * G:(ig + 1) * mg * G] for ig in range(ngrp)
    ]

    def body(ci, carry):
        m_all, l_all, acc_all = carry  # [nk, SB*G, 1] / [nk, SB*G, d]
        slot = jax.lax.rem(slot0 + ci, 2)
        nxt_slot = jax.lax.rem(slot0 + ci + 1, 2)

        @pl.when(ci + 1 < num_chunks)
        def _():
            for cpy in chunk_dma(nxt_slot, ci + 1):
                cpy.start()

        @pl.when(jnp.logical_and(ci + 1 == num_chunks, nxt_has_work))
        def _():
            # last chunk: prefetch the NEXT program's first chunk so its
            # DMA overlaps this program's compute (nxt_slot equals the
            # next program's slot0 by the parity handoff above)
            for cpy in chunk_dma(nxt_slot, 0, dp=1):
                cpy.start()

        if cheap_wait:
            # a DMA wait only consumes the semaphore by the dst ref's
            # byte count — build the wait descriptors with STATIC
            # indices so the scalar core skips redoing the block-table
            # loads + clamp math it already did at issue time (the
            # issue path is the serial bottleneck; measured r3)
            for j in range(sb):
                for p in range(chunk_pages):
                    pltpu.make_async_copy(
                        kv_hbm.at[0, 0],
                        kv_buf.at[slot, j, :, pl.ds(0, page_size)],
                        kv_sems.at[slot, j, p]).wait()
        else:
            for cpy in chunk_dma(slot, ci):
                cpy.wait()

        col_base = ns_tokens + ci * C + col_off  # [1, MG*C]
        oks = []
        for ig in range(ngrp):
            ok = (diag & (col_base < kv_len_grp[ig])
                  & (col_base <= pos_grp[ig]))
            if sliding_window is not None:
                ok &= col_base > pos_grp[ig] - sliding_window
            oks.append(ok)

        kv_all = kv_buf[slot]  # [SB, 2nk, C, d]
        qt = q_ref[...]  # [SB, nq, d]
        new_m, new_l, new_acc = [], [], []
        for h in range(num_kv_heads):
            gm, gl, gacc = [], [], []
            for ig in range(ngrp):
                kv_g = kv_all[ig * mg:(ig + 1) * mg]  # [MG, 2nk, C, d]
                # head-major pages: per-head rows are CONTIGUOUS in VMEM
                # (the token-major layout made this a 2nk-stride sublane
                # gather — measured 2x the whole kernel time, r4)
                k_big = kv_g[:, h].reshape(mg * C, head_dim)
                v_big = kv_g[:, num_kv_heads + h].reshape(
                    mg * C, head_dim)
                if kv_quant:
                    # dequant fold: int8/fp8 values convert to bf16 RAW
                    # (one VPU pass); k_scale folds into the score scale
                    # and v_scale applies once on the epilogue
                    k_big = k_big.astype(qt.dtype)
                    v_big = v_big.astype(qt.dtype)
                q_h = qt[ig * mg:(ig + 1) * mg,
                         h * G:(h + 1) * G, :].reshape(mg * G, head_dim)
                scores = jax.lax.dot_general(
                    q_h, k_big, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * eff_scale(h)
                if alibi is not None:
                    slope = _alibi_col(alibi, h, G, mg * G)
                    scores = scores + slope * (
                        col_base - pos_grp[ig]).astype(jnp.float32)
                if soft_cap is not None:
                    scores = soft_cap * jnp.tanh(scores / soft_cap)
                scores = jnp.where(oks[ig], scores, NEG_INF)

                sl = slice(ig * mg * G, (ig + 1) * mg * G)
                m_prev = m_all[h, sl]
                l_prev = l_all[h, sl]
                acc_prev = acc_all[h, sl]
                m_cur = jnp.max(scores, axis=-1, keepdims=True)
                m_new = jnp.maximum(m_prev, m_cur)
                p = jnp.exp(scores - m_new)
                l_cur = jnp.sum(p, axis=-1, keepdims=True)
                alpha = jnp.exp(m_prev - m_new)
                pv = jax.lax.dot_general(
                    p.astype(v_big.dtype), v_big,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                gm.append(m_new)
                gl.append(l_prev * alpha + l_cur)
                gacc.append(acc_prev * alpha + pv)
            new_m.append(jnp.concatenate(gm) if ngrp > 1 else gm[0])
            new_l.append(jnp.concatenate(gl) if ngrp > 1 else gl[0])
            new_acc.append(
                jnp.concatenate(gacc) if ngrp > 1 else gacc[0])
        return (jnp.stack(new_m), jnp.stack(new_l), jnp.stack(new_acc))

    init = (
        jnp.full((num_kv_heads, sb * G, 1), NEG_INF, jnp.float32),
        jnp.zeros((num_kv_heads, sb * G, 1), jnp.float32),
        jnp.zeros((num_kv_heads, sb * G, head_dim), jnp.float32),
    )

    if cascade:
        # shared-prefix pass first: every valid row attends these keys,
        # so the score dot needs no block-diagonal structure — a single
        # FULL [SB*G, C] pass per head, streamed once per program
        # (reference analog: the flash_attn cascade path's common-prefix
        # phase + merge_attn_states — merged here by threading the
        # online-softmax accumulators straight into the suffix loop).
        def sh_body(ci, carry):
            m_all, l_all, acc_all = carry
            slot = ci % 2

            @pl.when(ci + 1 < num_sh_chunks)
            def _():
                for cpy in shared_dma((ci + 1) % 2, ci + 1):
                    cpy.start()

            if cheap_wait:
                for p in range(chunk_pages):
                    pltpu.make_async_copy(
                        kv_hbm.at[0, 0],
                        sh_buf.at[slot, :, pl.ds(0, page_size)],
                        sh_sems.at[slot, p]).wait()
            else:
                for cpy in shared_dma(slot, ci):
                    cpy.wait()

            col = ci * C + jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
            ok = (col < ns_tokens) & (col <= pos_row)
            if sliding_window is not None:
                ok &= col > pos_row - sliding_window

            kv_sh = sh_buf[slot]  # [2nk, C, d]
            qt = q_ref[...]
            new_m, new_l, new_acc = [], [], []
            for h in range(num_kv_heads):
                k = kv_sh[h]
                v = kv_sh[num_kv_heads + h]
                if kv_quant:
                    k = k.astype(qt.dtype)
                    v = v.astype(qt.dtype)
                q_h = qt[:, h * G:(h + 1) * G, :].reshape(
                    sb * G, head_dim)
                scores = jax.lax.dot_general(
                    q_h, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * eff_scale(h)
                if alibi is not None:
                    slope = _alibi_col(alibi, h, G, sb * G)
                    scores = scores + slope * (
                        col - pos_row).astype(jnp.float32)
                if soft_cap is not None:
                    scores = soft_cap * jnp.tanh(scores / soft_cap)
                scores = jnp.where(ok, scores, NEG_INF)

                m_prev, l_prev, acc_prev = m_all[h], l_all[h], acc_all[h]
                m_cur = jnp.max(scores, axis=-1, keepdims=True)
                m_new = jnp.maximum(m_prev, m_cur)
                p = jnp.exp(scores - m_new)
                l_cur = jnp.sum(p, axis=-1, keepdims=True)
                alpha = jnp.exp(m_prev - m_new)
                pv = jax.lax.dot_general(
                    p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                new_m.append(m_new)
                new_l.append(l_prev * alpha + l_cur)
                new_acc.append(acc_prev * alpha + pv)
            return (jnp.stack(new_m), jnp.stack(new_l),
                    jnp.stack(new_acc))

        init = jax.lax.fori_loop(0, num_sh_chunks, sh_body, init)

    m_all, l_all, acc_all = jax.lax.fori_loop(0, num_chunks, body, init)

    @pl.when(jnp.logical_and(num_chunks == 0, nxt_has_work))
    def _():
        # this program ran no suffix chunks (all-padding rows, or the
        # cascade prefix covered the whole context): still hand the
        # next program its first chunk (target slot = our slot0 since
        # the parity advanced by 0)
        for cpy in chunk_dma(slot0, 0, dp=1):
            cpy.start()

    out = acc_all / jnp.maximum(l_all, 1e-20)  # [nk, SB*G, d]
    if kv_quant:
        # per-head V dequant fold (see body); scalar x static slice
        out = jnp.stack([out[h] * v_scale_ref[h]
                         for h in range(num_kv_heads)])
    out = out.reshape(num_kv_heads, sb, G, head_dim)
    out = out.transpose(1, 0, 2, 3).reshape(sb, nq, head_dim)
    out_ref[...] = out.astype(out_ref.dtype)




def _decode_kernel_loop(
    # scalar prefetch
    row_seq_ref,  # i32[Tpad]
    cu_q_lens_ref,  # i32[R+1]
    seq_lens_ref,  # i32[R]
    block_tables_ref,  # i32[R, MAXP]
    layer_ref,  # i32[1]
    k_scale_ref,  # f32[nk]
    v_scale_ref,  # f32[nk]
    # tensors (all HBM / ANY)
    q_hbm,  # [Tpad, nq, d]
    kv_hbm,  # [L, N, 2nk, ps, d]
    out_hbm,  # [Tpad, nq, d]
    # scratch
    q_buf,  # VMEM [Tpad, nq, d]
    out_buf,  # VMEM [Tpad, nq, d]
    kv_buf,  # VMEM [2, SB, 2nk, C, d]
    q_sem,
    out_sem,
    kv_sems,  # DMA [2, SB, chunk_pages]
    *,
    sb: int,
    mg: int,
    num_groups: int,
    chunk_pages: int,
    page_size: int,
    num_kv_heads: int,
    group: int,
    head_dim: int,
    scale: float,
    sliding_window,
    soft_cap,
    kv_quant: bool,
    alibi=None,
    cheap_wait: bool = True,
):
    """Single-program decode kernel (r5): ONE Pallas program fori-loops
    over row groups of SB token rows, double-buffering each group's
    batched page DMAs against the previous group's compute.  The grid
    version paid ~13.4 us of fixed dispatch + pipeline-handoff cost per
    SB-row program (bs=256/SB=16 -> 16 programs -> ~215 us/layer of pure
    overhead at a ~250 us/layer DMA roofline); here that cost is paid
    once, and the (group, chunk) DMA schedule streams back-to-back at
    the measured ~500 GB/s page-copy rate (tools/bench_dma_bw.py)."""
    C = chunk_pages * page_size
    G = group
    nq = num_kv_heads * group
    ngrp = sb // mg

    pltpu.make_async_copy(q_hbm, q_buf, q_sem).start()

    def row_params(g, j):
        r0 = g * sb
        s = row_seq_ref[r0 + j]
        valid = s >= 0
        sc = jnp.maximum(s, 0)
        kv_len = jnp.where(valid, seq_lens_ref[sc], 0)
        pos = kv_len - (cu_q_lens_ref[sc + 1] - (r0 + j))
        kv_needed = jnp.where(valid, jnp.minimum(kv_len, pos + 1), 0)
        return sc, kv_len, pos, kv_needed

    def group_chunks(g):
        nc = jnp.int32(0)
        for j in range(sb):
            _, _, _, kv_needed = row_params(g, j)
            nc = jnp.maximum(nc, pl.cdiv(kv_needed, C))
        return nc

    def chunk_dma(g, slot, ci):
        copies = []
        for j in range(sb):
            sc, kv_len, _, _ = row_params(g, j)
            for p in range(chunk_pages):
                page_pos = ci * chunk_pages + p
                max_page = pl.cdiv(kv_len, page_size) - 1
                safe_pos = jnp.clip(page_pos, 0, jnp.maximum(max_page, 0))
                page_id = block_tables_ref[sc, safe_pos]
                copies.append(
                    pltpu.make_async_copy(
                        kv_hbm.at[layer_ref[0], page_id],
                        kv_buf.at[slot, j, :,
                                  pl.ds(p * page_size, page_size)],
                        kv_sems.at[slot, j, p]))
        return copies

    # bootstrap: first group with work issues its chunk 0 at parity 0
    nc0 = group_chunks(0)

    @pl.when(nc0 > 0)
    def _():
        for cpy in chunk_dma(0, 0, 0):
            cpy.start()

    pltpu.make_async_copy(q_hbm, q_buf, q_sem).wait()

    # per-group compute identical to the grid kernel's body
    row_blk = jax.lax.broadcasted_iota(jnp.int32, (mg * G, 1), 0) // G
    col_blk = jax.lax.broadcasted_iota(jnp.int32, (1, mg * C), 1) // C
    col_off = jax.lax.broadcasted_iota(jnp.int32, (1, mg * C), 1) % C
    diag = row_blk == col_blk

    def eff_scale(h):
        return scale * k_scale_ref[h] if kv_quant else scale

    def group_body(g, slot0):
        num_chunks = group_chunks(g)
        g_nxt = jnp.minimum(g + 1, num_groups - 1)
        nxt_has_work = jnp.logical_and(
            g + 1 < num_groups, group_chunks(g_nxt) > 0)
        next_slot = jax.lax.rem(slot0 + num_chunks, 2)

        kv_len_rows, pos_rows = [], []
        for j in range(sb):
            _, kv_len_j, pos_j, _ = row_params(g, j)
            kv_len_rows.append(jnp.full((G, 1), kv_len_j, jnp.int32))
            pos_rows.append(jnp.full((G, 1), pos_j, jnp.int32))
        kv_len_row = jnp.concatenate(kv_len_rows)
        pos_row = jnp.concatenate(pos_rows)
        kv_len_grp = [
            kv_len_row[ig * mg * G:(ig + 1) * mg * G] for ig in range(ngrp)
        ]
        pos_grp = [
            pos_row[ig * mg * G:(ig + 1) * mg * G] for ig in range(ngrp)
        ]
        qt = q_buf[pl.ds(g * sb, sb)]  # [SB, nq, d]

        def chunk_body(ci, carry):
            m_all, l_all, acc_all = carry
            slot = jax.lax.rem(slot0 + ci, 2)

            @pl.when(ci + 1 < num_chunks)
            def _():
                for cpy in chunk_dma(g, jax.lax.rem(slot0 + ci + 1, 2),
                                     ci + 1):
                    cpy.start()

            @pl.when(jnp.logical_and(ci + 1 == num_chunks, nxt_has_work))
            def _():
                for cpy in chunk_dma(g_nxt, next_slot, 0):
                    cpy.start()

            if cheap_wait:
                for j in range(sb):
                    for p in range(chunk_pages):
                        pltpu.make_async_copy(
                            kv_hbm.at[0, 0],
                            kv_buf.at[slot, j, :, pl.ds(0, page_size)],
                            kv_sems.at[slot, j, p]).wait()
            else:
                for cpy in chunk_dma(g, slot, ci):
                    cpy.wait()

            col_base = ci * C + col_off
            oks = []
            for ig in range(ngrp):
                ok = (diag & (col_base < kv_len_grp[ig])
                      & (col_base <= pos_grp[ig]))
                if sliding_window is not None:
                    ok &= col_base > pos_grp[ig] - sliding_window
                oks.append(ok)

            kv_all = kv_buf[slot]  # [SB, 2nk, C, d]
            new_m, new_l, new_acc = [], [], []
            for h in range(num_kv_heads):
                gm, gl, gacc = [], [], []
                for ig in range(ngrp):
                    kv_g = kv_all[ig * mg:(ig + 1) * mg]
                    k_big = kv_g[:, h].reshape(mg * C, head_dim)
                    v_big = kv_g[:, num_kv_heads + h].reshape(
                        mg * C, head_dim)
                    k_big = k_big.astype(qt.dtype)
                    v_big = v_big.astype(qt.dtype)
                    q_h = qt[ig * mg:(ig + 1) * mg,
                             h * G:(h + 1) * G, :].reshape(
                                 mg * G, head_dim)
                    scores = jax.lax.dot_general(
                        q_h, k_big, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32) * eff_scale(h)
                    if alibi is not None:
                        slope = _alibi_col(alibi, h, G, mg * G)
                        scores = scores + slope * (
                            col_base - pos_grp[ig]).astype(jnp.float32)
                    if soft_cap is not None:
                        scores = soft_cap * jnp.tanh(scores / soft_cap)
                    scores = jnp.where(oks[ig], scores, NEG_INF)

                    sl = slice(ig * mg * G, (ig + 1) * mg * G)
                    m_prev = m_all[h, sl]
                    l_prev = l_all[h, sl]
                    acc_prev = acc_all[h, sl]
                    m_cur = jnp.max(scores, axis=-1, keepdims=True)
                    m_new = jnp.maximum(m_prev, m_cur)
                    p2 = jnp.exp(scores - m_new)
                    l_cur = jnp.sum(p2, axis=-1, keepdims=True)
                    alpha = jnp.exp(m_prev - m_new)
                    pv = jax.lax.dot_general(
                        p2.astype(v_big.dtype), v_big,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    gm.append(m_new)
                    gl.append(l_prev * alpha + l_cur)
                    gacc.append(acc_prev * alpha + pv)
                new_m.append(jnp.concatenate(gm) if ngrp > 1 else gm[0])
                new_l.append(jnp.concatenate(gl) if ngrp > 1 else gl[0])
                new_acc.append(
                    jnp.concatenate(gacc) if ngrp > 1 else gacc[0])
            return (jnp.stack(new_m), jnp.stack(new_l),
                    jnp.stack(new_acc))

        init = (
            jnp.full((num_kv_heads, sb * G, 1), NEG_INF, jnp.float32),
            jnp.zeros((num_kv_heads, sb * G, 1), jnp.float32),
            jnp.zeros((num_kv_heads, sb * G, head_dim), jnp.float32),
        )
        m_all, l_all, acc_all = jax.lax.fori_loop(0, num_chunks,
                                                  chunk_body, init)

        @pl.when(jnp.logical_and(num_chunks == 0, nxt_has_work))
        def _():
            # all-padding group: still hand the next group its first
            # chunk (parity unchanged since we consumed no chunks)
            for cpy in chunk_dma(g_nxt, slot0, 0):
                cpy.start()

        out = acc_all / jnp.maximum(l_all, 1e-20)  # [nk, SB*G, d]
        if kv_quant:
            out = jnp.stack([out[h] * v_scale_ref[h]
                             for h in range(num_kv_heads)])
        out = out.reshape(num_kv_heads, sb, G, head_dim)
        out = out.transpose(1, 0, 2, 3).reshape(sb, nq, head_dim)
        out_buf[pl.ds(g * sb, sb)] = out.astype(out_buf.dtype)
        return next_slot

    jax.lax.fori_loop(0, num_groups, group_body, jnp.int32(0))
    pltpu.make_async_copy(out_buf, out_hbm, out_sem).start()
    pltpu.make_async_copy(out_buf, out_hbm, out_sem).wait()


@functools.partial(
    jax.jit,
    static_argnames=("scale", "sliding_window", "logits_soft_cap",
                     "chunk_pages", "alibi", "sb", "mg", "cheap_wait"))
def _decode_attention_impl(
    q: jnp.ndarray,
    kv_cache: jnp.ndarray,
    layer: jnp.ndarray,
    query_start_loc: jnp.ndarray,
    seq_lens: jnp.ndarray,
    block_tables: jnp.ndarray,
    k_scale_vec: jnp.ndarray,  # f32[nk] (ones when unquantized)
    v_scale_vec: jnp.ndarray,  # f32[nk]
    scale: float,
    sliding_window: Optional[int],
    logits_soft_cap: Optional[float],
    chunk_pages: int,
    cascade_meta: Optional[jnp.ndarray] = None,  # i32[MAXP+1]
    alibi: Optional[tuple] = None,
    sb: int = 16,
    mg: int = 4,
    cheap_wait: bool = True,
) -> jnp.ndarray:
    T, nq, d = q.shape
    _, N, two_nk, ps, _ = kv_cache.shape
    nk = two_nk // 2
    group = nq // nk
    R = seq_lens.shape[0]
    SB = sb
    # rows per MXU pass: the block-diagonal dot computes MG x redundant
    # FLOPs, so smaller MG cuts MXU waste at the cost of more (fixed-
    # latency) dots; MG=SB reproduces the r2 single-pass behavior
    MG = min(mg, SB)
    num_progs = pl.cdiv(T, SB)

    # row -> seq map (padding rows -> -1)
    token_ids = jnp.arange(num_progs * SB, dtype=jnp.int32)
    row_seq = jnp.searchsorted(query_start_loc[1:], token_ids,
                               side="right").astype(jnp.int32)
    total = query_start_loc[-1]
    row_seq = jnp.where((token_ids < total) & (row_seq < R), row_seq, -1)

    q_pad = jnp.pad(q, ((0, num_progs * SB - T), (0, 0), (0, 0)))
    C = chunk_pages * ps
    if cascade_meta is None and envs.VLLM_TPU_DECODE_LOOP:
        # single-program loop variant (r5): one program, fori over row
        # groups — kills the fixed per-program dispatch/handoff cost
        kernel = functools.partial(
            _decode_kernel_loop,
            sb=SB,
            mg=MG,
            num_groups=num_progs,
            chunk_pages=chunk_pages,
            page_size=ps,
            num_kv_heads=nk,
            group=group,
            head_dim=d,
            scale=scale,
            sliding_window=sliding_window,
            soft_cap=logits_soft_cap,
            kv_quant=kv_cache.dtype != q.dtype,
            alibi=alibi,
            cheap_wait=cheap_wait,
        )
        Tpad = num_progs * SB
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=7,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # q
                pl.BlockSpec(memory_space=pl.ANY),  # kv
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((Tpad, nq, d), q.dtype),
                pltpu.VMEM((Tpad, nq, d), q.dtype),
                pltpu.VMEM((2, SB, two_nk, C, d), kv_cache.dtype),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA((2, SB, chunk_pages)),
            ],
        )
        out_pad = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((Tpad, nq, d), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=_INTERPRET,
        )(row_seq, query_start_loc, seq_lens, block_tables, layer,
          k_scale_vec, v_scale_vec, q_pad, kv_cache)
        return out_pad[:T]
    kernel = functools.partial(
        _decode_kernel,
        sb=SB,
        mg=MG,
        chunk_pages=chunk_pages,
        page_size=ps,
        num_kv_heads=nk,
        group=group,
        head_dim=d,
        scale=scale,
        sliding_window=sliding_window,
        soft_cap=logits_soft_cap,
        kv_quant=kv_cache.dtype != q.dtype,
        cascade=cascade_meta is not None,
        alibi=alibi,
        cheap_wait=cheap_wait,
    )
    if cascade_meta is None:
        cascade_arr = jnp.zeros(1, jnp.int32)
        sh_shape = (2, 2, 1, 128)  # untouched placeholder scratch
    else:
        cascade_arr = cascade_meta
        sh_shape = (2, two_nk, C, d)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(num_progs,),
        in_specs=[
            pl.BlockSpec((SB, nq, d), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # kv
        ],
        out_specs=pl.BlockSpec((SB, nq, d), lambda i, *_: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, SB, two_nk, C, d), kv_cache.dtype),
            pltpu.SemaphoreType.DMA((2, SB, chunk_pages)),
            pltpu.VMEM(sh_shape, kv_cache.dtype),
            pltpu.SemaphoreType.DMA((2, chunk_pages)),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    out_pad = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_progs * SB, nq, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(row_seq, query_start_loc, seq_lens, block_tables, layer,
      cascade_arr, k_scale_vec, v_scale_vec, q_pad, kv_cache)
    return out_pad[:T]


def ragged_paged_attention(
    q: jnp.ndarray,
    kv_cache: jnp.ndarray,
    metadata: AttentionMetadata,
    scale: float,
    sliding_window: Optional[int] = None,
    logits_soft_cap: Optional[float] = None,
    k_scale: Optional[jnp.ndarray] = None,
    v_scale: Optional[jnp.ndarray] = None,
    chunk_pages: int = 8,
    layer=None,
    alibi_slopes=None,
) -> jnp.ndarray:
    alibi = None
    if alibi_slopes is not None:
        # static per-model constants: baked into the kernel as weights
        alibi = tuple(float(x) for x in np.asarray(alibi_slopes))
    if metadata.lb_seq is None:
        raise ValueError(
            "AttentionMetadata.lb_seq/lb_q_start must be populated for the "
            "Pallas path (InputBatch.prepare_inputs builds them)")
    if kv_cache.ndim == 4:
        kv_cache = kv_cache[None]
        layer = 0
    layer_arr = jnp.asarray([layer if layer is not None else 0], jnp.int32)
    T = q.shape[0]
    R = metadata.seq_lens.shape[0]
    nk = kv_cache.shape[-3] // 2
    ps = kv_cache.shape[-2]

    def _vec(sc):
        # per-head f32[nk] dequant scale consumed in-kernel via scalar
        # prefetch (kills the former outer fp32 fold of the whole q /
        # output tensor — measured 9 ms/step of elementwise at bs=256)
        if sc is None:
            return jnp.ones((nk,), jnp.float32)
        sc = jnp.asarray(sc, jnp.float32)
        if sc.ndim == 0:
            return jnp.full((nk,), sc)
        return sc.reshape(nk)

    k_vec, v_vec = _vec(k_scale), _vec(v_scale)
    # Keep KV chunks near 256 tokens regardless of page size: short
    # sequences then stream no clamped duplicate page copies, and the
    # double-buffered chunk loop still pipelines long contexts.
    dec_chunk = max(1, min(chunk_pages, 256 // ps))
    if q_block_size(T, R) == 16:
        # decode-shaped bucket: the batched-row kernel amortizes the
        # ~3us fixed per-program cost over SB rows; cascade_meta (when
        # the scheduler found a batch-wide shared prefix) streams the
        # shared blocks once per program instead of once per row.
        return _decode_attention_impl(
            q, kv_cache, layer_arr, metadata.query_start_loc,
            metadata.seq_lens, metadata.block_tables, k_vec, v_vec,
            scale, sliding_window, logits_soft_cap, dec_chunk,
            cascade_meta=getattr(metadata, "cascade_meta", None),
            alibi=alibi, mg=envs.VLLM_TPU_DECODE_MG,
            sb=envs.VLLM_TPU_DECODE_SB,
            cheap_wait=bool(envs.VLLM_TPU_DECODE_CHEAP_WAIT))
    # Prefill-shaped bucket. The ragged kernel covers the true prefill
    # tiles; q_len==1 rows (decode riding a mixed chunked-prefill step)
    # go through the batched-row decode kernel instead — a single decode
    # row inside a BQ=128 tile computes at 1/BQ utilization and was
    # measured at ~10 ms/layer for a 4096-token bucket with 224 decode
    # rows. build_logical_blocks(skip_single=True) already left those
    # rows out of lb_seq.
    out = _ragged_paged_attention_impl(
        q, kv_cache, layer_arr, metadata.lb_seq, metadata.lb_q_start,
        metadata.query_start_loc, metadata.seq_lens, metadata.block_tables,
        k_vec, v_vec, scale, sliding_window, logits_soft_cap,
        dec_chunk, alibi=alibi)
    qsl = metadata.query_start_loc
    qlen = qsl[1:] - qsl[:-1]
    is_dec = qlen == 1
    dec_tok = jnp.where(is_dec, qsl[:-1], T)  # T = padded zero row
    qz = jnp.pad(q, ((0, 1), (0, 0), (0, 0)))
    q_dec = qz[dec_tok]  # [R, nq, d]
    dec_out = _decode_attention_impl(
        q_dec, kv_cache, layer_arr,
        jnp.arange(R + 1, dtype=jnp.int32),
        jnp.where(is_dec, metadata.seq_lens, 0),
        metadata.block_tables, k_vec, v_vec,
        scale, sliding_window, logits_soft_cap, dec_chunk,
        cascade_meta=None, alibi=alibi, mg=envs.VLLM_TPU_DECODE_MG,
        sb=envs.VLLM_TPU_DECODE_SB,
        cheap_wait=bool(envs.VLLM_TPU_DECODE_CHEAP_WAIT))
    # scatter AFTER the ragged output so BQ-tile write spill over decode
    # rows is overwritten; non-decode rows carry index T -> dropped
    return out.at[dec_tok].set(dec_out.astype(out.dtype), mode="drop")
