"""Pallas TPU MLA (multi-head latent attention) paged decode/prefill.

TPU-native answer to the reference's MLA backends
(reference: vllm/v1/attention/backends/mla/ flashmla/triton_mla;
csrc/attention/mla/ — design re-derived for the MXU, not ported).

Absorbed-MLA attention runs against a SINGLE latent "KV head" of width
D = kv_lora_rank + qk_rope_head_dim (576 for DeepSeek). Two structural
facts make a dedicated kernel worthwhile:

1. V is the first kv_lora_rank columns of K (the latent c_kv), so the
   cache stores ONE D-wide vector per token — half the bytes of the
   generic kernel's K+V layout (the reference's concat_and_cache_mla
   makes the same choice, csrc/cache_kernels.cu).
2. Every query head attends to the same latent head, so the q tile
   flattens to a single tall [BQ * num_heads, D] matmul per KV chunk —
   ideal MXU shape; no per-KV-head loop.

Same ragged logical-q-block scaffolding as ragged_paged_attention.py:
scalar-prefetched block assignments, double-buffered page DMA, online
softmax. D (576) is not a multiple of the 128 lane width; Mosaic pads
the trailing tile — the ~11% VREG waste on the score matmul is far
cheaper than the 2x cache traffic of the zero-padded-V fallback.

Cache layout: ``[L, num_blocks, page_size, D]`` (no head/KV axis).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vllm_tpu.ops.attention import AttentionMetadata
from vllm_tpu.ops.pallas.ragged_paged_attention import q_block_size

NEG_INF = -1e30
_INTERPRET = os.environ.get("VLLM_TPU_PALLAS_INTERPRET", "0") == "1"


def _kernel(
    # scalar prefetch
    lb_seq_ref,
    lb_q_start_ref,
    cu_q_lens_ref,
    seq_lens_ref,
    block_tables_ref,
    layer_ref,
    # tensors (HBM)
    q_hbm,  # [T + BQ, nq, D]
    kv_hbm,  # [L, N, ps, D]
    out_hbm,  # [T + BQ, nq, dv]
    # scratch
    q_buf,  # VMEM [BQ, nq, D]
    kv_buf,  # VMEM [2, C, D]
    out_buf,  # VMEM [BQ, nq, dv]
    q_sem,
    out_sem,
    kv_sems,
    *,
    bq: int,
    chunk_pages: int,
    page_size: int,
    num_heads: int,
    latent_dim: int,
    v_dim: int,
    scale: float,
    kv_quant: bool,
    kv_scale: float,
):
    lb = pl.program_id(0)
    s = lb_seq_ref[lb]

    @pl.when(s >= 0)
    def _run():
        q_start = lb_q_start_ref[lb]
        q_end_seq = cu_q_lens_ref[s + 1]
        kv_len = seq_lens_ref[s]
        C = chunk_pages * page_size

        q_dma = pltpu.make_async_copy(
            q_hbm.at[pl.ds(q_start, bq)], q_buf, q_sem)
        q_dma.start()

        last_row_t = jnp.minimum(q_start + bq, q_end_seq) - 1
        kv_needed = jnp.minimum(kv_len,
                                kv_len - (q_end_seq - last_row_t) + 1)
        kv_needed = jnp.maximum(kv_needed, 0)
        num_chunks = pl.cdiv(kv_needed, C)

        def chunk_dma(slot, ci):
            copies = []
            for p in range(chunk_pages):
                page_pos = ci * chunk_pages + p
                max_page = pl.cdiv(kv_len, page_size) - 1
                safe_pos = jnp.clip(page_pos, 0, jnp.maximum(max_page, 0))
                page_id = block_tables_ref[s, safe_pos]
                copies.append(
                    pltpu.make_async_copy(
                        kv_hbm.at[layer_ref[0], page_id],
                        kv_buf.at[slot, pl.ds(p * page_size, page_size)],
                        kv_sems.at[slot, p]))
            return copies

        @pl.when(num_chunks > 0)
        def _():
            for c in chunk_dma(0, 0):
                c.start()

        q_dma.wait()
        # one latent head: the whole q tile is a single tall operand
        qf = q_buf[...].reshape(bq * num_heads, latent_dim)

        row_t = q_start + jax.lax.broadcasted_iota(
            jnp.int32, (bq * num_heads, 1), 0) // num_heads
        row_pos = kv_len - (q_end_seq - row_t)
        row_valid = row_t < q_end_seq

        def body(ci, carry):
            m_prev, l_prev, acc_prev = carry
            slot = ci % 2

            @pl.when(ci + 1 < num_chunks)
            def _():
                for cpy in chunk_dma((ci + 1) % 2, ci + 1):
                    cpy.start()

            for cpy in chunk_dma(slot, ci):
                cpy.wait()

            col = ci * C + jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
            col_ok = (col < kv_len) & (col <= row_pos)

            k = kv_buf[slot]  # [C, D]
            if kv_quant:
                k = (k.astype(jnp.float32) * kv_scale).astype(qf.dtype)
            scores = jax.lax.dot_general(
                qf, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            scores = jnp.where(col_ok & row_valid, scores, NEG_INF)

            m_cur = jnp.max(scores, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.exp(scores - m_new)
            l_cur = jnp.sum(p, axis=-1, keepdims=True)
            alpha = jnp.exp(m_prev - m_new)
            l_new = l_prev * alpha + l_cur
            # V = the latent prefix of K
            pv = jax.lax.dot_general(
                p.astype(k.dtype), k[:, :v_dim],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_new = acc_prev * alpha + pv
            return (m_new, l_new, acc_new)

        init = (
            jnp.full((bq * num_heads, 1), NEG_INF, jnp.float32),
            jnp.zeros((bq * num_heads, 1), jnp.float32),
            jnp.zeros((bq * num_heads, v_dim), jnp.float32),
        )
        m_all, l_all, acc = jax.lax.fori_loop(0, num_chunks, body, init)

        out = acc / jnp.maximum(l_all, 1e-20)
        out_buf[...] = out.reshape(bq, num_heads, v_dim).astype(
            out_buf.dtype)

        out_dma = pltpu.make_async_copy(
            out_buf, out_hbm.at[pl.ds(q_start, bq)], out_sem)
        out_dma.start()
        out_dma.wait()


@functools.partial(
    jax.jit, static_argnames=("kv_scale", "scale", "chunk_pages", "v_dim"))
def _mla_attention_impl(
    q: jnp.ndarray,  # [T, nq, D]
    kv_cache: jnp.ndarray,  # [L, N, ps, D]
    layer: jnp.ndarray,
    lb_seq: jnp.ndarray,
    lb_q_start: jnp.ndarray,
    query_start_loc: jnp.ndarray,
    seq_lens: jnp.ndarray,
    block_tables: jnp.ndarray,
    kv_scale: Optional[float],
    scale: float,
    chunk_pages: int,
    v_dim: int,
) -> jnp.ndarray:
    T, nq, D = q.shape
    _, N, ps, _ = kv_cache.shape
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
        num_heads=nq,
        latent_dim=D,
        v_dim=v_dim,
        scale=scale,
        kv_quant=kv_quant,
        kv_scale=kv_scale if kv_scale is not None else 1.0,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(maxlb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((bq, nq, D), q.dtype),
            pltpu.VMEM((2, C, D), kv_cache.dtype),
            pltpu.VMEM((bq, nq, v_dim), q.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2, chunk_pages)),
        ],
    )
    out_pad = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T + bq, nq, v_dim), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(lb_seq, lb_q_start, query_start_loc, seq_lens, block_tables, layer,
      q_pad, kv_cache)
    return out_pad[:T]


def mla_ref(q, kv_cache, metadata: AttentionMetadata, scale: float,
            v_dim: int, layer=0, kv_scale=None) -> jnp.ndarray:
    """jnp reference (CPU path + kernel oracle): paged gather then causal
    softmax against the latent cache; V = K[:, :v_dim]."""
    T, nq, D = q.shape
    _, N, ps, _ = kv_cache.shape
    R = metadata.seq_lens.shape[0]
    cache = kv_cache[layer].reshape(N * ps, D)
    if cache.dtype != q.dtype:
        cache = cache.astype(jnp.float32)
        if kv_scale is not None:
            cache = cache * kv_scale
        cache = cache.astype(q.dtype)

    max_pages = metadata.block_tables.shape[1]
    ctx = max_pages * ps
    qsl = metadata.query_start_loc

    token_ids = jnp.arange(T, dtype=jnp.int32)
    seq_of_token = jnp.searchsorted(qsl[1:], token_ids, side="right")
    seq_of_token = jnp.minimum(seq_of_token, R - 1)
    row_pos = (metadata.seq_lens[seq_of_token] -
               (qsl[seq_of_token + 1] - token_ids))

    # gather each sequence's context rows [R, ctx, D]
    page_rows = (metadata.block_tables[:, :, None] * ps +
                 jnp.arange(ps)[None, None, :]).reshape(R, ctx)
    k_all = cache[page_rows]  # [R, ctx, D]

    kt = k_all[seq_of_token]  # [T, ctx, D]
    scores = jnp.einsum("thd,tcd->thc", q.astype(jnp.float32),
                        kt.astype(jnp.float32)) * scale
    col = jnp.arange(ctx, dtype=jnp.int32)[None, None, :]
    ok = col <= row_pos[:, None, None]
    ok &= col < metadata.seq_lens[seq_of_token][:, None, None]
    scores = jnp.where(ok, scores, NEG_INF)
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("thc,tcd->thd", p, kt[..., :v_dim].astype(jnp.float32))
    return out.astype(q.dtype)


def mla_paged_attention(
    q: jnp.ndarray,
    kv_cache: jnp.ndarray,  # [L, N, ps, D] single-copy latent cache
    metadata: AttentionMetadata,
    scale: float,
    v_dim: int,
    layer=None,
    kv_scale: Optional[float] = None,
    chunk_pages: int = 8,
) -> jnp.ndarray:
    """Dispatch: Pallas MLA kernel on TPU, jnp reference elsewhere."""
    li = layer if layer is not None else 0
    use_pallas = (jax.default_backend() in ("tpu", "axon")
                  and metadata.lb_seq is not None)
    if use_pallas:
        layer_arr = jnp.asarray([li], jnp.int32)
        return _mla_attention_impl(
            q, kv_cache, layer_arr, metadata.lb_seq, metadata.lb_q_start,
            metadata.query_start_loc, metadata.seq_lens,
            metadata.block_tables, kv_scale, scale, chunk_pages, v_dim)
    return mla_ref(q, kv_cache, metadata, scale, v_dim, layer=li,
                   kv_scale=kv_scale)


def write_mla_cache(kv_cache: jnp.ndarray, c: jnp.ndarray,
                    slot_mapping: jnp.ndarray, layer=None) -> jnp.ndarray:
    """Scatter latent rows into the single-copy MLA cache
    (reference: csrc/cache_kernels.cu concat_and_cache_mla).
    kv_cache [L, N, ps, D] (donated), c [T, D]."""
    L, N, ps, D = kv_cache.shape
    flat = kv_cache.reshape(L, N * ps, D)
    li = layer if layer is not None else 0
    flat = flat.at[li, slot_mapping].set(c.astype(kv_cache.dtype))
    return flat.reshape(L, N, ps, D)
