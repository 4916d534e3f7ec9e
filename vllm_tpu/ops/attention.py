"""Ragged paged attention over a block-table KV cache.

TPU-native answer to the reference's paged_attention_v1/v2 + flash varlen
CUDA kernels (reference: csrc/attention/, vllm/v1/attention/backends/
flash_attn.py, pallas.py:41-267). One op serves prefill, chunked prefill,
decode, and spec-decode verification in a single ragged batch:

  q               f32/bf16 [T, num_q_heads, head]   flat token-major
  kv_cache        [num_blocks, 2 * num_kv_heads, page_size, head]
                  (K heads first, then V heads; HEAD-MAJOR pages so the
                  Pallas kernels' per-head reads are contiguous — the
                  token-major [page, heads, head] layout made every
                  per-head extraction a 2nk-stride sublane gather on
                  (32,128)-tiled int8 VMEM, measured 2x the whole
                  decode-attention time; see PARITY.md round 4)
  query_start_loc i32 [R + 1]   cumulative query counts (padding rows
                                 repeat the last value)
  seq_lens        i32 [R]        context length per request (0 for padding)
  block_tables    i32 [R, max_blocks]
  positions       i32 [T]        absolute position of each query token

This module provides the jnp reference implementation (used on CPU and as
the numerics oracle); the production Pallas kernel lives in
ops/pallas/ragged_paged_attention.py and is dispatched via `attention()`.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from vllm_tpu import envs


@jax.tree_util.register_dataclass
@dataclass
class AttentionMetadata:
    """Per-step device metadata (built host-side by the InputBatch)."""

    slot_mapping: jnp.ndarray  # i32[T] flat slot = block_id*page + offset
    block_tables: jnp.ndarray  # i32[R, max_blocks]
    query_start_loc: jnp.ndarray  # i32[R+1]
    seq_lens: jnp.ndarray  # i32[R]
    positions: jnp.ndarray  # i32[T]
    # Logical q-block assignment for the Pallas ragged kernel (host-built
    # by ops.pallas.ragged_paged_attention.build_logical_blocks); None on
    # the jnp-reference path.
    lb_seq: Optional[jnp.ndarray] = None  # i32[MAXLB], -1 padded
    lb_q_start: Optional[jnp.ndarray] = None  # i32[MAXLB]
    # SSM models: persistent state slot per request row (see
    # models/mamba2.py); attention models ignore it
    state_slots: Optional[jnp.ndarray] = None  # i32[R]
    # MRoPE models (Qwen2-VL family): 3D positions (temporal, height,
    # width) per token; None for standard-rope models
    mrope_positions: Optional[jnp.ndarray] = None  # i32[3, T]
    # Cascade attention (shared batch-wide prefix): [0]=num shared
    # pages, [1:]=their page ids; None when no useful common prefix
    cascade_meta: Optional[jnp.ndarray] = None  # i32[MAXP+1]
    # Prefix-LM models (PaliGemma: whole prompt; Gemma3-VLM: the image
    # token span): per-request [start, end) token range that attends
    # BIDIRECTIONALLY; [0, 0) disables. Only the jnp reference path
    # honors it — the attention() dispatcher routes prefill-shaped
    # batches of such models there (decode rows are causal-equivalent).
    bidir_spans: Optional[jnp.ndarray] = None  # i32[R, 2]


@jax.tree_util.register_pytree_node_class
class KVSlabs:
    """Layer-slabbed paged KV cache.

    Logically one layer-stacked [L, N, 2K, page, D] cache; physically a
    tuple of [Lg, N, 2K, page, D] slabs. Models scan layers slab by
    slab (llama.py _run_layers), so the attention kernels only ever see
    one slab (a plain ndarray) plus a slab-local layer index.

    OFF by default (VLLM_TPU_KV_SLAB_MB=0): a round-4 sweep of the real
    decode kernel found no dependence on allocation size (the earlier
    microbench that showed a 2x "big-allocation DMA penalty" was
    confounded by a non-donated buffer copy scaling with buffer size),
    and per-slab scans cost extra compile time. Kept as an experiment
    knob and exercised by tests/test_kv_slabs.py.

    Registered as a pytree so it rides jit args/donation transparently.
    NOT a tuple on purpose: tuple-valued cache-group entries already
    mean SSM state groups in the runner step fn.
    """

    __slots__ = ("slabs",)

    def __init__(self, slabs):
        self.slabs = tuple(slabs)

    def tree_flatten(self):
        return self.slabs, None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children)

    @property
    def num_layers(self) -> int:
        return sum(s.shape[0] for s in self.slabs)

    @property
    def dtype(self):
        return self.slabs[0].dtype

    @property
    def shape(self):
        """Logical stacked shape [L, N, 2K, page, D]."""
        return (self.num_layers,) + tuple(self.slabs[0].shape[1:])

    def gather_pages(self, page_id: int):
        """Host-side: one page's rows across all layers -> np [L, ...]
        (KV-connector D2H fetch path)."""
        import numpy as np

        return np.concatenate([np.asarray(s[:, page_id]) for s in self.slabs])

    def set_pages(self, ids, data) -> "KVSlabs":
        """Host-side: scatter [L, n, ...] data into pages ``ids`` (KV-
        connector load path); returns a new KVSlabs (donated per slab)."""
        out = []
        base = 0
        for s in self.slabs:
            nl = s.shape[0]
            out.append(
                jax.jit(lambda kv, i, d: kv.at[:, i].set(d),
                        donate_argnums=(0,))(
                            s, ids, jnp.asarray(data[base:base + nl],
                                                s.dtype)))
            base += nl
        return KVSlabs(out)


def write_kv_cache(
    kv_cache: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    slot_mapping: jnp.ndarray,
    k_scale: Optional[jnp.ndarray] = None,
    v_scale: Optional[jnp.ndarray] = None,
    layer=None,
) -> jnp.ndarray:
    """Scatter new K/V rows into the paged cache
    (reference csrc analog: cache_kernels.cu reshape_and_cache).

    kv_cache: [num_blocks, 2*K, page, D] (head-major pages), or the full
    stacked [L, num_blocks, 2*K, page, D] when ``layer`` (a traced i32
    scalar) is given — the layered form scatters in place on the
    loop-carried stack so a decode step writes only the new rows, never
    a fresh KV buffer. k, v: [T, K, D]; slot_mapping: i32[T] (padding
    slots point at block 0, the null block). Optional scales quantize
    into a low-precision cache dtype.
    """
    page = kv_cache.shape[-2]
    kv = jnp.concatenate([k, v], axis=1)  # [T, 2K, D]
    if kv_cache.dtype != kv.dtype:
        if k_scale is not None:
            scale = jnp.concatenate([
                jnp.broadcast_to(k_scale, k.shape[1:2]),
                jnp.broadcast_to(v_scale, v.shape[1:2]),
            ])[None, :, None]
            kv = kv.astype(jnp.float32) / scale
        if jnp.issubdtype(kv_cache.dtype, jnp.floating):
            finfo_max = jnp.finfo(kv_cache.dtype).max
        else:
            finfo_max = jnp.iinfo(kv_cache.dtype).max
            # round-to-nearest, not astype's truncate-toward-zero: the
            # truncation bias alone costs ~half the int8 cache's SNR
            kv = jnp.round(kv.astype(jnp.float32))
        kv = jnp.clip(kv, -float(finfo_max), float(finfo_max))
        kv = kv.astype(kv_cache.dtype)
    T, two_k, d = kv.shape
    # (a Pallas DMA-scatter alternative was benched post-Mosaic-fix at
    # 45 ms/layer vs this path's sub-ms — per-token strided HBM->HBM
    # DMAs lose badly to the barrier+row-scatter below, so it was
    # deleted; tools/bench_kv_scatter.py r5)
    # The quantize chain must NOT fuse into the scatter: XLA evaluates a
    # scatter's fused producer per update row on the scalar core
    # (measured 5 GB/s, 283 us/layer at the flagship decode shape —
    # more than the whole attention kernel). The barrier materializes
    # the int8 rows first; the bare scatter then streams at full rate.
    kv = jax.lax.optimization_barrier(kv)
    block_ids = slot_mapping // page
    offsets = slot_mapping % page
    # Scatter D-contiguous ROWS on the (free, adjacent-dims) merged view
    # [..., N, 2K*page, D], ordered TOKEN-major so the update tensor is
    # a free reshape of kv (no transpose). The naive
    # `at[blocks, :, offsets]` window form makes XLA lay the scatter
    # temp out token-major and materialize a full transposed COPY of
    # the cache inside the step program (+6.6GB HBM at the flagship
    # config); row scatter is layout-neutral and aliases the donated
    # input.
    rows = (offsets[:, None] +
            jnp.arange(two_k, dtype=jnp.int32)[None, :] * page
            ).reshape(-1)                                  # [T*2K]
    blocks_rep = jnp.broadcast_to(block_ids[:, None],
                                  (T, two_k)).reshape(-1)  # [T*2K]
    updates = kv.reshape(T * two_k, d)
    shape = kv_cache.shape
    merged = kv_cache.reshape(*shape[:-3], shape[-3] * page, d)
    if layer is None:
        merged = merged.at[blocks_rep, rows].set(updates)
    else:
        merged = merged.at[layer, blocks_rep, rows].set(updates)
    return merged.reshape(shape)


def ragged_paged_attention_ref(
    q: jnp.ndarray,
    kv_cache: jnp.ndarray,
    metadata: AttentionMetadata,
    scale: float,
    sliding_window: Optional[int] = None,
    logits_soft_cap: Optional[float] = None,
    k_scale: Optional[jnp.ndarray] = None,
    v_scale: Optional[jnp.ndarray] = None,
    layer=None,
    causal: bool = True,
    local_chunk: Optional[int] = None,
    alibi_slopes: Optional[jnp.ndarray] = None,  # f32[num_q_heads]
) -> jnp.ndarray:
    """Reference jnp implementation (gathers all pages per request; O(T *
    max_ctx) memory — the numerics oracle for the Pallas kernel and the
    CPU-backend path). kv_cache may be the stacked [L, ...] form with a
    traced ``layer`` index."""
    if layer is not None:
        kv_cache = jax.lax.dynamic_index_in_dim(kv_cache, layer, 0,
                                                keepdims=False)
    T, num_q_heads, head = q.shape
    num_blocks, two_k, page, _ = kv_cache.shape
    num_kv_heads = two_k // 2
    group = num_q_heads // num_kv_heads
    R, max_blocks = metadata.block_tables.shape
    ctx = max_blocks * page

    # token -> request map from the ragged offsets.
    token_ids = jnp.arange(T, dtype=jnp.int32)
    token_req = jnp.clip(
        jnp.searchsorted(metadata.query_start_loc,
                         token_ids,
                         side="right") - 1, 0, R - 1)

    pages = kv_cache[metadata.block_tables]  # [R, B, 2K, page, D]
    pages = jnp.swapaxes(pages, 2, 3).reshape(R, ctx, two_k, head)
    k_all = pages[:, :, :num_kv_heads, :]
    v_all = pages[:, :, num_kv_heads:, :]
    if kv_cache.dtype != q.dtype:
        k_all = k_all.astype(jnp.float32)
        v_all = v_all.astype(jnp.float32)
        if k_scale is not None:
            k_all = k_all * k_scale
            v_all = v_all * v_scale
        k_all = k_all.astype(q.dtype)
        v_all = v_all.astype(q.dtype)

    k_t = k_all[token_req]  # [T, ctx, K, D]
    v_t = v_all[token_req]
    qg = q.reshape(T, num_kv_heads, group, head)

    scores = jnp.einsum("tkgd,tckd->tkgc", qg.astype(jnp.float32),
                        k_t.astype(jnp.float32)) * scale
    if alibi_slopes is not None:
        # ALiBi (reference: csrc attention kernels' alibi bias; used by
        # Bloom/MPT/Baichuan-13B): bias = slope_h * (col - pos), negative
        # for past keys, 0 at the query position.
        dist = (jnp.arange(ctx, dtype=jnp.float32)[None, :] -
                metadata.positions[:, None].astype(jnp.float32))
        slopes = alibi_slopes.reshape(num_kv_heads, group)
        scores = scores + (slopes[None, :, :, None] *
                           dist[:, None, None, :])
    if logits_soft_cap is not None:
        scores = logits_soft_cap * jnp.tanh(scores / logits_soft_cap)

    col = jnp.arange(ctx, dtype=jnp.int32)[None, :]  # [1, ctx]
    pos = metadata.positions[:, None]  # [T, 1]
    valid = col < metadata.seq_lens[token_req][:, None]
    if causal:
        causal_ok = col <= pos
        if metadata.bidir_spans is not None:
            # prefix-LM: inside the request's [start, end) span both the
            # query and the key attend bidirectionally
            s0 = metadata.bidir_spans[token_req, 0][:, None]
            s1 = metadata.bidir_spans[token_req, 1][:, None]
            in_span = ((pos >= s0) & (pos < s1) &
                       (col >= s0) & (col < s1))
            causal_ok |= in_span
        valid &= causal_ok
    if sliding_window is not None:
        valid &= col > pos - sliding_window
        if not causal:
            # encoder local attention (ModernBERT): the window is
            # symmetric around the query position
            valid &= col < pos + sliding_window
    if local_chunk is not None:
        # chunked local attention (Llama-4 local layers): only keys in
        # the query's own chunk are attendable
        valid &= col >= (pos // local_chunk) * local_chunk
    valid = valid[:, None, None, :]  # [T, 1, 1, ctx]

    scores = jnp.where(valid, scores, -jnp.inf)
    # Safe softmax: rows that are fully masked (padding tokens) yield 0.
    row_max = jnp.max(scores, axis=-1, keepdims=True)
    row_max = jnp.where(jnp.isfinite(row_max), row_max, 0.0)
    unnorm = jnp.where(valid, jnp.exp(scores - row_max), 0.0)
    denom = jnp.sum(unnorm, axis=-1, keepdims=True)
    probs = unnorm / jnp.maximum(denom, 1e-20)

    out = jnp.einsum("tkgc,tckd->tkgd", probs, v_t.astype(jnp.float32))
    return out.reshape(T, num_q_heads, head).astype(q.dtype)


@functools.lru_cache(maxsize=1)
def _use_pallas() -> bool:
    backend = jax.default_backend()
    return backend in ("tpu", "axon")


def attention(
    q: jnp.ndarray,
    kv_cache: jnp.ndarray,
    metadata: AttentionMetadata,
    scale: float,
    sliding_window: Optional[int] = None,
    logits_soft_cap: Optional[float] = None,
    k_scale: Optional[jnp.ndarray] = None,
    v_scale: Optional[jnp.ndarray] = None,
    layer=None,
    causal: bool = True,
    local_chunk: Optional[int] = None,
    alibi_slopes: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Dispatch: Pallas ragged-paged-attention on TPU, jnp reference
    elsewhere.

    The Pallas kernel requires lane-aligned head_dim (Mosaic tiles the
    last dim by 128); unaligned heads (tiny test models, 64-dim heads)
    take the XLA path. TODO(perf): pad 64-dim heads to 128 inside the
    kernel like the reference backend (v1/attention/backends/pallas.py
    head pad to 128) instead of falling back.

    Per-kv-head dequant scales (``k_scale``/``v_scale`` as arrays [K])
    need no kernel support at all: the score is linear in k, so the
    K-scale folds into q per head before the call, and the output is
    linear in v, so the V-scale folds into the kernel output — exact
    numerics, zero extra HBM traffic (TPU answer to the reference's
    k_scale/v_scale dequant inside paged_attention_kernel,
    csrc/attention/attention_kernels.cu).
    """
    bidir_prefill = False
    if metadata.bidir_spans is not None:
        from vllm_tpu.ops.pallas.ragged_paged_attention import q_block_size

        # decode-shaped buckets are causal-equivalent (every query sits
        # at its sequence end); prefill buckets need the span mask
        bidir_prefill = q_block_size(q.shape[0],
                                     metadata.seq_lens.shape[0]) != 16
    if causal and local_chunk is None and not bidir_prefill \
            and _use_pallas() and q.shape[-1] % 128 == 0:
        try:
            from vllm_tpu.ops.pallas.ragged_paged_attention import (
                ragged_paged_attention)
        except ImportError:
            pass
        else:
            # per-head scale arrays go INTO the kernels (scalar-prefetch
            # SMEM), where the dequant multiply already exists — folding
            # them into q / the output out here costs a full fp32
            # elementwise pass over both tensors per layer (measured
            # 9 ms/step at bs=256).
            return ragged_paged_attention(
                q, kv_cache, metadata, scale,
                sliding_window=sliding_window,
                logits_soft_cap=logits_soft_cap,
                k_scale=k_scale, v_scale=v_scale, layer=layer,
                alibi_slopes=alibi_slopes)
    if k_scale is not None and getattr(k_scale, "ndim", 0) >= 1:
        # jnp reference path: fold per-head array scales exactly — the
        # score is linear in k (K-scale into q) and the output is linear
        # in v (V-scale onto the output).
        num_kv = kv_cache.shape[-3] // 2
        group = q.shape[1] // num_kv
        qs = jnp.repeat(k_scale.astype(jnp.float32).reshape(num_kv),
                        group)
        q2 = (q.astype(jnp.float32) * qs[None, :, None]).astype(q.dtype)
        vs = jnp.repeat(v_scale.astype(jnp.float32).reshape(num_kv),
                        group)
        out = ragged_paged_attention_ref(
            q2, kv_cache, metadata, scale,
            sliding_window=sliding_window,
            logits_soft_cap=logits_soft_cap,
            k_scale=None, v_scale=None, layer=layer, causal=causal,
            local_chunk=local_chunk, alibi_slopes=alibi_slopes)
        return (out.astype(jnp.float32) *
                vs[None, :, None]).astype(out.dtype)
    return ragged_paged_attention_ref(
        q, kv_cache, metadata, scale,
        sliding_window=sliding_window,
        logits_soft_cap=logits_soft_cap,
        k_scale=k_scale, v_scale=v_scale, layer=layer, causal=causal,
        local_chunk=local_chunk, alibi_slopes=alibi_slopes)
