"""Pallas KV-cache scatter: paged reshape_and_cache for TPU.

TPU-native replacement for the reference's reshape_and_cache /
reshape_and_cache_flash CUDA kernels (reference:
csrc/cache_kernels.cu:208,278 — design re-derived, not ported).

Why not jnp scatter: XLA's TPU scatter executes row-by-row on the
scalar core — measured 281 us for 256 decode tokens x 16 head-rows of
128 B (~5.7 GB/s) in the flagship bench, 9 ms/step across 32 layers,
and it grows linearly with tokens so a 4096-token prefill step paid
~4.5 ms/layer. The DMA engines handle strided writes natively: this
kernel issues ONE async copy per token straight HBM->HBM, no VMEM
staging, and software-pipelines CH copies deep.

Tiling-legality note (the shape choreography below is load-bearing):
Mosaic tiles the LAST TWO dims of every memref — (2,128) for bf16,
(4,128) for int8 — and rejects `memref_slice` windows not aligned to
the tile (a size-1 slice of the page dim, the obvious way to address
one token's row, fails to compile on real hardware). So the kernel
addresses the head-major cache through the merged view
[L, N, 2K, ps*d]: one token's write is then a [2K, d]-shaped window —
full in the second-minor dim (2K) and a d-sized, d-aligned window of
the minor dim at offset off*d — which is tile-aligned for every cache
dtype (d == 128 == the lane tile). The DMA engine renders it as 2K
rows of d bytes striding ps*d through the page, exactly the intended
strided write.

kv_cache: [L, N, 2K, ps, d] stacked head-major pages (or [N, 2K, ps, d]
with L=1 squeezed by the caller). kv_rows: [T, 2K, d] quantized rows.
slot_mapping: i32[T], slot = block_id * ps + offset; padding rows point
at the null block 0 (duplicate in-flight writes to the same null slot
carry identical bytes, so the race is benign).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = os.environ.get("VLLM_TPU_PALLAS_INTERPRET", "0") == "1"

# copies issued per wait-batch; bounds in-flight DMAs well under the
# hardware queue depth while amortizing the per-batch serialization
_CH = 128


def _kernel(
    # scalar prefetch
    slots_ref,  # i32[T]
    layer_ref,  # i32[1]
    # operands (ANY/HBM)
    rows_hbm,  # [T, 2K, d]
    cache_in,  # [L, N, 2K, ps*d] (aliased to output)
    cache_out,  # [L, N, 2K, ps*d]
    # scratch
    sems,  # DMA [CH]
    *,
    tokens: int,
    page_size: int,
    head_dim: int,
):
    layer = layer_ref[0]

    def copy(i, j):
        # i is traced (fori_loop chunk base + static j); clamp keeps the
        # tail chunk in range — clamped duplicates rewrite the same
        # bytes to the same slot, which is benign (see module docstring)
        t = jnp.minimum(i + j, tokens - 1)
        slot = slots_ref[t]
        bid = slot // page_size
        off = slot % page_size
        return pltpu.make_async_copy(
            rows_hbm.at[t],  # [2K, d]
            cache_out.at[layer, bid, :, pl.ds(off * head_dim, head_dim)],
            sems.at[j])

    nchunks = pl.cdiv(tokens, _CH)

    def body(c, _):
        base = c * _CH
        for j in range(_CH):
            copy(base, j).start()
        for j in range(_CH):
            copy(base, j).wait()
        return 0

    jax.lax.fori_loop(0, nchunks, body, 0)


@functools.partial(jax.jit, static_argnames=(), donate_argnums=(0,))
def _scatter_impl(kv_cache, rows, slots, layer):
    T = rows.shape[0]
    L, N, two_k, ps, d = kv_cache.shape
    kernel = functools.partial(_kernel, tokens=T, page_size=ps,
                               head_dim=d)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # rows
            pl.BlockSpec(memory_space=pltpu.HBM),  # cache
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((_CH,))],
    )
    merged = kv_cache.reshape(L, N, two_k, ps * d)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(merged.shape, merged.dtype),
        input_output_aliases={3: 0},  # cache operand -> output
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=_INTERPRET,
    )(slots, layer, rows, merged)
    return out.reshape(L, N, two_k, ps, d)


def kv_cache_scatter(kv_cache: jnp.ndarray, rows: jnp.ndarray,
                     slot_mapping: jnp.ndarray, layer) -> jnp.ndarray:
    """Scatter quantized KV rows [T, 2K, d] into the paged stack.

    kv_cache: [L, N, 2K, ps, d] (or [N, 2K, ps, d], treated as L=1).
    layer: traced i32 scalar (or None -> 0).
    """
    squeeze = kv_cache.ndim == 4
    if squeeze:
        kv_cache = kv_cache[None]
    layer_arr = jnp.asarray(
        [layer if layer is not None else 0], jnp.int32)
    out = _scatter_impl(kv_cache, rows, slot_mapping.astype(jnp.int32),
                        layer_arr)
    return out[0] if squeeze else out
