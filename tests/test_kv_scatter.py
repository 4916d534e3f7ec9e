"""Pallas KV-scatter kernel vs the XLA row-scatter reference.

Reference test precedent: kernel-vs-reference parity in interpret mode
(SURVEY.md §4; reference csrc/cache_kernels.cu reshape_and_cache tests).
"""

import os

os.environ.setdefault("VLLM_TPU_PALLAS_INTERPRET", "1")

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_tpu.ops.pallas.kv_scatter import kv_cache_scatter


def _xla_ref(kv_cache, rows, slots, layer):
    page = kv_cache.shape[-2]
    T, two_k, d = rows.shape
    block_ids = slots // page
    offsets = slots % page
    row_idx = (offsets[:, None]
               + np.arange(two_k, dtype=np.int32)[None, :] * page).reshape(-1)
    blocks_rep = np.broadcast_to(block_ids[:, None], (T, two_k)).reshape(-1)
    shape = kv_cache.shape
    merged = np.array(kv_cache).reshape(*shape[:-3], shape[-3] * page, d)
    upd = np.asarray(rows).reshape(T * two_k, d)
    if len(shape) == 5:
        merged[layer, blocks_rep, row_idx] = upd
    else:
        merged[blocks_rep, row_idx] = upd
    return merged.reshape(shape)


@pytest.mark.parametrize("stacked", [False, True])
@pytest.mark.parametrize("dtype", [jnp.int8, jnp.bfloat16])
def test_scatter_matches_xla(stacked, dtype):
    rng = np.random.default_rng(0)
    L, N, two_k, ps, d = 3, 8, 4, 16, 128
    T = 21
    shape = (L, N, two_k, ps, d) if stacked else (N, two_k, ps, d)
    cache = jnp.asarray(
        rng.integers(-50, 50, shape).astype(np.float32)).astype(dtype)
    rows = jnp.asarray(
        rng.integers(-50, 50, (T, two_k, d)).astype(np.float32)).astype(dtype)
    # unique slots across several pages (no duplicate-write ambiguity)
    slots = rng.choice(N * ps, size=T, replace=False).astype(np.int32)
    layer = 2 if stacked else 0

    # snapshot before the call: the kernel donates (and deletes) cache
    cache_np = np.asarray(cache.astype(jnp.float32))
    rows_np = np.asarray(rows.astype(jnp.float32))
    got = kv_cache_scatter(cache, rows,
                           jnp.asarray(slots), layer if stacked else None)
    want = _xla_ref(cache_np, rows_np, slots, layer)
    np.testing.assert_array_equal(
        np.asarray(got.astype(jnp.float32)), want)


def test_scatter_tail_chunk_padding():
    """T far below the chunk size: the clamped duplicate copies must
    leave every non-target slot untouched."""
    rng = np.random.default_rng(1)
    N, two_k, ps, d = 4, 2, 8, 128
    cache = jnp.zeros((N, two_k, ps, d), jnp.int8)
    T = 3
    rows = jnp.asarray(rng.integers(1, 50, (T, two_k, d)), jnp.int8)
    slots = np.asarray([9, 17, 30], np.int32)
    got = np.asarray(
        kv_cache_scatter(cache, rows, jnp.asarray(slots), None))
    want = _xla_ref(np.zeros((N, two_k, ps, d), np.float32),
                    np.asarray(rows, np.float32), slots, 0)
    np.testing.assert_array_equal(got.astype(np.float32), want)


def test_write_kv_cache_uses_pallas_path(monkeypatch):
    """write_kv_cache dispatches to the Pallas kernel when enabled and
    produces the same cache as the XLA fallback."""
    from vllm_tpu.ops import attention as att

    rng = np.random.default_rng(2)
    N, K, ps, d = 4, 2, 8, 128
    T = 5
    cache = jnp.zeros((N, 2 * K, ps, d), jnp.int8)
    k = jnp.asarray(rng.normal(size=(T, K, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(T, K, d)), jnp.float32)
    slots = jnp.asarray(rng.choice(N * ps, size=T, replace=False), jnp.int32)
    ks = jnp.float32(0.05)
    vs = jnp.float32(0.05)

    monkeypatch.setattr(att, "_use_pallas", lambda: True)
    monkeypatch.setenv("VLLM_TPU_PALLAS_SCATTER", "1")
    got = att.write_kv_cache(cache, k, v, slots, ks, vs)
    monkeypatch.setattr(att, "_use_pallas", lambda: False)
    want = att.write_kv_cache(cache, k, v, slots, ks, vs)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
