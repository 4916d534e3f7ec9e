"""Chunked local attention: masking semantics + block reclamation
(reference analog: tests for ChunkedLocalAttentionManager +
chunked-local backend masking)."""

import numpy as np

import jax.numpy as jnp

from tests.test_model_vs_hf import build_metadata
from vllm_tpu.ops.attention import ragged_paged_attention_ref, write_kv_cache


def test_local_chunk_mask_matches_manual():
    rng = np.random.default_rng(0)
    T, K, D, C = 12, 2, 16, 4
    toks = [list(range(T))]
    md, _, _ = build_metadata(toks, 4, max_blocks=8, total_pad=16,
                              req_pad=2)
    q = jnp.asarray(rng.standard_normal((16, 2 * K, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((16, K, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((16, K, D)), jnp.float32)
    kv = jnp.zeros((32, 2 * K, 4, D), jnp.float32)
    kv = write_kv_cache(kv, k, v, md.slot_mapping)
    out = np.asarray(ragged_paged_attention_ref(q, kv, md, 0.25,
                                                local_chunk=C))
    # manual per-token: softmax over keys in [chunk_start, pos]
    qn = np.asarray(q).reshape(16, K, 2, D)
    kn, vn = np.asarray(k), np.asarray(v)
    for t in range(T):
        lo = (t // C) * C
        keys = kn[lo:t + 1]  # [n, K, D]
        vals = vn[lo:t + 1]
        for h in range(K):
            for g in range(2):
                s = (keys[:, h] @ qn[t, h, g]) * 0.25
                p = np.exp(s - s.max())
                p /= p.sum()
                ref = p @ vals[:, h]
                np.testing.assert_allclose(
                    out[t].reshape(K, 2, D)[h, g], ref, rtol=1e-5,
                    atol=1e-5)


def test_chunked_local_manager_reclaims_blocks():
    from vllm_tpu.core.block_pool import BlockPool
    from vllm_tpu.core.kv_cache_interface import ChunkedLocalAttentionSpec
    from vllm_tpu.core.single_type_kv_cache_manager import (
        ChunkedLocalAttentionManager, spec_manager_map)

    spec = ChunkedLocalAttentionSpec(block_size=4, num_kv_heads=1,
                                     head_size=16, dtype="float32",
                                     attention_chunk_size=8)
    assert spec_manager_map(spec) is ChunkedLocalAttentionManager
    assert "local_attention_8" in spec.type_id
    pool = BlockPool(num_blocks=32, enable_caching=False)
    mgr = ChunkedLocalAttentionManager(spec, pool)
    free0 = pool.get_num_free_blocks()

    mgr.allocate_new_blocks("r", 20)  # 5 blocks for 20 tokens
    assert pool.get_num_free_blocks() == free0 - 5
    # at token 20, chunk start = 16 -> blocks covering [0,16) reclaimed
    mgr.remove_skipped_blocks("r", 20)
    blocks = mgr.req_to_blocks["r"]
    assert sum(b is pool.null_block for b in blocks) == 4
    assert pool.get_num_free_blocks() == free0 - 1
    pool.free_blocks(mgr.free("r"))
