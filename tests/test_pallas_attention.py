"""Pallas ragged-paged-attention kernel vs jnp reference, interpret mode
(reference analog: tests/v1/tpu/test_pallas.py + kernel-vs-torch tests)."""

import os

os.environ["VLLM_TPU_PALLAS_INTERPRET"] = "1"

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_tpu.ops.attention import AttentionMetadata, \
    ragged_paged_attention_ref


def make_case(rng, seq_specs, num_q_heads, num_kv_heads, head, page,
              max_blocks, token_pad, req_pad, dtype=jnp.float32):
    """seq_specs: list of (q_len, kv_len) with kv_len >= q_len."""
    from vllm_tpu.ops.pallas.ragged_paged_attention import \
        build_logical_blocks

    R, T = req_pad, token_pad
    total_q = sum(q for q, _ in seq_specs)
    assert total_q <= T
    num_blocks = 1 + sum(-(-kv // page) for _, kv in seq_specs)
    kv_cache = jnp.asarray(
        rng.standard_normal((num_blocks, 2 * num_kv_heads, page, head),
                            dtype=np.float32), dtype)
    q = jnp.asarray(
        rng.standard_normal((T, num_q_heads, head), dtype=np.float32),
        dtype)

    qsl = np.zeros(R + 1, np.int32)
    seq_lens = np.zeros(R, np.int32)
    positions = np.zeros(T, np.int32)
    block_tables = np.zeros((R, max_blocks), np.int32)
    next_block = 1
    offset = 0
    for r, (q_len, kv_len) in enumerate(seq_specs):
        seq_lens[r] = kv_len
        positions[offset:offset + q_len] = np.arange(kv_len - q_len, kv_len)
        nb = -(-kv_len // page)
        block_tables[r, :nb] = np.arange(next_block, next_block + nb)
        next_block += nb
        qsl[r + 1] = offset + q_len
        offset += q_len
    qsl[len(seq_specs) + 1:] = offset

    lb_seq, lb_q_start = build_logical_blocks(qsl, T, R,
                                               skip_single=True)
    meta = AttentionMetadata(
        slot_mapping=jnp.zeros(T, jnp.int32),
        block_tables=jnp.asarray(block_tables),
        query_start_loc=jnp.asarray(qsl),
        seq_lens=jnp.asarray(seq_lens),
        positions=jnp.asarray(positions),
        lb_seq=jnp.asarray(lb_seq),
        lb_q_start=jnp.asarray(lb_q_start),
    )
    return q, kv_cache, meta, total_q


CASES = [
    # (seq_specs, description)
    ([(1, 17), (1, 32), (1, 5), (1, 64)], "pure decode"),
    ([(48, 48)], "single prefill"),
    ([(30, 30), (17, 17), (1, 40)], "mixed prefill+decode"),
    ([(16, 48)], "chunked prefill continuation"),
    ([(5, 9), (3, 3)], "tiny ragged"),
]


@pytest.mark.parametrize("case_idx", range(len(CASES)))
def test_kernel_matches_reference(case_idx):
    from vllm_tpu.ops.pallas.ragged_paged_attention import \
        ragged_paged_attention

    seq_specs, _ = CASES[case_idx]
    rng = np.random.default_rng(case_idx)
    q, kv, meta, total_q = make_case(
        rng, seq_specs, num_q_heads=8, num_kv_heads=2, head=128, page=16,
        max_blocks=8, token_pad=64, req_pad=8)
    ref = ragged_paged_attention_ref(q, kv, meta, scale=0.125)
    out = ragged_paged_attention(q, kv, meta, scale=0.125, chunk_pages=2)
    np.testing.assert_allclose(np.asarray(out)[:total_q],
                               np.asarray(ref)[:total_q],
                               rtol=2e-3, atol=2e-3)


def test_kernel_sliding_window():
    from vllm_tpu.ops.pallas.ragged_paged_attention import \
        ragged_paged_attention

    rng = np.random.default_rng(7)
    q, kv, meta, total_q = make_case(
        rng, [(24, 24), (1, 40)], num_q_heads=4, num_kv_heads=4, head=128,
        page=16, max_blocks=8, token_pad=32, req_pad=4)
    ref = ragged_paged_attention_ref(q, kv, meta, scale=0.2,
                                     sliding_window=8)
    out = ragged_paged_attention(q, kv, meta, scale=0.2, sliding_window=8,
                                 chunk_pages=2)
    np.testing.assert_allclose(np.asarray(out)[:total_q],
                               np.asarray(ref)[:total_q],
                               rtol=2e-3, atol=2e-3)


def test_kernel_soft_cap():
    from vllm_tpu.ops.pallas.ragged_paged_attention import \
        ragged_paged_attention

    rng = np.random.default_rng(9)
    q, kv, meta, total_q = make_case(
        rng, [(8, 8), (1, 24)], num_q_heads=4, num_kv_heads=2, head=128,
        page=16, max_blocks=4, token_pad=16, req_pad=4)
    ref = ragged_paged_attention_ref(q, kv, meta, scale=0.3,
                                     logits_soft_cap=30.0)
    out = ragged_paged_attention(q, kv, meta, scale=0.3,
                                 logits_soft_cap=30.0, chunk_pages=2)
    np.testing.assert_allclose(np.asarray(out)[:total_q],
                               np.asarray(ref)[:total_q],
                               rtol=2e-3, atol=2e-3)


def test_kernel_per_head_kv_scales():
    """int8 KV + per-head dequant scale VECTORS consumed in-kernel
    (scalar-prefetch SMEM) vs the fp32 reference — both the prefill
    (ragged) and the mixed decode-row split paths."""
    from vllm_tpu.ops.pallas.ragged_paged_attention import \
        ragged_paged_attention

    rng = np.random.default_rng(11)
    for seq_specs, token_pad, req_pad in [
            ([(30, 30), (17, 17), (1, 40), (1, 12)], 64, 8),  # mixed
            ([(1, 17), (1, 32), (1, 5), (1, 64)], 8, 8),  # decode bucket
    ]:
        q, kv, meta, total_q = make_case(
            rng, seq_specs, num_q_heads=8, num_kv_heads=2, head=128,
            page=16, max_blocks=8, token_pad=token_pad, req_pad=req_pad)
        K = 2
        ks = np.abs(np.asarray(kv[:, :K])).max(axis=(0, 2, 3)) / 127.0
        vs = np.abs(np.asarray(kv[:, K:])).max(axis=(0, 2, 3)) / 127.0
        qkv = np.asarray(kv, np.float32).copy()
        qkv[:, :K] = np.round(qkv[:, :K] / ks[None, :, None, None])
        qkv[:, K:] = np.round(qkv[:, K:] / vs[None, :, None, None])
        kv_q = jnp.asarray(np.clip(qkv, -127, 127), jnp.int8)
        # reference: exact dequant through a float cache
        deq = np.asarray(kv_q, np.float32).copy()
        deq[:, :K] *= ks[None, :, None, None]
        deq[:, K:] *= vs[None, :, None, None]
        ref = ragged_paged_attention_ref(q, jnp.asarray(deq), meta,
                                         scale=0.125)
        out = ragged_paged_attention(
            q, kv_q, meta, scale=0.125, chunk_pages=2,
            k_scale=jnp.asarray(ks, jnp.float32),
            v_scale=jnp.asarray(vs, jnp.float32))
        np.testing.assert_allclose(np.asarray(out)[:total_q],
                                   np.asarray(ref)[:total_q],
                                   rtol=5e-3, atol=5e-3)


# ------------------------------------------------------------- MLA kernel

def make_mla_case(rng, seq_specs, num_heads, latent_dim, page, max_blocks,
                  token_pad, req_pad):
    from vllm_tpu.ops.pallas.ragged_paged_attention import \
        build_logical_blocks

    R, T = req_pad, token_pad
    num_blocks = 1 + sum(-(-kv // page) for _, kv in seq_specs)
    kv_cache = jnp.asarray(
        rng.standard_normal((1, num_blocks, page, latent_dim),
                            dtype=np.float32), jnp.float32)
    q = jnp.asarray(
        rng.standard_normal((T, num_heads, latent_dim), dtype=np.float32),
        jnp.float32)
    qsl = np.zeros(R + 1, np.int32)
    seq_lens = np.zeros(R, np.int32)
    block_tables = np.zeros((R, max_blocks), np.int32)
    next_block = 1
    offset = 0
    for r, (q_len, kv_len) in enumerate(seq_specs):
        seq_lens[r] = kv_len
        nb = -(-kv_len // page)
        block_tables[r, :nb] = np.arange(next_block, next_block + nb)
        next_block += nb
        qsl[r + 1] = offset + q_len
        offset += q_len
    qsl[len(seq_specs) + 1:] = offset
    # NO skip_single: the MLA kernel serves every row from lb_seq (the
    # decode-row split is a GQA-dispatcher feature; runner sets
    # lb_skip_single=False for MLASpec groups)
    lb_seq, lb_q_start = build_logical_blocks(qsl, T, R)
    meta = AttentionMetadata(
        slot_mapping=jnp.zeros(T, jnp.int32),
        block_tables=jnp.asarray(block_tables),
        query_start_loc=jnp.asarray(qsl),
        seq_lens=jnp.asarray(seq_lens),
        positions=jnp.zeros(T, jnp.int32),
        lb_seq=jnp.asarray(lb_seq),
        lb_q_start=jnp.asarray(lb_q_start),
    )
    return q, kv_cache, meta, offset


MLA_CASES = [
    [(1, 17), (1, 32), (1, 5), (1, 64)],  # pure decode
    [(48, 48)],  # single prefill
    [(30, 30), (17, 17), (1, 40)],  # mixed
    [(16, 48)],  # chunked continuation
]


@pytest.mark.parametrize("case_idx", range(len(MLA_CASES)))
def test_mla_kernel_matches_reference(case_idx):
    """MLA Pallas kernel (single-copy latent cache, V = K prefix) vs the
    jnp reference, interpret mode. latent 192 = 128 kv_lora + 64 rope —
    deliberately NOT a multiple of 128 like DeepSeek's 576."""
    from vllm_tpu.ops.pallas.mla_attention import (_mla_attention_impl,
                                                   mla_ref)

    rng = np.random.default_rng(case_idx)
    latent, v_dim, nh = 192, 128, 4
    q, kv_cache, meta, total_q = make_mla_case(
        rng, MLA_CASES[case_idx], nh, latent, page=8, max_blocks=16,
        token_pad=64, req_pad=4)
    scale = latent ** -0.5
    out = _mla_attention_impl(
        q, kv_cache, jnp.asarray([0], jnp.int32), meta.lb_seq,
        meta.lb_q_start, meta.query_start_loc, meta.seq_lens,
        meta.block_tables, None, scale, 1, v_dim)
    ref = mla_ref(q, kv_cache, meta, scale, v_dim)
    np.testing.assert_allclose(np.asarray(out)[:total_q, :, :],
                               np.asarray(ref)[:total_q], rtol=2e-3,
                               atol=2e-3)


def test_write_mla_cache_roundtrip():
    from vllm_tpu.ops.pallas.mla_attention import write_mla_cache

    rng = np.random.default_rng(0)
    kv = jnp.zeros((2, 4, 8, 192), jnp.float32)
    c = jnp.asarray(rng.standard_normal((5, 192)), jnp.float32)
    slots = jnp.asarray([8, 9, 10, 17, 25], jnp.int32)
    kv = write_mla_cache(kv, c, slots, layer=1)
    flat = np.asarray(kv).reshape(2, 32, 192)
    np.testing.assert_allclose(flat[1, [8, 9, 10, 17, 25]],
                               np.asarray(c))
    assert np.abs(flat[0]).max() == 0


# ------------------------------------------------------ decode row kernel

@pytest.mark.parametrize("specs", [
    [(1, 17), (1, 32), (1, 5), (1, 64), (1, 1)],  # pure decode, ragged ctx
    [(1, 40)] * 11,  # uniform decode, partial last program
    [(2, 30), (1, 7), (3, 9)],  # mixed short rows in a decode bucket
])
def test_decode_row_kernel_matches_reference(specs):
    """Batched-row decode kernel (SB rows/program) vs jnp reference."""
    from vllm_tpu.ops.pallas.ragged_paged_attention import \
        _decode_attention_impl

    rng = np.random.default_rng(len(specs))
    total = sum(q for q, _ in specs)
    R = max(len(specs), 4)
    q, kv, meta, total_q = make_case(
        rng, specs, num_q_heads=8, num_kv_heads=2, head=128, page=16,
        max_blocks=8, token_pad=total + 3, req_pad=R)
    ref = ragged_paged_attention_ref(q, kv, meta, scale=0.125)
    out = _decode_attention_impl(
        q, kv[None], jnp.asarray([0], jnp.int32), meta.query_start_loc,
        meta.seq_lens, meta.block_tables, None, None, 0.125, None, None,
        2)
    np.testing.assert_allclose(np.asarray(out)[:total_q],
                               np.asarray(ref)[:total_q],
                               rtol=2e-3, atol=2e-3)


def test_decode_row_kernel_sliding_window_and_cap():
    from vllm_tpu.ops.pallas.ragged_paged_attention import \
        _decode_attention_impl

    rng = np.random.default_rng(3)
    specs = [(1, 33), (1, 64), (1, 9)]
    q, kv, meta, total_q = make_case(
        rng, specs, num_q_heads=4, num_kv_heads=4, head=128, page=16,
        max_blocks=8, token_pad=8, req_pad=4)
    ref = ragged_paged_attention_ref(q, kv, meta, scale=0.2,
                                     sliding_window=16, logits_soft_cap=30.0)
    out = _decode_attention_impl(
        q, kv[None], jnp.asarray([0], jnp.int32), meta.query_start_loc,
        meta.seq_lens, meta.block_tables, None, None, 0.2, 16, 30.0, 2)
    np.testing.assert_allclose(np.asarray(out)[:total_q],
                               np.asarray(ref)[:total_q],
                               rtol=2e-3, atol=2e-3)


def test_decode_kernel_cascade_matches_reference():
    """Shared-prefix (cascade) decode: every sequence's first blocks are
    the SAME pages; the kernel streams them once per program and must
    produce identical outputs to the non-cascade reference."""
    from vllm_tpu.ops.pallas.ragged_paged_attention import \
        _decode_attention_impl

    rng = np.random.default_rng(11)
    R = 12
    page = 16
    shared_pages = 3  # 48 shared tokens
    own_tokens = 20
    ctx = shared_pages * page + own_tokens
    nq, nk, d = 8, 2, 128

    num_blocks = 1 + shared_pages + R * 2
    kv = jnp.asarray(
        rng.standard_normal((1, num_blocks, 2 * nk, page, d)),
        jnp.float32)
    q = jnp.asarray(rng.standard_normal((R, nq, d)), jnp.float32)
    qsl = np.arange(R + 1, dtype=np.int32)
    seq_lens = np.full(R, ctx, np.int32)
    bt = np.zeros((R, 8), np.int32)
    shared = np.arange(1, 1 + shared_pages)
    nxt = 1 + shared_pages
    for r in range(R):
        bt[r, :shared_pages] = shared
        bt[r, shared_pages:shared_pages + 2] = [nxt, nxt + 1]
        nxt += 2
    meta = AttentionMetadata(
        slot_mapping=jnp.zeros(R, jnp.int32),
        block_tables=jnp.asarray(bt),
        query_start_loc=jnp.asarray(qsl),
        seq_lens=jnp.asarray(seq_lens),
        positions=jnp.asarray(np.full(R, ctx - 1, np.int32)),
    )
    ref = ragged_paged_attention_ref(q, kv[0], meta, scale=0.1)

    cascade_meta = np.zeros(9, np.int32)
    cascade_meta[0] = shared_pages
    cascade_meta[1:1 + shared_pages] = shared
    out = _decode_attention_impl(
        q, kv, jnp.asarray([0], jnp.int32), meta.query_start_loc,
        meta.seq_lens, meta.block_tables, None, None, 0.1, None, None, 2,
        jnp.asarray(cascade_meta))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)
    # and the non-cascade path agrees too
    out2 = _decode_attention_impl(
        q, kv, jnp.asarray([0], jnp.int32), meta.query_start_loc,
        meta.seq_lens, meta.block_tables, None, None, 0.1, None, None, 2)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_cascade_gate_in_input_batch():
    """The InputBatch emits cascade_meta exactly when >=8 decode rows
    share >=256 tokens of leading blocks."""
    from vllm_tpu.core.sched.output import NewRequestData, SchedulerOutput
    from vllm_tpu.worker.input_batch import InputBatch

    rng = np.random.default_rng(0)
    batch = InputBatch(max_num_reqs=16, max_model_len=1024,
                       max_blocks_per_req=32, block_size=32)
    shared = list(range(1, 9))  # 8 shared blocks = 256 tokens
    num_sched = {}
    for r in range(10):
        blocks = shared + [100 + r]
        data = NewRequestData(
            req_id=f"r{r}", prompt_token_ids=[1] * 270,
            sampling_params=None, block_ids=(blocks,),
            num_computed_tokens=269)
        batch.add_request(data, rng)
        num_sched[f"r{r}"] = 1
    so = SchedulerOutput(num_scheduled_tokens=num_sched,
                         total_num_scheduled_tokens=10)
    prep = batch.prepare_inputs(so, token_bucket=16, req_bucket=16)
    assert prep.cascade_meta is not None
    # 8 shared + 1 unique, minus the 1-block safety margin
    assert prep.cascade_meta[0] == 8
    np.testing.assert_array_equal(prep.cascade_meta[1:9], shared)

    # a differing block table kills the gate
    batch2 = InputBatch(max_num_reqs=16, max_model_len=1024,
                        max_blocks_per_req=32, block_size=32)
    for r in range(10):
        blocks = ([1, 2, 3, 4, 5, 6, 7, 8] if r else
                  [1, 2, 99, 4, 5, 6, 7, 8]) + [100 + r]
        data = NewRequestData(
            req_id=f"r{r}", prompt_token_ids=[1] * 270,
            sampling_params=None, block_ids=(blocks,),
            num_computed_tokens=269)
        batch2.add_request(data, rng)
    prep2 = batch2.prepare_inputs(so, token_bucket=16, req_bucket=16)
    # slot is always present (stable jit layout); zeros = disabled
    assert prep2.cascade_meta is not None
    assert prep2.cascade_meta[0] == 0


def test_kernel_alibi_matches_reference():
    """ALiBi bias in BOTH Pallas kernels (prefill-shaped general grid +
    decode-row grid) vs the jnp reference (VERDICT r02: Bloom/MPT no
    longer take the unpaged fallback)."""
    from vllm_tpu.ops.pallas.ragged_paged_attention import \
        ragged_paged_attention

    rng = np.random.default_rng(11)
    nq, nk = 4, 2
    slopes = jnp.asarray([0.5, 0.25, 0.125, 0.0625], jnp.float32)

    # prefill-shaped (general kernel)
    q, kv, meta, total = make_case(rng, [(30, 30), (17, 17)], nq, nk,
                                   128, 8, 8, token_pad=64, req_pad=4)
    out = ragged_paged_attention(q, kv, meta, scale=0.125,
                                 chunk_pages=2, alibi_slopes=slopes)
    ref = ragged_paged_attention_ref(q, kv, meta, scale=0.125,
                                     alibi_slopes=slopes)
    np.testing.assert_allclose(np.asarray(out[:total]),
                               np.asarray(ref[:total]), rtol=2e-3,
                               atol=2e-3)

    # decode-shaped (batched-row kernel)
    q, kv, meta, total = make_case(rng, [(1, 17), (1, 32), (1, 5),
                                         (1, 64)], nq, nk, 128, 8, 8,
                                   token_pad=16, req_pad=16)
    out = ragged_paged_attention(q, kv, meta, scale=0.125,
                                 chunk_pages=2, alibi_slopes=slopes)
    ref = ragged_paged_attention_ref(q, kv, meta, scale=0.125,
                                     alibi_slopes=slopes)
    np.testing.assert_allclose(np.asarray(out[:total]),
                               np.asarray(ref[:total]), rtol=2e-3,
                               atol=2e-3)


def test_decode_grid_kernel_variant(monkeypatch):
    """The grid (per-program) decode kernel stays correct with the
    single-program loop variant off."""
    monkeypatch.setenv("VLLM_TPU_DECODE_LOOP", "0")
    from vllm_tpu.ops.pallas.ragged_paged_attention import \
        ragged_paged_attention

    rng = np.random.default_rng(21)
    q, kv, meta, total_q = make_case(
        rng, [(1, 17), (2, 30), (1, 64), (3, 9)], num_q_heads=8,
        num_kv_heads=2, head=128, page=16, max_blocks=8, token_pad=8,
        req_pad=8)
    ref = ragged_paged_attention_ref(q, kv, meta, scale=0.125)
    out = ragged_paged_attention(q, kv, meta, scale=0.125, chunk_pages=2)
    np.testing.assert_allclose(np.asarray(out)[:total_q],
                               np.asarray(ref)[:total_q],
                               rtol=2e-3, atol=2e-3)
