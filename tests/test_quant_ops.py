"""Quantized op tests: Pallas fused dequant-matmul vs jnp reference, and
quantize/dequant round trips (reference analog: tests/kernels/quantization/)."""

import os

os.environ["VLLM_TPU_PALLAS_INTERPRET"] = "1"

import numpy as np
import pytest

import jax.numpy as jnp


def dequant_ref(w_q, scale, zero):
    K, N = w_q.shape
    G = scale.shape[0]
    gs = K // G
    w = np.asarray(w_q, np.float32).reshape(G, gs, N)
    if zero is not None:
        w = w - np.asarray(zero)[:, None, :]
    w = w * np.asarray(scale)[:, None, :]
    return w.reshape(K, N)


@pytest.mark.parametrize("zero_point", [False, True])
@pytest.mark.parametrize("shape", [(16, 256, 256), (64, 512, 384)])
def test_fused_quant_matmul(zero_point, shape):
    from vllm_tpu.ops.pallas.quant_matmul import fused_quant_matmul

    T, K, N = shape
    G = K // 128
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((T, K)), jnp.float32)
    w_q = jnp.asarray(rng.integers(-8, 8, (K, N)), jnp.int8)
    scale = jnp.asarray(rng.uniform(0.001, 0.01, (G, N)), jnp.float32)
    zero = None
    if zero_point:
        zero = jnp.asarray(rng.uniform(-2, 2, (G, N)), jnp.float32)

    out = fused_quant_matmul(x, w_q, scale, zero)
    ref = np.asarray(x) @ dequant_ref(w_q, scale, zero)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-2, atol=2e-2)


def test_quant_matmul_jnp_path_matches():
    """The grouped jnp fallback (CPU) must match plain dequant matmul."""
    from vllm_tpu.ops.quant import quant_matmul

    rng = np.random.default_rng(1)
    T, K, N, G = 8, 256, 128, 2
    x = jnp.asarray(rng.standard_normal((T, K)), jnp.float32)
    w_q = jnp.asarray(rng.integers(-128, 128, (K, N)), jnp.int8)
    scale = jnp.asarray(rng.uniform(0.001, 0.01, (G, N)), jnp.float32)
    out = quant_matmul(x, {"w_q": w_q, "scale": scale})
    ref = np.asarray(x) @ dequant_ref(w_q, scale, None)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_weight_quant_roundtrip_error():
    from vllm_tpu.models.loader import _quantize_stacked

    rng = np.random.default_rng(2)
    w = rng.standard_normal((2, 256, 128)).astype(np.float32) * 0.05
    q8 = _quantize_stacked(w, 8, 128)
    deq = dequant_ref(q8["w_q"][0], q8["scale"][0], None)
    rel = np.abs(deq - w[0]).max() / np.abs(w[0]).max()
    assert rel < 0.01  # int8: <1% of max

    q4 = _quantize_stacked(w, 4, 128)
    from vllm_tpu.ops.quant import unpack_int4

    w_q4 = np.asarray(unpack_int4(jnp.asarray(q4["w_p"]), signed=True))
    assert w_q4.min() >= -8 and w_q4.max() <= 7
    deq4 = dequant_ref(w_q4[0], q4["scale"][0], None)
    rel4 = np.abs(deq4 - w[0]).max() / np.abs(w[0]).max()
    assert rel4 < 0.1


@pytest.mark.parametrize("zero_point", [False, True])
@pytest.mark.parametrize("shape", [(16, 256, 256), (64, 512, 384)])
def test_fused_packed_int4_matmul(zero_point, shape):
    """Packed-int4 kernel (two nibbles/byte, split-K-half layout) vs the
    unpacked dequant reference."""
    from vllm_tpu.models.quant_checkpoints import pack_int4_np
    from vllm_tpu.ops.pallas.quant_matmul import fused_packed_int4_matmul

    T, K, N = shape
    G = K // 128
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((T, K)), jnp.float32)
    if zero_point:
        w_q = rng.integers(0, 16, (K, N))  # unsigned codes (GPTQ/AWQ)
        zero = jnp.asarray(rng.uniform(4, 12, (G, N)), jnp.float32)
    else:
        w_q = rng.integers(-8, 8, (K, N))
        zero = None
    scale = jnp.asarray(rng.uniform(0.001, 0.01, (G, N)), jnp.float32)
    w_p = jnp.asarray(pack_int4_np(w_q))

    out = fused_packed_int4_matmul(x, w_p, scale, zero)
    ref = np.asarray(x) @ dequant_ref(w_q.astype(np.int8), scale, zero)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-2, atol=2e-2)


def test_packed_int4_layered_matches_and_roundtrip():
    from vllm_tpu.models.quant_checkpoints import pack_int4_np
    from vllm_tpu.ops.pallas.quant_matmul import fused_packed_int4_matmul
    from vllm_tpu.ops.quant import pack_int4, quant_matmul, unpack_int4

    rng = np.random.default_rng(7)
    L, T, K, N = 3, 16, 256, 128
    G = K // 128
    w_q = rng.integers(-8, 8, (L, K, N))
    # device and host packers agree
    w_p_np = pack_int4_np(w_q)
    w_p_dev = np.asarray(pack_int4(jnp.asarray(w_q, jnp.int8)))
    np.testing.assert_array_equal(w_p_np, w_p_dev)
    np.testing.assert_array_equal(
        np.asarray(unpack_int4(jnp.asarray(w_p_np), signed=True)),
        w_q.astype(np.int8))

    x = jnp.asarray(rng.standard_normal((T, K)), jnp.float32)
    scale = jnp.asarray(rng.uniform(0.001, 0.01, (L, G, N)), jnp.float32)
    for li in range(L):
        out = fused_packed_int4_matmul(x, jnp.asarray(w_p_np), scale,
                                       layer=jnp.asarray([li]))
        ref = np.asarray(x) @ dequant_ref(
            w_q[li].astype(np.int8), np.asarray(scale[li]), None)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-2,
                                   atol=2e-2)
    # jnp fallback path through the params dict ("w_p" key)
    out2 = quant_matmul(x, {"w_p": jnp.asarray(w_p_np[0]),
                            "scale": scale[0]})
    ref2 = np.asarray(x) @ dequant_ref(w_q[0].astype(np.int8),
                                       np.asarray(scale[0]), None)
    np.testing.assert_allclose(np.asarray(out2), ref2, rtol=1e-3,
                               atol=1e-3)


def test_fp8_quantize_roundtrip():
    from vllm_tpu.ops.quant import quantize_fp8

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((64, 64)), jnp.float32)
    q, s = quantize_fp8(x)
    deq = np.asarray(q, np.float32) * float(s)
    # e4m3 carries ~6% relative precision (3 mantissa bits).
    rel = np.abs(deq - np.asarray(x)) / (np.abs(np.asarray(x)) + 1e-3)
    assert np.median(rel) < 0.04
    assert rel.max() < 0.15


def test_int8_kv_cache_write_and_attend():
    """KV cache in int8 with scales: write + attention dequant path."""
    from vllm_tpu.ops.attention import (AttentionMetadata,
                                        ragged_paged_attention_ref,
                                        write_kv_cache)

    rng = np.random.default_rng(4)
    T, nk, d, page = 8, 2, 64, 8
    k = jnp.asarray(rng.standard_normal((T, nk, d)) * 0.5, jnp.float32)
    v = jnp.asarray(rng.standard_normal((T, nk, d)) * 0.5, jnp.float32)
    kv_f = jnp.zeros((4, 2 * nk, page, d), jnp.float32)
    kv_q = jnp.zeros((4, 2 * nk, page, d), jnp.int8)
    slots = jnp.arange(page, page + T, dtype=jnp.int32)  # block 1
    kv_f = write_kv_cache(kv_f, k, v, slots)
    scale = jnp.asarray(0.05, jnp.float32)
    kv_q = write_kv_cache(kv_q, k, v, slots, k_scale=scale, v_scale=scale)

    meta = AttentionMetadata(
        slot_mapping=slots,
        block_tables=jnp.asarray([[1, 0]], jnp.int32),
        query_start_loc=jnp.asarray([0, T], jnp.int32),
        seq_lens=jnp.asarray([T], jnp.int32),
        positions=jnp.arange(T, dtype=jnp.int32),
    )
    q = jnp.asarray(rng.standard_normal((T, 4, d)), jnp.float32)
    out_f = ragged_paged_attention_ref(q, kv_f, meta, scale=0.125)
    out_q = ragged_paged_attention_ref(q, kv_q, meta, scale=0.125,
                                       k_scale=scale, v_scale=scale)
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(out_f),
                               rtol=0.15, atol=0.05)


def test_w4a8_matmul_matches_reference():
    """W4A8 int8-MXU kernel (packed signed nibbles, int32 acc) vs exact
    integer reference — both flat and layered variants."""
    import jax.numpy as jnp

    from vllm_tpu.ops.quant import w4a8_matmul

    rng = np.random.default_rng(7)
    T, K, N, L = 48, 256, 384, 3
    q4 = rng.integers(-8, 8, (L, K, N)).astype(np.int32)
    lo, hi = q4[:, :K // 2], q4[:, K // 2:]
    packed = ((lo & 0xF) | (hi << 4)).astype(np.int8)
    cs = (rng.random((L, N)) * 0.01 + 0.001).astype(np.float32)
    x = rng.standard_normal((T, K)).astype(np.float32)

    # reference: per-token int8 activation quant, exact integer dot
    ax = np.maximum(np.abs(x).max(axis=-1), 1e-6) / 127.0
    x8 = np.clip(np.round(x / ax[:, None]), -127, 127).astype(np.int32)

    for li in range(L):
        expect = (x8 @ q4[li]).astype(np.float32) * ax[:, None] * cs[li]
        got = np.asarray(w4a8_matmul(
            jnp.asarray(x), {"w4": jnp.asarray(packed[li]),
                             "chan_scale": jnp.asarray(cs[li])}))
        np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-5)
        got_l = np.asarray(w4a8_matmul(
            jnp.asarray(x), {"w4": jnp.asarray(packed),
                             "chan_scale": jnp.asarray(cs)},
            layer=li))
        np.testing.assert_allclose(got_l, expect, rtol=1e-5, atol=1e-5)


def test_w4a8_requant_roundtrip():
    """loader int4 -> w4a8 exec repack: dequantized packed weights must
    match the per-channel int4 requantization of the grouped original."""
    from vllm_tpu.models.loader import (_requant_entry_w8a8,
                                        _quantize_stacked)

    rng = np.random.default_rng(3)
    L, K, N = 2, 128, 64
    w = rng.standard_normal((L, K, N)).astype(np.float32) * 0.1
    p = _quantize_stacked(w, 4, 32)  # grouped int4 checkpoint layout
    out = _requant_entry_w8a8(dict(p), wbits=4)
    assert "w4" in out and out["w4"].shape == (L, K // 2, N)
    pk = out["w4"].astype(np.int32)
    lo = (pk << 28) >> 28
    hi = pk >> 4
    q4 = np.concatenate([lo, hi], axis=1).astype(np.float32)
    deq = q4 * out["chan_scale"][:, None, :]
    # vs the grouped dequant of the checkpoint (within int4 step size)
    from vllm_tpu.ops.quant import unpack_int4
    import jax.numpy as jnp
    ref = np.asarray(unpack_int4(jnp.asarray(p["w_p"]),
                                 signed=True)).astype(np.float32)
    ref = ref.reshape(L, 4, 32, N) * p["scale"][:, :, None, :]
    ref = ref.reshape(L, K, N)
    step = out["chan_scale"].max()
    assert np.abs(deq - ref).max() <= step * 0.5 + 1e-6
