"""Calibrated low-precision KV cache scales (models/loader.py
calibrate_kv_scales + ops/attention.py per-head scale fold).

The K-scale folds into q (scores linear in k) and the V-scale into the
attention output (linear in v), so per-head dequant needs no kernel
support. The loader self-calibrates per-layer per-head scales from one
full-precision-cache forward (reference analog: checkpoint
k_scale/v_scale consumed by csrc paged attention)."""

import numpy as np
import pytest

from tests.utils import build_tiny_llama


@pytest.fixture(scope="module")
def tiny_model_dir(tmp_path_factory):
    return build_tiny_llama(str(tmp_path_factory.mktemp("kvscale")))


def _single_seq_forward(model, params, kv_dtype, T=64, bs=16):
    import jax.numpy as jnp

    from vllm_tpu.ops.attention import AttentionMetadata
    from vllm_tpu.ops.pallas.ragged_paged_attention import \
        build_logical_blocks
    from vllm_tpu.utils import cdiv

    a = model.args
    ids = np.random.default_rng(1).integers(
        0, a.vocab_size, T).astype(np.int32)
    nb = cdiv(T, bs) + 1
    qsl = np.array([0, T], np.int32)
    lb_seq, lb_q = build_logical_blocks(qsl, T, 1)
    bt = np.arange(1, nb + 1, dtype=np.int32)[None]
    pos = np.arange(T, dtype=np.int32)
    slots = (bt[0][pos // bs] * bs + pos % bs).astype(np.int32)
    md = AttentionMetadata(
        slot_mapping=jnp.asarray(slots), block_tables=jnp.asarray(bt),
        query_start_loc=jnp.asarray(qsl),
        seq_lens=jnp.asarray([T]).astype(jnp.int32),
        positions=jnp.asarray(pos), lb_seq=jnp.asarray(lb_seq),
        lb_q_start=jnp.asarray(lb_q))
    dt = {"auto": jnp.float32, "int8": jnp.int8,
          "fp8_e4m3": jnp.float8_e4m3fn}[kv_dtype]
    kv = jnp.zeros((a.num_layers, nb + 2, 2 * a.num_kv_heads, bs,
                    a.head_dim), dt)
    h, _ = model.forward(params, jnp.asarray(ids), [kv], md)
    return np.asarray(model.compute_logits(params, h))


def _load(tiny_model_dir, kv_dtype, calibrate):
    from vllm_tpu.config import CacheConfig, EngineConfig, ModelConfig
    from vllm_tpu.models.loader import load_model_params
    from vllm_tpu.models.registry import get_model

    mc = ModelConfig(model=tiny_model_dir, dtype="float32",
                     kv_cache_dtype=kv_dtype, skip_tokenizer_init=True)
    mc.resolve_hf_config()
    cfg = EngineConfig(
        model_config=mc,
        cache_config=CacheConfig(
            cache_dtype=kv_dtype if calibrate else "auto"))
    model = get_model(mc)
    return model, load_model_params(model, cfg)


def test_calibrated_int8_kv_beats_unit_scale(tiny_model_dir):
    model, params = _load(tiny_model_dir, "auto", False)
    ref = _single_seq_forward(model, params, "auto")

    model_u, params_u = _load(tiny_model_dir, "int8", False)
    assert "kv_scale_k" not in params_u["layers"]
    unit = _single_seq_forward(model_u, params_u, "int8")

    model_c, params_c = _load(tiny_model_dir, "int8", True)
    assert "kv_scale_k" in params_c["layers"]
    assert params_c["layers"]["kv_scale_k"].shape == (
        model_c.args.num_layers, model_c.args.num_kv_heads)
    cal = _single_seq_forward(model_c, params_c, "int8")

    err_unit = np.abs(unit - ref).max()
    err_cal = np.abs(cal - ref).max()
    assert err_cal < 0.02
    assert err_cal < err_unit / 10


def test_calibrated_fp8_kv(tiny_model_dir):
    model, params = _load(tiny_model_dir, "auto", False)
    ref = _single_seq_forward(model, params, "auto")
    model_c, params_c = _load(tiny_model_dir, "fp8_e4m3", True)
    assert "kv_scale_k" in params_c["layers"]
    cal = _single_seq_forward(model_c, params_c, "fp8_e4m3")
    assert np.abs(cal - ref).max() < 0.05


def test_scale_fold_is_exact(tiny_model_dir):
    """Array-scale fold == explicit dequant: same floats either way."""
    import jax.numpy as jnp

    from vllm_tpu.ops.attention import (AttentionMetadata, attention,
                                        write_kv_cache)
    from vllm_tpu.ops.pallas.ragged_paged_attention import \
        build_logical_blocks

    rng = np.random.default_rng(0)
    T, K, QH, D, bs = 16, 2, 4, 32, 16
    nb = 3
    q = jnp.asarray(rng.normal(size=(T, QH, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(T, K, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(T, K, D)), jnp.float32)
    qsl = np.array([0, T], np.int32)
    lb_seq, lb_q = build_logical_blocks(qsl, T, 1)
    bt = np.arange(1, nb + 1, dtype=np.int32)[None]
    pos = np.arange(T, dtype=np.int32)
    slots = (bt[0][pos // bs] * bs + pos % bs).astype(np.int32)
    md = AttentionMetadata(
        slot_mapping=jnp.asarray(slots), block_tables=jnp.asarray(bt),
        query_start_loc=jnp.asarray(qsl),
        seq_lens=jnp.asarray([T]).astype(jnp.int32),
        positions=jnp.asarray(pos), lb_seq=jnp.asarray(lb_seq),
        lb_q_start=jnp.asarray(lb_q))

    ks = jnp.asarray(np.abs(np.asarray(k)).max(axis=(0, 2)) / 127.0)
    vs = jnp.asarray(np.abs(np.asarray(v)).max(axis=(0, 2)) / 127.0)
    cache = jnp.zeros((nb + 2, 2 * K, bs, D), jnp.int8)
    cache = write_kv_cache(cache, k, v, md.slot_mapping,
                           k_scale=ks, v_scale=vs)
    out = attention(q, cache, md, 1.0 / np.sqrt(D),
                    k_scale=ks, v_scale=vs)

    # explicit dequant through a float cache
    rows = np.asarray(cache).astype(np.float32)
    rows[:, :K] *= np.asarray(ks)[None, :, None, None]
    rows[:, K:] *= np.asarray(vs)[None, :, None, None]
    fcache = jnp.zeros((nb + 2, 2 * K, bs, D), jnp.float32)
    fcache = fcache.at[:].set(rows)
    ref = attention(q, fcache, md, 1.0 / np.sqrt(D))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
