"""GPTQ/AWQ checkpoint ingestion tests (reference analog:
tests/kernels/quantization/test_gptq.py, test_awq.py)."""

import json

import numpy as np
import pytest

import jax.numpy as jnp


def pack_nibbles_input_dim(codes: np.ndarray) -> np.ndarray:
    """[K, N] uint4 codes -> int32 [K/8, N] packed low-to-high (GPTQ)."""
    K, N = codes.shape
    c = codes.astype(np.uint32).reshape(K // 8, 8, N)
    shifts = (np.arange(8, dtype=np.uint32) * 4)[None, :, None]
    return np.sum(c << shifts, axis=1).astype(np.int32)


def pack_nibbles_output_awq(codes: np.ndarray) -> np.ndarray:
    """[K, N] uint4 -> int32 [K, N/8] with AWQ interleave order."""
    from vllm_tpu.models.quant_checkpoints import AWQ_ORDER

    K, N = codes.shape
    c = codes.astype(np.uint32).reshape(K, N // 8, 8)
    c = c[:, :, AWQ_ORDER]
    shifts = (np.arange(8, dtype=np.uint32) * 4)[None, None, :]
    return np.sum(c << shifts, axis=2).astype(np.int32)


def test_gptq_unpack_roundtrip():
    from vllm_tpu.models.quant_checkpoints import (dequant_reference,
                                                   unpack_gptq)

    rng = np.random.default_rng(0)
    K, N, group = 64, 32, 16
    G = K // group
    codes = rng.integers(0, 16, (K, N)).astype(np.uint8)
    zeros = rng.integers(0, 15, (G, N)).astype(np.uint8)
    scales = rng.uniform(0.01, 0.1, (G, N)).astype(np.float32)

    qweight = pack_nibbles_input_dim(codes)
    qzeros = pack_nibbles_input_dim(zeros.T).T if False else \
        pack_nibbles_output_gptq_zeros(zeros)
    unpacked = unpack_gptq(qweight, qzeros, scales, None)
    # dequant formula check: w = s * (q - (z + 1))
    w = dequant_reference(unpacked)
    expected = (codes.reshape(G, group, N).astype(np.float32) -
                (zeros.astype(np.float32) + 1.0)[:, None, :]) * \
        scales[:, None, :]
    np.testing.assert_allclose(w, expected.reshape(K, N), rtol=1e-6)


def pack_nibbles_output_gptq_zeros(zeros: np.ndarray) -> np.ndarray:
    """GPTQ qzeros: [G, N] -> int32 [G, N/8], packed along N low-to-high."""
    G, N = zeros.shape
    z = zeros.astype(np.uint32).reshape(G, N // 8, 8)
    shifts = (np.arange(8, dtype=np.uint32) * 4)[None, None, :]
    return np.sum(z << shifts, axis=2).astype(np.int32)


def test_awq_unpack_roundtrip():
    from vllm_tpu.models.quant_checkpoints import (dequant_reference,
                                                   unpack_awq)

    rng = np.random.default_rng(1)
    K, N, group = 32, 64, 16
    G = K // group
    codes = rng.integers(0, 16, (K, N)).astype(np.uint8)
    zeros = rng.integers(0, 16, (G, N)).astype(np.uint8)
    scales = rng.uniform(0.01, 0.1, (G, N)).astype(np.float32)

    unpacked = unpack_awq(
        pack_nibbles_output_awq(codes),
        pack_nibbles_output_awq(zeros),
        scales)
    w = dequant_reference(unpacked)
    expected = (codes.reshape(G, group, N).astype(np.float32) -
                zeros.astype(np.float32)[:, None, :]) * scales[:, None, :]
    np.testing.assert_allclose(w, expected.reshape(K, N), rtol=1e-6)


def make_gptq_checkpoint(tmp_path, act_order=False):
    """Quantize a tiny llama to GPTQ-format safetensors.  With
    ``act_order`` the channels quantize in a shuffled group order
    (desc_act=True) and the exact-dequant oracles are returned too."""
    import torch
    from safetensors.numpy import save_file
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256)
    hf = LlamaForCausalLM(cfg)
    hf.eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}

    group = 16
    out = {}
    oracles = {}
    rng_p = np.random.default_rng(7)
    for name, w in sd.items():
        if name.endswith("_proj.weight"):
            wt = w.T.astype(np.float32)  # [K, N]
            K, N = wt.shape
            G = K // group
            if act_order:
                perm = rng_p.permutation(K)
            else:
                perm = np.arange(K)
            g_idx = np.empty(K, np.int32)
            g_idx[perm] = (np.arange(K) // group).astype(np.int32)
            wg = wt[perm].reshape(G, group, N)
            wmax = wg.max(axis=1)
            wmin = wg.min(axis=1)
            scale = np.maximum((wmax - wmin) / 15.0, 1e-8)
            zero_f = np.round(-wmin / scale)  # 0..15
            zero = np.clip(zero_f, 0, 15).astype(np.uint8)
            codes_p = np.clip(np.round(wg / scale[:, None, :]) +
                              zero[:, None, :], 0, 15).astype(np.uint8)
            inv = np.empty(K, np.int64)
            inv[perm] = np.arange(K)
            codes = codes_p.reshape(K, N)[inv]  # natural channel order
            base = name[:-len(".weight")]
            dq = ((codes_p.astype(np.float32) -
                   zero[:, None, :].astype(np.float32)) *
                  scale[:, None, :]).reshape(K, N)[inv]
            oracles[base] = dq
            out[base + ".qweight"] = pack_nibbles_input_dim(codes)
            # GPTQ stores zeros - 1
            out[base + ".qzeros"] = pack_nibbles_output_gptq_zeros(
                np.maximum(zero.astype(np.int32) - 1, 0).astype(np.uint8))
            out[base + ".scales"] = scale.astype(np.float32)
            out[base + ".g_idx"] = g_idx
        else:
            out[name] = w

    d = tmp_path / "gptq_model"
    d.mkdir()
    # safetensors.numpy silently mis-serializes non-contiguous arrays
    # (writes the raw buffer ignoring strides) — force contiguity.
    out = {k: np.ascontiguousarray(v) for k, v in out.items()}
    save_file(out, str(d / "model.safetensors"))
    cfg_dict = cfg.to_dict()
    cfg_dict["quantization_config"] = {
        "quant_method": "gptq", "bits": 4, "group_size": group,
        "desc_act": act_order,
    }
    cfg_dict["architectures"] = ["LlamaForCausalLM"]
    (d / "config.json").write_text(json.dumps(cfg_dict))
    if act_order:
        return str(d), hf, group, oracles
    return str(d), hf, group


def test_gptq_checkpoint_end_to_end(tmp_path):
    """Load a GPTQ checkpoint through the real loader and check the
    dequantized linear output matches the quantized-torch oracle."""
    import torch

    from vllm_tpu.config import ModelConfig
    from vllm_tpu.models.registry import get_model
    from vllm_tpu.models.weight_utils import weights_iterator
    from vllm_tpu.ops.linear import linear

    model_dir, hf, group = make_gptq_checkpoint(tmp_path)
    mc = ModelConfig(model=model_dir, dtype="float32")
    model = get_model(mc)
    params = model.load_quantized_weights(weights_iterator(model_dir),
                                          "gptq")
    qkv = params["layers"]["qkv"]
    # 4-bit codes land packed two per byte (split-K-half layout)
    assert qkv["w_p"].dtype == np.int8
    assert qkv["w_p"].shape == (2, 32, (4 + 2 + 2) * 16)

    # Oracle: dequantize q_proj layer 0 from the torch weights with the
    # same quantization, and compare linear() output.
    w = hf.state_dict()["model.layers.0.self_attn.q_proj.weight"]
    wt = w.numpy().T.astype(np.float32)
    K, N = wt.shape
    G = K // group
    wg = wt.reshape(G, group, N)
    scale = np.maximum((wg.max(axis=1) - wg.min(axis=1)) / 15.0, 1e-8)
    zero = np.clip(np.round(-wg.min(axis=1) / scale), 0, 15)
    codes = np.clip(np.round(wg / scale[:, None, :]) + zero[:, None, :],
                    0, 15)
    wdq = ((codes - zero[:, None, :]) * scale[:, None, :]).reshape(K, N)

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, K)), jnp.float32)
    layer0 = {k: jnp.asarray(v[0]) for k, v in qkv.items()}
    got = np.asarray(linear(x, layer0))[:, :N]  # q slice of fused qkv
    expected = np.asarray(x) @ wdq
    np.testing.assert_allclose(got, expected, rtol=2e-3, atol=2e-3)


def test_gptq_act_order_requantize():
    """desc_act=True: unpack -> contiguous-group repack matches the exact
    g_idx dequant within the int4 re-grid error (reference analog:
    gptq_shuffle, vllm gptq.py:262)."""
    from vllm_tpu.models.quant_checkpoints import (dequant_reference,
                                                   requantize_act_order,
                                                   unpack_gptq)

    rng = np.random.default_rng(3)
    K, N, group = 64, 32, 16
    G = K // group
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.05
    # act-order grouping: channels quantized in a shuffled order
    perm = rng.permutation(K)
    g_idx = np.empty(K, np.int32)
    g_idx[perm] = np.arange(K) // group
    wp = w[perm]  # [K, N] rows grouped g_idx-contiguously
    wg = wp.reshape(G, group, N)
    scale = np.maximum((wg.max(axis=1) - wg.min(axis=1)) / 15.0, 1e-8)
    zero = np.clip(np.round(-wg.min(axis=1) / scale), 0, 15)
    codes_p = np.clip(np.round(wg / scale[:, None, :]) + zero[:, None, :],
                      0, 15).astype(np.uint8).reshape(K, N)
    inv = np.empty(K, np.int64)
    inv[perm] = np.arange(K)
    codes = codes_p[inv]  # natural channel order, as stored on disk

    qweight = pack_nibbles_input_dim(codes)
    qzeros = pack_nibbles_output_gptq_zeros(
        np.maximum(zero.astype(np.int32) - 1, 0).astype(np.uint8))
    unpacked = unpack_gptq(qweight, qzeros, scale.astype(np.float32),
                           g_idx)
    assert "perm" in unpacked
    exact = dequant_reference(unpacked)  # == the g_idx dequant of codes
    # sanity: the exact dequant reconstructs w within the int4 grid
    assert np.abs(exact - w).max() < scale.max()

    re = requantize_act_order(unpacked)
    assert "perm" not in re
    redq = dequant_reference(re)
    # re-grid error bounded by one requant step of the widest new group
    assert np.abs(redq - exact).max() <= scale.max() * 1.5
    # and the repacked tensor still approximates the float weights
    assert np.abs(redq - w).max() < scale.max() * 2.5


def test_gptq_act_order_checkpoint_end_to_end(tmp_path):
    """desc_act=True checkpoint through the real loader: the fused qkv
    linear output matches the exact g_idx dequant oracle."""
    import torch

    from vllm_tpu.config import ModelConfig
    from vllm_tpu.models.registry import get_model
    from vllm_tpu.models.weight_utils import weights_iterator
    from vllm_tpu.ops.linear import linear

    model_dir, hf, group, oracles = make_gptq_checkpoint(
        tmp_path, act_order=True)
    mc = ModelConfig(model=model_dir, dtype="float32")
    model = get_model(mc)
    params = model.load_quantized_weights(weights_iterator(model_dir),
                                          "gptq")
    qkv = params["layers"]["qkv"]
    assert "w_p" in qkv  # packed int4, no runtime permutation arrays

    wdq = oracles["model.layers.0.self_attn.q_proj"]  # exact dequant
    K, N = wdq.shape
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, K)), jnp.float32)
    layer0 = {k: jnp.asarray(v[0]) for k, v in qkv.items()}
    got = np.asarray(linear(x, layer0))[:, :N]
    expected = np.asarray(x) @ wdq
    # requant re-grid adds error on top of kernel tolerance
    err = np.abs(got - expected).max()
    ref_mag = np.abs(expected).max()
    assert err < 0.05 * ref_mag + 0.05, (err, ref_mag)
