"""Multi-device parallelism tests on the 8-way virtual CPU mesh
(reference analog: tests/distributed/ — but TPU-native: mesh +
PartitionSpecs instead of process groups; SURVEY.md §4 layer 5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from vllm_tpu.ops.attention import AttentionMetadata
from vllm_tpu.parallel.mesh import (EP_AXES, kv_cache_sharding, make_mesh,
                                    param_shardings)


def _tiny_llama(layers=4):
    from transformers import LlamaConfig

    from vllm_tpu.config import ModelConfig
    from vllm_tpu.models.llama import LlamaForCausalLM

    hf = LlamaConfig(vocab_size=256, hidden_size=64, intermediate_size=128,
                     num_hidden_layers=layers, num_attention_heads=4,
                     num_key_value_heads=4, head_dim=16,
                     max_position_embeddings=128)
    mc = ModelConfig(model="tiny", dtype="float32", hf_config=hf)
    return LlamaForCausalLM(mc)


def _inputs(T=16, R=2, bs=8):
    per = T // R
    qsl = np.arange(R + 1, dtype=np.int32) * per
    pos = np.concatenate([np.arange(per, dtype=np.int32)] * R)
    slots = np.concatenate([
        (1 + r * 2) * bs + np.arange(per, dtype=np.int32) for r in range(R)
    ]).astype(np.int32)
    bt = np.zeros((R, 4), np.int32)
    for r in range(R):
        bt[r, 0], bt[r, 1] = 1 + r * 2, 2 + r * 2
    md = AttentionMetadata(
        slot_mapping=jnp.asarray(slots),
        block_tables=jnp.asarray(bt),
        query_start_loc=jnp.asarray(qsl),
        seq_lens=jnp.asarray(np.full(R, per, np.int32)),
        positions=jnp.asarray(pos))
    ids = jnp.asarray(np.arange(T) % 256, dtype=jnp.int32)
    return md, ids


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_tp_forward_matches_single_device():
    model = _tiny_llama()
    params = jax.tree.map(jnp.asarray, model.init_dummy_params(0))
    md, ids = _inputs()
    kv = jnp.zeros((4, 8, 8, 8, 16), jnp.float32)
    h0, kv0 = model.forward(params, ids, [kv], md)

    mesh = make_mesh(tensor_parallel_size=4, data_parallel_size=2)
    sh = param_shardings(params, mesh)
    params_s = jax.tree.map(lambda x, s: jax.device_put(x, s), params, sh)
    kv_s = jax.device_put(kv, kv_cache_sharding(mesh))
    h1, kv1 = jax.jit(
        lambda p, kv, i, m: model.forward(p, i, [kv], m))(params_s, kv_s,
                                                          ids, md)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h0), rtol=2e-4,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(kv1[0]), np.asarray(kv0[0]),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.parametrize("pp,tp", [(2, 4), (4, 2), (2, 1)])
def test_pipeline_forward_matches_single_device(pp, tp):
    model = _tiny_llama(layers=4)
    params = jax.tree.map(jnp.asarray, model.init_dummy_params(0))
    md, ids = _inputs()
    kv = jnp.zeros((4, 8, 8, 8, 16), jnp.float32)
    h0, kv0 = model.forward(params, ids, [kv], md)

    mesh = make_mesh(tensor_parallel_size=tp, pipeline_parallel_size=pp)
    sh = param_shardings(params, mesh)
    params_s = jax.tree.map(lambda x, s: jax.device_put(x, s), params, sh)
    kv_s = jax.device_put(kv, kv_cache_sharding(mesh))
    model.mesh = mesh
    model.pp_size = pp
    try:
        h1, kv1 = jax.jit(
            lambda p, kv, i, m: model.forward(p, i, [kv], m))(
                params_s, kv_s, ids, md)
        np.testing.assert_allclose(np.asarray(h1), np.asarray(h0),
                                   rtol=2e-4, atol=2e-5)
        # block 0 is the null block: the pp ring's non-live iterations
        # park their writes there by design — exclude it
        np.testing.assert_allclose(np.asarray(kv1[0])[:, 1:],
                                   np.asarray(kv0[0])[:, 1:],
                                   rtol=2e-4, atol=2e-5)
    finally:
        model.mesh = None
        model.pp_size = 1


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_pipeline_with_lora_matches():
    """PP ring + per-token LoRA combined."""
    model = _tiny_llama(layers=4)
    params = jax.tree.map(jnp.asarray, model.init_dummy_params(0))
    md, ids = _inputs()
    kv = jnp.zeros((4, 8, 8, 8, 16), jnp.float32)

    rng = np.random.default_rng(0)
    S, R_ = 2, 8
    lora_params = {
        "qkv": {"a": jnp.asarray(rng.normal(size=(4, S, 64, 3 * R_))
                                 .astype(np.float32) * 0.02),
                "b": jnp.asarray(rng.normal(size=(4, S, 3 * R_, 3 * 64))
                                 .astype(np.float32) * 0.02)},
    }
    token_lora = jnp.asarray((np.arange(16) % (S + 1)).astype(np.int32))
    lora = (lora_params, token_lora)

    h0, _ = model.forward(params, ids, [kv], md, lora=lora)

    mesh = make_mesh(tensor_parallel_size=4, pipeline_parallel_size=2)
    sh = param_shardings(params, mesh)
    params_s = jax.tree.map(lambda x, s: jax.device_put(x, s), params, sh)
    kv_s = jax.device_put(kv, kv_cache_sharding(mesh))
    model.mesh = mesh
    model.pp_size = 2
    try:
        h1, _ = jax.jit(
            lambda p, kv, i, m, lo: model.forward(p, i, [kv], m, lora=lo))(
                params_s, kv_s, ids, md, lora)
        np.testing.assert_allclose(np.asarray(h1), np.asarray(h0),
                                   rtol=2e-4, atol=2e-5)
    finally:
        model.mesh = None
        model.pp_size = 1


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_expert_parallel_moe_matches():
    from vllm_tpu.ops.moe import fused_moe, fused_moe_ep, topk_routing

    rng = np.random.default_rng(0)
    T, H, I, E, K = 12, 32, 64, 8, 2
    x = jnp.asarray(rng.normal(size=(T, H)).astype(np.float32))
    wg = jnp.asarray(rng.normal(size=(E, H, 2 * I)).astype(np.float32)
                     * 0.1)
    wd = jnp.asarray(rng.normal(size=(E, I, H)).astype(np.float32) * 0.1)
    w, ids = topk_routing(
        jnp.asarray(rng.normal(size=(T, E)).astype(np.float32)), K)
    base = fused_moe(x, wg, wd, w, ids)

    mesh = make_mesh(tensor_parallel_size=2, data_parallel_size=2,
                     pipeline_parallel_size=2)
    wg_s = jax.device_put(wg, NamedSharding(mesh, P(EP_AXES)))
    wd_s = jax.device_put(wd, NamedSharding(mesh, P(EP_AXES)))
    out = jax.jit(lambda *a: fused_moe_ep(*a, mesh=mesh))(x, wg_s, wd_s,
                                                          w, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_dryrun_multichip_contract():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
