"""EPLB: placement algorithm invariants + redundancy-aware routing
equivalence (reference analog: tests/distributed/test_eplb_algo.py,
test_eplb_execute.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_tpu.distributed.eplb import (EplbConfig, EplbState,
                                       balanced_packing,
                                       expand_to_physical, map_to_physical,
                                       permute_expert_weights,
                                       rebalance_experts,
                                       replicate_experts)


def test_balanced_packing_exact_fill():
    rng = np.random.default_rng(0)
    w = rng.random((3, 12))
    pack, rank = balanced_packing(w, 4)
    for layer in range(3):
        counts = np.bincount(pack[layer], minlength=4)
        assert (counts == 3).all()
        for p in range(4):
            ranks = sorted(rank[layer][pack[layer] == p])
            assert ranks == [0, 1, 2]
    # greedy bound: max pack load <= avg + max item weight
    loads = np.zeros((3, 4))
    for layer in range(3):
        np.add.at(loads[layer], pack[layer], w[layer])
    assert (loads.max(-1) <= w.sum(-1) / 4 + w.max(-1) + 1e-12).all()


def test_replicate_experts_targets_heaviest():
    w = np.array([[8.0, 1.0, 1.0, 1.0]])
    phy2log, phy_rank, logcnt = replicate_experts(w, 7)
    assert logcnt[0, 0] == 4  # all 3 extra replicas go to expert 0
    assert sorted(phy2log[0, 4:]) == [0, 0, 0]
    assert (phy_rank[0, :4] == 0).all()


def test_rebalance_experts_mappings_consistent():
    rng = np.random.default_rng(1)
    L, E, P = 2, 8, 12
    w = rng.random((L, E)) * 100
    phy2log, log2phy, logcnt = rebalance_experts(w, P, num_groups=4,
                                                 num_nodes=2, num_ranks=4)
    assert phy2log.shape == (L, P)
    assert logcnt.sum(-1).tolist() == [P, P]
    # every logical expert has >= 1 replica and mappings invert
    for layer in range(L):
        assert set(phy2log[layer]) == set(range(E))
        for e in range(E):
            slots = [s for s in log2phy[layer, e] if s >= 0]
            assert len(slots) == logcnt[layer, e]
            assert all(phy2log[layer, s] == e for s in slots)
    # balance: per-rank replica-weighted load near uniform
    per_slot = np.take_along_axis(w / logcnt, phy2log, axis=1)
    per_rank = per_slot.reshape(L, 4, -1).sum(-1)
    assert (per_rank.max(-1) <= per_rank.sum(-1) * 0.5).all()


def test_rebalance_hierarchical_keeps_groups_on_nodes():
    rng = np.random.default_rng(2)
    L, E = 1, 8
    w = rng.random((L, E))
    phy2log, _, _ = rebalance_experts(w, 8, num_groups=4, num_nodes=2,
                                      num_ranks=4)
    group_of = np.arange(E) // 2
    # each node's slots hold complete groups
    for node in range(2):
        slots = phy2log[0, node * 4:(node + 1) * 4]
        gs = group_of[slots]
        for g in set(gs):
            assert (gs == g).sum() == 2


def test_eplb_state_lifecycle_and_permutation():
    state = EplbState(num_layers=2, num_logical=4,
                      config=EplbConfig(window_size=16, step_interval=4,
                                        num_redundant_experts=4),
                      num_ranks=4)
    assert state.num_physical == 8
    skew = np.array([[100.0, 1, 1, 1], [1, 1, 1, 100.0]])
    for _ in range(4):
        state.record_load(skew)
    assert state.should_rearrange()
    before = state.balancedness()
    perm = state.rearrange()
    assert perm.shape == (2, 8)
    # layer 0's hot expert 0 gets the extra replicas
    assert state.logcnt[0, 0] > 1
    assert state.logcnt[1, 3] > 1
    for _ in range(4):
        state.record_load(skew)
    assert state.balancedness() > before
    # perm rows reference valid old slots holding the right expert
    stacks = {"w": jnp.arange(2 * 8, dtype=jnp.float32).reshape(2, 8, 1, 1)}
    out = permute_expert_weights(stacks, perm)
    assert out["w"].shape == (2, 8, 1, 1)


def test_physical_routing_matches_logical_moe():
    """Replicated experts + permuted weights give bit-identical MoE
    output to the unreplicated logical MoE."""
    from vllm_tpu.ops.moe import fused_moe, topk_routing

    rng = np.random.default_rng(3)
    T, H, I, E, K = 16, 32, 64, 4, 2
    x = jnp.asarray(rng.standard_normal((T, H)), jnp.float32)
    w_gu = jnp.asarray(rng.standard_normal((E, H, 2 * I)) * 0.1,
                       jnp.float32)
    w_d = jnp.asarray(rng.standard_normal((E, I, H)) * 0.1, jnp.float32)
    router = jnp.asarray(rng.standard_normal((T, E)), jnp.float32)
    weights, ids = topk_routing(router, K)
    ref = fused_moe(x, w_gu, w_d, weights, ids)

    state = EplbState(num_layers=1, num_logical=E,
                      config=EplbConfig(step_interval=1,
                                        num_redundant_experts=4),
                      num_ranks=2)
    phys_stacks = expand_to_physical({"gu": w_gu[None], "d": w_d[None]},
                                     state.phy2log)
    state.record_load(np.array([[50.0, 30, 10, 10]]))
    perm = state.rearrange()
    phys_stacks = permute_expert_weights(phys_stacks, perm)
    l2p, logcnt = state.physical_routing_tables()
    phys_ids = map_to_physical(ids, jnp.arange(T, dtype=jnp.int32),
                               jnp.asarray(l2p), jnp.asarray(logcnt),
                               layer=0)
    # replicas actually used: hot expert 0 must appear at >1 slot
    assert len(set(np.asarray(phys_ids)[np.asarray(ids) == 0])) > 1
    out = fused_moe(x, phys_stacks["gu"][0], phys_stacks["d"][0], weights,
                    phys_ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_physical_routing_ep_sharded():
    """Same equivalence under real EP sharding on the 8-device mesh."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vllm_tpu.ops.moe import fused_moe, fused_moe_ep, topk_routing
    from vllm_tpu.parallel.mesh import EP_AXES, make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(tensor_parallel_size=4, data_parallel_size=2)

    rng = np.random.default_rng(4)
    T, H, I, E, K = 16, 32, 64, 8, 2
    x = jnp.asarray(rng.standard_normal((T, H)), jnp.float32)
    w_gu = jnp.asarray(rng.standard_normal((E, H, 2 * I)) * 0.1,
                       jnp.float32)
    w_d = jnp.asarray(rng.standard_normal((E, I, H)) * 0.1, jnp.float32)
    router = jnp.asarray(rng.standard_normal((T, E)), jnp.float32)
    weights, ids = topk_routing(router, K)
    ref = fused_moe(x, w_gu, w_d, weights, ids)

    state = EplbState(num_layers=1, num_logical=E,
                      config=EplbConfig(step_interval=1,
                                        num_redundant_experts=8),
                      num_ranks=8)
    stacks = expand_to_physical({"gu": w_gu[None], "d": w_d[None]},
                                state.phy2log)
    state.record_load(rng.random((1, E)) * 100)
    perm = state.rearrange()
    stacks = permute_expert_weights(stacks, perm)
    l2p, logcnt = state.physical_routing_tables()
    phys_ids = map_to_physical(ids, jnp.arange(T, dtype=jnp.int32),
                               jnp.asarray(l2p), jnp.asarray(logcnt),
                               layer=0)
    spec = NamedSharding(mesh, P(EP_AXES))
    gu_s = jax.device_put(stacks["gu"][0], spec)
    d_s = jax.device_put(stacks["d"][0], spec)
    out = jax.jit(lambda *a: fused_moe_ep(*a, mesh=mesh))(
        x, gu_s, d_s, weights, phys_ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------- serving


@pytest.fixture(scope="module")
def tiny_moe_dir(tmp_path_factory):
    import torch
    from transformers import MixtralConfig, MixtralForCausalLM

    torch.manual_seed(0)
    cfg = MixtralConfig(vocab_size=256, hidden_size=64,
                        intermediate_size=96, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=2,
                        num_local_experts=8, num_experts_per_tok=2,
                        max_position_embeddings=256)
    m = MixtralForCausalLM(cfg)
    m.eval()
    d = tmp_path_factory.mktemp("tiny_moe_eplb")
    m.save_pretrained(d, safe_serialization=True)
    return str(d)


def _gen_moe(model_dir, prompts, **kw):
    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import SamplingParams

    llm = LLM(model=model_dir, dtype="float32", max_model_len=128,
              max_num_seqs=8, max_num_batched_tokens=256, block_size=16,
              num_gpu_blocks_override=64, enforce_eager=True,
              skip_tokenizer_init=True, **kw)
    outs = llm.generate(
        [{"prompt_token_ids": p} for p in prompts],
        SamplingParams(temperature=0.0, max_tokens=16, ignore_eos=True))
    toks = [o.outputs[0].token_ids for o in outs]
    runner = llm.llm_engine.engine_core.executor.worker.runner
    state = runner.eplb_state
    llm.llm_engine.shutdown()
    return toks, state


def test_eplb_serving_rearranges_and_keeps_numerics(tiny_moe_dir):
    """End-to-end EPLB (reference: eplb_state.py wired into the MoE
    layer + runner): redundant physical experts, in-graph load stats,
    and a mid-generation rearrangement must leave greedy decoding
    bit-identical — replicas hold identical weights and the routing
    tables move with them."""
    prompts = [[7, 11, 13, 17, 19], [3, 5], [23, 29, 31, 37]]
    base, state0 = _gen_moe(tiny_moe_dir, prompts)
    assert state0 is None
    toks, state = _gen_moe(tiny_moe_dir, prompts, enable_eplb=True,
                           eplb_num_redundant_experts=2,
                           eplb_window_size=4, eplb_step_interval=3)
    assert toks == base
    assert state is not None
    assert state.num_physical == 10
    assert state.num_rearrangements >= 2
    # load stats were really recorded (every MoE layer routed tokens)
    assert state.window_load().sum() > 0


def test_eplb_serving_no_redundancy_identity(tiny_moe_dir):
    """num_redundant_experts=0: pure load-stat tracking + rearrangement
    of the identity-width tables must also hold numerics."""
    prompts = [[2, 4, 6, 8]]
    base, _ = _gen_moe(tiny_moe_dir, prompts)
    toks, state = _gen_moe(tiny_moe_dir, prompts, enable_eplb=True,
                           eplb_window_size=4, eplb_step_interval=5)
    assert toks == base
    assert state.num_rearrangements >= 1
