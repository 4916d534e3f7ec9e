"""EAGLE speculative decoding end-to-end
(reference analog: tests/v1/e2e/test_spec_decode.py eagle cases).

The rejection scheme emits exact target samples, so greedy generation
WITH an EAGLE draft — even a random one — must equal plain greedy."""

import json

import numpy as np
import pytest

from tests.test_llm_engine import tiny_model_dir  # noqa: F401 fixture


@pytest.fixture(scope="module")
def eagle_draft_dir(tmp_path_factory, tiny_model_dir):  # noqa: F811
    """Synthetic EAGLE draft checkpoint matching the tiny target dims."""
    from safetensors.numpy import save_file

    d = tmp_path_factory.mktemp("eagle_draft")
    with open(f"{tiny_model_dir}/config.json") as f:
        target_cfg = json.load(f)
    H = target_cfg["hidden_size"]
    I = target_cfg["intermediate_size"]
    nq = target_cfg["num_attention_heads"]
    nk = target_cfg.get("num_key_value_heads", nq)
    hd = H // nq
    cfg = dict(target_cfg)
    cfg["num_hidden_layers"] = 1
    with open(d / "config.json", "w") as f:
        json.dump(cfg, f)

    rng = np.random.default_rng(42)

    def w(*shape, scale=0.2):
        return (rng.standard_normal(shape).astype(np.float32) *
                scale / np.sqrt(shape[-1]))

    tensors = {
        "fc.weight": w(H, 2 * H),
        "layers.0.self_attn.q_proj.weight": w(nq * hd, H),
        "layers.0.self_attn.k_proj.weight": w(nk * hd, H),
        "layers.0.self_attn.v_proj.weight": w(nk * hd, H),
        "layers.0.self_attn.o_proj.weight": w(H, nq * hd),
        "layers.0.mlp.gate_proj.weight": w(I, H),
        "layers.0.mlp.up_proj.weight": w(I, H),
        "layers.0.mlp.down_proj.weight": w(H, I),
        "layers.0.post_attention_layernorm.weight":
            np.ones(H, np.float32),
    }
    save_file(tensors, str(d / "model.safetensors"))
    return str(d)


def _make_llm(model_dir, eagle_dir=None, k=3):
    from vllm_tpu.entrypoints.llm import LLM

    kwargs = {}
    if eagle_dir is not None:
        kwargs.update(speculative_method="eagle",
                      num_speculative_tokens=k,
                      speculative_model=eagle_dir)
    return LLM(model=model_dir, dtype="float32", max_model_len=128,
               max_num_seqs=8, max_num_batched_tokens=256, block_size=16,
               num_gpu_blocks_override=64, enforce_eager=True, **kwargs)


def test_eagle_greedy_equals_plain_greedy(tiny_model_dir,  # noqa: F811
                                          eagle_draft_dir):
    from vllm_tpu.sampling_params import SamplingParams

    prompts = [
        "the quick brown fox",
        "one two three four five",
        "to be or not",
    ]
    params = SamplingParams(temperature=0.0, max_tokens=24,
                            ignore_eos=True)

    plain = _make_llm(tiny_model_dir)
    base = [o.outputs[0].token_ids for o in plain.generate(prompts, params)]
    del plain

    spec = _make_llm(tiny_model_dir, eagle_draft_dir)
    got = [o.outputs[0].token_ids for o in spec.generate(prompts, params)]
    for g, b in zip(got, base):
        assert list(g) == list(b), f"eagle changed greedy output\n{g}\n{b}"


def test_eagle_proposer_shapes(tiny_model_dir, eagle_draft_dir):  # noqa: F811
    """Direct unit check of the propose() contract on tiny shapes."""
    import jax.numpy as jnp

    from vllm_tpu.config import CacheConfig, ModelConfig, SpeculativeConfig
    from vllm_tpu.models.llama import LlamaForCausalLM
    from vllm_tpu.ops.attention import AttentionMetadata
    from vllm_tpu.ops.pallas.ragged_paged_attention import \
        build_logical_blocks
    from vllm_tpu.spec_decode.eagle import EagleProposer

    mc = ModelConfig(model=tiny_model_dir, dtype="float32")
    model = LlamaForCausalLM(mc)
    params = model.init_dummy_params(0)
    import jax

    params = jax.tree.map(jnp.asarray, params)
    spec_cfg = SpeculativeConfig(method="eagle", num_speculative_tokens=3,
                                 model=eagle_draft_dir)
    cache_cfg = CacheConfig(block_size=16)
    eagle = EagleProposer(model, spec_cfg, cache_cfg)
    dp = eagle.load_weights(jnp.float32)

    a = model.args
    T, R, bs, nb = 8, 2, 16, 8
    qsl = np.array([0, 4, 8], np.int32)
    lb_seq, lb_q_start = build_logical_blocks(qsl, T, R)
    bt = np.zeros((R, 4), np.int32)
    bt[0, 0], bt[1, 0] = 1, 2
    pos = np.array([0, 1, 2, 3, 0, 1, 2, 3], np.int32)
    slots = np.concatenate([bs * 1 + np.arange(4), bs * 2 + np.arange(4)])
    md = AttentionMetadata(
        slot_mapping=jnp.asarray(slots.astype(np.int32)),
        block_tables=jnp.asarray(bt),
        query_start_loc=jnp.asarray(qsl),
        seq_lens=jnp.asarray(np.array([4, 4], np.int32)),
        positions=jnp.asarray(pos),
        lb_seq=jnp.asarray(lb_seq),
        lb_q_start=jnp.asarray(lb_q_start))

    kv = jnp.zeros((a.num_layers, nb, 2 * a.num_kv_heads, bs, a.head_dim),
                   jnp.float32)
    draft_kv = jnp.zeros(
        (1, nb, 2 * eagle.num_kv_heads, bs, eagle.head_dim), jnp.float32)
    ids = jnp.asarray(np.arange(T, dtype=np.int32) + 3)
    hidden, _ = model.forward(params, ids, [kv], md)

    emitted = jnp.asarray(np.array([[7, 0, 0, 0], [9, 0, 0, 0]], np.int32))
    num_emitted = jnp.asarray(np.array([1, 1], np.int32))
    num_drafts = jnp.asarray(np.zeros(2, np.int32))

    drafts, new_kv = jax.jit(
        lambda *args: eagle.propose(*args, max_model_len=64))(
            dp, params, draft_kv, ids, hidden, md, emitted, num_emitted,
            num_drafts)
    assert drafts.shape == (R, 3)
    assert new_kv.shape == draft_kv.shape
    # catch-up + loop wrote draft KV in the requests' blocks
    assert np.any(np.asarray(new_kv)[0, 1] != 0)
    assert np.any(np.asarray(new_kv)[0, 2] != 0)
