"""KVSlabs: layer-slabbed KV cache must be numerically identical to the
single stacked allocation (ops/attention.KVSlabs — an experiment knob,
off by default; see the class docstring)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tests.test_model_vs_hf import build_metadata, tiny_llama_dir  # noqa: F401


def _build(tiny_llama_dir):
    from vllm_tpu.config import ModelConfig
    from vllm_tpu.models.registry import get_model
    from vllm_tpu.models.weight_utils import weights_iterator

    mc = ModelConfig(model=tiny_llama_dir, dtype="float32")
    model = get_model(mc)
    params = model.load_weights(weights_iterator(tiny_llama_dir))
    return model, params


def test_slabbed_forward_matches_stacked(tiny_llama_dir):  # noqa: F811
    from vllm_tpu.ops.attention import KVSlabs

    model, params = _build(tiny_llama_dir)
    a = model.args
    token_lists = [[1, 5, 9, 3, 7, 11, 2], [4, 8, 100, 42]]
    block_size = 4
    metadata, input_ids, _ = build_metadata(token_lists, block_size,
                                            max_blocks=8, total_pad=16,
                                            req_pad=4)

    shape = (a.num_layers, 32, 2 * a.num_kv_heads, block_size, a.head_dim)
    kv = jnp.zeros(shape, jnp.float32)
    hidden_ref, (kv_ref,) = model.forward(params, input_ids, [kv], metadata)

    # one slab per layer (maximally split)
    slabs = KVSlabs([jnp.zeros((1,) + shape[1:], jnp.float32)
                     for _ in range(a.num_layers)])
    hidden_s, (kv_s,) = model.forward(params, input_ids, [slabs], metadata)

    np.testing.assert_allclose(np.asarray(hidden_s), np.asarray(hidden_ref),
                               rtol=1e-6, atol=1e-6)
    assert isinstance(kv_s, KVSlabs)
    stacked = np.concatenate([np.asarray(s) for s in kv_s.slabs])
    np.testing.assert_allclose(stacked, np.asarray(kv_ref), rtol=1e-6,
                               atol=1e-6)


def test_slab_decode_matches_prefill(tiny_llama_dir):  # noqa: F811
    """Incremental decode against a slabbed cache == full prefill."""
    from vllm_tpu.ops.attention import KVSlabs

    model, params = _build(tiny_llama_dir)
    a = model.args
    toks = [1, 5, 9, 3, 7, 11, 2, 6]
    block_size = 4
    shape = (1, 16, 2 * a.num_kv_heads, block_size, a.head_dim)

    metadata, input_ids, _ = build_metadata([toks], block_size, 8, 8, 1)
    slabs = KVSlabs([jnp.zeros(shape, jnp.float32)
                     for _ in range(a.num_layers)])
    hidden_full, _ = model.forward(params, input_ids, [slabs], metadata)
    logits_full = np.asarray(
        model.compute_logits(params, hidden_full))[len(toks) - 1]

    metadata7, input7, _ = build_metadata([toks[:7]], block_size, 8, 8, 1)
    slabs = KVSlabs([jnp.zeros(shape, jnp.float32)
                     for _ in range(a.num_layers)])
    _, (slabs,) = model.forward(params, input7, [slabs], metadata7)

    # the decode token's slot continues the same block table
    from vllm_tpu.ops.attention import AttentionMetadata

    metadata1 = AttentionMetadata(
        slot_mapping=jnp.asarray([2 * block_size + 3], jnp.int32),
        block_tables=metadata7.block_tables,
        query_start_loc=jnp.asarray([0, 1], jnp.int32),
        seq_lens=jnp.asarray([8], jnp.int32),
        positions=jnp.asarray([7], jnp.int32),
    )
    hidden_dec, _ = model.forward(params, jnp.asarray([toks[7]], jnp.int32),
                                  [slabs], metadata1)
    logits_dec = np.asarray(model.compute_logits(params, hidden_dec))[0]
    np.testing.assert_allclose(logits_dec, logits_full, rtol=1e-5,
                               atol=1e-5)


def test_kv_slab_plan(monkeypatch):
    """Slab plan: multiples of the layer pattern, under the size cap
    (the knob is off by default, so force a cap for the test)."""
    from transformers import LlamaConfig

    from vllm_tpu.config import ModelConfig
    from vllm_tpu.models.llama import LlamaForCausalLM

    monkeypatch.setenv("VLLM_TPU_KV_SLAB_MB", "512")
    hf = LlamaConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                     num_hidden_layers=8, num_attention_heads=4,
                     num_key_value_heads=2)
    model = LlamaForCausalLM(ModelConfig(model="x", dtype="float32",
                                         hf_config=hf))
    mb = 2**20
    # 3 layers fit per slab -> [3, 3, 2]
    assert model.kv_slab_plan(8, 160 * mb) == [3, 3, 2]
    # everything fits in one slab -> no slabbing
    assert model.kv_slab_plan(8, 8 * mb) is None
    # a layer larger than the cap still gets its own slab
    assert model.kv_slab_plan(4, 900 * mb) == [1, 1, 1, 1]
    # pp>1: disabled (pipeline stages slice the stacked cache)
    model.pp_size = 2
    assert model.kv_slab_plan(8, 160 * mb) is None


def test_engine_e2e_with_slabs(tiny_llama_dir, monkeypatch):  # noqa: F811
    """LLMEngine with VLLM_TPU_KV_SLAB_MB forced tiny: outputs must be
    identical to the unslabbed engine."""
    monkeypatch.setenv("VLLM_TPU_KV_SLAB_MB", "0")
    ref = _engine_generate(tiny_llama_dir)
    # tiny cap -> one layer per slab
    monkeypatch.setenv("VLLM_TPU_KV_SLAB_MB", "1")
    slab = _engine_generate(tiny_llama_dir, expect_slabs=True)
    assert ref == slab


def _engine_generate(model_dir, expect_slabs=False):
    from vllm_tpu.engine.args import EngineArgs
    from vllm_tpu.engine.llm_engine import LLMEngine
    from vllm_tpu.ops.attention import KVSlabs
    from vllm_tpu.sampling_params import SamplingParams

    engine_args = EngineArgs(
        model=model_dir, dtype="float32", load_format="auto",
        skip_tokenizer_init=True, max_model_len=64, max_num_seqs=4,
        max_num_batched_tokens=64, block_size=4,
        gpu_memory_utilization=0.02, enforce_eager=True)
    engine = LLMEngine(engine_args.create_engine_config())
    kv_caches = engine.engine_core.executor.worker.runner.kv_caches
    if expect_slabs:
        assert any(isinstance(c, KVSlabs) for c in kv_caches), \
            "slab cap should have produced a slabbed cache"
        assert all(s.shape[0] == 1 for c in kv_caches
                   if isinstance(c, KVSlabs) for s in c.slabs)
    params = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    for i, prompt in enumerate([[1, 5, 9, 3], [4, 8, 100, 42, 7]]):
        engine.add_request(str(i), {"prompt_token_ids": prompt}, params)
    results = {}
    while engine.has_unfinished_requests():
        for out in engine.step():
            if out.finished:
                results[out.request_id] = tuple(
                    out.outputs[0].token_ids)
    return results
