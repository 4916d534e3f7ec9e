"""Pooling (embedding/classify) path: runner pooler vs manual hidden-state
reference, engine end-to-end, and mixed generate+pool batches
(reference analog: tests/models/embedding + v1 pooling tests)."""

import numpy as np
import pytest

from tests.test_llm_engine import tiny_model_dir  # noqa: F401 fixture
from vllm_tpu.sampling_params import PoolingParams, SamplingParams


@pytest.fixture(scope="module")
def llm(tiny_model_dir):  # noqa: F811
    from vllm_tpu.entrypoints.llm import LLM

    return LLM(model=tiny_model_dir, dtype="float32", max_model_len=128,
               max_num_seqs=8, max_num_batched_tokens=256, block_size=16,
               num_gpu_blocks_override=64, enforce_eager=True)


def _manual_hidden(llm, token_ids):
    """Oracle: final hidden states via a direct model forward."""
    import jax
    import jax.numpy as jnp

    from vllm_tpu.ops.attention import AttentionMetadata
    from vllm_tpu.ops.pallas.ragged_paged_attention import \
        build_logical_blocks

    runner = llm.llm_engine.engine_core.executor.worker.runner
    model, params = runner.model, runner.params
    a = model.args
    T = len(token_ids)
    bs = 16
    qsl = np.array([0, T], np.int32)
    lb_seq, lb_q_start = build_logical_blocks(qsl, T, 1)
    nb = T // bs + 2
    bt = np.arange(1, nb + 1, dtype=np.int32)[None]
    pos = np.arange(T, dtype=np.int32)
    slots = (bt[0][pos // bs] * bs + pos % bs).astype(np.int32)
    md = AttentionMetadata(
        slot_mapping=jnp.asarray(slots),
        block_tables=jnp.asarray(bt),
        query_start_loc=jnp.asarray(qsl),
        seq_lens=jnp.asarray(np.array([T], np.int32)),
        positions=jnp.asarray(pos),
        lb_seq=jnp.asarray(lb_seq),
        lb_q_start=jnp.asarray(lb_q_start))
    kv = jnp.zeros((a.num_layers, nb + 2, 2 * a.num_kv_heads, bs,
                    a.head_dim), jnp.float32)
    hidden, _ = model.forward(params, jnp.asarray(token_ids, jnp.int32),
                              [kv], md)
    return np.asarray(hidden, np.float32)


def test_embed_last_pooling_matches_manual(llm):
    toks = [3, 17, 42, 8, 99]
    out = llm.encode({"prompt_token_ids": toks},
                     PoolingParams(pooling_type="last"))[0]
    vec = np.asarray(out.outputs.data)
    hidden = _manual_hidden(llm, toks)
    expect = hidden[-1]
    expect = expect / np.linalg.norm(expect)
    np.testing.assert_allclose(vec, expect, rtol=2e-4, atol=2e-5)
    assert abs(np.linalg.norm(vec) - 1.0) < 1e-5


def test_embed_mean_pooling_matches_manual(llm):
    toks = [5, 6, 7, 8, 9, 10, 11]
    out = llm.encode({"prompt_token_ids": toks},
                     PoolingParams(pooling_type="mean"))[0]
    vec = np.asarray(out.outputs.data)
    hidden = _manual_hidden(llm, toks)
    expect = hidden.mean(axis=0)
    expect = expect / np.linalg.norm(expect)
    np.testing.assert_allclose(vec, expect, rtol=2e-4, atol=2e-5)


def test_embed_dimensions_truncation(llm):
    toks = [1, 2, 3, 4]
    out = llm.encode({"prompt_token_ids": toks},
                     PoolingParams(dimensions=16))[0]
    vec = np.asarray(out.outputs.data)
    assert vec.shape == (16,)
    assert abs(np.linalg.norm(vec) - 1.0) < 1e-5


def test_mixed_generate_and_pool_batch(llm):
    """Pooling and generation requests coexist in one engine loop."""
    eng = llm.llm_engine
    sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)
    gen_prompt = {"prompt_token_ids": [9, 8, 7]}
    base = llm.generate(gen_prompt, sp)[0].outputs[0].token_ids

    eng.add_request("gen", gen_prompt, sp)
    eng.add_request("pool", {"prompt_token_ids": [3, 17, 42, 8, 99]},
                    PoolingParams())
    done = {}
    while eng.has_unfinished_requests():
        for out in eng.step():
            if out.finished:
                done[out.request_id] = out
    assert list(done["gen"].outputs[0].token_ids) == list(base)
    vec = np.asarray(done["pool"].outputs.data)
    single = llm.encode({"prompt_token_ids": [3, 17, 42, 8, 99]},
                        PoolingParams())[0]
    np.testing.assert_allclose(vec, np.asarray(single.outputs.data),
                               rtol=1e-5, atol=1e-6)


def test_pooling_prompt_budget_validation(tiny_model_dir):  # noqa: F811
    from vllm_tpu.entrypoints.llm import LLM

    small = LLM(model=tiny_model_dir, dtype="float32", max_model_len=128,
                max_num_seqs=4, max_num_batched_tokens=64, block_size=16,
                num_gpu_blocks_override=32, enforce_eager=True)
    with pytest.raises(ValueError, match="max_num_batched_tokens"):
        small.encode({"prompt_token_ids": [3] * 100}, PoolingParams())


def test_classify_softmax(llm):
    out = llm.classify({"prompt_token_ids": [4, 5, 6]})[0]
    vec = np.asarray(out.outputs.data)
    assert abs(vec.sum() - 1.0) < 1e-4
    assert (vec >= 0).all()
