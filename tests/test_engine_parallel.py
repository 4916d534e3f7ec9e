"""End-to-end LLMEngine tests on the 8-device CPU mesh: TP / PP / EP go
through EngineArgs + Worker + mesh, not bare model.forward
(reference analog: tests/distributed/test_pipeline_parallel.py,
tests/v1/test_async_llm_dp.py)."""

import pytest

from tests.utils import build_tiny_llama

PROMPTS = [
    "the quick brown fox",
    "hello world this is",
    "one two three four five",
]


@pytest.fixture(scope="module")
def tiny_model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_par")
    return build_tiny_llama(str(d))


def _generate(model_dir: str, max_tokens: int = 8, **engine_kwargs):
    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import SamplingParams

    llm = LLM(
        model=model_dir,
        dtype="float32",
        max_model_len=128,
        max_num_seqs=8,
        max_num_batched_tokens=256,
        block_size=16,
        num_gpu_blocks_override=64,
        enforce_eager=True,
        **engine_kwargs,
    )
    outs = llm.generate(
        PROMPTS,
        SamplingParams(temperature=0.0, max_tokens=max_tokens,
                       ignore_eos=True))
    tokens = [o.outputs[0].token_ids for o in outs]
    llm.llm_engine.shutdown()
    return tokens


@pytest.fixture(scope="module")
def baseline_tokens(tiny_model_dir):
    return _generate(tiny_model_dir)


def test_engine_tp4_matches_single_device(tiny_model_dir, baseline_tokens):
    tp = _generate(tiny_model_dir, tensor_parallel_size=4)
    assert tp == baseline_tokens


def test_engine_pp2_matches_single_device(tiny_model_dir, baseline_tokens):
    pp = _generate(tiny_model_dir, pipeline_parallel_size=2)
    assert pp == baseline_tokens


def test_engine_tp2_pp2_matches_single_device(tiny_model_dir,
                                              baseline_tokens):
    both = _generate(tiny_model_dir, tensor_parallel_size=2,
                     pipeline_parallel_size=2)
    assert both == baseline_tokens


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
    d = tmp_path_factory.mktemp("tiny_moe")
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
        SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True))
    toks = [o.outputs[0].token_ids for o in outs]
    llm.llm_engine.shutdown()
    return toks


def test_engine_dp2_tp2_ep_moe_uneven_batch(tiny_moe_dir):
    """DP x TP mesh with expert parallelism over (dp, tp): a single
    request (so one dp shard's worth of batch is idle) must neither
    deadlock nor change numerics. In this engine's single-controller
    SPMD design every step is ONE jit spanning all mesh devices, so the
    MoE collectives are in lockstep by construction — the reference
    needs DPCoordinator wave counting + dummy batches for this
    (gpu_model_runner.py:1346, coordinator.py:21)."""
    prompts = [[7, 11, 13, 17, 19]]
    base = _gen_moe(tiny_moe_dir, prompts)
    dp = _gen_moe(tiny_moe_dir, prompts, data_parallel_size=2,
                  tensor_parallel_size=2, enable_expert_parallel=True)
    assert dp == base

    # uneven multi-request batch
    prompts3 = [[7, 11, 13, 17, 19], [3, 5], [23, 29, 31]]
    base3 = _gen_moe(tiny_moe_dir, prompts3)
    dp3 = _gen_moe(tiny_moe_dir, prompts3, data_parallel_size=2,
                   tensor_parallel_size=2, enable_expert_parallel=True)
    assert dp3 == base3
