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
