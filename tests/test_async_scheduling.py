"""Async scheduling (one-step-lagged sampling): greedy output must be
IDENTICAL to the synchronous engine — placeholders substitute exactly
the previous step's samples (reference analog: vllm --async-scheduling
tests)."""

import numpy as np
import pytest

from tests.test_llm_engine import tiny_model_dir  # noqa: F401 fixture
from vllm_tpu.sampling_params import SamplingParams


def _mk(model_dir, **kw):
    from vllm_tpu.entrypoints.llm import LLM

    return LLM(model=model_dir, dtype="float32", max_model_len=128,
               max_num_seqs=8, max_num_batched_tokens=256, block_size=16,
               num_gpu_blocks_override=64, enforce_eager=True, **kw)


def test_async_greedy_equals_sync(tiny_model_dir):  # noqa: F811
    prompts = [
        "the quick brown fox",
        "one two three four five six",
        "to be or not",
    ]
    sp = SamplingParams(temperature=0.0, max_tokens=20, ignore_eos=True)
    sync = _mk(tiny_model_dir)
    base = [o.outputs[0].token_ids for o in sync.generate(prompts, sp)]
    del sync

    a = _mk(tiny_model_dir, async_scheduling=True)
    got = [o.outputs[0].token_ids for o in a.generate(prompts, sp)]
    for g, b in zip(got, base):
        assert list(g) == list(b), (g, b)

    # second wave through the same async engine (steady-state reuse)
    got2 = [o.outputs[0].token_ids for o in a.generate(prompts, sp)]
    for g, b in zip(got2, base):
        assert list(g) == list(b)


def test_async_seeded_sampling_deterministic(tiny_model_dir):  # noqa: F811
    a = _mk(tiny_model_dir, async_scheduling=True)
    sp = SamplingParams(temperature=0.8, seed=1234, max_tokens=12,
                        ignore_eos=True)
    r1 = a.generate("hello world", sp)[0].outputs[0].token_ids
    r2 = a.generate("hello world", sp)[0].outputs[0].token_ids
    assert list(r1) == list(r2)


def test_async_eos_and_stop(tiny_model_dir):  # noqa: F811
    """EOS/max-token stops land one step late internally but outputs are
    exact."""
    a = _mk(tiny_model_dir, async_scheduling=True)
    sp = SamplingParams(temperature=0.0, max_tokens=3, ignore_eos=True)
    out = a.generate("the quick brown fox", sp)[0].outputs[0]
    assert len(out.token_ids) == 3
