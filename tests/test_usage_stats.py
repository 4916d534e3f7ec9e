"""Usage telemetry (reference analog: vllm/usage/usage_lib.py
UsageMessage): one flat JSON record per engine start to the local
stats sink; opt-out switches honored."""

import json
import os
import time

import pytest

from tests.test_llm_engine import tiny_model_dir  # fixture reuse  # noqa


def _mk(model_dir, **env):
    from vllm_tpu.entrypoints.llm import LLM

    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        return LLM(model=model_dir, dtype="float32", max_model_len=128,
                   max_num_seqs=4, max_num_batched_tokens=128,
                   block_size=16, num_gpu_blocks_override=32,
                   enforce_eager=True)
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def _wait_lines(path, timeout=5.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if os.path.exists(path):
            lines = [l for l in open(path).read().splitlines() if l]
            if lines:
                return lines
        time.sleep(0.1)
    return []


def test_usage_record_written(tiny_model_dir, tmp_path):  # noqa: F811
    path = str(tmp_path / "usage_stats.json")
    llm = _mk(tiny_model_dir, VLLM_TPU_USAGE_STATS_PATH=path)
    lines = _wait_lines(path)
    llm.llm_engine.shutdown()
    assert lines, "no usage record written"
    rec = json.loads(lines[0])
    assert rec["source"] == "vllm_tpu"
    assert rec["model_architecture"] == "LlamaForCausalLM"
    assert rec["context"] == "ENGINE_CONTEXT"
    assert rec["tensor_parallel_size"] == 1
    assert rec["max_num_seqs"] == 4
    assert rec["num_cpu"] and rec["log_time"] > 0


def test_usage_opt_out(tiny_model_dir, tmp_path):  # noqa: F811
    path = str(tmp_path / "usage_stats_optout.json")
    llm = _mk(tiny_model_dir, VLLM_TPU_USAGE_STATS_PATH=path,
              VLLM_NO_USAGE_STATS="1")
    time.sleep(0.5)
    llm.llm_engine.shutdown()
    assert not os.path.exists(path)
