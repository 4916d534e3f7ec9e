"""Simulated 2-host engine test: two processes, each with 4 CPU devices,
form a jax.distributed cluster; host 0 runs LLMEngine + MultiHostExecutor
(TP=8 over the global mesh), host 1 runs the follower verb loop. Greedy
tokens must match a single-process single-device run
(reference analog: tests/distributed/test_multi_node_assignment.py —
multi-node simulated by localhost processes)."""

import json
import os
import socket
import subprocess
import sys

import pytest

from tests.utils import build_tiny_llama

_DRIVER_SCRIPT = r"""
import json, os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=4")
import jax
jax.config.update("jax_platforms", "cpu")

model_dir, port, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
from vllm_tpu.entrypoints.llm import LLM
from vllm_tpu.sampling_params import SamplingParams

llm = LLM(model=model_dir, dtype="float32", max_model_len=128,
          max_num_seqs=8, max_num_batched_tokens=256, block_size=16,
          num_gpu_blocks_override=64, enforce_eager=True,
          tensor_parallel_size=4, pipeline_parallel_size=2, num_hosts=2, host_id=0,
          coordinator_address=f"localhost:{port}")
outs = llm.generate(
    ["the quick brown fox", "hello world this is", "one two three four"],
    SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True))
tokens = [o.outputs[0].token_ids for o in outs]
llm.llm_engine.shutdown()
with open(out_path, "w") as f:
    json.dump(tokens, f)
print("DRIVER DONE", flush=True)
"""

_FOLLOWER_SCRIPT = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=4")
import jax
jax.config.update("jax_platforms", "cpu")

model_dir, port = sys.argv[1], sys.argv[2]
from vllm_tpu.engine.args import EngineArgs
from vllm_tpu.executor.multihost import run_follower

args = EngineArgs(model=model_dir, dtype="float32", max_model_len=128,
                  max_num_seqs=8, max_num_batched_tokens=256,
                  block_size=16, num_gpu_blocks_override=64,
                  enforce_eager=True, tensor_parallel_size=4,
                  pipeline_parallel_size=2, num_hosts=2,
                  host_id=1, coordinator_address=f"localhost:{port}")
run_follower(args.create_engine_config())
print("FOLLOWER DONE", flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def tiny_model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_mh")
    return build_tiny_llama(str(d))


def test_two_host_engine_matches_single_process(tiny_model_dir, tmp_path):
    # jax.distributed needs two consecutive free ports (coordinator +
    # the derived ZMQ verb bus at port+1).
    port = _free_port()
    out_path = str(tmp_path / "tokens.json")
    driver_py = str(tmp_path / "driver.py")
    follower_py = str(tmp_path / "follower.py")
    with open(driver_py, "w") as f:
        f.write(_DRIVER_SCRIPT)
    with open(follower_py, "w") as f:
        f.write(_FOLLOWER_SCRIPT)

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = "/root/repo" + (
        ":" + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    driver = subprocess.Popen(
        [sys.executable, driver_py, tiny_model_dir, str(port), out_path],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, cwd="/root/repo")
    follower = subprocess.Popen(
        [sys.executable, follower_py, tiny_model_dir, str(port)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, cwd="/root/repo")
    try:
        d_out, _ = driver.communicate(timeout=420)
        f_out, _ = follower.communicate(timeout=60)
    except subprocess.TimeoutExpired:
        driver.kill()
        follower.kill()
        d_out = driver.communicate()[0]
        f_out = follower.communicate()[0]
        raise AssertionError(
            f"multihost timed out\nDRIVER:\n{d_out[-4000:]}\n"
            f"FOLLOWER:\n{f_out[-4000:]}")
    assert driver.returncode == 0, f"driver failed:\n{d_out[-6000:]}"
    assert follower.returncode == 0, f"follower failed:\n{f_out[-6000:]}"

    with open(out_path) as f:
        mh_tokens = json.load(f)

    # Single-process single-device baseline (in this pytest process).
    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import SamplingParams

    llm = LLM(model=tiny_model_dir, dtype="float32", max_model_len=128,
              max_num_seqs=8, max_num_batched_tokens=256, block_size=16,
              num_gpu_blocks_override=64, enforce_eager=True)
    outs = llm.generate(
        ["the quick brown fox", "hello world this is",
         "one two three four"],
        SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True))
    base = [o.outputs[0].token_ids for o in outs]
    llm.llm_engine.shutdown()

    assert mh_tokens == base
