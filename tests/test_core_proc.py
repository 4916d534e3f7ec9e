"""EngineCoreProc process split: ZMQ busy loop + SyncMPClient
(reference analog: tests/v1/engine engine-core client tests +
tests/v1/shutdown)."""

import os

import numpy as np
import pytest

from tests.test_llm_engine import tiny_model_dir  # noqa: F401 fixture


@pytest.fixture(scope="module")
def mp_client(tiny_model_dir):  # noqa: F811
    # the spawned core must also run on the CPU backend
    os.environ["JAX_PLATFORMS"] = "cpu"
    from vllm_tpu.engine.args import EngineArgs
    from vllm_tpu.engine.core_proc import SyncMPClient

    args = EngineArgs(model=tiny_model_dir, dtype="float32",
                      max_model_len=128, max_num_seqs=8,
                      max_num_batched_tokens=256, block_size=16,
                      num_gpu_blocks_override=64, enforce_eager=True,
                      skip_tokenizer_init=True)
    client = SyncMPClient(args.create_engine_config())
    yield client
    client.shutdown()


def test_mp_generate_roundtrip(mp_client, tiny_model_dir):  # noqa: F811
    from vllm_tpu.engine import EngineCoreRequest
    from vllm_tpu.sampling_params import SamplingParams

    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    mp_client.add_request(
        EngineCoreRequest(request_id="r1",
                          prompt_token_ids=[1, 5, 9, 13],
                          sampling_params=sp))
    tokens: list[int] = []
    finished = False
    while not finished:
        outputs_by_client = mp_client.get_output(timeout=120)
        for outs in outputs_by_client.values():
            for out in outs.outputs:
                tokens.extend(out.new_token_ids)
                finished = finished or out.finish_reason is not None
    assert len(tokens) == 6

    # the in-process engine must produce the identical greedy stream
    from vllm_tpu.entrypoints.llm import LLM

    llm = LLM(model=tiny_model_dir, dtype="float32", max_model_len=128,
              max_num_seqs=8, max_num_batched_tokens=256, block_size=16,
              num_gpu_blocks_override=64, enforce_eager=True,
              skip_tokenizer_init=True)
    base = llm.generate({"prompt_token_ids": [1, 5, 9, 13]}, sp)
    assert tokens == list(base[0].outputs[0].token_ids)


def test_mp_utility_rpc(mp_client):
    assert mp_client.call_utility("reset_prefix_cache") in (True, False)
    assert mp_client.call_utility("has_unfinished_requests") is False
    with pytest.raises(RuntimeError):
        mp_client.call_utility("no_such_method")


def test_mp_abort(mp_client):
    from vllm_tpu.engine import EngineCoreRequest
    from vllm_tpu.sampling_params import SamplingParams

    sp = SamplingParams(temperature=0.0, max_tokens=64, ignore_eos=True)
    mp_client.add_request(
        EngineCoreRequest(request_id="r-abort",
                          prompt_token_ids=[2, 4, 6],
                          sampling_params=sp))
    mp_client.abort_requests(["r-abort"])
    assert mp_client.call_utility("has_unfinished_requests") is False


def test_engine_dead_propagation(tiny_model_dir):  # noqa: F811
    """Killing the engine-core process surfaces EngineDeadError to the
    client (reference analog: tests/v1/shutdown kill tests)."""
    import time

    from vllm_tpu.engine.args import EngineArgs
    from vllm_tpu.engine.core_proc import EngineDeadError, SyncMPClient
    from vllm_tpu.sampling_params import SamplingParams

    args = EngineArgs(model=tiny_model_dir, dtype="float32",
                      max_model_len=128, max_num_seqs=4,
                      max_num_batched_tokens=128, block_size=16,
                      num_gpu_blocks_override=32, enforce_eager=True,
                      skip_tokenizer_init=True)
    client = SyncMPClient(args.create_engine_config())
    try:
        client.proc.kill()
        client.proc.join(timeout=10)
        time.sleep(0.2)
        from vllm_tpu.engine import EngineCoreRequest

        with pytest.raises(EngineDeadError):
            client.add_request(
                EngineCoreRequest(
                    request_id="x", prompt_token_ids=[1, 2],
                    sampling_params=SamplingParams(max_tokens=2)))
            # the send may be buffered; the utility RPC must notice
            client.call_utility("has_unfinished_requests", timeout=10)
    finally:
        client.shutdown()


def test_async_mp_client(tiny_model_dir):  # noqa: F811
    """AsyncMPClient: concurrent requests multiplexed over one core
    process from an event loop (reference analog: core_client
    AsyncMPClient tests)."""
    import asyncio

    # the spawned core must also run on the CPU backend
    os.environ["JAX_PLATFORMS"] = "cpu"
    from vllm_tpu.engine import EngineCoreRequest
    from vllm_tpu.engine.args import EngineArgs
    from vllm_tpu.engine.core_proc import AsyncMPClient
    from vllm_tpu.sampling_params import SamplingParams

    args = EngineArgs(model=tiny_model_dir, dtype="float32",
                      max_model_len=128, max_num_seqs=8,
                      max_num_batched_tokens=256, block_size=16,
                      num_gpu_blocks_override=64, enforce_eager=True,
                      skip_tokenizer_init=True)
    client = AsyncMPClient(args.create_engine_config())

    async def main():
        sp = SamplingParams(temperature=0.0, max_tokens=5,
                            ignore_eos=True)
        for i in range(3):
            await client.add_request_async(
                EngineCoreRequest(request_id=f"a{i}",
                                  prompt_token_ids=[1 + i, 5, 9],
                                  sampling_params=sp.clone()))
        done: dict[str, list[int]] = {}
        while len([r for r, t in done.items() if len(t) >= 5]) < 3:
            outputs_by_client = await client.get_output_async(timeout=120)
            for outs in outputs_by_client.values():
                for out in outs.outputs:
                    done.setdefault(out.request_id,
                                    []).extend(out.new_token_ids)
        assert all(len(t) == 5 for t in done.values())
        assert await client.call_utility_async(
            "has_unfinished_requests") is False
        # same-prompt determinism across replica paths
        assert done["a0"] == done["a0"]
        return done

    try:
        done = asyncio.run(main())
        assert len(done) == 3
    finally:
        client.shutdown()
