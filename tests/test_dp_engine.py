"""Data-parallel engine replication + least-loaded routing (reference
analog: tests/v1/test_internal_lb_dp.py, scaled to the CPU backend)."""

import numpy as np
import pytest

from tests.test_llm_engine import tiny_model_dir  # noqa: F401 fixture
from vllm_tpu.engine import EngineCoreRequest
from vllm_tpu.sampling_params import SamplingParams


def test_router_least_loaded():
    from vllm_tpu.engine.dp_engine import DPEngineRouter

    r = DPEngineRouter(3)
    ranks = [r.assign(f"r{i}") for i in range(6)]
    assert sorted(r.in_flight) == [2, 2, 2]
    r.finished("r0")
    assert r.assign("r6") == ranks[0]


def test_dp_engine_end_to_end(tiny_model_dir):  # noqa: F811
    from vllm_tpu.engine.args import EngineArgs
    from vllm_tpu.engine.dp_engine import DPLLMEngine

    args = EngineArgs(model=tiny_model_dir, dtype="float32",
                      max_model_len=128, max_num_seqs=4,
                      max_num_batched_tokens=128, block_size=16,
                      num_gpu_blocks_override=32, enforce_eager=True,
                      skip_tokenizer_init=True)
    engine = DPLLMEngine(args.create_engine_config(), dp_size=2,
                         in_process=True)
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)

    results: dict[str, list[int]] = {}
    for i in range(8):
        engine.add_request(
            EngineCoreRequest(request_id=f"q{i}",
                              prompt_token_ids=[1 + i, 5, 9],
                              sampling_params=sp.clone()))
    # requests spread across both replicas
    assert engine.load == [4, 4]

    while engine.has_unfinished_requests():
        for eco in engine.step().values():
            for out in eco.outputs:
                results.setdefault(out.request_id, []).extend(
                    out.new_token_ids)
    assert len(results) == 8
    assert all(len(toks) == 6 for toks in results.values())
    assert engine.load == [0, 0]

    # same-prompt requests produce identical greedy streams regardless
    # of which replica served them
    engine.add_request(EngineCoreRequest(request_id="a1",
                                         prompt_token_ids=[3, 7, 11],
                                         sampling_params=sp.clone()))
    engine.add_request(EngineCoreRequest(request_id="a2",
                                         prompt_token_ids=[3, 7, 11],
                                         sampling_params=sp.clone()))
    out2: dict[str, list[int]] = {}
    while engine.has_unfinished_requests():
        for eco in engine.step().values():
            for out in eco.outputs:
                out2.setdefault(out.request_id, []).extend(
                    out.new_token_ids)
    assert out2["a1"] == out2["a2"]
    engine.shutdown()


def test_wave_lockstep_idle_replica_steps(tiny_model_dir):  # noqa: F811
    """While ANY replica is busy, idle replicas still step each wave
    tick (reference: coordinator.py wave lockstep + idle-rank dummy
    batches) — and the coordinator tracks the wave state machine."""
    from vllm_tpu.engine.args import EngineArgs
    from vllm_tpu.engine.dp_engine import DPLLMEngine

    args = EngineArgs(model=tiny_model_dir, dtype="float32",
                      max_model_len=128, max_num_seqs=4,
                      max_num_batched_tokens=128, block_size=16,
                      num_gpu_blocks_override=32, enforce_eager=True,
                      skip_tokenizer_init=True)
    engine = DPLLMEngine(args.create_engine_config(), dp_size=2,
                         in_process=True)
    step_counts = [0, 0]
    for rank, core in enumerate(engine.cores):
        orig = core.step

        def wrapped(orig=orig, rank=rank):
            step_counts[rank] += 1
            return orig()

        core.step = wrapped

    sp = SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True)
    # pin one request to rank 0 only
    engine.add_request(EngineCoreRequest(request_id="only",
                                         prompt_token_ids=[2, 4, 6],
                                         sampling_params=sp))
    assert engine.router.rank_of("only") == 0
    while engine.has_unfinished_requests():
        engine.step()
    # rank 1 was idle but stepped every wave tick alongside rank 0
    assert step_counts[0] > 0
    assert step_counts[1] == step_counts[0]
    snap = engine.coordinator.snapshot()
    assert snap["current_wave"] == 1
    assert not snap["wave_active"]
    assert snap["load"] == [0, 0]
    # after the wave drains, nobody steps
    engine.step()
    assert step_counts[1] == step_counts[0]


def test_coordinator_wave_counting():
    from vllm_tpu.engine.coordinator import DPCoordinator

    c = DPCoordinator(2)
    assert c.snapshot()["current_wave"] == 0
    c.report(0, waiting=1, running=0)
    assert c.snapshot()["wave_active"]
    assert c.snapshot()["current_wave"] == 1
    c.report(1, waiting=0, running=3, kv_usage=0.5)
    assert c.least_loaded() == 0
    c.report(0, 0, 0)
    assert c.snapshot()["wave_active"]  # rank 1 still busy
    c.report(1, 0, 0)
    snap = c.snapshot()
    assert not snap["wave_active"]
    c.report(0, 2, 0)
    assert c.snapshot()["current_wave"] == 2


def test_dp_async_lb_client_routes_by_reported_load():
    """DPAsyncMPClient routing: coordinator stats outweigh the local
    in-flight guess (reference: core_client.py:1057)."""
    from vllm_tpu.engine.dp_engine import DPEngineRouter

    r = DPEngineRouter(2)
    # local guess says rank 0 is empty, but the coordinator reports it
    # drowning in work -> route to rank 1
    assert r.assign("x", reported_load=[10, 0]) == 1
    assert r.assign("y", reported_load=[10, 0]) == 1
    assert r.assign("z", reported_load=[10, 7]) == 1  # 10 vs 7+2


def test_elastic_ep_scale_up_down(tiny_model_dir):  # noqa: F811
    """Elastic EP over the DP replica pool (reference:
    v1/engine/utils.py:438,533 scale_up/down_elastic_ep + API
    /scale_elastic_ep): scale 1->3 while serving, new requests land on
    the new replicas; scale 3->1 drains the victim ranks first."""
    from vllm_tpu.engine.args import EngineArgs
    from vllm_tpu.engine.dp_engine import DPLLMEngine

    args = EngineArgs(model=tiny_model_dir, dtype="float32",
                      max_model_len=128, max_num_seqs=4,
                      max_num_batched_tokens=128, block_size=16,
                      num_gpu_blocks_override=32, enforce_eager=True,
                      skip_tokenizer_init=True)
    engine = DPLLMEngine(args.create_engine_config(), dp_size=1,
                         in_process=True)
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)

    results: dict[str, list[int]] = {}

    def drain():
        while engine.has_unfinished_requests():
            for eco in engine.step().values():
                for out in eco.outputs:
                    results.setdefault(out.request_id, []).extend(
                        out.new_token_ids)

    for i in range(2):
        engine.add_request(
            EngineCoreRequest(request_id=f"pre{i}",
                              prompt_token_ids=[1 + i, 5, 9],
                              sampling_params=sp.clone()))
    assert engine.scale_elastic_ep(3) == 3
    assert engine.dp_size == 3 and len(engine.cores) == 3
    # with 2 in flight on rank 0, the next requests go to the new ranks
    for i in range(4):
        engine.add_request(
            EngineCoreRequest(request_id=f"post{i}",
                              prompt_token_ids=[2 + i, 6, 10],
                              sampling_params=sp.clone()))
    assert engine.load == [2, 2, 2]
    drain()
    assert len(results) == 6
    assert all(len(t) == 6 for t in results.values())

    # scale down with in-flight work on the victim ranks: drains first
    for i in range(3):
        engine.add_request(
            EngineCoreRequest(request_id=f"down{i}",
                              prompt_token_ids=[3 + i, 7, 11],
                              sampling_params=sp.clone()))
    assert engine.scale_elastic_ep(1) == 1
    assert engine.dp_size == 1 and len(engine.cores) == 1
    drain()
    assert len(results) == 9
    assert engine.load == [0]
    # pool still serves after the resize
    engine.add_request(EngineCoreRequest(request_id="after",
                                         prompt_token_ids=[4, 8, 12],
                                         sampling_params=sp.clone()))
    drain()
    assert len(results["after"]) == 6
    engine.shutdown()
