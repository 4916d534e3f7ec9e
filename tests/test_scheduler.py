"""Scheduler unit tests with fabricated requests — no device needed
(reference analog: tests/v1/core/test_scheduler.py)."""

from tests.utils import EOS_TOKEN_ID, create_requests, create_scheduler
from vllm_tpu.core.sched.output import ModelRunnerOutput
from vllm_tpu.request import RequestStatus


def run_step(scheduler, token_fn=lambda req_id, n: [[100]]):
    """Schedule one step and feed back fabricated sampled tokens."""
    output = scheduler.schedule()
    req_ids = []
    sampled = []
    for req_id, n in output.num_scheduled_tokens.items():
        req = scheduler.requests[req_id]
        req_ids.append(req_id)
        # Emit a token only if the prompt is fully computed (the runner's
        # contract: no sampling during partial prefill).
        if req.num_computed_tokens >= req.num_prompt_tokens:
            sampled.append(list(token_fn(req_id, n)))
        else:
            sampled.append([])
    runner_out = ModelRunnerOutput(req_ids=req_ids, sampled_token_ids=sampled)
    ec_outs = scheduler.update_from_output(output, runner_out)
    return output, ec_outs


def test_add_and_schedule_basic():
    scheduler = create_scheduler()
    requests = create_requests(3, num_tokens=10)
    for r in requests:
        scheduler.add_request(r)
    output = scheduler.schedule()
    assert len(output.scheduled_new_reqs) == 3
    assert output.total_num_scheduled_tokens == 30
    for r in requests:
        assert r.status == RequestStatus.RUNNING
        assert r.num_computed_tokens == 10


def test_decode_after_prefill():
    scheduler = create_scheduler()
    for r in create_requests(2, num_tokens=8):
        scheduler.add_request(r)
    run_step(scheduler)  # prefill + first sample
    output, _ = run_step(scheduler)  # decode
    assert output.total_num_scheduled_tokens == 2  # 1 token per request
    assert not output.scheduled_new_reqs
    assert output.scheduled_cached_reqs.num_reqs == 2


def test_token_budget_chunks_long_prefill():
    scheduler = create_scheduler(max_num_batched_tokens=64,
                                 num_blocks=512,
                                 max_model_len=4096)
    reqs = create_requests(1, num_tokens=150, max_tokens=4)
    scheduler.add_request(reqs[0])
    out1 = scheduler.schedule()
    assert out1.total_num_scheduled_tokens == 64
    scheduler.update_from_output(
        out1, ModelRunnerOutput(req_ids=[reqs[0].request_id],
                                sampled_token_ids=[[]]))
    out2 = scheduler.schedule()
    assert out2.total_num_scheduled_tokens == 64
    scheduler.update_from_output(
        out2, ModelRunnerOutput(req_ids=[reqs[0].request_id],
                                sampled_token_ids=[[]]))
    out3 = scheduler.schedule()
    assert out3.total_num_scheduled_tokens == 22  # 150 - 128
    assert reqs[0].num_computed_tokens == 150


def test_stop_on_eos():
    scheduler = create_scheduler()
    reqs = create_requests(1, num_tokens=5, max_tokens=16)
    scheduler.add_request(reqs[0])
    _, ec = run_step(scheduler, lambda *_: [EOS_TOKEN_ID])
    out = ec[0].outputs[0]
    assert out.finished
    assert str(out.finish_reason) == "stop"
    assert not scheduler.has_unfinished_requests()
    # Blocks are released.
    assert scheduler.kv_cache_manager.block_pool.get_usage() == 0.0


def test_stop_on_max_tokens():
    scheduler = create_scheduler()
    reqs = create_requests(1, num_tokens=5, max_tokens=3)
    scheduler.add_request(reqs[0])
    finished = False
    for _ in range(5):
        _, ec = run_step(scheduler)
        outs = ec[0].outputs
        if outs and outs[0].finished:
            finished = True
            assert str(outs[0].finish_reason) == "length"
            break
    assert finished
    assert reqs[0].num_output_tokens == 3


def test_stop_token_ids():
    scheduler = create_scheduler()
    reqs = create_requests(1, num_tokens=5, max_tokens=16,
                           stop_token_ids=[777])
    scheduler.add_request(reqs[0])
    _, ec = run_step(scheduler, lambda *_: [777])
    out = ec[0].outputs[0]
    assert out.finished
    assert out.stop_reason == 777


def test_abort():
    scheduler = create_scheduler()
    reqs = create_requests(2, num_tokens=5)
    for r in reqs:
        scheduler.add_request(r)
    run_step(scheduler)
    scheduler.finish_requests(reqs[0].request_id,
                              RequestStatus.FINISHED_ABORTED)
    assert scheduler.get_num_unfinished_requests() == 1
    output = scheduler.schedule()
    assert reqs[0].request_id in output.finished_req_ids
    assert len(output.num_scheduled_tokens) == 1


def test_preemption_and_resume():
    # Tiny pool: 8 usable blocks of 16 = 128 tokens total.
    scheduler = create_scheduler(num_blocks=9, max_model_len=256,
                                 enable_prefix_caching=False)
    reqs = create_requests(2, num_tokens=60, max_tokens=64)
    for r in reqs:
        scheduler.add_request(r)
    # Both fit initially: 60 tokens = 4 blocks each (8 total).
    run_step(scheduler)
    assert all(r.status == RequestStatus.RUNNING for r in reqs)
    # Decode until block space runs out; request 1 must get preempted.
    preempted = False
    for _ in range(20):
        run_step(scheduler)
        if reqs[1].status == RequestStatus.PREEMPTED:
            preempted = True
            break
    assert preempted
    assert reqs[1].num_computed_tokens == 0
    assert reqs[1].num_preemptions == 1
    # Finish request 0 -> request 1 resumes from scratch and completes.
    scheduler.finish_requests(reqs[0].request_id,
                              RequestStatus.FINISHED_ABORTED)
    for _ in range(80):
        if reqs[1].is_finished:
            break
        run_step(scheduler)
    assert reqs[1].is_finished
    # Preempted requests keep their generated tokens.
    assert reqs[1].num_output_tokens == 64


def test_preempted_resume_hits_prefix_cache():
    """A preempted request must reuse still-cached prompt blocks on
    resume instead of recomputing from token 0 (reference gate:
    scheduler.py:377-380 — num_computed_tokens == 0, not status)."""
    scheduler = create_scheduler(num_blocks=12, max_model_len=256,
                                 enable_prefix_caching=True)
    reqs = create_requests(2, num_tokens=64, max_tokens=64)
    for r in reqs:
        scheduler.add_request(r)
    run_step(scheduler)
    preempted = False
    for _ in range(40):
        run_step(scheduler)
        if reqs[1].status == RequestStatus.PREEMPTED:
            preempted = True
            break
    assert preempted
    # Request 1's freed blocks stay in the prefix cache until evicted.
    # Finishing request 0 releases space without evicting them all.
    scheduler.finish_requests(reqs[0].request_id,
                              RequestStatus.FINISHED_ABORTED)
    output = scheduler.schedule()
    rid = reqs[1].request_id
    assert rid in output.num_scheduled_tokens
    # On resume some prompt blocks must be cache hits: fewer new tokens
    # scheduled than the request's full (prompt + generated) length.
    total_len = reqs[1].num_tokens
    assert output.num_scheduled_tokens[rid] < total_len
    assert reqs[1].num_computed_tokens > 0


def test_priority_scheduling():
    scheduler = create_scheduler(policy="priority", max_num_seqs=1)
    low = create_requests(1, num_tokens=5)[0]
    low.priority = 10
    high = create_requests(1, num_tokens=5)[0]
    high.request_id = "high"
    high.priority = 0
    scheduler.add_request(low)
    scheduler.add_request(high)
    output = scheduler.schedule()
    assert output.scheduled_new_reqs[0].req_id == "high"


def test_max_num_seqs_respected():
    scheduler = create_scheduler(max_num_seqs=2)
    for r in create_requests(5, num_tokens=4):
        scheduler.add_request(r)
    output = scheduler.schedule()
    assert len(output.scheduled_new_reqs) == 2


def test_prefix_cache_reuse_across_requests():
    scheduler = create_scheduler(block_size=16)
    reqs = create_requests(1, num_tokens=64, max_tokens=2, same_prompt=True)
    scheduler.add_request(reqs[0])
    for _ in range(4):
        run_step(scheduler)
    assert not scheduler.has_unfinished_requests()
    # Same prompt again: must hit the prefix cache.
    req2 = create_requests(1, num_tokens=64, max_tokens=2,
                           same_prompt=True)[0]
    req2.request_id = "again"
    scheduler.add_request(req2)
    output = scheduler.schedule()
    new_req = output.scheduled_new_reqs[0]
    assert new_req.num_computed_tokens == 48  # 3 of 4 blocks hit
    assert output.num_scheduled_tokens["again"] == 16


def test_spec_decode_accounting():
    scheduler = create_scheduler(num_speculative_tokens=3)
    reqs = create_requests(1, num_tokens=5, max_tokens=32)
    scheduler.add_request(reqs[0])
    rid = reqs[0].request_id
    run_step(scheduler)  # prefill
    # Attach draft tokens as a proposer would.
    reqs[0].spec_token_ids = [11, 12, 13]
    output = scheduler.schedule()
    assert output.num_scheduled_tokens[rid] == 4  # 1 real + 3 spec
    assert output.scheduled_spec_decode_tokens[rid] == [11, 12, 13]
    # Runner accepts 2 drafts + bonus token -> 3 sampled.
    runner_out = ModelRunnerOutput(req_ids=[rid],
                                   sampled_token_ids=[[11, 12, 99]])
    scheduler.update_from_output(output, runner_out)
    # computed advanced by 4, then rolled back by (3+1-3)=1 rejected.
    assert reqs[0].num_computed_tokens == 5 + 1 + 3 - 1
    assert reqs[0].num_output_tokens == 1 + 3


def test_stats():
    scheduler = create_scheduler()
    for r in create_requests(2, num_tokens=5):
        scheduler.add_request(r)
    _, ec = run_step(scheduler)
    stats = ec[0].scheduler_stats
    assert stats.num_running_reqs == 2
    assert stats.kv_cache_usage > 0
