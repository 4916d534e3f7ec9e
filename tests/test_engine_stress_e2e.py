"""Engine-level sustained stress e2e (reference analog:
tests/v1/e2e/ sustained-load coverage; VERDICT r04 item 7).

Unlike tests/test_serving_stress.py (scheduler + fabricated runner
outputs), this drives the REAL LLMEngine — tokenizer, processor,
runner-on-CPU, detokenizer — for hundreds of steps mixing:
  - preemption churn (undersized block pool),
  - prefix-cache reuse (shared prompt prefixes),
  - ngram speculative decoding,
  - guided JSON / regex structured output (async FSM compile),
  - staggered admission + mid-flight aborts,
  - stop-token and max_tokens finishes.

Asserts drain-clean: every request finishes or aborts, the scheduler
empties, and the block pool returns to fully free with intact
prefix-cache invariants."""

import random

import pytest

from tests.utils import build_tiny_llama


@pytest.fixture(scope="module")
def tiny_model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_stress")
    return build_tiny_llama(str(d))


PREFIXES = [
    "the quick brown fox jumps over the lazy dog ",
    "hello world this is a test of ",
    "one two three four five six ",
]

JSON_SCHEMA = {
    "type": "object",
    "properties": {"a": {"type": "integer"}},
    "required": ["a"],
}


def _mk_params(rng):
    from vllm_tpu.sampling_params import SamplingParams

    kw = dict(max_tokens=rng.randint(8, 64), ignore_eos=False)
    roll = rng.random()
    if roll < 0.2:
        kw["guided_json"] = JSON_SCHEMA
    elif roll < 0.3:
        kw["guided_regex"] = "(yes|no) ?(yes|no)?"
    if rng.random() < 0.3:
        kw["temperature"] = 0.8
        kw["seed"] = rng.randint(0, 2**31)
    if rng.random() < 0.2:
        kw["stop"] = ["the"]
    return SamplingParams(**kw)


def test_engine_sustained_churn_drains_clean(tiny_model_dir):
    from vllm_tpu.engine.args import EngineArgs
    from vllm_tpu.engine.llm_engine import LLMEngine

    engine_args = EngineArgs(
        model=tiny_model_dir,
        dtype="float32",
        max_model_len=256,
        max_num_seqs=8,
        max_num_batched_tokens=128,   # chunked prefill under churn
        block_size=16,
        num_gpu_blocks_override=26,   # undersized: forces preemption
        enable_prefix_caching=True,
        enforce_eager=True,
        speculative_method="ngram",
        num_speculative_tokens=2,
        scheduling_policy="priority",
    )
    engine = LLMEngine(engine_args.create_engine_config())
    rng = random.Random(0)

    NUM_REQS = 80
    next_req = 0
    in_flight: set[str] = set()
    finished: set[str] = set()
    aborted: set[str] = set()
    steps = 0
    try:
        while next_req < NUM_REQS or engine.has_unfinished_requests():
            # staggered admission, bursty
            if next_req < NUM_REQS and (len(in_flight) < 4
                                        or rng.random() < 0.4):
                for _ in range(rng.randint(1, 3)):
                    if next_req >= NUM_REQS:
                        break
                    rid = f"req-{next_req}"
                    prompt = (rng.choice(PREFIXES)
                              + "word " * rng.randint(0, 20))
                    engine.add_request(rid, prompt, _mk_params(rng),
                                       priority=rng.randint(0, 3))
                    in_flight.add(rid)
                    next_req += 1
            # mid-flight aborts
            if in_flight and rng.random() < 0.08:
                victim = rng.choice(sorted(in_flight))
                engine.abort_request([victim])
                in_flight.discard(victim)
                aborted.add(victim)
            for out in engine.step():
                if out.finished:
                    finished.add(out.request_id)
                    in_flight.discard(out.request_id)
            steps += 1
            assert steps < 4000, "engine failed to drain"

        assert finished | aborted == {f"req-{i}" for i in range(NUM_REQS)}
        assert not engine.has_unfinished_requests()

        sched = engine.engine_core.scheduler
        assert not sched.running and not sched.waiting
        mgr = sched.kv_cache_manager
        pool = mgr.block_pool
        # drain-clean: all blocks back in the free queue (block 0 is the
        # reserved null block)
        assert pool.get_num_free_blocks() == pool.num_blocks - 1
        assert mgr.usage == 0.0
        # prefix-cache invariant: every cached block is hashable + free
        for blocks in pool.cached_block_hash_to_block.values():
            for b in blocks.values():
                assert b.ref_cnt == 0
        # preemption actually happened (the pool is undersized)
        assert sched.num_preempted_reqs_total > 0
    finally:
        engine.shutdown()


def test_engine_churn_with_structured_only(tiny_model_dir):
    """Narrow variant: every request guided (FSM compile queue under
    churn) — catches WAITING_FOR_FSM/preemption interactions."""
    from vllm_tpu.engine.args import EngineArgs
    from vllm_tpu.engine.llm_engine import LLMEngine
    from vllm_tpu.sampling_params import SamplingParams

    engine_args = EngineArgs(
        model=tiny_model_dir,
        dtype="float32",
        max_model_len=128,
        max_num_seqs=4,
        max_num_batched_tokens=64,
        block_size=16,
        num_gpu_blocks_override=24,
        enable_prefix_caching=True,
        enforce_eager=True,
    )
    engine = LLMEngine(engine_args.create_engine_config())
    rng = random.Random(1)
    try:
        for i in range(20):
            engine.add_request(
                f"g-{i}", rng.choice(PREFIXES),
                SamplingParams(max_tokens=8, ignore_eos=False,
                               guided_json=JSON_SCHEMA))
        finished = set()
        steps = 0
        while engine.has_unfinished_requests():
            for out in engine.step():
                if out.finished:
                    finished.add(out.request_id)
            steps += 1
            assert steps < 1500
        assert len(finished) == 20
        pool = engine.engine_core.scheduler.kv_cache_manager.block_pool
        assert pool.get_num_free_blocks() == pool.num_blocks - 1
    finally:
        engine.shutdown()
