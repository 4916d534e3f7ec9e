"""PP resident-ring streaming: pp batches in flight, one per stage
(parallel/pipeline.py pipeline_stream_layers + model_runner
_execute_stream).  TPU answer to the reference's batch-queue PP
(vllm/v1/engine/core.py:290 step_with_batch_queue): each engine step
every stage applies its W/pp layer chunk to a DIFFERENT in-flight
batch, so steady-state decode throughput approaches pp x the
rotate-through ring while producing identical greedy tokens."""

import pytest

from tests.utils import build_tiny_llama


@pytest.fixture(scope="module")
def tiny_model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_ppstream")
    return build_tiny_llama(str(d))


PROMPTS = [[3 + i, 5 + i, 7 + i, 11 + i, 13 + i] for i in range(6)]


def _gen(model_dir: str, budget: int, max_tokens: int = 8, **kw):
    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import SamplingParams

    llm = LLM(model=model_dir, dtype="float32", max_model_len=128,
              max_num_seqs=8, max_num_batched_tokens=budget,
              block_size=16, num_gpu_blocks_override=64,
              enforce_eager=True, skip_tokenizer_init=True, **kw)
    outs = llm.generate(
        [{"prompt_token_ids": p} for p in PROMPTS],
        SamplingParams(temperature=0.0, max_tokens=max_tokens,
                       ignore_eos=True))
    toks = [o.outputs[0].token_ids for o in outs]
    runner = llm.llm_engine.engine_core.executor.worker.runner
    stats = (runner._stream_hops, runner._stream_bubbles)
    llm.llm_engine.shutdown()
    return toks, stats


@pytest.fixture(scope="module")
def baseline(tiny_model_dir):
    toks, _ = _gen(tiny_model_dir, budget=64)
    return toks


def test_stream_single_cohort_matches(tiny_model_dir, baseline):
    """All decodes fit one batch: the ring degenerates to
    inject / bubble-drain alternation — tokens must still match."""
    toks, (hops, bubbles) = _gen(tiny_model_dir, budget=64,
                                 pipeline_parallel_size=2,
                                 async_scheduling=True)
    assert toks == baseline
    assert hops > 0  # the stream path actually engaged


def test_stream_two_cohorts_match(tiny_model_dir, baseline):
    """Token budget 3 splits the 6 decoders into two interleaved
    cohorts: the ring stays full (real batch at every stage), so
    steady-state hops are nearly bubble-free."""
    toks, (hops, bubbles) = _gen(tiny_model_dir, budget=3,
                                 pipeline_parallel_size=2,
                                 async_scheduling=True)
    assert toks == baseline
    assert hops > 0
    # steady state: one real injection per hop; bubbles only at
    # drain-down and layout changes
    assert bubbles < hops / 2


def test_stream_tp2_pp2_matches(tiny_model_dir, baseline):
    toks, (hops, _) = _gen(tiny_model_dir, budget=3,
                           tensor_parallel_size=2,
                           pipeline_parallel_size=2,
                           async_scheduling=True)
    assert toks == baseline
    assert hops > 0


def test_stream_mixed_prefill_flushes(tiny_model_dir):
    """Late-arriving prompts: bucket-compatible prompt-bearing steps
    now RIDE the ring (no flush — the reference's batch-queue PP covers
    all step types, v1/engine/core.py:290); tokens must match a plain
    engine either way."""
    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import SamplingParams

    flush_counts = []

    def run(**kw):
        llm = LLM(model=tiny_model_dir, dtype="float32",
                  max_model_len=128, max_num_seqs=8,
                  max_num_batched_tokens=16, block_size=16,
                  num_gpu_blocks_override=64, enforce_eager=True,
                  skip_tokenizer_init=True, **kw)
        sp = SamplingParams(temperature=0.0, max_tokens=6,
                            ignore_eos=True)
        eng = llm.llm_engine
        for i, p in enumerate(PROMPTS[:3]):
            eng.add_request(str(i), {"prompt_token_ids": p}, sp)
        # run a few steps so the first wave is mid-decode, then add more
        results = {}
        steps = 0
        while eng.has_unfinished_requests():
            for out in eng.step():
                if out.finished:
                    results[out.request_id] = out.outputs[0].token_ids
            steps += 1
            if steps == 4:
                for i, p in enumerate(PROMPTS[3:]):
                    eng.add_request(str(3 + i), {"prompt_token_ids": p},
                                    sp)
            assert steps < 500
        runner = eng.engine_core.executor.worker.runner
        flush_counts.append(getattr(runner, "_stream_prompt_rides", 0))
        eng.shutdown()
        return [results[str(i)] for i in range(6)]

    base = run()
    stream = run(pipeline_parallel_size=2, async_scheduling=True)
    assert stream == base
    # prompt-bearing steps rode the ring (no forced flush to the
    # normal path for bucket-compatible prefills)
    assert flush_counts[-1] > 0, flush_counts
