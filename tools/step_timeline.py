"""Per-step wall-time timeline of the bench.py timed round.

Answers "where do the 9 seconds go": for every engine.step() of the
bench workload it prints step index, scheduled prefill/decode token
counts, number of running reqs, and wall ms. Decode steps are expected
at ~device-step time; anything else is admission, prefill, or host gap.

Run on the real chip:  python tools/step_timeline.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.profile_step import build_engine  # noqa: E402


def main() -> None:
    import numpy as np

    from vllm_tpu.sampling_params import SamplingParams

    engine, hf_config, on_tpu = build_engine()
    bs = 256 if on_tpu else 8
    in_len = 128 if on_tpu else 16
    out_len = 128 if on_tpu else 8

    rng = np.random.default_rng(0)
    params = SamplingParams(temperature=0.0, max_tokens=out_len,
                            ignore_eos=True)

    def add_all():
        t = time.perf_counter()
        for i in range(bs):
            toks = rng.integers(10, hf_config.vocab_size - 10,
                                in_len).tolist()
            engine.add_request(str(i), {"prompt_token_ids": toks}, params)
        return time.perf_counter() - t

    # warmup round: compile all buckets
    add_all()
    t0 = time.perf_counter()
    n = 0
    while engine.has_unfinished_requests():
        engine.step()
        n += 1
    print(f"# warmup: {n} steps in {time.perf_counter() - t0:.1f}s",
          flush=True)

    sched = engine.engine_core.scheduler
    last = {"so": None}
    orig_schedule = sched.schedule

    def capture():
        so = orig_schedule()
        last["so"] = so
        return so

    sched.schedule = capture

    # timed round with per-step logging
    t0 = time.perf_counter()
    t_add = add_all()
    print(f"# add_all: {t_add * 1e3:.1f} ms", flush=True)
    rows = []
    prev = time.perf_counter()
    while engine.has_unfinished_requests():
        engine.step()
        now = time.perf_counter()
        # introspect what was scheduled (last SchedulerOutput)
        so = last["so"]
        ntok = getattr(so, "total_num_scheduled_tokens", -1) if so else -1
        nreq = len(sched.running) if hasattr(sched, "running") else -1
        rows.append((now - prev, ntok, nreq))
        prev = now
    elapsed = time.perf_counter() - t0
    print(f"# timed: {len(rows)} steps in {elapsed:.2f}s", flush=True)

    # bucket the steps
    for i, (dt, ntok, nreq) in enumerate(rows):
        if dt > 0.05 or i < 20 or i % 20 == 0 or ntok > 300:
            print(f"step {i:4d}: {dt * 1e3:7.1f} ms  tokens={ntok:5d} "
                  f"running={nreq:4d}", flush=True)
    dts = sorted(r[0] for r in rows)
    import statistics
    print(f"# p50={dts[len(dts) // 2] * 1e3:.1f}ms "
          f"p90={dts[int(len(dts) * 0.9)] * 1e3:.1f}ms "
          f"max={dts[-1] * 1e3:.1f}ms "
          f"mean={statistics.mean(r[0] for r in rows) * 1e3:.1f}ms",
          flush=True)
    big = sum(dt for dt, ntok, _ in rows if ntok > 300)
    small = sum(dt for dt, ntok, _ in rows if 0 <= ntok <= 300)
    print(f"# time in mixed/prefill steps (>300 tok): {big:.2f}s; "
          f"decode steps: {small:.2f}s", flush=True)


if __name__ == "__main__":
    main()
