"""Device-op traces for BOTH bench phases (VERDICT r04 item 1).

Builds the bench engine, then captures two xprof traces over the live
workload: (a) the prefill ramp (steps 0..N_PRE) and (b) steady decode.
Prints top device ops per phase.  Run on the real chip:
    python tools/profile_phases.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profile_step import build_engine, report_trace  # noqa: E402


def main() -> None:
    import jax
    import numpy as np

    from vllm_tpu.sampling_params import SamplingParams

    engine, hf_config, on_tpu = build_engine()
    bs = 256 if on_tpu else 8
    in_len = 128 if on_tpu else 16
    n_pre = 10 if on_tpu else 3

    rng = np.random.default_rng(0)
    params = SamplingParams(temperature=0.0, max_tokens=8192,
                            ignore_eos=True)

    def add_all(tag):
        for i in range(bs):
            toks = rng.integers(10, hf_config.vocab_size - 10,
                                in_len).tolist()
            engine.add_request(f"{tag}-{i}", {"prompt_token_ids": toks},
                               params)

    # Warmup pass: compile everything both phases touch, then abort.
    add_all("w")
    t0 = time.perf_counter()
    for i in range(n_pre + 30):
        engine.step()
    print(f"# warmup {n_pre + 30} steps in {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)
    engine.abort_request([f"w-{i}" for i in range(bs)])
    while engine.has_unfinished_requests():
        engine.step()

    # --- phase (a): prefill ramp ------------------------------------------
    add_all("p")
    d1 = "/tmp/vtpu_prof_prefill"
    os.makedirs(d1, exist_ok=True)
    t0 = time.perf_counter()
    jax.profiler.start_trace(d1)
    for _ in range(n_pre):
        engine.step()
    jax.profiler.stop_trace()
    print(f"# prefill ramp: {n_pre} steps in "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)

    # --- phase (b): steady decode ----------------------------------------
    for _ in range(20):
        engine.step()
    d2 = "/tmp/vtpu_prof_decode"
    os.makedirs(d2, exist_ok=True)
    t0 = time.perf_counter()
    jax.profiler.start_trace(d2)
    for _ in range(5):
        engine.step()
    jax.profiler.stop_trace()
    print(f"# steady decode: 5 steps in {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)

    print("\n######## PREFILL RAMP (per step = 1/%d of trace) ########"
          % n_pre)
    report_trace(d1, n_pre)
    print("\n######## STEADY DECODE (per step = 1/5 of trace) ########")
    report_trace(d2, 5)


if __name__ == "__main__":
    main()
