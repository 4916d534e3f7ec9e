"""Per-step time breakdown for the bench config (VERDICT r02 item 1).

Builds the bench.py engine (Llama-3-8B-class INT4 + int8-KV dummy,
bs=256 decode), warms up to steady-state decode, then:
  1. times N steps with host-phase timers (schedule / dispatch / fetch /
     update),
  2. captures a jax.profiler trace of a few steps,
  3. parses the trace (xprof framework_op_stats) and prints the top ops
     by device self-time.

Run on the real chip:  python tools/profile_step.py [--steps 20]
Output: human-readable breakdown to stdout; trace under /tmp/vtpu_prof.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_engine(out_len: int = 2048):
    from transformers import LlamaConfig

    from vllm_tpu.engine.args import EngineArgs
    from vllm_tpu.engine.llm_engine import LLMEngine

    import jax
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if on_tpu:
        model_kwargs = dict(hidden_size=4096, intermediate_size=14336,
                            num_hidden_layers=32, num_attention_heads=32,
                            num_key_value_heads=8, head_dim=128)
        max_seqs, max_tokens, max_model_len = 256, 4096, 1024
        max_seqs = int(os.environ.get("BENCH_MAX_SEQS", max_seqs))
        quant, dtype, kv_dtype = "int4", "bfloat16", "int8"
    else:
        model_kwargs = dict(hidden_size=256, intermediate_size=512,
                            num_hidden_layers=2, num_attention_heads=8,
                            num_key_value_heads=8, head_dim=32)
        max_seqs, max_tokens, max_model_len = 8, 512, 256
        quant, dtype, kv_dtype = None, "float32", "auto"

    hf_config = LlamaConfig(vocab_size=128256 if on_tpu else 2048,
                            max_position_embeddings=max_model_len,
                            **model_kwargs)
    engine_args = EngineArgs(
        model="llama3-8b-dummy", dtype=dtype, quantization=quant,
        kv_cache_dtype=kv_dtype, load_format="dummy",
        skip_tokenizer_init=True, max_model_len=max_model_len,
        max_num_seqs=max_seqs, max_num_batched_tokens=max_tokens,
        block_size=256, gpu_memory_utilization=0.95,
        async_scheduling=True, hf_config=hf_config, enforce_eager=True)
    config = engine_args.create_engine_config()
    if on_tpu:
        config.compilation_config.min_token_bucket = 256
        config.compilation_config.token_bucket_linear_step = max_tokens
        config.compilation_config.min_req_bucket = max_seqs
    t0 = time.perf_counter()
    engine = LLMEngine(config)
    print(f"# engine built in {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)
    return engine, hf_config, on_tpu


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--trace-steps", type=int, default=5)
    ap.add_argument("--bs", type=int, default=256)
    ap.add_argument("--in-len", type=int, default=128)
    args = ap.parse_args()

    import jax
    import numpy as np

    from vllm_tpu.sampling_params import SamplingParams

    engine, hf_config, on_tpu = build_engine()
    bs = args.bs if on_tpu else 8
    in_len = args.in_len if on_tpu else 16

    rng = np.random.default_rng(0)
    params = SamplingParams(temperature=0.0, max_tokens=8192,
                            ignore_eos=True)
    for i in range(bs):
        toks = rng.integers(10, hf_config.vocab_size - 10, in_len).tolist()
        engine.add_request(str(i), {"prompt_token_ids": toks}, params)

    # Warm up into steady-state decode (past all prefills + compiles).
    t0 = time.perf_counter()
    warm = 40 if on_tpu else 6
    for i in range(warm):
        engine.step()
    print(f"# warmup {warm} steps in {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)

    # --- phase-timed steps --------------------------------------------------
    core = engine.engine_core
    sched = core.scheduler
    executor = core.executor

    phases = {"schedule": [], "dispatch": [], "fetch": [], "update": [],
              "wall": []}

    orig_schedule = sched.schedule
    orig_exec = executor.execute_model
    orig_rpc = executor.collective_rpc
    orig_update = sched.update_from_output

    def timed(key, fn):
        def wrap(*a, **kw):
            t = time.perf_counter()
            r = fn(*a, **kw)
            phases[key].append(time.perf_counter() - t)
            return r
        return wrap

    sched.schedule = timed("schedule", orig_schedule)
    executor.execute_model = timed("dispatch", orig_exec)
    sched.update_from_output = timed("update", orig_update)

    def rpc_wrap(method, *a, **kw):
        if method == "finalize_pending":
            t = time.perf_counter()
            r = orig_rpc(method, *a, **kw)
            phases["fetch"].append(time.perf_counter() - t)
            return r
        return orig_rpc(method, *a, **kw)

    executor.collective_rpc = rpc_wrap

    for _ in range(args.steps):
        t = time.perf_counter()
        engine.step()
        phases["wall"].append(time.perf_counter() - t)

    sched.schedule = orig_schedule
    executor.execute_model = orig_exec
    executor.collective_rpc = orig_rpc
    sched.update_from_output = orig_update

    print("\n=== host phase breakdown (ms/step, mean over "
          f"{args.steps} steps) ===")
    for k, v in phases.items():
        if v:
            print(f"  {k:10s} {1e3 * sum(v) / len(v):8.2f}  "
                  f"(min {1e3 * min(v):.2f} max {1e3 * max(v):.2f})")

    # --- device trace -------------------------------------------------------
    trace_dir = "/tmp/vtpu_prof"
    os.makedirs(trace_dir, exist_ok=True)
    jax.profiler.start_trace(trace_dir)
    for _ in range(args.trace_steps):
        engine.step()
    jax.profiler.stop_trace()
    print(f"# trace written to {trace_dir}", file=sys.stderr)

    report_trace(trace_dir, args.trace_steps)


def report_trace(trace_dir: str, n_steps: int) -> None:
    pbs = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                           recursive=True), key=os.path.getmtime)
    if not pbs:
        print("no xplane found", file=sys.stderr)
        return
    pb = pbs[-1]
    try:
        from xprof.convert.raw_to_tool_data import xspace_to_tool_data
    except ImportError:
        print(f"xprof not available; inspect {pb} manually",
              file=sys.stderr)
        return
    data, _ = xspace_to_tool_data([pb], "framework_op_stats", {})
    import gzip
    import json
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
        data = data.decode()
    obj = json.loads(data)
    # gviz DataTable: {"cols": [{"id": ...}], "rows": [{"c": [{"v":}]}]}
    tables = obj if isinstance(obj, list) else [obj]
    stats = []
    for table in tables:
        if not isinstance(table, dict) or "cols" not in table:
            continue
        cols = [c["id"] for c in table["cols"]]
        for r in table.get("rows", []):
            vals = [c.get("v") if isinstance(c, dict) else c
                    for c in r["c"]]
            stats.append(dict(zip(cols, vals)))
        break
    if not stats:
        print(json.dumps(obj, indent=1)[:1500])
        return
    key = "total_self_time"
    stats.sort(key=lambda d: -(d.get(key) or 0))
    dev = [d for d in stats
           if str(d.get("host_or_device", "")).lower() != "host"]
    total = sum((d.get(key) or 0) for d in dev
                if "IDLE" not in str(d.get("operation", "")))
    print(f"\n=== top device ops ({key}, over {n_steps} steps) ===")
    for d in dev[:20]:
        t = (d.get(key) or 0) / max(n_steps, 1)
        print(f"  {t:10.1f} us/step x{d.get('occurrences', '?'):>6}  "
              f"{str(d.get('operation', '?'))[:70]}")
    print(f"  (device busy total {total / max(n_steps, 1) / 1e3:.2f} "
          "ms/step)")


if __name__ == "__main__":
    main()
