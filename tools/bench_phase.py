"""Phase decomposition of bench.py (VERDICT r04 items 1+3).

Times the engine-build stages (load / profile_run / kv-init / misc),
then runs the exact bench workload twice (warmup + timed) logging every
step's wall time together with what the scheduler put in it (prefill
tokens, decode reqs).  Prints:
  - build-stage table,
  - timed-round phase split: admission / prefill-bearing steps / pure
    decode steps / drain,
  - step-wall histograms per step type.

Run on the real chip:  python tools/bench_phase.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax

    on_tpu = jax.default_backend() in ("tpu", "axon")
    if on_tpu:
        model_kwargs = dict(hidden_size=4096, intermediate_size=14336,
                            num_hidden_layers=32, num_attention_heads=32,
                            num_key_value_heads=8, head_dim=128)
        num_prompts, in_len, out_len = 256, 128, 128
        max_seqs, max_tokens, max_model_len = 256, 4096, 1024
        quant, dtype, kv_dtype = "int4", "bfloat16", "int8"
        vocab = 128256
    else:
        model_kwargs = dict(hidden_size=256, intermediate_size=512,
                            num_hidden_layers=2, num_attention_heads=8,
                            num_key_value_heads=8, head_dim=32)
        num_prompts, in_len, out_len = 8, 32, 16
        max_seqs, max_tokens, max_model_len = 8, 512, 256
        quant, dtype, kv_dtype = None, "float32", "auto"
        vocab = 2048

    from transformers import LlamaConfig

    from vllm_tpu.engine.args import EngineArgs
    from vllm_tpu.engine.llm_engine import LLMEngine
    from vllm_tpu.sampling_params import SamplingParams

    hf_config = LlamaConfig(vocab_size=vocab,
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

    # --- instrument build stages -----------------------------------------
    from vllm_tpu.worker import worker as worker_mod

    stage_times: dict[str, float] = {}

    def timed_method(cls, name):
        orig = getattr(cls, name)

        def wrap(self, *a, **kw):
            t = time.perf_counter()
            r = orig(self, *a, **kw)
            stage_times[name] = (stage_times.get(name, 0.0) +
                                 time.perf_counter() - t)
            return r
        setattr(cls, name, wrap)

    for m in ("load_model", "determine_available_memory",
              "initialize_from_config", "compile_or_warm_up_model"):
        timed_method(worker_mod.Worker, m)

    t_build = time.perf_counter()
    engine = LLMEngine(config)
    build_s = time.perf_counter() - t_build
    print(f"\n=== build stages (total {build_s:.1f}s) ===")
    acc = 0.0
    for k, v in stage_times.items():
        print(f"  {k:30s} {v:8.1f}s")
        acc += v
    print(f"  {'(other: sched/init/misc)':30s} {build_s - acc:8.1f}s")

    # --- run the workload with per-step introspection ---------------------
    core = engine.engine_core
    sched = core.scheduler
    step_meta: list[dict] = []
    orig_schedule = sched.schedule

    def schedule_wrap(*a, **kw):
        out = orig_schedule(*a, **kw)
        pre_toks = 0
        dec = 0
        try:
            n = getattr(out, "num_scheduled_tokens", {}) or {}
            for rid, nt in n.items():
                if nt > 1:
                    pre_toks += nt
                else:
                    dec += 1
        except Exception:
            pass
        step_meta.append({"prefill_toks": pre_toks, "decode_reqs": dec})
        return out

    sched.schedule = schedule_wrap

    rng = np.random.default_rng(0)
    params = SamplingParams(temperature=0.0, max_tokens=out_len,
                            ignore_eos=True)

    def add_all():
        t = time.perf_counter()
        for i in range(num_prompts):
            toks = rng.integers(10, vocab - 10, in_len).tolist()
            engine.add_request(str(i), {"prompt_token_ids": toks}, params)
        return time.perf_counter() - t

    def run_round(label):
        step_meta.clear()
        t0 = time.perf_counter()
        admit_s = add_all()
        walls = []
        while engine.has_unfinished_requests():
            t = time.perf_counter()
            engine.step()
            walls.append(time.perf_counter() - t)
        total = time.perf_counter() - t0
        # align step_meta with walls (schedule called once per step)
        n = min(len(walls), len(step_meta))
        pre_wall = dec_wall = idle_wall = 0.0
        pre_steps = dec_steps = idle_steps = 0
        dec_walls = []
        for w, m in zip(walls[:n], step_meta[:n]):
            if m["prefill_toks"] > 0:
                pre_wall += w
                pre_steps += 1
            elif m["decode_reqs"] > 0:
                dec_wall += w
                dec_steps += 1
                dec_walls.append(w)
            else:
                idle_wall += w
                idle_steps += 1
        rest = total - admit_s - sum(walls[:n]) - sum(walls[n:])
        print(f"\n=== {label}: {total:.2f}s total, {len(walls)} steps ===")
        print(f"  admission (add_request x{num_prompts}) {admit_s:8.3f}s")
        print(f"  prefill-bearing steps x{pre_steps:<5d} {pre_wall:8.3f}s "
              f"(mean {1e3 * pre_wall / max(pre_steps, 1):.1f} ms)")
        print(f"  pure-decode steps     x{dec_steps:<5d} {dec_wall:8.3f}s "
              f"(mean {1e3 * dec_wall / max(dec_steps, 1):.1f} ms)")
        if dec_walls:
            d = sorted(dec_walls)
            print(f"      decode wall p10/p50/p90/max: "
                  f"{1e3 * d[len(d) // 10]:.1f} / {1e3 * d[len(d) // 2]:.1f} / "
                  f"{1e3 * d[9 * len(d) // 10]:.1f} / {1e3 * d[-1]:.1f} ms")
        print(f"  empty steps           x{idle_steps:<5d} {idle_wall:8.3f}s")
        print(f"  tail/uncounted        {max(rest, 0):8.3f}s")
        toks = num_prompts * (in_len + out_len)
        print(f"  => {toks / total:.0f} tok/s (prompt+gen), "
              f"{num_prompts * out_len / total:.0f} gen-only")
        # per-step trace of the prefill ramp (first 20 steps)
        print("  first 20 steps (wall ms | prefill toks | decode reqs):")
        for i, (w, m) in enumerate(list(zip(walls, step_meta))[:20]):
            print(f"    {i:3d} {1e3 * w:8.1f} {m['prefill_toks']:6d} "
                  f"{m['decode_reqs']:5d}")

    run_round("warmup round")
    run_round("timed round")


if __name__ == "__main__":
    main()
