"""Round benchmark: offline decode throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config: Llama-3-8B-class architecture (32 layers, 4096 hidden, GQA 32/8,
head 128) with dummy weights, INT4 weight-only quantization (packed two
nibbles/byte — the north-star config), 8-bit KV cache, continuous
batching at high concurrency.

Baseline anchor: the reference's MI300X Llama-3.1-70B FP8 TP8 throughput
(1580 tok/s/GPU, BASELINE.md docs/dev-docker/README.md:43-46),
size-normalized to this benchmark's 8B model: 1580 x (70/8) = 13825
tok/s/GPU-equivalent. Round 1 compared raw 1580 (8B-vs-70B, flattering by
~9x); this anchor answers "how does one v5e chip serving 8B compare to
one MI300X serving its per-GPU 70B shard, per unit of model size".
"""

from __future__ import annotations

import json
import os
import sys
import time

BASELINE_TOKS_PER_CHIP = 1580.0 * (70.0 / 8.0)  # size-normalized anchor


def main() -> None:
    import jax

    on_tpu = jax.default_backend() in ("tpu", "axon")
    if not on_tpu:
        # CPU smoke mode: shrink everything so the script stays runnable.
        model_kwargs = dict(hidden_size=256, intermediate_size=512,
                            num_hidden_layers=2, num_attention_heads=8,
                            num_key_value_heads=8, head_dim=32)
        num_prompts, in_len, out_len = 8, 32, 16
        max_seqs, max_tokens = 8, 512
        max_model_len = 256
        quant = None
        dtype = "float32"
        kv_dtype = "auto"
    else:
        model_kwargs = dict(hidden_size=4096, intermediate_size=14336,
                            num_hidden_layers=32, num_attention_heads=32,
                            num_key_value_heads=8, head_dim=128)
        num_prompts, in_len, out_len = 256, 128, 128
        max_seqs, max_tokens = 256, 4096
        max_model_len = 1024
        # North-star config (BASELINE.json): INT4 weights + 8-bit KV.
        # Packed int4 streams half the weight bytes of int8; the KV
        # cache is 1 byte/element like the baseline's FP8-KV. v5e has no
        # native fp8 arithmetic — e4m3 casts are software-emulated and
        # measured ~30% slower end to end — so the 8-bit KV format here
        # is int8 (same bytes/token; the engine also serves fp8_e4m3 /
        # fp8_e5m2 KV for parity).
        quant = "int4"
        dtype = "bfloat16"
        kv_dtype = "int8"
        # experiment overrides (defaults are the shipping config)
        num_prompts = int(os.environ.get("BENCH_NUM_PROMPTS",
                                         num_prompts))
        max_seqs = int(os.environ.get("BENCH_MAX_SEQS", max_seqs))

    from transformers import LlamaConfig

    from vllm_tpu.config import ModelConfig
    from vllm_tpu.engine.args import EngineArgs
    from vllm_tpu.engine.llm_engine import LLMEngine
    from vllm_tpu.sampling_params import SamplingParams

    hf_config = LlamaConfig(vocab_size=128256,
                            max_position_embeddings=max_model_len,
                            **model_kwargs)
    if not on_tpu:
        hf_config.vocab_size = 2048

    engine_args = EngineArgs(
        model="llama3-8b-dummy",
        dtype=dtype,
        quantization=quant,
        kv_cache_dtype=kv_dtype,
        load_format="dummy",
        skip_tokenizer_init=True,
        max_model_len=max_model_len,
        max_num_seqs=max_seqs,
        max_num_batched_tokens=max_tokens,
        block_size=256,
        gpu_memory_utilization=0.95,
        # overlap host scheduling + token fetch with device execution
        async_scheduling=True,
        hf_config=hf_config,
        # The warmup round compiles exactly the buckets this workload
        # touches; blanket precompilation of every bucket would add
        # ~30 min of compile time for nothing here.
        enforce_eager=True,
    )
    config = engine_args.create_engine_config()
    if on_tpu:
        # Coarse buckets: each (token, req) bucket is one ~15-60s XLA
        # compile through the remote-compile tunnel; bound the count to
        # the handful this workload actually needs.
        config.compilation_config.min_token_bucket = 256
        config.compilation_config.token_bucket_linear_step = max_tokens
        config.compilation_config.min_req_bucket = max_seqs
    t_build = time.perf_counter()
    engine = LLMEngine(config)
    print(f"# engine built in {time.perf_counter() - t_build:.1f}s",
          file=sys.stderr, flush=True)

    import numpy as np

    rng = np.random.default_rng(0)
    params = SamplingParams(temperature=0.0, max_tokens=out_len,
                            ignore_eos=True)

    def add_all():
        for i in range(num_prompts):
            toks = rng.integers(10, hf_config.vocab_size - 10,
                                in_len).tolist()
            engine.add_request(str(i), {"prompt_token_ids": toks}, params)

    # Warmup round (compile all buckets touched by this workload).
    t_warm = time.perf_counter()
    add_all()
    steps = 0
    while engine.has_unfinished_requests():
        engine.step()
        steps += 1
        if steps % 20 == 0:
            print(f"# warmup step {steps} at "
                  f"{time.perf_counter() - t_warm:.1f}s",
                  file=sys.stderr, flush=True)
    warm_s = time.perf_counter() - t_warm
    print(f"# warmup: {steps} steps in {warm_s:.1f}s", file=sys.stderr,
          flush=True)

    # Timed round.
    t0 = time.perf_counter()
    add_all()
    done = 0
    while engine.has_unfinished_requests():
        for out in engine.step():
            if out.finished:
                done += 1
    elapsed = time.perf_counter() - t0
    assert done == num_prompts, (done, num_prompts)

    total_tokens = num_prompts * (in_len + out_len)
    gen_tokens = num_prompts * out_len
    toks_per_s = total_tokens / elapsed
    result = {
        "metric": "offline_throughput_tok_per_s_per_chip",
        "value": round(toks_per_s, 1),
        "unit": "tok/s/chip (prompt+gen, Llama-3-8B-class INT4-stored/"
                "w8a8-exec + int8-KV "
                f"dummy, in{in_len}/out{out_len}x{num_prompts}; "
                f"gen-only {gen_tokens / elapsed:.0f}; anchor "
                "size-normalized MI300X 70B FP8 = 13825 tok/s)",
        "vs_baseline": round(toks_per_s / BASELINE_TOKS_PER_CHIP, 3),
    }
    print(json.dumps(result))
    print(f"# gen-only: {gen_tokens / elapsed:.1f} tok/s; warmup {warm_s:.1f}s;"
          f" timed {elapsed:.1f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
