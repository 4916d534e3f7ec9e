"""In-tree benchmarks: ``python -m vllm_tpu bench {latency,throughput,serve}``
(reference: vllm/benchmarks/ latency.py / throughput.py / serve.py)."""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _add_engine_args(parser: argparse.ArgumentParser) -> None:
    from vllm_tpu.engine.args import EngineArgs

    EngineArgs.add_cli_args(parser)


def _build_engine(args):
    from vllm_tpu.engine.args import EngineArgs
    from vllm_tpu.engine.llm_engine import LLMEngine

    engine_args = EngineArgs.from_cli_args(args)
    if args.dummy_weights:
        engine_args.load_format = "dummy"
        engine_args.skip_tokenizer_init = True
    return LLMEngine(engine_args.create_engine_config())


def _random_prompts(n: int, in_len: int, vocab: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    return [{
        "prompt_token_ids": rng.integers(10, vocab - 10, in_len).tolist()
    } for _ in range(n)]


def bench_latency(argv: list[str]) -> None:
    """E2E latency of a fixed (batch, in, out) workload
    (reference: benchmarks/benchmark_latency.py)."""
    parser = argparse.ArgumentParser()
    parser.add_argument("--input-len", type=int, default=128)
    parser.add_argument("--output-len", type=int, default=128)
    parser.add_argument("--batch-size", type=int, default=1)
    parser.add_argument("--num-iters", type=int, default=3)
    parser.add_argument("--num-iters-warmup", type=int, default=1)
    parser.add_argument("--dummy-weights", action="store_true")
    _add_engine_args(parser)
    args = parser.parse_args(argv)
    engine = _build_engine(args)
    vocab = engine.config.model_config.get_vocab_size()

    from vllm_tpu.sampling_params import SamplingParams

    params = SamplingParams(temperature=0.0, max_tokens=args.output_len,
                            ignore_eos=True)

    def run_once(tag: str) -> float:
        prompts = _random_prompts(args.batch_size, args.input_len, vocab)
        t0 = time.perf_counter()
        for i, p in enumerate(prompts):
            engine.add_request(f"{tag}-{i}", p, params)
        while engine.has_unfinished_requests():
            engine.step()
        return time.perf_counter() - t0

    for w in range(args.num_iters_warmup):
        run_once(f"warm{w}")
    latencies = [run_once(f"iter{i}") for i in range(args.num_iters)]
    lat = np.asarray(latencies)
    print(
        json.dumps({
            "avg_latency_s": float(lat.mean()),
            "p50_latency_s": float(np.percentile(lat, 50)),
            "p99_latency_s": float(np.percentile(lat, 99)),
            "decode_tok_s": args.batch_size * args.output_len /
            float(lat.mean()),
        }))


def bench_throughput(argv: list[str]) -> None:
    """Offline max-load throughput
    (reference: benchmarks/benchmark_throughput.py)."""
    parser = argparse.ArgumentParser()
    parser.add_argument("--input-len", type=int, default=128)
    parser.add_argument("--output-len", type=int, default=128)
    parser.add_argument("--num-prompts", type=int, default=128)
    parser.add_argument("--dummy-weights", action="store_true")
    _add_engine_args(parser)
    args = parser.parse_args(argv)
    engine = _build_engine(args)
    vocab = engine.config.model_config.get_vocab_size()

    from vllm_tpu.sampling_params import SamplingParams

    params = SamplingParams(temperature=0.0, max_tokens=args.output_len,
                            ignore_eos=True)

    def run(tag):
        prompts = _random_prompts(args.num_prompts, args.input_len, vocab)
        t0 = time.perf_counter()
        for i, p in enumerate(prompts):
            engine.add_request(f"{tag}-{i}", p, params)
        done = 0
        while engine.has_unfinished_requests():
            for out in engine.step():
                done += out.finished
        return time.perf_counter() - t0

    run("warmup")
    elapsed = run("timed")
    total = args.num_prompts * (args.input_len + args.output_len)
    print(
        json.dumps({
            "requests_per_s": args.num_prompts / elapsed,
            "tokens_per_s": total / elapsed,
            "gen_tokens_per_s":
            args.num_prompts * args.output_len / elapsed,
            "elapsed_s": elapsed,
        }))


def bench_serve(argv: list[str]) -> None:
    """Online serving benchmark against a running server: TTFT/TPOT/ITL
    percentiles (reference: benchmarks/benchmark_serving.py)."""
    import asyncio

    parser = argparse.ArgumentParser()
    parser.add_argument("--base-url", type=str,
                        default="http://127.0.0.1:8000")
    parser.add_argument("--model", type=str, default="")
    parser.add_argument("--num-prompts", type=int, default=64)
    parser.add_argument("--input-len", type=int, default=128)
    parser.add_argument("--output-len", type=int, default=128)
    parser.add_argument("--request-rate", type=float, default=float("inf"))
    args = parser.parse_args(argv)

    async def run():
        import aiohttp

        results = []

        async def one(session, i):
            prompt = " ".join(["benchmark"] * max(args.input_len // 2, 1))
            t0 = time.perf_counter()
            ttft = None
            tokens = 0
            last = t0
            itls = []
            async with session.post(
                    f"{args.base_url}/v1/completions",
                    json={
                        "model": args.model,
                        "prompt": prompt,
                        "max_tokens": args.output_len,
                        "temperature": 0.0,
                        "ignore_eos": True,
                        "stream": True,
                    }) as resp:
                async for line in resp.content:
                    if not line.startswith(b"data:"):
                        continue
                    if b"[DONE]" in line:
                        break
                    now = time.perf_counter()
                    if ttft is None:
                        ttft = now - t0
                    else:
                        itls.append(now - last)
                    last = now
                    tokens += 1
            results.append((ttft, itls, time.perf_counter() - t0, tokens))

        async with aiohttp.ClientSession() as session:
            tasks = []
            for i in range(args.num_prompts):
                tasks.append(asyncio.create_task(one(session, i)))
                if args.request_rate != float("inf"):
                    await asyncio.sleep(1.0 / args.request_rate)
            t0 = time.perf_counter()
            await asyncio.gather(*tasks)
            wall = time.perf_counter() - t0

        ttfts = np.asarray([r[0] for r in results if r[0] is not None])
        itls = np.asarray(sum((r[1] for r in results), []))
        e2es = np.asarray([r[2] for r in results])
        total_tokens = sum(r[3] for r in results)
        print(
            json.dumps({
                "num_requests": len(results),
                "total_gen_tokens": int(total_tokens),
                "gen_tok_per_s": total_tokens / wall,
                "ttft_p50_ms": float(np.percentile(ttfts, 50) * 1e3),
                "ttft_p99_ms": float(np.percentile(ttfts, 99) * 1e3),
                "itl_p50_ms": float(np.percentile(itls, 50) * 1e3)
                if len(itls) else None,
                "itl_p99_ms": float(np.percentile(itls, 99) * 1e3)
                if len(itls) else None,
                "e2e_p50_s": float(np.percentile(e2es, 50)),
            }))

    asyncio.run(run())


def main(argv: list[str]) -> None:
    if not argv:
        print("usage: vllm_tpu bench {latency,throughput,serve} ...")
        return
    cmd, rest = argv[0], argv[1:]
    if cmd == "latency":
        bench_latency(rest)
    elif cmd == "throughput":
        bench_throughput(rest)
    elif cmd == "serve":
        bench_serve(rest)
    else:
        raise SystemExit(f"unknown bench {cmd!r}")
