"""CLI: ``python -m vllm_tpu serve|bench|collect-env``
(reference: vllm/entrypoints/cli/main.py:12-57)."""

from __future__ import annotations

import argparse
import sys


def cmd_serve(argv: list[str]) -> None:
    from vllm_tpu.entrypoints.openai.api_server import (make_arg_parser,
                                                        run_server)

    parser = make_arg_parser()
    # `vllm serve MODEL` positional convenience
    parser.add_argument("model_tag", nargs="?", default=None)
    # Multi-host follower mode (reference: vllm serve --headless for
    # multi-node data parallel, cli/serve.py)
    parser.add_argument("--headless", action="store_true", default=False)
    args = parser.parse_args(argv)
    if args.model_tag and not args.model:
        args.model = args.model_tag
    import logging

    logging.basicConfig(level=logging.INFO)
    if args.headless:
        from vllm_tpu.engine.args import EngineArgs
        from vllm_tpu.executor.multihost import run_follower

        engine_args = EngineArgs.from_cli_args(args)
        run_follower(engine_args.create_engine_config())
        return
    run_server(args)


def cmd_bench(argv: list[str]) -> None:
    from vllm_tpu.benchmarks.main import main as bench_main

    bench_main(argv)


def cmd_run_batch(argv: list[str]) -> None:
    from vllm_tpu.entrypoints.run_batch import main as rb_main

    import logging

    logging.basicConfig(level=logging.INFO)
    rb_main(argv)


def cmd_collect_env(argv: list[str]) -> None:
    import platform

    import jax

    print(f"python: {platform.python_version()}")
    print(f"jax: {jax.__version__}")
    print(f"backend: {jax.default_backend()}")
    print(f"devices: {jax.devices()}")
    import vllm_tpu

    print(f"vllm_tpu: {vllm_tpu.__version__}")


def main() -> None:
    argv = sys.argv[1:]
    if not argv or argv[0] in ("-h", "--help"):
        print("usage: vllm_tpu {serve,bench,run-batch,collect-env} ...")
        return
    cmd, rest = argv[0], argv[1:]
    if cmd == "serve":
        cmd_serve(rest)
    elif cmd == "bench":
        cmd_bench(rest)
    elif cmd == "run-batch":
        cmd_run_batch(rest)
    elif cmd == "collect-env":
        cmd_collect_env(rest)
    else:
        print(f"unknown command {cmd!r}; expected "
              "serve|bench|run-batch|collect-env")
        sys.exit(2)


if __name__ == "__main__":
    main()
