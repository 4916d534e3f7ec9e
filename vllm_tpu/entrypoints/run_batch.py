"""Offline OpenAI-batch-file processing
(reference behavior parity: vllm/entrypoints/openai/run_batch.py —
`vllm run-batch -i requests.jsonl -o results.jsonl`).

Input lines: {"custom_id", "method": "POST", "url": "/v1/chat/completions"
| "/v1/completions" | "/v1/embeddings", "body": {...}}.
Output lines mirror the OpenAI batch response envelope."""

from __future__ import annotations

import argparse
import json
import logging
from typing import Any

from vllm_tpu.engine.args import EngineArgs
from vllm_tpu.entrypoints.openai.protocol import random_uuid
from vllm_tpu.sampling_params import PoolingParams, SamplingParams

logger = logging.getLogger(__name__)


def _sampling_from_body(body: dict, default_max: int) -> SamplingParams:
    return SamplingParams(
        temperature=body.get("temperature", 1.0),
        top_p=body.get("top_p", 1.0),
        max_tokens=body.get("max_tokens",
                            body.get("max_completion_tokens",
                                     default_max)),
        stop=body.get("stop"),
        seed=body.get("seed"),
        presence_penalty=body.get("presence_penalty", 0.0),
        frequency_penalty=body.get("frequency_penalty", 0.0),
    )


def run_batch(args: argparse.Namespace) -> None:
    from vllm_tpu.engine.llm_engine import LLMEngine

    engine_args = EngineArgs.from_cli_args(args)
    engine = LLMEngine(engine_args.create_engine_config())
    tokenizer = engine.tokenizer

    with open(args.input_file) as f:
        lines = [json.loads(line) for line in f if line.strip()]

    # submit everything (continuous batching does the rest)
    kinds: dict[str, tuple[str, dict]] = {}
    for i, item in enumerate(lines):
        rid = f"batch-{i}"
        body = item.get("body", {})
        url = item.get("url", "/v1/chat/completions")
        kinds[rid] = (url, item)
        if url.endswith("/chat/completions"):
            prompt = tokenizer.apply_chat_template(
                body.get("messages", []), tokenize=False,
                add_generation_prompt=True)
            engine.add_request(rid, prompt,
                               _sampling_from_body(body, 256))
        elif url.endswith("/completions"):
            engine.add_request(rid, body.get("prompt", ""),
                               _sampling_from_body(body, 256))
        elif url.endswith("/embeddings"):
            engine.add_request(
                rid, body.get("input", ""),
                PoolingParams(task="embed",
                              dimensions=body.get("dimensions")))
        else:
            raise ValueError(f"unsupported url {url!r}")

    results: dict[str, Any] = {}
    while engine.has_unfinished_requests():
        for out in engine.step():
            if out.finished:
                results[out.request_id] = out

    with open(args.output_file, "w") as f:
        for i, item in enumerate(lines):
            rid = f"batch-{i}"
            url, orig = kinds[rid]
            out = results.get(rid)
            if out is None:
                envelope = {"custom_id": orig.get("custom_id"),
                            "error": {"message": "request lost"}}
            else:
                if url.endswith("/embeddings"):
                    body = {"object": "list", "data": [{
                        "object": "embedding", "index": 0,
                        "embedding": [float(x) for x in out.outputs.data],
                    }]}
                elif url.endswith("/chat/completions"):
                    c = out.outputs[0]
                    body = {"choices": [{
                        "index": 0,
                        "message": {"role": "assistant",
                                    "content": c.text},
                        "finish_reason": c.finish_reason,
                    }]}
                else:
                    c = out.outputs[0]
                    body = {"choices": [{
                        "index": 0, "text": c.text,
                        "finish_reason": c.finish_reason,
                    }]}
                envelope = {
                    "id": f"vllm-{random_uuid()}",
                    "custom_id": orig.get("custom_id"),
                    "response": {"status_code": 200, "body": body},
                    "error": None,
                }
            f.write(json.dumps(envelope) + "\n")
    logger.info("wrote %d results to %s", len(lines), args.output_file)


def make_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="vllm-tpu offline batch runner")
    parser.add_argument("-i", "--input-file", required=True)
    parser.add_argument("-o", "--output-file", required=True)
    EngineArgs.add_cli_args(parser)
    return parser


def main(argv=None) -> None:
    run_batch(make_parser().parse_args(argv))


if __name__ == "__main__":
    main()
