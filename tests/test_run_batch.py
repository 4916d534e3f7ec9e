"""run-batch CLI + P3L perplexity smoke (reference analog:
entrypoints/openai/run_batch.py tests, benchmarks/P3L.py)."""

import argparse
import json
import math

from tests.test_llm_engine import tiny_model_dir  # noqa: F401 fixture


def test_run_batch_roundtrip(tiny_model_dir, tmp_path):  # noqa: F811
    from vllm_tpu.entrypoints.run_batch import main

    infile, outfile = tmp_path / "in.jsonl", tmp_path / "out.jsonl"
    reqs = [
        {"custom_id": "c1", "method": "POST",
         "url": "/v1/chat/completions",
         "body": {"messages": [{"role": "user", "content": "hi there"}],
                  "max_tokens": 4, "temperature": 0}},
        {"custom_id": "c2", "method": "POST", "url": "/v1/completions",
         "body": {"prompt": "the quick brown", "max_tokens": 4,
                  "temperature": 0}},
        {"custom_id": "c3", "method": "POST", "url": "/v1/embeddings",
         "body": {"input": "hello world"}},
    ]
    with open(infile, "w") as f:
        for r in reqs:
            f.write(json.dumps(r) + "\n")

    main([
        "-i", str(infile), "-o", str(outfile),
        "--model", tiny_model_dir, "--dtype", "float32",
        "--max-model-len", "128", "--max-num-seqs", "8",
        "--max-num-batched-tokens", "256", "--block-size", "16",
        "--num-gpu-blocks-override", "64", "--enforce-eager",
    ])

    with open(outfile) as f:
        results = [json.loads(line) for line in f]
    assert len(results) == 3
    by_id = {r["custom_id"]: r for r in results}
    assert by_id["c1"]["response"]["status_code"] == 200
    assert "message" in by_id["c1"]["response"]["body"]["choices"][0]
    assert "text" in by_id["c2"]["response"]["body"]["choices"][0]
    emb = by_id["c3"]["response"]["body"]["data"][0]["embedding"]
    assert len(emb) == 64  # hidden size of the tiny model


def test_patch_ppl(tiny_model_dir, tmp_path):  # noqa: F811
    import jax

    from transformers import AutoTokenizer

    from vllm_tpu.benchmarks.ppl import compute_patch_ppl
    from vllm_tpu.config import ModelConfig
    from vllm_tpu.models.loader import load_model_params
    from vllm_tpu.models.registry import get_model
    from vllm_tpu.config import EngineConfig

    mc = ModelConfig(model=tiny_model_dir, dtype="float32")
    model = get_model(mc)
    params = load_model_params(model, EngineConfig(model_config=mc))
    tok = AutoTokenizer.from_pretrained(tiny_model_dir)
    text = "the quick brown fox jumps over the lazy dog " * 20
    ppl, n = compute_patch_ppl(model, params, tok, text, ctx=16,
                               sample=8, patches=3)
    assert n == 24
    assert math.isfinite(ppl) and ppl > 1.0
