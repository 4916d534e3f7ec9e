"""Patch-perplexity (P3L) gate (reference behavior parity:
benchmarks/P3L.py:19-42 — sliding-window "patch" perplexity as a
quantization-quality canary; SURVEY.md §6 perplexity gate).

Scores log-loss of the model on text patches: context ctx tokens, score
the next `sample` tokens, slide by `patch`. Works on any local text file
(no network egress)."""

from __future__ import annotations

import argparse
import json
import math

import numpy as np

from vllm_tpu.engine.args import EngineArgs
from vllm_tpu.sampling_params import SamplingParams


def compute_patch_ppl(model, params, tokenizer, text: str, ctx: int,
                      sample: int, patches: int, block_size: int = 16,
                      kv_dtype: str = "auto", token_ids=None):
    """Teacher-forced log-loss via direct model forwards.

    ``kv_dtype`` mirrors CacheConfig.cache_dtype ("auto" | "int8" |
    "fp8_e4m3" | "fp8_e5m2"): prefill attention reads back the KV rows it
    just quantized into the cache, so a low-precision cache's accuracy
    cost shows up in the score (quantization canary, reference
    tests/tpu/test_quantization_accuracy.py)."""
    import jax.numpy as jnp

    from vllm_tpu.ops.attention import AttentionMetadata
    from vllm_tpu.ops.pallas.ragged_paged_attention import \
        build_logical_blocks
    from vllm_tpu.utils import cdiv

    if token_ids is not None:
        ids = np.asarray(token_ids, np.int32)
    else:
        ids = tokenizer(text, return_tensors="np")["input_ids"][0]
    total_nll, total_tokens = 0.0, 0
    a = model.args
    spec = next(iter(model.get_kv_cache_specs(block_size,
                                              "float32").values()))
    for p in range(patches):
        start = p * sample
        window = ids[start:start + ctx + sample]
        if len(window) < ctx + sample:
            break
        T = len(window)
        nb = cdiv(T, block_size) + 1
        qsl = np.array([0, T], np.int32)
        lb_seq, lb_q_start = build_logical_blocks(qsl, T, 1)
        bt = np.arange(1, nb + 1, dtype=np.int32)[None]
        pos = np.arange(T, dtype=np.int32)
        slots = (bt[0][pos // block_size] * block_size +
                 pos % block_size).astype(np.int32)
        md = AttentionMetadata(
            slot_mapping=jnp.asarray(slots),
            block_tables=jnp.asarray(bt),
            query_start_loc=jnp.asarray(qsl),
            seq_lens=jnp.asarray(np.array([T], np.int32)),
            positions=jnp.asarray(pos),
            lb_seq=jnp.asarray(lb_seq),
            lb_q_start=jnp.asarray(lb_q_start))
        from vllm_tpu.core.kv_cache_interface import MLASpec

        if kv_dtype in ("auto", None):
            kv_jdtype = (jnp.bfloat16 if model.dtype == jnp.bfloat16
                         else jnp.float32)
        else:
            kv_jdtype = {"int8": jnp.int8,
                         "fp8": jnp.float8_e4m3fn,
                         "fp8_e4m3": jnp.float8_e4m3fn,
                         "fp8_e5m2": jnp.float8_e5m2}[kv_dtype]
        if isinstance(spec, MLASpec):
            kv = jnp.zeros((a.num_layers, nb + 2, block_size,
                            spec.head_size), kv_jdtype)
        else:
            kv = jnp.zeros((a.num_layers, nb + 2,
                            2 * spec.num_kv_heads, block_size,
                            spec.head_size), kv_jdtype)
        hidden, _ = model.forward(params,
                                  jnp.asarray(window, jnp.int32), [kv],
                                  md)
        import jax

        logits = model.compute_logits(params, hidden[ctx - 1:T - 1])
        log_probs = jax.nn.log_softmax(logits.astype(jnp.float32),
                                       axis=-1)
        logp = jnp.take_along_axis(
            log_probs,
            jnp.asarray(window[ctx:T], jnp.int32)[:, None], axis=-1)
        total_nll += float(-logp.sum())
        total_tokens += T - ctx
    return math.exp(total_nll / max(total_tokens, 1)), total_tokens


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="P3L-style perplexity")
    parser.add_argument("--text-file", required=True)
    parser.add_argument("--context-size", type=int, default=1024)
    parser.add_argument("--sample-size", type=int, default=512)
    parser.add_argument("--patch-size", type=int, default=1)
    EngineArgs.add_cli_args(parser)
    args = parser.parse_args(argv)

    from transformers import AutoTokenizer

    from vllm_tpu.config import ModelConfig
    from vllm_tpu.models.loader import load_model_params
    from vllm_tpu.models.registry import get_model

    engine_args = EngineArgs.from_cli_args(args)
    config = engine_args.create_engine_config()
    model = get_model(config.model_config)
    params = load_model_params(model, config)
    tokenizer = AutoTokenizer.from_pretrained(config.model_config.tokenizer)

    with open(args.text_file) as f:
        text = f.read()
    ppl, n = compute_patch_ppl(model, params, tokenizer, text,
                               args.context_size, args.sample_size,
                               args.patch_size,
                               kv_dtype=config.model_config.kv_cache_dtype)
    print(json.dumps({"metric": "ppl", "value": round(ppl, 4),
                      "tokens_scored": n}))


if __name__ == "__main__":
    main()
