"""Quantization-accuracy gate: measured delta-ppl across serving configs.

BASELINE.json's accuracy north star demands <=0.1 ppl delta vs FP16 at
the serving bit-widths. This scores a *trained* checkpoint (produced by
tools/train_tiny_llama.py on local text — the environment has no network
egress, so no public checkpoint is fetchable) through the engine's real
load + forward path (models/loader.py quantized load, ops/quant.py
grouped matmul, ops/attention.py quantized KV write/read) and prints one
JSON line per config plus the delta table (reference analog:
benchmarks/P3L.py, tests/tpu/test_quantization_accuracy.py:24-35).

It also cross-checks the fp32 JAX score against the same checkpoint run
under torch/transformers — proving the engine's forward itself is
faithful before any quantization delta is attributed.

Usage:
  python tools/quant_accuracy.py --model /tmp/tiny_trained \
      [--ctx 256] [--sample 128] [--patches 12] [--platform cpu]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def torch_patch_ppl(model_dir: str, text: str, ctx: int, sample: int,
                    patches: int, token_ids=None) -> tuple[float, int]:
    """Same patch protocol as vllm_tpu.benchmarks.ppl, via transformers."""
    import torch
    from transformers import AutoModelForCausalLM, AutoTokenizer

    model = AutoModelForCausalLM.from_pretrained(
        model_dir, torch_dtype=torch.float32).eval()
    if token_ids is not None:
        ids = torch.tensor(token_ids, dtype=torch.long)
    else:
        tok = AutoTokenizer.from_pretrained(model_dir)
        ids = tok(text, return_tensors="pt")["input_ids"][0]
    total_nll, total_tokens = 0.0, 0
    with torch.no_grad():
        for p in range(patches):
            start = p * sample
            window = ids[start:start + ctx + sample]
            if len(window) < ctx + sample:
                break
            T = len(window)
            logits = model(window[None]).logits[0]
            lp = torch.log_softmax(logits[ctx - 1:T - 1].float(), -1)
            tgt = window[ctx:T]
            total_nll += float(-lp[torch.arange(T - ctx), tgt].sum())
            total_tokens += T - ctx
    return math.exp(total_nll / max(total_tokens, 1)), total_tokens


CONFIGS = [
    # (label, dtype, quantization, kv_cache_dtype)
    ("fp32", "float32", None, "auto"),
    ("bf16", "bfloat16", None, "auto"),
    ("int8-w", "bfloat16", "int8", "auto"),
    ("int4-w", "bfloat16", "int4", "auto"),
    ("int8-kv", "bfloat16", None, "int8"),
    ("fp8-kv", "bfloat16", None, "fp8_e4m3"),
    ("int4-w+int8-kv", "bfloat16", "int4", "int8"),  # bench north star
]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True,
                    help="trained HF checkpoint dir (with eval.txt)")
    ap.add_argument("--text-file", default=None)
    ap.add_argument("--ctx", type=int, default=256)
    ap.add_argument("--sample", type=int, default=128)
    ap.add_argument("--patches", type=int, default=12)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--gate", type=float, default=0.1,
                    help="max |delta ppl| vs fp16/bf16 (BASELINE.json)")
    ap.add_argument("--configs", default=None,
                    help="comma-separated subset of config labels")
    args = ap.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    text_file = args.text_file or f"{args.model}/eval.txt"
    ids_file = os.path.join(args.model, "eval_ids.npy")
    text = None
    eval_ids = None
    if args.text_file is None and os.path.exists(ids_file):
        # tokenizer decode does not round-trip; prefer the exact ids
        import numpy as np

        eval_ids = np.load(ids_file)
    else:
        with open(text_file) as f:
            text = f.read()

    t_ppl, n = torch_patch_ppl(args.model, text, args.ctx, args.sample,
                               args.patches, token_ids=eval_ids)
    print(json.dumps({"config": "torch-fp32", "ppl": round(t_ppl, 4),
                      "tokens": n}), flush=True)

    from transformers import AutoTokenizer

    from vllm_tpu.benchmarks.ppl import compute_patch_ppl
    from vllm_tpu.config import CacheConfig, EngineConfig, ModelConfig
    from vllm_tpu.models.loader import load_model_params
    from vllm_tpu.models.registry import get_model

    tokenizer = (None if eval_ids is not None
                 else AutoTokenizer.from_pretrained(args.model))
    wanted = args.configs.split(",") if args.configs else None
    results: dict[str, float] = {}
    for label, dtype, quant, kv_dtype in CONFIGS:
        if wanted and label not in wanted:
            continue
        mc = ModelConfig(model=args.model, dtype=dtype,
                         quantization=quant, kv_cache_dtype=kv_dtype,
                         skip_tokenizer_init=True)
        mc.resolve_hf_config()
        config = EngineConfig(model_config=mc,
                              cache_config=CacheConfig(
                                  cache_dtype=kv_dtype))
        model = get_model(mc)
        params = load_model_params(model, config)
        ppl, n = compute_patch_ppl(model, params, tokenizer, text,
                                   args.ctx, args.sample, args.patches,
                                   kv_dtype=kv_dtype, token_ids=eval_ids)
        results[label] = ppl
        print(json.dumps({"config": label, "ppl": round(ppl, 4),
                          "tokens": n}), flush=True)

    base = results.get("bf16", results.get("fp32"))
    ok = True
    if "fp32" in results:
        drift = abs(results["fp32"] - t_ppl)
        print(f"# engine-vs-torch fp32 drift: {drift:.4f} "
              f"({'OK' if drift < 0.05 * t_ppl else 'SUSPECT'})")
    print("# delta vs bf16 baseline (gate: |delta| <= "
          f"{args.gate}):")
    for label, ppl in results.items():
        if label in ("fp32", "bf16") or base is None:
            continue
        delta = ppl - base
        verdict = "PASS" if abs(delta) <= args.gate else "FAIL"
        if verdict == "FAIL":
            ok = False
        print(json.dumps({"config": label, "delta_ppl": round(delta, 4),
                          "verdict": verdict}), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
