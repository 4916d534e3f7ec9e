"""Checkpoint streaming utilities (reference:
vllm/model_executor/model_loader/weight_utils.py).

Iterates (name, numpy array) pairs from local safetensors / torch
checkpoints. bf16 tensors arrive as ml_dtypes.bfloat16 numpy arrays
(jax consumes them zero-copy).
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

import numpy as np


def _bf16_from_torch(t) -> np.ndarray:
    import ml_dtypes
    import torch

    if t.dtype == torch.bfloat16:
        return t.view(torch.uint16).numpy().view(ml_dtypes.bfloat16)
    if t.dtype == torch.float8_e4m3fn:
        return t.view(torch.uint8).numpy().view(ml_dtypes.float8_e4m3fn)
    return t.numpy()


def safetensors_weights_iterator(
        model_dir: str) -> Iterator[tuple[str, np.ndarray]]:
    from safetensors import safe_open

    files = sorted(f for f in os.listdir(model_dir)
                   if f.endswith(".safetensors"))
    if not files:
        raise FileNotFoundError(f"no .safetensors files in {model_dir}")
    for fname in files:
        path = os.path.join(model_dir, fname)
        try:
            with safe_open(path, framework="numpy") as f:
                for name in f.keys():
                    yield name, f.get_tensor(name)
        except (TypeError, ValueError):
            # numpy framework can't represent some dtypes (bf16/fp8 on old
            # safetensors) — fall back through torch.
            with safe_open(path, framework="pt") as f:
                for name in f.keys():
                    yield name, _bf16_from_torch(f.get_tensor(name))


def torch_bin_weights_iterator(
        model_dir: str) -> Iterator[tuple[str, np.ndarray]]:
    import torch

    files = sorted(f for f in os.listdir(model_dir)
                   if f.endswith(".bin") or f.endswith(".pt"))
    for fname in files:
        state = torch.load(os.path.join(model_dir, fname),
                           map_location="cpu", weights_only=True)
        if "model_key" in state:
            # fairseq2 wrapper: {"model_key": name, name: state_dict}
            # (reference: models/fairseq2_llama.py:52)
            state = state[state["model_key"]]
        for name, t in state.items():
            if hasattr(t, "dtype"):
                yield name, _bf16_from_torch(t)


def weights_iterator(model_dir: str) -> Iterator[tuple[str, np.ndarray]]:
    has_safetensors = any(
        f.endswith(".safetensors") for f in os.listdir(model_dir))
    if has_safetensors:
        yield from safetensors_weights_iterator(model_dir)
    else:
        yield from torch_bin_weights_iterator(model_dir)


def get_quantization_config(model_dir: str) -> dict | None:
    """Read quantization_config from the checkpoint's config.json."""
    cfg_path = os.path.join(model_dir, "config.json")
    if not os.path.exists(cfg_path):
        return None
    with open(cfg_path) as f:
        cfg = json.load(f)
    return cfg.get("quantization_config")
