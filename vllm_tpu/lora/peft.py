"""PEFT LoRA checkpoint ingestion → fused stacked layout.

Reference analog: vllm/lora/models.py LoRAModel.from_local_checkpoint
(reads adapter_config.json + adapter_model.safetensors) and
lora/utils.py target-module mapping. Here the adapter is repacked at load
time into the fused, layer-stacked layout the TPU forward pass consumes
(see vllm_tpu/lora/ops.py): per fused target module one
  a: [L, in,  n_sub*max_rank]    (A matrices, transposed)
  b: [L, n_sub*max_rank, out]    (B matrices, transposed, *scaling,
                                  block-diagonal across sub-adapters)
"""

from __future__ import annotations

import json
import math
import os
import re
from dataclasses import dataclass
from typing import Any, Optional

import numpy as np


@dataclass(frozen=True)
class SubTarget:
    """One HF module folded into a fused target."""
    index: int  # rank-range index within the fused target
    out_start: int
    out_len: int


@dataclass(frozen=True)
class TargetSpec:
    in_dim: int
    out_dim: int
    subs: dict[str, SubTarget]  # peft module name -> placement

    @property
    def n_sub(self) -> int:
        return len(self.subs)


def default_target_specs(args) -> dict[str, TargetSpec]:
    """Fused target specs for the Llama-family layer layout."""
    nq, nk, d = args.num_heads, args.num_kv_heads, args.head_dim
    H, I = args.hidden_size, args.intermediate_size
    return {
        "qkv": TargetSpec(H, (nq + 2 * nk) * d, {
            "q_proj": SubTarget(0, 0, nq * d),
            "k_proj": SubTarget(1, nq * d, nk * d),
            "v_proj": SubTarget(2, (nq + nk) * d, nk * d),
        }),
        "o": TargetSpec(nq * d, H, {"o_proj": SubTarget(0, 0, H)}),
        "gate_up": TargetSpec(H, 2 * I, {
            "gate_proj": SubTarget(0, 0, I),
            "up_proj": SubTarget(1, I, I),
        }),
        "down": TargetSpec(I, H, {"down_proj": SubTarget(0, 0, H)}),
    }


_KEY_RE = re.compile(
    r"\.layers\.(\d+)\.(?:self_attn|mlp)\.(\w+)\.lora_(A|B)\.weight$")


def _load_tensors(path: str) -> dict[str, np.ndarray]:
    st = os.path.join(path, "adapter_model.safetensors")
    if os.path.exists(st):
        try:
            from safetensors.numpy import load_file
            return load_file(st)
        except Exception:
            from safetensors.torch import load_file as tload
            return {k: v.float().numpy() for k, v in tload(st).items()}
    bin_path = os.path.join(path, "adapter_model.bin")
    if os.path.exists(bin_path):
        import torch
        sd = torch.load(bin_path, map_location="cpu", weights_only=True)
        return {k: v.float().numpy() for k, v in sd.items()}
    raise FileNotFoundError(f"no adapter weights found under {path}")


@dataclass
class LoRAAdapter:
    """One adapter repacked to the fused stacked layout."""
    rank: int
    # target -> {"a": [L, in, Rtot], "b": [L, Rtot, out]} (float32)
    tensors: dict[str, dict[str, np.ndarray]]


def load_peft_adapter(path: str, num_layers: int,
                      target_specs: dict[str, TargetSpec],
                      max_rank: int) -> LoRAAdapter:
    cfg_path = os.path.join(path, "adapter_config.json")
    with open(cfg_path) as f:
        cfg = json.load(f)
    r = int(cfg.get("r", 8))
    if r > max_rank:
        raise ValueError(
            f"adapter rank {r} exceeds max_lora_rank {max_rank}")
    alpha = float(cfg.get("lora_alpha", r))
    scaling = (alpha / math.sqrt(r) if cfg.get("use_rslora")
               else alpha / r)

    sub_to_target = {
        sub_name: (tname, sub)
        for tname, spec in target_specs.items()
        for sub_name, sub in spec.subs.items()
    }

    tensors: dict[str, dict[str, np.ndarray]] = {}

    def ensure(tname: str) -> dict[str, np.ndarray]:
        if tname not in tensors:
            spec = target_specs[tname]
            rt = spec.n_sub * max_rank
            tensors[tname] = {
                "a": np.zeros((num_layers, spec.in_dim, rt), np.float32),
                "b": np.zeros((num_layers, rt, spec.out_dim), np.float32),
            }
        return tensors[tname]

    raw = _load_tensors(path)
    for key, w in raw.items():
        m = _KEY_RE.search(key)
        if m is None:
            continue
        layer, module, ab = int(m.group(1)), m.group(2), m.group(3)
        if module not in sub_to_target or layer >= num_layers:
            continue
        tname, sub = sub_to_target[module]
        dst = ensure(tname)
        r0 = sub.index * max_rank
        w = np.asarray(w, np.float32)
        if ab == "A":  # peft lora_A: [r, in]
            dst["a"][layer, :, r0:r0 + w.shape[0]] = w.T
        else:  # peft lora_B: [out, r]
            dst["b"][layer, r0:r0 + w.shape[1],
                     sub.out_start:sub.out_start + sub.out_len] = \
                w.T * scaling
    if not tensors:
        raise ValueError(
            f"adapter at {path} targets none of "
            f"{sorted(sub_to_target)} (keys: {sorted(raw)[:4]}...)")
    return LoRAAdapter(rank=r, tensors=tensors)


def save_peft_adapter(path: str, num_layers: int, rank: int, alpha: float,
                      weights: dict[str, tuple[np.ndarray, np.ndarray]],
                      ) -> None:
    """Write a PEFT-format adapter dir (test/tooling helper).

    weights: module name (e.g. "q_proj") -> (A [r, in], B [out, r]);
    the same matrices are written for every layer.
    """
    os.makedirs(path, exist_ok=True)
    modules = sorted(weights)
    with open(os.path.join(path, "adapter_config.json"), "w") as f:
        json.dump({"r": rank, "lora_alpha": alpha,
                   "target_modules": modules,
                   "peft_type": "LORA"}, f)
    attn = {"q_proj", "k_proj", "v_proj", "o_proj"}
    tensors: dict[str, np.ndarray] = {}
    for i in range(num_layers):
        for mod in modules:
            a, b = weights[mod]
            parent = "self_attn" if mod in attn else "mlp"
            base = f"base_model.model.model.layers.{i}.{parent}.{mod}"
            tensors[f"{base}.lora_A.weight"] = np.asarray(a, np.float32)
            tensors[f"{base}.lora_B.weight"] = np.asarray(b, np.float32)
    from safetensors.numpy import save_file
    save_file(tensors, os.path.join(path, "adapter_model.safetensors"))
