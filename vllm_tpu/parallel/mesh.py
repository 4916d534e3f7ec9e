"""Device-mesh parallelism (reference analog: vllm/distributed/parallel_state.py
GroupCoordinator per axis; TPU-native replacement per SURVEY.md §5.8).

Instead of process groups + NCCL calls, one ``jax.sharding.Mesh`` with
named axes and PartitionSpecs per weight; XLA's SPMD partitioner inserts
ICI collectives (all-reduce after row-parallel matmuls, all-gather for the
sharded lm_head) and overlaps them with compute.

Axes:
  "dp"  data parallel       — replicated engines / per-engine batches
  "tp"  tensor parallel     — Megatron-style weight sharding (the common
                              intra-host axis; rides ICI)
Expert parallelism reuses "tp" for now (EP = DP x TP flattening in the
reference, parallel_state.py:1092-1097); pipeline stages are a host-level
concept handled by the executor.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(tensor_parallel_size: int = 1,
              data_parallel_size: int = 1,
              devices=None) -> Optional[Mesh]:
    if devices is None:
        devices = jax.devices()
    world = tensor_parallel_size * data_parallel_size
    if world <= 1:
        return None
    if world > len(devices):
        raise ValueError(
            f"need {world} devices, have {len(devices)}")
    grid = np.asarray(devices[:world]).reshape(data_parallel_size,
                                               tensor_parallel_size)
    return Mesh(grid, axis_names=("dp", "tp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def kv_cache_sharding(mesh: Mesh) -> NamedSharding:
    # [L, num_blocks, page, 2*kv_heads, head] — shard the KV heads.
    return NamedSharding(mesh, P(None, None, None, "tp", None))


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """Megatron-style PartitionSpecs mirroring the model param pytree.

    Column-parallel (shard output dim): qkv, gate_up, lm_head.
    Row-parallel (shard input dim): o, down — XLA inserts the psum.
    Embedding is sharded on vocab (XLA lowers the gather + masking).
    Works for plain {"w": ...} and quantized {"w_q", "scale", ...} leaves
    (scales follow their weight's output-dim sharding).
    """

    def col(leaf_key: str) -> P:
        # stacked layer weights are [L, in, out]; scales [L, G, out]
        return P(None, None, "tp")

    def row(leaf_key: str) -> P:
        return P(None, "tp", None)

    def shard_linear(p: dict, spec_fn) -> dict:
        out = {}
        for k, v in p.items():
            if k in ("w", "w_q"):
                out[k] = spec_fn(k)
            elif k in ("scale", "zero"):
                # grouped scales [L, G, out]: groups follow the input dim
                out[k] = (P(None, None, "tp")
                          if spec_fn is col else P(None, "tp", None))
            elif k == "w_scale":
                out[k] = P()
            elif k == "b":
                out[k] = (P(None, "tp") if spec_fn is col else P())
            else:
                out[k] = P()
        return out

    layers = params["layers"]
    layer_specs: dict[str, Any] = {}
    for name, p in layers.items():
        if name in ("qkv", "gate_up"):
            layer_specs[name] = shard_linear(p, col)
        elif name in ("o", "down"):
            layer_specs[name] = shard_linear(p, row)
        elif isinstance(p, dict):
            layer_specs[name] = jax.tree.map(lambda _: P(), p)
        else:
            layer_specs[name] = P()

    specs: dict[str, Any] = {
        "embed": {"w": P("tp", None)},
        "layers": layer_specs,
        "final_ln": P(),
        "lm_head": {k: (P(None, "tp") if k in ("w", "w_q") else P())
                    for k in params["lm_head"]},
    }
    # Any extra top-level params default to replicated.
    for k in params:
        if k not in specs:
            specs[k] = jax.tree.map(lambda _: P(), params[k])
    return jax.tree.map(
        lambda spec: NamedSharding(mesh, spec), specs,
        is_leaf=lambda x: isinstance(x, P))
