"""Device-mesh parallelism (reference analog: vllm/distributed/parallel_state.py
GroupCoordinator per axis; TPU-native replacement per SURVEY.md §5.8).

Instead of process groups + NCCL calls, one ``jax.sharding.Mesh`` with
named axes and PartitionSpecs per weight; XLA's SPMD partitioner inserts
ICI collectives (all-reduce after row-parallel matmuls, all-gather for the
sharded lm_head) and overlaps them with compute.

Axes (rank order mirrors the reference, parallel_state.py:1003):
  "dp"  data parallel       — replicated engines / per-engine batches
  "pp"  pipeline parallel   — layer-stack (stage) sharding; the decoder
                              stack's leading [L] axis is split into
                              contiguous stages and activations ride a
                              ``ppermute`` ring (parallel/pipeline.py)
  "tp"  tensor parallel     — Megatron-style weight sharding (the common
                              intra-host axis; rides ICI)
Derived axes:
  EP (expert parallel) = flattened ("dp","tp") exactly like the
  reference (parallel_state.py:1092-1097 EP = DP x TP): with
  enable_expert_parallel the expert axis of MoE weights is sharded over
  ("dp","tp") instead of TP-sharding each expert.
  SP (sequence parallel) rides the "tp" axis: XLA's SPMD partitioner
  already rewrites all-reduce -> reduce-scatter + all-gather around
  elementwise regions when profitable (the reference implements this as a
  torch.compile pass, compilation/sequence_parallelism.py).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

EP_AXES = ("dp", "tp")


def make_mesh(tensor_parallel_size: int = 1,
              data_parallel_size: int = 1,
              pipeline_parallel_size: int = 1,
              devices=None) -> Optional[Mesh]:
    if devices is None:
        devices = jax.devices()
    world = (tensor_parallel_size * data_parallel_size *
             pipeline_parallel_size)
    if world <= 1:
        return None
    if world > len(devices):
        raise ValueError(f"need {world} devices, have {len(devices)}")
    grid = np.asarray(devices[:world]).reshape(data_parallel_size,
                                               pipeline_parallel_size,
                                               tensor_parallel_size)
    return Mesh(grid, axis_names=("dp", "pp", "tp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def kv_cache_sharding(mesh: Mesh, ndim: int = 5) -> NamedSharding:
    # [L, num_blocks, 2*kv_heads, page, head] — stages own their
    # layers' KV; the KV heads shard over tp. The 4-dim MLA latent cache
    # [L, num_blocks, page, D] has one shared latent head -> replicated
    # over tp (absorbed-MLA queries differ per head, the cache doesn't).
    if ndim == 4:
        return NamedSharding(mesh, P("pp", None, None, None))
    return NamedSharding(mesh, P("pp", None, "tp", None, None))


def param_shardings(params: Any, mesh: Mesh,
                    enable_expert_parallel: bool = False) -> Any:
    """Megatron-style PartitionSpecs mirroring the model param pytree.

    Column-parallel (shard output dim): qkv, gate_up, lm_head.
    Row-parallel (shard input dim): o, down — XLA inserts the psum.
    Embedding is sharded on vocab (XLA lowers the gather + masking).
    Every stacked layer leaf ([L, ...]) is stage-sharded on "pp".
    MoE expert stacks shard the expert axis over EP_AXES when expert
    parallelism is on, else each expert TP-shards like a dense MLP.
    Works for plain {"w": ...} and quantized {"w_q", "scale", ...} leaves
    (scales follow their weight's output-dim sharding).
    """

    def col(leaf_key: str) -> P:
        # stacked layer weights are [L, in, out]; scales [L, G, out]
        return P("pp", None, "tp")

    def row(leaf_key: str) -> P:
        return P("pp", "tp", None)

    def shard_linear(p: dict, spec_fn) -> dict:
        out = {}
        for k, v in p.items():
            if k in ("w", "w_q", "w_p", "w8"):
                out[k] = spec_fn(k)
            elif k in ("scale", "zero"):
                # grouped scales [L, G, out]: groups follow the input dim
                out[k] = (P("pp", None, "tp")
                          if spec_fn is col else P("pp", "tp", None))
            elif k == "chan_scale":
                # per-channel scales [L, out] follow the output dim
                out[k] = (P("pp", "tp") if spec_fn is col else P("pp"))
            elif k == "w_scale":
                out[k] = P()
            elif k == "b":
                out[k] = (P("pp", "tp") if spec_fn is col else P("pp"))
            else:
                out[k] = P("pp")
        return out

    def stage_only(leaf) -> P:
        # any other stacked per-layer tensor: stage-shard the L axis
        return P(*(["pp"] + [None] * (np.ndim(leaf) - 1)))

    layers = params["layers"]
    layer_specs: dict[str, Any] = {}
    for name, p in layers.items():
        if name in ("qkv", "gate_up"):
            layer_specs[name] = shard_linear(p, col)
        elif name in ("o", "down"):
            layer_specs[name] = shard_linear(p, row)
        elif name == "experts_gate_up":
            # [L, E, H, 2I]
            layer_specs[name] = (P("pp", EP_AXES, None, None)
                                 if enable_expert_parallel else
                                 P("pp", None, None, "tp"))
        elif name == "experts_down":
            # [L, E, I, H]
            layer_specs[name] = (P("pp", EP_AXES, None, None)
                                 if enable_expert_parallel else
                                 P("pp", None, "tp", None))
        elif isinstance(p, dict):
            layer_specs[name] = jax.tree.map(stage_only, p)
        else:
            layer_specs[name] = stage_only(p)

    specs: dict[str, Any] = {
        "embed": {"w": P("tp", None)},
        "layers": layer_specs,
        "final_ln": P(),
        "lm_head": {k: (P(None, "tp") if k in ("w", "w_q", "w_p", "w8")
                        else (P("tp") if k == "chan_scale" else P()))
                    for k in params["lm_head"]},
    }
    # Any extra top-level params default to replicated.
    for k in params:
        if k not in specs:
            specs[k] = jax.tree.map(lambda _: P(), params[k])
    return jax.tree.map(
        lambda spec: NamedSharding(mesh, spec), specs,
        is_leaf=lambda x: isinstance(x, P))


def lora_shardings(mesh: Mesh) -> dict:
    """PartitionSpec factory for LoRA stacks (lora/manager.py), matching
    the target's input/output sharding; stacks are [L, S, in, R] /
    [L, S, R, out] so the leading axis stage-shards like model layers."""
    return {
        "col": {"a": P("pp"), "b": P("pp", None, None, "tp")},
        "row": {"a": P("pp", None, "tp", None), "b": P("pp")},
    }
