"""Pipeline parallelism: stage-sharded layer stack + ppermute ring.

Reference analog: vllm/distributed PP (IntermediateTensors send/recv
between ranks, gpu_model_runner.py:1497-1556) — re-designed for SPMD TPU.
The decoder stack's stacked [L, ...] params and KV cache shard their
leading axis over the "pp" mesh axis (contiguous stages). One serving
step runs a ring of ``pp`` iterations inside a hybrid ``jax.shard_map``
(manual over "pp", auto over "dp"/"tp" so tensor parallelism inside a
stage is still GSPMD-partitioned): every stage applies its resident layer
chunk and passes activations to the next stage with ``lax.ppermute``
(ICI neighbor hop). The live batch starts on stage 0 and finishes on
stage 0 after ``pp`` hops; each stage commits its KV-cache chunk only on
its live iteration.

Per-step utilization is 1/pp, exactly like non-microbatched GPU PP.
The async-scheduling engine keeps ONE step in flight (a depth-1 pipeline,
not the reference's step_with_batch_queue multi-batch queue), so the
1/pp bubble is NOT hidden today — PP here buys memory capacity across
stages, not throughput. Unlike the GPU path there is no host round-trip
between stages: the whole ring is one XLA program.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def _pvary(x, axis: str):
    """Mark a value as device-varying over a manual mesh axis."""
    try:
        return jax.lax.pcast(x, (axis,), to="varying")
    except (AttributeError, TypeError):
        return jax.lax.pvary(x, (axis,))


def pipeline_layers(
    run_layers,  # fn(layers_chunk, kv_chunk, x, metadata, lora) -> (x, kv)
    layers: Any,  # stacked [L, ...] pytree, leading axis pp-sharded
    kv: jnp.ndarray,  # [L, N, 2K, page, D]
    x: jnp.ndarray,  # [T, H] activations (replicated over pp)
    metadata: Any,
    lora,  # None | (lora_params [L, S, ...], token_lora)
    mesh,
    pp: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Run the decoder stack over the pp ring; returns (x, new_kv)."""
    lora_params, token_lora = lora if lora is not None else (None, None)
    perm = [(j, (j + 1) % pp) for j in range(pp)]

    def stage_fn(layers_local, kv_local, x, metadata, lora_local,
                 token_lora):
        stage = jax.lax.axis_index("pp")
        lora_ctx_params = lora_local  # local [L/pp, S, ...] chunk or None
        x = _pvary(x, "pp")
        kv_cur = kv_local
        for k in range(pp):
            lora_k = (None if lora_ctx_params is None else
                      (lora_ctx_params, token_lora))
            # non-live iterations write into the null block (slot 0)
            # instead of copying/selecting the whole KV chunk afterwards
            live = (stage == k)
            import dataclasses as _dc

            md_k = _dc.replace(
                metadata,
                slot_mapping=jnp.where(live, metadata.slot_mapping, 0))
            new_x, kv_cur = run_layers(layers_local, kv_cur, x, md_k,
                                       lora_k)
            x = jax.lax.ppermute(new_x, "pp", perm)
        # after pp hops the live activations are back on stage 0; emit a
        # [pp, T, H] stage-major stack and pick stage 0 outside.
        return x[None], kv_cur

    in_specs = (
        jax.tree.map(lambda _: P("pp"), layers),
        P("pp"),
        P(),
        jax.tree.map(lambda _: P(), metadata),
        (None if lora_params is None else
         jax.tree.map(lambda _: P("pp"), lora_params)),
        None if token_lora is None else P(),
    )
    f = jax.shard_map(stage_fn, mesh=mesh, in_specs=in_specs,
                      out_specs=(P("pp"), P("pp")),
                      axis_names={"pp"}, check_vma=False)
    xs, new_kv = f(layers, kv, x, metadata, lora_params, token_lora)
    return xs[0], new_kv


def pipeline_stream_layers(
    run_layers,  # fn(layers_chunk, kv_chunk, x, metadata, lora) -> (x, kv)
    layers: Any,  # stacked [L, ...] pytree, leading axis pp-sharded
    kv: jnp.ndarray,  # [L, N, 2K, page, D]
    x_inject: jnp.ndarray,  # [T, H] embedded inputs of the NEW batch
    resident: jnp.ndarray,  # [pp, T, H] per-stage in-flight activations
    md_stacked: Any,  # AttentionMetadata, every array [pp, ...]
    mesh,
    pp: int,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """ONE ring hop of the resident streaming pipeline.

    This is the TPU answer to the reference's PP batch-queue
    (vllm/v1/engine/core.py:290 ``step_with_batch_queue``): instead of
    rotating a single live batch through all ``pp`` stages inside one
    step (which makes every stage read its weight chunk ``pp`` times per
    completed batch — no faster than a single chip for bandwidth-bound
    decode), the engine keeps ``pp`` DISJOINT batches in flight, one per
    stage, with their activations resident on device between steps.
    Every step each stage applies its layer chunk ONCE to the batch it
    currently holds (metadata slot s = the batch injected s steps ago),
    then the ring advances by one ``ppermute`` hop.  Per engine step a
    stage reads only W/pp weight bytes, so steady-state decode
    throughput approaches ``pp``x the single-live-batch ring.

    Returns ``(exit_hidden [T, H], new_kv, new_resident [pp, T, H])``
    where ``exit_hidden`` is the final (pre-final-norm) hidden state of
    the batch injected ``pp-1`` steps ago, now fully through the stack.
    """
    perm = [(j, (j + 1) % pp) for j in range(pp)]

    def stage_fn(layers_local, kv_local, x_in, res_local, md_local):
        stage = jax.lax.axis_index("pp")
        # strip the leading pp axis of this stage's metadata slot
        md = jax.tree.map(lambda a: a[0], md_local)
        x = jnp.where(stage == 0, _pvary(x_in, "pp"), res_local[0])
        y, kv_local = run_layers(layers_local, kv_local, x, md, None)
        y = jax.lax.ppermute(y, "pp", perm)
        return y[None], kv_local

    in_specs = (
        jax.tree.map(lambda _: P("pp"), layers),
        P("pp"),
        P(),
        P("pp"),
        jax.tree.map(lambda _: P("pp"), md_stacked),
    )
    f = jax.shard_map(stage_fn, mesh=mesh, in_specs=in_specs,
                      out_specs=(P("pp"), P("pp")),
                      axis_names={"pp"}, check_vma=False)
    new_resident, new_kv = f(layers, kv, x_inject, resident, md_stacked)
    # after the hop, stage 0 holds the exiting batch's final hiddens
    return new_resident[0], new_kv, new_resident
