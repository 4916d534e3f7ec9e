"""Worker-side multi-LoRA slot manager.

Reference analog: vllm/lora/models.py LRUCacheLoRAModelManager +
worker_manager.py. TPU-native: a *static pool* of S adapter slots lives in
device memory as layer-stacked arrays (one per fused target module), so
the jitted step function sees constant shapes and never recompiles as
adapters come and go. Activating an adapter writes one slot with a donated
in-place ``.at[:, slot].set`` update; eviction is LRU over slots not used
by the current batch.
"""

from __future__ import annotations

import logging
import time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vllm_tpu.lora.peft import (LoRAAdapter, default_target_specs,
                                load_peft_adapter)
from vllm_tpu.lora.request import LoRARequest

logger = logging.getLogger(__name__)


def _set_slot(stack: jnp.ndarray, new: jnp.ndarray,
              slot: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.dynamic_update_index_in_dim(stack, new, slot, 1)


_set_slot_jit = jax.jit(_set_slot, donate_argnums=(0,))


class LoRAManager:

    def __init__(self, model_args, lora_config, dtype,
                 mesh=None) -> None:
        self.max_rank = lora_config.max_lora_rank
        self.num_slots = lora_config.max_loras
        self.dtype = dtype
        self.mesh = mesh
        self.target_specs = default_target_specs(model_args)
        self.num_layers = model_args.num_layers

        S = self.num_slots
        L = self.num_layers
        self.stacks: dict[str, dict[str, jnp.ndarray]] = {}
        for tname, spec in self.target_specs.items():
            rt = spec.n_sub * self.max_rank
            a = jnp.zeros((L, S, spec.in_dim, rt), dtype)
            b = jnp.zeros((L, S, rt, spec.out_dim), dtype)
            if mesh is not None:
                a, b = self._shard(tname, a, b)
            self.stacks[tname] = {"a": a, "b": b}

        # slot state
        self.slot_ids: list[Optional[int]] = [None] * S
        self.id_to_slot: dict[int, int] = {}
        self.last_used: dict[int, float] = {}
        self.registered: dict[int, LoRARequest] = {}
        # host-side cache of repacked adapters (CPU "LoRA cache",
        # reference max_cpu_loras)
        self._cpu_cache: dict[int, LoRAAdapter] = {}
        self.max_cpu = lora_config.max_cpu_loras or max(S * 2, 8)

    # ---------------------------------------------------------- sharding

    def _shard(self, tname: str, a: jnp.ndarray, b: jnp.ndarray):
        from jax.sharding import NamedSharding

        from vllm_tpu.parallel.mesh import lora_shardings

        kind = "col" if tname in ("qkv", "gate_up") else "row"
        spec = lora_shardings(self.mesh)[kind]
        return (jax.device_put(a, NamedSharding(self.mesh, spec["a"])),
                jax.device_put(b, NamedSharding(self.mesh, spec["b"])))

    # ------------------------------------------------------------- verbs

    def add_lora(self, lora_request: LoRARequest) -> bool:
        """Register + eagerly load an adapter into a slot."""
        self.registered[lora_request.lora_int_id] = lora_request
        self._activate_one(lora_request, protected=set())
        return True

    def remove_lora(self, lora_id: int) -> bool:
        self.registered.pop(lora_id, None)
        self._cpu_cache.pop(lora_id, None)
        slot = self.id_to_slot.pop(lora_id, None)
        self.last_used.pop(lora_id, None)
        if slot is None:
            return False
        self.slot_ids[slot] = None
        return True

    def list_loras(self) -> set[int]:
        return set(self.registered) | set(self.id_to_slot)

    def pin_lora(self, lora_id: int) -> bool:
        self.last_used[lora_id] = float("inf")
        return lora_id in self.id_to_slot

    # ------------------------------------------------------------ per-step

    def activate(self,
                 lora_requests: list[LoRARequest]) -> dict[int, int]:
        """Ensure every adapter in the batch is resident; returns
        lora_int_id -> device slot."""
        needed = {r.lora_int_id: r for r in lora_requests if r is not None}
        if len(needed) > self.num_slots:
            raise RuntimeError(
                f"batch uses {len(needed)} adapters > max_loras"
                f"={self.num_slots}")
        protected = set(needed)
        now = time.monotonic()
        for lora_id, req in needed.items():
            if lora_id not in self.id_to_slot:
                self._activate_one(req, protected)
            self.last_used[lora_id] = now
        return dict(self.id_to_slot)

    def _activate_one(self, req: LoRARequest, protected: set[int]) -> int:
        lora_id = req.lora_int_id
        if lora_id in self.id_to_slot:
            return self.id_to_slot[lora_id]
        slot = self._pick_slot(protected)
        adapter = self._get_adapter(req)
        t0 = time.perf_counter()
        slot_arr = jnp.asarray(slot, jnp.int32)
        for tname, stack in self.stacks.items():
            spec = self.target_specs[tname]
            rt = spec.n_sub * self.max_rank
            src = adapter.tensors.get(tname)
            if src is None:
                a = jnp.zeros((self.num_layers, spec.in_dim, rt),
                              self.dtype)
                b = jnp.zeros((self.num_layers, rt, spec.out_dim),
                              self.dtype)
            else:
                a = jnp.asarray(src["a"], self.dtype)
                b = jnp.asarray(src["b"], self.dtype)
            stack["a"] = _set_slot_jit(stack["a"], a, slot_arr)
            stack["b"] = _set_slot_jit(stack["b"], b, slot_arr)
        old = self.slot_ids[slot]
        if old is not None:
            self.id_to_slot.pop(old, None)
        self.slot_ids[slot] = lora_id
        self.id_to_slot[lora_id] = slot
        self.last_used[lora_id] = time.monotonic()
        logger.info("activated LoRA %s (id=%d) in slot %d (%.1f ms)",
                    req.lora_name, lora_id, slot,
                    1e3 * (time.perf_counter() - t0))
        return slot

    def _pick_slot(self, protected: set[int]) -> int:
        for slot, sid in enumerate(self.slot_ids):
            if sid is None:
                return slot
        # LRU eviction among slots not used by the current batch
        candidates = [(self.last_used.get(sid, 0.0), slot)
                      for slot, sid in enumerate(self.slot_ids)
                      if sid not in protected]
        if not candidates:
            raise RuntimeError("no evictable LoRA slot")
        return min(candidates)[1]

    def _get_adapter(self, req: LoRARequest) -> LoRAAdapter:
        adapter = self._cpu_cache.get(req.lora_int_id)
        if adapter is None:
            adapter = load_peft_adapter(req.lora_path, self.num_layers,
                                        self.target_specs, self.max_rank)
            if len(self._cpu_cache) >= self.max_cpu:
                victim = min(self._cpu_cache,
                             key=lambda i: self.last_used.get(i, 0.0))
                del self._cpu_cache[victim]
            self._cpu_cache[req.lora_int_id] = adapter
        return adapter

    # --------------------------------------------------------------- misc

    @property
    def none_slot(self) -> int:
        """Slot index meaning "no adapter" (one_hot maps it to zeros)."""
        return self.num_slots
