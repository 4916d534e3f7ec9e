"""TPU worker: device init, model load, memory profiling, KV allocation
(reference: vllm/v1/worker/gpu_worker.py:43, tpu_worker.py:38)."""

from __future__ import annotations

import logging
from typing import Any, Optional

import jax

from vllm_tpu.config import EngineConfig
from vllm_tpu.core.kv_cache_interface import KVCacheConfig, KVCacheSpec
from vllm_tpu.core.sched.output import ModelRunnerOutput, SchedulerOutput
from vllm_tpu.worker.model_runner import TPUModelRunner

logger = logging.getLogger(__name__)


class Worker:

    def __init__(self, engine_config: EngineConfig, rank: int = 0) -> None:
        self.config = engine_config
        self.rank = rank
        self.mesh = None
        self.runner: Optional[TPUModelRunner] = None
        self._kv_save_pool = None  # lazy; see kv_save_blocks

    # -- lifecycle -----------------------------------------------------------

    def init_device(self) -> None:
        pc = self.config.parallel_config
        if pc.world_size > 1:
            from vllm_tpu.parallel.mesh import make_mesh

            self.mesh = make_mesh(pc.tensor_parallel_size,
                                  pc.data_parallel_size,
                                  pc.pipeline_parallel_size)
        self.runner = TPUModelRunner(self.config, mesh=self.mesh)

    def load_model(self) -> None:
        self.runner.load_model()

    def get_kv_cache_specs(self) -> dict[str, KVCacheSpec]:
        return self.runner.get_kv_cache_specs()

    def determine_available_memory(self) -> int:
        """Free HBM for the KV cache after weights + activation peak
        (reference: gpu_worker.py:211, tpu_worker.py:166)."""
        self.runner.profile_run()
        util = self.config.cache_config.gpu_memory_utilization
        device = jax.local_devices()[0]
        stats = getattr(device, "memory_stats", lambda: None)() or {}
        limit = stats.get("bytes_limit")
        in_use = stats.get("bytes_in_use", stats.get("peak_bytes_in_use", 0))
        if limit:
            return max(int(limit * util) - int(in_use), 0)
        if device.platform == "tpu":
            return self._estimate_tpu_budget(util)
        # CPU backend: no HBM accounting — use a fixed test budget.
        return 256 * 1024 * 1024

    def _estimate_tpu_budget(self, util: float) -> int:
        """Some TPU runtimes (the axon tunnel here) expose no
        memory_stats; budget = chip HBM x util - resident weights -
        an activation-peak reserve sized from the largest compiled
        bucket. Override chip HBM with VLLM_TPU_HBM_GB."""
        from vllm_tpu import envs

        device = jax.local_devices()[0]
        kind = getattr(device, "device_kind", "")
        hbm_gb = envs.VLLM_TPU_HBM_GB
        if not hbm_gb:
            table = {"TPU v5 lite": 16, "TPU v5e": 16, "TPU v5p": 95,
                     "TPU v4": 32, "TPU v6 lite": 32, "TPU v6e": 32,
                     "TPU v3": 16, "TPU v2": 8}
            hbm_gb = table.get(kind, 16)

        def tree_bytes(tree) -> int:
            total = 0
            for leaf in jax.tree.leaves(tree):
                total += getattr(leaf, "nbytes", 0)
            return total

        runner = self.runner
        used = tree_bytes(runner.params)
        used += tree_bytes(runner.draft_params)
        if runner.lora_manager is not None:
            used += tree_bytes(runner.lora_manager.stacks)

        # activation peak: prefer XLA's memory analysis of the largest
        # compiled bucket; fall back to a formula (logits + live
        # hidden/FFN slices) when the AOT stats aren't exposed
        measured = runner.measure_activation_peak()
        if measured is not None:
            reserve = max(int(measured * 1.1), 1 << 29)
        else:
            a = runner.model.args
            T = runner.token_buckets[-1]
            R = runner.req_buckets[-1]
            vocab = getattr(a, "vocab_size", 131072)
            inter = getattr(a, "intermediate_size", 4 * a.hidden_size)
            logits_bytes = max(R, 1) * vocab * 4 * 3
            fwd_bytes = T * (a.hidden_size * 6 + inter * 2) * 2
            reserve = max(logits_bytes + fwd_bytes, 1 << 30)

        budget = int(hbm_gb * (1 << 30) * util) - used - reserve
        return max(budget, 256 * 1024 * 1024)

    def initialize_from_config(self,
                               kv_cache_config: KVCacheConfig) -> None:
        self.runner.initialize_kv_cache(kv_cache_config)

    def compile_or_warm_up_model(self) -> None:
        self.runner.capture_model()

    # -- steady state ----------------------------------------------------------

    def execute_model(
            self, scheduler_output: SchedulerOutput) -> ModelRunnerOutput:
        return self.runner.execute_model(scheduler_output)

    # -- control verbs ----------------------------------------------------------

    def apply_method(self, method: str, *args, **kwargs) -> Any:
        """collective_rpc target: run a named method (reference:
        multiproc_executor worker_busy_loop dispatch)."""
        return getattr(self, method)(*args, **kwargs)

    def save_sharded_state(self, path: str) -> None:
        """Persist the processed device param tree for fast restart with
        --load-format sharded_state (reference:
        sharded_state_loader.py)."""
        from vllm_tpu.models.loader import save_sharded_state

        save_sharded_state(self.runner.params, path)

    def sleep(self, level: int = 1) -> None:
        """Discard KV cache (and weights at level 2) to free HBM for an
        external trainer (reference: gpu_worker sleep/wake_up; the CUDA VMM
        allocator has no TPU analog — arrays are simply dropped and
        re-created, SURVEY §2.7 cumem_allocator row)."""
        self.runner.kv_caches = []
        if level >= 2:
            self.runner.params = None

    def wake_up(self, tags: Optional[list[str]] = None) -> None:
        if self.runner.params is None:
            self.runner.load_model()
        if not self.runner.kv_caches and self.runner.kv_cache_config:
            self.runner.initialize_kv_cache(self.runner.kv_cache_config)

    def profile(self, is_start: bool = True) -> None:
        if is_start:
            from vllm_tpu import envs

            trace_dir = envs.VLLM_TPU_PROFILE_DIR
            jax.profiler.start_trace(trace_dir)
        else:
            jax.profiler.stop_trace()

    def check_health(self) -> bool:
        return True

    def flush_kv_saves(self) -> None:
        """Drain pending async KV-save writes (durability barrier:
        engine shutdown / sleep must not drop queued tier writes)."""
        if self._kv_save_pool is not None:
            self._kv_save_pool.shutdown(wait=True)
            self._kv_save_pool = None

    def finalize_pending(self):
        """Async scheduling: fetch + build the oldest dispatched step's
        output (reference: async-scheduling sampled-token lag)."""
        return self.runner.finalize_pending()

    # -- KV transfer (disagg P/D; reference: worker-side connector hooks)

    def kv_save_blocks(self, saves: list) -> None:
        """Persist finished requests' KV. The D2H fetch runs inline
        (the freed blocks may be reallocated by the very next schedule,
        so the device rows must be read now); the storage write runs on
        a background thread so file/network IO never blocks the engine
        loop (reference: async KV-save worker hooks)."""
        connector = self.runner.kv_connector
        if connector is None:
            return
        for spec in saves:
            fetched = connector.fetch_blocks(self.runner.kv_caches, spec)
            if fetched is None:  # connector without the async split
                connector.save_blocks(self.runner.kv_caches, spec)
                continue
            if self._kv_save_pool is None:
                from concurrent.futures import ThreadPoolExecutor

                self._kv_save_pool = ThreadPoolExecutor(
                    max_workers=1, thread_name_prefix="kv-save")
            self._kv_save_pool.submit(connector.write_blocks, spec,
                                      fetched)

    # -- LoRA verbs (reference: gpu_worker add_lora/remove_lora/list_loras)

    def add_lora(self, lora_request: Any) -> bool:
        if self.runner.lora_manager is None:
            raise RuntimeError("LoRA is not enabled (--enable-lora)")
        return self.runner.lora_manager.add_lora(lora_request)

    def remove_lora(self, lora_id: int) -> bool:
        if self.runner.lora_manager is None:
            return False
        return self.runner.lora_manager.remove_lora(lora_id)

    def list_loras(self) -> set[int]:
        if self.runner.lora_manager is None:
            return set()
        return self.runner.lora_manager.list_loras()

    def pin_lora(self, lora_id: int) -> bool:
        if self.runner.lora_manager is None:
            return False
        return self.runner.lora_manager.pin_lora(lora_id)
