"""Central environment-flag registry (reference: vllm/envs.py — 277
lazily-resolved VLLM_* flags; this engine keeps the same one-module
shape with its much smaller surface).

Flags resolve lazily via attribute access (``vllm_tpu.envs.FLAG``) so a
flag set after import is still honored, matching the reference's
module-level ``__getattr__`` pattern (vllm/envs.py:651).
"""

from __future__ import annotations

import os
from typing import Any, Callable

_FLAGS: dict[str, Callable[[], Any]] = {
    # Run Pallas kernels in interpret mode (CPU kernel unit tests).
    "VLLM_TPU_PALLAS_INTERPRET":
    lambda: os.environ.get("VLLM_TPU_PALLAS_INTERPRET", "0") == "1",
    # Override the per-chip HBM budget (GiB) when the runtime exposes no
    # memory_stats (worker/worker.py _estimate_tpu_budget).
    "VLLM_TPU_HBM_GB":
    lambda: float(os.environ.get("VLLM_TPU_HBM_GB", 0)),
    # jax.profiler trace output directory (worker profile verb).
    "VLLM_TPU_PROFILE_DIR":
    lambda: os.environ.get("VLLM_TPU_PROFILE_DIR",
                           "/tmp/vllm_tpu_profile"),
    # Multi-host topology (distributed/multihost.py; CLI args override).
    "VLLM_TPU_NUM_HOSTS":
    lambda: int(os.environ.get("VLLM_TPU_NUM_HOSTS", "1")),
    "VLLM_TPU_HOST_ID":
    lambda: int(os.environ.get("VLLM_TPU_HOST_ID", "0")),
    "VLLM_TPU_COORDINATOR":
    lambda: os.environ.get("VLLM_TPU_COORDINATOR"),
    # Set by tests/conftest.py: relaxes device expectations.
    "VLLM_TPU_TEST_MODE":
    lambda: os.environ.get("VLLM_TPU_TEST_MODE", "0") == "1",
    # Persistent XLA compilation cache directory ("" disables). Cuts
    # engine rebuild from minutes to seconds (TPU analog of CUDA-graph
    # capture reuse; reference: gpu_worker.py:288 warmup reuse intent).
    "VLLM_TPU_COMPILE_CACHE_DIR":
    lambda: os.environ.get(
        "VLLM_TPU_COMPILE_CACHE_DIR",
        os.path.expanduser("~/.cache/vllm_tpu/jax_cache")),
    # Decode-kernel block-diagonal group size (rows contracted per MXU
    # pass). MG trades redundant FLOPs (MGx) against fixed per-dot MXU
    # latency; sweep with tools/bench_decode_kernel.py. Must divide 16.
    "VLLM_TPU_DECODE_MG":
    lambda: int(os.environ.get("VLLM_TPU_DECODE_MG", "4")),
    # int4/int8 weight-only EXECUTION layout: "w4a8" repacks int4
    # checkpoints to per-channel signed nibbles on the int8 MXU (half
    # the weight HBM of w8a8); "w8a8" requantizes the
    # weights per-channel int8 at load and runs int8xint8->int32 on the
    # MXU (2x the bf16 rate via XLA; measured 0.100 vs 0.182 ms/layer at
    # bs=256) with per-token dynamic activation quant; "native" keeps
    # the packed int4 / grouped int8 Pallas dequant-matmul (half the
    # weight HBM of w8a8 — use when memory-bound).
    "VLLM_TPU_QUANT_EXEC":
    lambda: os.environ.get("VLLM_TPU_QUANT_EXEC", "w8a8"),
    # decode kernel rows per program (SB): more rows amortize the fixed
    # per-program cost and widen the cross-program DMA overlap window at
    # the cost of more VMEM scratch
    "VLLM_TPU_DECODE_SB":
    lambda: int(os.environ.get("VLLM_TPU_DECODE_SB", "16")),
    # decode kernel: wait on DMA semaphores via static descriptors
    # instead of re-deriving the per-page copy descriptors (saves
    # serial scalar-core work; 0 to fall back to full reconstruction)
    "VLLM_TPU_DECODE_CHEAP_WAIT":
    lambda: int(os.environ.get("VLLM_TPU_DECODE_CHEAP_WAIT", "1")),
    # Decode-attention kernel structure: 1 = single-program loop (one
    # Pallas program fori-loops over row groups; kills the ~13us fixed
    # per-program dispatch+handoff cost of the grid version, measured
    # r5), 0 = grid of SB-row programs (r3/r4 kernel).
    "VLLM_TPU_DECODE_LOOP":
    lambda: int(os.environ.get("VLLM_TPU_DECODE_LOOP", "1")),
    # max bytes per KV-cache device allocation, in MB; >0 splits the
    # stacked [L, N, ...] cache into per-layer-group slabs
    # (ops/attention.KVSlabs) and scans layers slab by slab. Default
    # OFF: a round-4 sweep of the real decode kernel found NO
    # dependence on allocation size (the microbench "big-alloc penalty"
    # that motivated slabs was an artifact of a non-donated buffer
    # copy), and extra scans cost compile time. Kept as an experiment
    # knob.
    "VLLM_TPU_KV_SLAB_MB":
    lambda: int(os.environ.get("VLLM_TPU_KV_SLAB_MB", "0")),
}


def enable_compilation_cache() -> None:
    """Point JAX's persistent compilation cache at
    VLLM_TPU_COMPILE_CACHE_DIR (idempotent; no-op when disabled)."""
    cache_dir = __getattr__("VLLM_TPU_COMPILE_CACHE_DIR")
    if not cache_dir:
        return
    import jax

    if jax.config.jax_compilation_cache_dir == cache_dir:
        return
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def __getattr__(name: str) -> Any:
    try:
        return _FLAGS[name]()
    except KeyError:
        raise AttributeError(
            f"unknown vllm_tpu env flag {name!r}; known: "
            f"{sorted(_FLAGS)}") from None


def __dir__() -> list[str]:
    return sorted(_FLAGS)
