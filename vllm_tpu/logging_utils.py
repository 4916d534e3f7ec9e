"""Crash forensics (reference: vllm/logging_utils/dump_input.py:57
dump_engine_exception): on any execute_model exception, log enough
engine state to reproduce — config summary, the failing
SchedulerOutput, and scheduler counters — before re-raising."""

from __future__ import annotations

import logging

logger = logging.getLogger("vllm_tpu")


def dump_engine_exception(config, scheduler_output,
                          scheduler=None) -> None:
    try:
        mc = config.model_config
        sc = config.scheduler_config
        logger.error(
            "EngineCore hit an exception in execute_model. "
            "model=%s dtype=%s max_model_len=%s max_num_seqs=%s "
            "max_num_batched_tokens=%s block_size=%s", mc.model, mc.dtype,
            sc.max_model_len, sc.max_num_seqs, sc.max_num_batched_tokens,
            config.cache_config.block_size)
        ns = scheduler_output.num_scheduled_tokens
        logger.error(
            "SchedulerOutput: total_tokens=%s reqs=%s new_reqs=%s "
            "per-req tokens=%s spec=%s",
            scheduler_output.total_num_scheduled_tokens, len(ns),
            len(scheduler_output.scheduled_new_reqs), dict(ns),
            getattr(scheduler_output, "scheduled_spec_decode_tokens",
                    None))
        if scheduler is not None:
            logger.error(
                "Scheduler state: running=%d waiting=%d kv_usage=%.3f",
                len(scheduler.running), len(scheduler.waiting),
                scheduler.kv_cache_manager.usage)
    except Exception:  # noqa: BLE001 — forensics must never mask the cause
        logger.exception("dump_engine_exception itself failed")
