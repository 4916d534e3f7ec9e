"""Prometheus + logging stat loggers
(reference: vllm/v1/metrics/loggers.py:148 PrometheusStatLogger — metric
names kept identical so existing dashboards work unchanged)."""

from __future__ import annotations

import logging
import time
from typing import Optional

from vllm_tpu.engine import SchedulerStats
from vllm_tpu.metrics.stats import IterationStats

logger = logging.getLogger(__name__)


def _hist_buckets_time():
    return [0.001, 0.005, 0.01, 0.02, 0.04, 0.08, 0.16, 0.32, 0.64, 1.28,
            2.56, 5.12, 10.24, 20.48, 40.96, 81.92]


def _hist_buckets_tokens():
    return [1, 2, 5, 10, 20, 50, 100, 200, 500, 1000, 2000, 5000, 10000]


class PrometheusStatLogger:

    def __init__(self, model_name: str, engine_index: int = 0) -> None:
        import prometheus_client as pc

        labels = {"model_name": model_name,
                  "engine": str(engine_index)}
        labelnames = list(labels)
        lv = list(labels.values())

        def gauge(name, doc):
            g = pc.Gauge(name, doc, labelnames=labelnames)
            return g.labels(*lv)

        def counter(name, doc):
            c = pc.Counter(name, doc, labelnames=labelnames)
            return c.labels(*lv)

        def hist(name, doc, buckets):
            h = pc.Histogram(name, doc, labelnames=labelnames,
                             buckets=buckets)
            return h.labels(*lv)

        self.gauge_running = gauge("vllm:num_requests_running",
                                   "Requests currently running")
        self.gauge_waiting = gauge("vllm:num_requests_waiting",
                                   "Requests waiting to be scheduled")
        self.gauge_kv_usage = gauge("vllm:kv_cache_usage_perc",
                                    "KV-cache block usage fraction")
        # deprecated gpu_-prefixed aliases kept for dashboard drop-in
        # compatibility (reference keeps both names)
        self.gauge_kv_usage_gpu = gauge(
            "vllm:gpu_cache_usage_perc",
            "KV-cache block usage fraction (deprecated alias)")
        self.counter_prefix_queries = counter(
            "vllm:prefix_cache_queries",
            "Prefix cache queries (new requests)")
        self.counter_prefix_hits = counter("vllm:prefix_cache_hits",
                                           "Prefix cache hits")
        self.counter_prefix_queries_gpu = counter(
            "vllm:gpu_prefix_cache_queries",
            "Prefix cache queries (deprecated alias)")
        self.counter_prefix_hits_gpu = counter(
            "vllm:gpu_prefix_cache_hits",
            "Prefix cache hits (deprecated alias)")
        self.counter_preempted = counter("vllm:num_preemptions",
                                         "Preempted requests")
        self.counter_prompt_tokens = counter("vllm:prompt_tokens",
                                             "Prompt tokens processed")
        self.counter_gen_tokens = counter("vllm:generation_tokens",
                                          "Generated tokens")
        self.hist_ttft = hist("vllm:time_to_first_token_seconds",
                              "TTFT", _hist_buckets_time())
        self.hist_tpot = hist("vllm:time_per_output_token_seconds",
                              "Inter-token latency", _hist_buckets_time())
        self.hist_e2e = hist("vllm:e2e_request_latency_seconds",
                             "Request E2E latency", _hist_buckets_time())
        self.hist_prompt_len = hist("vllm:request_prompt_tokens",
                                    "Prompt length", _hist_buckets_tokens())
        self.hist_gen_len = hist("vllm:request_generation_tokens",
                                 "Generation length",
                                 _hist_buckets_tokens())
        self.hist_max_gen_len = hist(
            "vllm:request_max_num_generation_tokens",
            "Max generation length across a request's parallel samples",
            _hist_buckets_tokens())
        self.counter_success = counter("vllm:request_success",
                                       "Finished requests")
        # Interval histograms from EngineCoreEvents (reference:
        # loggers.py:593-618)
        self.hist_queue_time = hist(
            "vllm:request_queue_time_seconds",
            "Time waiting in queue before first schedule",
            _hist_buckets_time())
        self.hist_prefill_time = hist(
            "vllm:request_prefill_time_seconds",
            "First schedule to first token", _hist_buckets_time())
        self.hist_decode_time = hist(
            "vllm:request_decode_time_seconds",
            "First token to finish", _hist_buckets_time())
        self.hist_inference_time = hist(
            "vllm:request_inference_time_seconds",
            "First schedule to finish", _hist_buckets_time())
        self.hist_iteration_tokens = hist(
            "vllm:iteration_tokens_total",
            "Tokens processed per engine step", _hist_buckets_tokens())
        self.hist_params_n = hist(
            "vllm:request_params_n", "Request n parameter",
            [1, 2, 5, 10, 20])
        self.hist_params_max_tokens = hist(
            "vllm:request_params_max_tokens",
            "Request max_tokens parameter", _hist_buckets_tokens())
        # spec decode acceptance (reference: loggers.py spec metrics)
        self.counter_spec_drafts = counter(
            "vllm:spec_decode_num_drafts", "Draft proposals scheduled")
        self.counter_spec_draft_tokens = counter(
            "vllm:spec_decode_num_draft_tokens",
            "Draft tokens scheduled for verification")
        self.counter_spec_accepted = counter(
            "vllm:spec_decode_num_accepted_tokens",
            "Draft tokens accepted")
        # LoRA serving-state gauge (reference loggers.py:456
        # vllm:lora_requests_info): labels carry the adapter lists,
        # value is the observation timestamp
        self._lora_gauge_cls = pc.Gauge(
            "vllm:lora_requests_info", "Running stats on lora requests.",
            labelnames=["max_lora", "waiting_lora_adapters",
                        "running_lora_adapters"])
        self._last_prefix_queries = 0
        self._last_prefix_hits = 0
        self._last_preempted = 0

    def record(self, scheduler_stats: Optional[SchedulerStats],
               iteration_stats: Optional[IterationStats]) -> None:
        if scheduler_stats is not None:
            self.gauge_running.set(scheduler_stats.num_running_reqs)
            self.gauge_waiting.set(scheduler_stats.num_waiting_reqs)
            self.gauge_kv_usage.set(scheduler_stats.kv_cache_usage)
            self.gauge_kv_usage_gpu.set(scheduler_stats.kv_cache_usage)
            if scheduler_stats.lora_stats is not None:
                max_lora, running, waiting = scheduler_stats.lora_stats
                self._lora_gauge_cls.labels(
                    str(max_lora), ",".join(waiting),
                    ",".join(running)).set_to_current_time()
            self.counter_prefix_queries.inc(
                max(scheduler_stats.prefix_cache_queries -
                    self._last_prefix_queries, 0))
            self.counter_prefix_queries_gpu.inc(
                max(scheduler_stats.prefix_cache_queries -
                    self._last_prefix_queries, 0))
            self._last_prefix_queries = scheduler_stats.prefix_cache_queries
            self.counter_prefix_hits.inc(
                max(scheduler_stats.prefix_cache_hits -
                    self._last_prefix_hits, 0))
            self.counter_prefix_hits_gpu.inc(
                max(scheduler_stats.prefix_cache_hits -
                    self._last_prefix_hits, 0))
            self._last_prefix_hits = scheduler_stats.prefix_cache_hits
            self.counter_preempted.inc(
                max(scheduler_stats.num_preempted_reqs -
                    self._last_preempted, 0))
            self._last_preempted = scheduler_stats.num_preempted_reqs
            if scheduler_stats.spec_num_drafts:
                self.counter_spec_drafts.inc(
                    scheduler_stats.spec_num_drafts)
                self.counter_spec_draft_tokens.inc(
                    scheduler_stats.spec_num_draft_tokens)
                self.counter_spec_accepted.inc(
                    scheduler_stats.spec_num_accepted_tokens)
        if iteration_stats is not None:
            self.counter_prompt_tokens.inc(iteration_stats.num_prompt_tokens)
            self.counter_gen_tokens.inc(
                iteration_stats.num_generation_tokens)
            for v in iteration_stats.time_to_first_tokens:
                self.hist_ttft.observe(v)
            for v in iteration_stats.inter_token_latencies:
                self.hist_tpot.observe(v)
            total = (iteration_stats.num_prompt_tokens +
                     iteration_stats.num_generation_tokens)
            if total:
                self.hist_iteration_tokens.observe(total)
            for fin in iteration_stats.finished_requests:
                self.hist_e2e.observe(fin.e2e_latency)
                self.hist_prompt_len.observe(fin.num_prompt_tokens)
                self.hist_gen_len.observe(fin.num_generation_tokens)
                self.hist_max_gen_len.observe(fin.num_generation_tokens)
                self.hist_queue_time.observe(fin.queued_time)
                self.hist_prefill_time.observe(fin.prefill_time)
                self.hist_decode_time.observe(fin.decode_time)
                self.hist_inference_time.observe(fin.inference_time)
                self.hist_params_n.observe(fin.n_params)
                if fin.max_tokens_param:
                    self.hist_params_max_tokens.observe(
                        fin.max_tokens_param)
                self.counter_success.inc()


class LoggingStatLogger:
    """Periodic throughput lines (reference: loggers.py:51)."""

    def __init__(self, interval: float = 10.0) -> None:
        self.interval = interval
        self.last_log = time.monotonic()
        self.prompt_tokens = 0
        self.gen_tokens = 0

    def record(self, scheduler_stats: Optional[SchedulerStats],
               iteration_stats: Optional[IterationStats]) -> None:
        if iteration_stats is not None:
            self.prompt_tokens += iteration_stats.num_prompt_tokens
            self.gen_tokens += iteration_stats.num_generation_tokens
        now = time.monotonic()
        dt = now - self.last_log
        if dt >= self.interval:
            running = waiting = 0
            usage = 0.0
            if scheduler_stats is not None:
                running = scheduler_stats.num_running_reqs
                waiting = scheduler_stats.num_waiting_reqs
                usage = scheduler_stats.kv_cache_usage
            logger.info(
                "Throughput: %.1f prompt tok/s, %.1f gen tok/s | "
                "running %d, waiting %d, kv usage %.1f%%",
                self.prompt_tokens / dt, self.gen_tokens / dt, running,
                waiting, usage * 100)
            self.prompt_tokens = 0
            self.gen_tokens = 0
            self.last_log = now
