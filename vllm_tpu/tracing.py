"""Request-level tracing (reference behavior parity: vllm/tracing.py
init_tracer + SpanAttributes; spans emitted per finished request).

The environment ships the opentelemetry API without the SDK, so this
module provides a minimal built-in exporter: spans are serialized as
JSON lines either to a file (``file:///path`` or a bare path) or POSTed
to an HTTP endpoint. The attribute names match the reference's
``gen_ai.*`` conventions so downstream dashboards keep working.
"""

from __future__ import annotations

import json
import logging
import threading
import time
import urllib.request
from dataclasses import dataclass, field
from typing import Any, Optional

logger = logging.getLogger(__name__)


class SpanAttributes:
    # mirrors vllm/tracing.py:98-122
    GEN_AI_USAGE_COMPLETION_TOKENS = "gen_ai.usage.completion_tokens"
    GEN_AI_USAGE_PROMPT_TOKENS = "gen_ai.usage.prompt_tokens"
    GEN_AI_REQUEST_ID = "gen_ai.request.id"
    GEN_AI_REQUEST_N = "gen_ai.request.n"
    GEN_AI_REQUEST_MAX_TOKENS = "gen_ai.request.max_tokens"
    GEN_AI_REQUEST_TEMPERATURE = "gen_ai.request.temperature"
    GEN_AI_REQUEST_TOP_P = "gen_ai.request.top_p"
    GEN_AI_RESPONSE_MODEL = "gen_ai.response.model"
    GEN_AI_LATENCY_TIME_IN_QUEUE = "gen_ai.latency.time_in_queue"
    GEN_AI_LATENCY_TIME_TO_FIRST_TOKEN = \
        "gen_ai.latency.time_to_first_token"
    GEN_AI_LATENCY_E2E = "gen_ai.latency.e2e"
    GEN_AI_LATENCY_TIME_IN_SCHEDULER = "gen_ai.latency.time_in_scheduler"


@dataclass
class Span:
    name: str
    start_time: float
    end_time: float
    attributes: dict[str, Any] = field(default_factory=dict)

    def to_json(self) -> dict:
        return {
            "name": self.name,
            "start_time_unix_nano": int(self.start_time * 1e9),
            "end_time_unix_nano": int(self.end_time * 1e9),
            "attributes": self.attributes,
        }


class Tracer:
    """Buffered span exporter. Thread-safe; flushes in the background."""

    def __init__(self, endpoint: str, service_name: str = "vllm_tpu",
                 flush_interval: float = 2.0) -> None:
        self.endpoint = endpoint
        self.service_name = service_name
        self._buf: list[Span] = []
        self._lock = threading.Lock()
        self._flush_interval = flush_interval
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="vllm-tpu-tracer")
        self._thread.start()

    def span(self, name: str, start_time: float, end_time: float,
             attributes: dict[str, Any]) -> None:
        with self._lock:
            self._buf.append(Span(name, start_time, end_time, attributes))

    def _run(self) -> None:
        while not self._stop.wait(self._flush_interval):
            self.flush()
        self.flush()

    def flush(self) -> None:
        with self._lock:
            spans, self._buf = self._buf, []
        if not spans:
            return
        payload = {
            "resource": {"service.name": self.service_name},
            "spans": [s.to_json() for s in spans],
        }
        try:
            if self.endpoint.startswith(("http://", "https://")):
                req = urllib.request.Request(
                    self.endpoint, data=json.dumps(payload).encode(),
                    headers={"Content-Type": "application/json"})
                urllib.request.urlopen(req, timeout=5).read()
            else:
                path = self.endpoint.removeprefix("file://")
                with open(path, "a") as f:
                    for s in payload["spans"]:
                        f.write(json.dumps(s) + "\n")
        except Exception as e:  # noqa: BLE001
            logger.warning("trace export to %s failed: %s", self.endpoint,
                           e)

    def shutdown(self) -> None:
        self._stop.set()
        if self._thread.is_alive():
            self._thread.join(timeout=5)


def init_tracer(service_name: str,
                endpoint: Optional[str]) -> Optional[Tracer]:
    """(reference: vllm/tracing.py:48 init_tracer)"""
    if not endpoint:
        return None
    return Tracer(endpoint, service_name)


def request_span_attributes(request_id: str, model: str,
                            num_prompt_tokens: int,
                            num_completion_tokens: int,
                            arrival_time: float,
                            first_token_time: float,
                            finished_time: float,
                            scheduled_time: Optional[float] = None,
                            sampling_params=None) -> dict[str, Any]:
    attrs = {
        SpanAttributes.GEN_AI_REQUEST_ID: request_id,
        SpanAttributes.GEN_AI_RESPONSE_MODEL: model,
        SpanAttributes.GEN_AI_USAGE_PROMPT_TOKENS: num_prompt_tokens,
        SpanAttributes.GEN_AI_USAGE_COMPLETION_TOKENS:
            num_completion_tokens,
        SpanAttributes.GEN_AI_LATENCY_E2E: finished_time - arrival_time,
    }
    if first_token_time:
        attrs[SpanAttributes.GEN_AI_LATENCY_TIME_TO_FIRST_TOKEN] = \
            first_token_time - arrival_time
    if scheduled_time is not None:
        attrs[SpanAttributes.GEN_AI_LATENCY_TIME_IN_QUEUE] = \
            scheduled_time - arrival_time
    if sampling_params is not None:
        attrs[SpanAttributes.GEN_AI_REQUEST_N] = sampling_params.n
        attrs[SpanAttributes.GEN_AI_REQUEST_MAX_TOKENS] = \
            sampling_params.max_tokens
        attrs[SpanAttributes.GEN_AI_REQUEST_TEMPERATURE] = \
            sampling_params.temperature
        attrs[SpanAttributes.GEN_AI_REQUEST_TOP_P] = sampling_params.top_p
    return attrs
