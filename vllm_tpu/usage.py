"""Anonymous usage telemetry (reference behavior parity:
vllm/usage/usage_lib.py:123 UsageMessage).

Collects flat environment + engine facts once per engine start on a
background thread and appends one JSON line to a local stats file
(``~/.config/vllm_tpu/usage_stats.json`` or $VLLM_TPU_USAGE_STATS_PATH).
The reference additionally POSTs to a collection server; this
environment has no egress, so the local record IS the telemetry sink.
Opt out with VLLM_NO_USAGE_STATS=1 or DO_NOT_TRACK=1, or a
``do_not_track`` file under ~/.config/vllm_tpu (same switches as
usage_lib.py _USAGE_STATS_ENABLED)."""

from __future__ import annotations

import json
import os
import platform
import threading
import time
import uuid
from enum import Enum
from typing import Any, Optional


class UsageContext(str, Enum):
    UNKNOWN_CONTEXT = "UNKNOWN_CONTEXT"
    LLM_CLASS = "LLM_CLASS"
    API_SERVER = "API_SERVER"
    OPENAI_API_SERVER = "OPENAI_API_SERVER"
    OPENAI_BATCH_RUNNER = "OPENAI_BATCH_RUNNER"
    ENGINE_CONTEXT = "ENGINE_CONTEXT"


def usage_stats_enabled() -> bool:
    if os.environ.get("VLLM_NO_USAGE_STATS") == "1":
        return False
    if os.environ.get("DO_NOT_TRACK") == "1":
        return False
    marker = os.path.expanduser("~/.config/vllm_tpu/do_not_track")
    return not os.path.exists(marker)


def _stats_path() -> str:
    return os.environ.get(
        "VLLM_TPU_USAGE_STATS_PATH",
        os.path.expanduser("~/.config/vllm_tpu/usage_stats.json"))


class UsageMessage:
    """Flat KV facts about one engine start (usage_lib.py:123)."""

    def __init__(self) -> None:
        self.uuid = str(uuid.uuid4())

    def report_usage(self, model_architecture: str,
                     usage_context: UsageContext,
                     extra_kvs: Optional[dict[str, Any]] = None) -> None:
        if not usage_stats_enabled():
            return
        t = threading.Thread(
            target=self._report_once,
            args=(model_architecture, usage_context, extra_kvs or {}),
            daemon=True, name="usage-stats")
        t.start()
        self._thread = t

    def _report_once(self, model_architecture: str,
                     usage_context: UsageContext,
                     extra_kvs: dict[str, Any]) -> None:
        try:
            record = self._collect(model_architecture, usage_context)
            record.update(extra_kvs)
            path = _stats_path()
            os.makedirs(os.path.dirname(path), exist_ok=True)
            with open(path, "a") as f:
                f.write(json.dumps(record) + "\n")
        except Exception:  # noqa: BLE001 — telemetry must never raise
            pass

    def _collect(self, model_architecture: str,
                 usage_context: UsageContext) -> dict[str, Any]:
        record: dict[str, Any] = {
            "uuid": self.uuid,
            "source": "vllm_tpu",
            "log_time": int(time.time()),
            "context": str(usage_context.value),
            "model_architecture": model_architecture,
            "architecture": platform.machine(),
            "platform": platform.platform(),
            "num_cpu": os.cpu_count(),
        }
        try:
            import vllm_tpu

            record["vllm_tpu_version"] = getattr(vllm_tpu, "__version__",
                                                 "dev")
        except Exception:  # noqa: BLE001
            record["vllm_tpu_version"] = "dev"
        try:
            import jax

            devs = jax.devices()
            record["accelerator_count"] = len(devs)
            record["accelerator_type"] = devs[0].device_kind
        except Exception:  # noqa: BLE001
            pass
        return record


usage_message = UsageMessage()
