"""Layerwise device profiler (reference:
vllm/profiler/layerwise_profile.py:69 — there, a torch.profiler tree
keyed by module; here, an xprof framework-op-stats summary keyed by the
jit scope names XLA records).

The decoder stack runs as a `lax.scan` over layer indices, so each
per-layer op appears ONCE in the program with `occurrences =
num_layers * traced_steps`; per-layer time = total_self_time /
occurrences. Use:

    with layerwise_profile("/tmp/prof") as result:
        for _ in range(5):
            engine.step()
    result.print_table()
"""

from __future__ import annotations

import glob
import gzip
import json
import os
from dataclasses import dataclass, field
from typing import Optional


@dataclass
class OpRow:
    operation: str
    occurrences: int
    total_self_us: float
    bound_by: str = ""

    @property
    def per_occurrence_us(self) -> float:
        return self.total_self_us / max(self.occurrences, 1)


@dataclass
class LayerwiseResult:
    trace_dir: str
    steps: int = 1
    rows: list[OpRow] = field(default_factory=list)

    def device_total_ms_per_step(self) -> float:
        return sum(r.total_self_us for r in self.rows
                   if "IDLE" not in r.operation) / self.steps / 1e3

    def top(self, n: int = 20) -> list[OpRow]:
        return sorted(self.rows, key=lambda r: -r.total_self_us)[:n]

    def print_table(self, n: int = 20) -> None:
        print(f"=== device ops by self time (over {self.steps} steps, "
              f"busy {self.device_total_ms_per_step():.2f} ms/step) ===")
        for r in self.top(n):
            print(f"  {r.total_self_us / self.steps:10.1f} us/step "
                  f"x{r.occurrences:>6} ({r.per_occurrence_us:8.1f} "
                  f"us/occ) {r.bound_by:>10} {r.operation[:64]}")


def summarize_trace(trace_dir: str, steps: int = 1) -> LayerwiseResult:
    """Parse the newest xplane under trace_dir into op rows."""
    pbs = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                           recursive=True), key=os.path.getmtime)
    result = LayerwiseResult(trace_dir, steps=steps)
    if not pbs:
        return result
    try:
        from xprof.convert.raw_to_tool_data import xspace_to_tool_data
    except ImportError:  # xprof not installed: leave rows empty
        return result
    data, _ = xspace_to_tool_data([pbs[-1]], "framework_op_stats", {})
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
        data = data.decode()
    obj = json.loads(data)
    tables = obj if isinstance(obj, list) else [obj]
    for table in tables:
        if not isinstance(table, dict) or "cols" not in table:
            continue
        cols = [c["id"] for c in table["cols"]]
        for raw in table.get("rows", []):
            vals = [c.get("v") if isinstance(c, dict) else c
                    for c in raw["c"]]
            d = dict(zip(cols, vals))
            if str(d.get("host_or_device", "")).lower() == "host":
                continue
            result.rows.append(
                OpRow(operation=str(d.get("operation", "?")),
                      occurrences=int(d.get("occurrences") or 0),
                      total_self_us=float(d.get("total_self_time") or 0),
                      bound_by=str(d.get("bound_by") or "")))
        break
    return result


class layerwise_profile:
    """Context manager: jax.profiler trace + parsed summary."""

    def __init__(self, trace_dir: Optional[str] = None,
                 steps: int = 1) -> None:
        from vllm_tpu import envs

        self.trace_dir = trace_dir or envs.VLLM_TPU_PROFILE_DIR
        self.steps = steps
        self.result = LayerwiseResult(self.trace_dir, steps=steps)

    def __enter__(self) -> LayerwiseResult:
        import jax

        os.makedirs(self.trace_dir, exist_ok=True)
        jax.profiler.start_trace(self.trace_dir)
        return self.result

    def __exit__(self, *exc) -> None:
        import jax

        jax.profiler.stop_trace()
        parsed = summarize_trace(self.trace_dir, self.steps)
        self.result.rows = parsed.rows
