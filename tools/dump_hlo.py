"""Dump compiled HLO of the bench step at decode + prefill buckets.

Writes /tmp/hlo_decode.txt and /tmp/hlo_prefill.txt for fusion-level
attribution of xprof traces (identify fusion.NNN ops).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profile_step import build_engine  # noqa: E402


def main() -> None:
    engine, hf_config, on_tpu = build_engine()
    worker = engine.engine_core.executor.worker
    runner = worker.runner

    for name, (T, R) in (("decode", (256, 256)), ("prefill", (4096, 256))):
        i32, f32, layout = runner._dummy_blobs(T, R)
        lora_stacks = (runner.lora_manager.stacks
                       if runner.lora_manager is not None else None)
        lowered = runner._compiled_step.lower(
            runner.params, runner.kv_caches, runner.draft_kv, i32, f32,
            layout, 0, lora_stacks, runner.draft_params, None, None, None)
        compiled = lowered.compile()
        txt = compiled.as_text()
        path = f"/tmp/hlo_{name}.txt"
        with open(path, "w") as f:
            f.write(txt)
        print(f"{path}: {len(txt)} chars")


if __name__ == "__main__":
    main()
