"""Out-of-tree plugin loader (reference: vllm/plugins/__init__.py —
entry-point-group discovery so external packages can register models,
connectors, or tool parsers without forking the engine).

A plugin is a callable registered under the ``vllm_tpu.general_plugins``
entry-point group (or, for model archs, ``vllm_tpu.models`` returning a
{arch_name: "module:Class"} mapping merged into the registry).
``VLLM_TPU_PLUGINS`` (comma-separated names) restricts which load; unset
loads all.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

_loaded = False

GENERAL_GROUP = "vllm_tpu.general_plugins"
MODELS_GROUP = "vllm_tpu.models"


def _allowed(name: str) -> bool:
    allow = os.environ.get("VLLM_TPU_PLUGINS")
    if allow is None:
        return True
    return name in {p.strip() for p in allow.split(",") if p.strip()}


def load_general_plugins() -> list[str]:
    """Discover + invoke general plugins once per process (reference:
    load_general_plugins). Returns the names loaded."""
    global _loaded
    if _loaded:
        return []
    _loaded = True
    loaded: list[str] = []
    from importlib.metadata import entry_points

    for ep in entry_points(group=GENERAL_GROUP):
        if not _allowed(ep.name):
            continue
        try:
            func = ep.load()
            func()
            loaded.append(ep.name)
            logger.info("loaded plugin %s from %s", ep.name, ep.value)
        except Exception:
            logger.exception("plugin %s failed to load", ep.name)
    return loaded


def load_model_plugins() -> dict[str, tuple[str, str]]:
    """Collect out-of-tree model registrations:
    {arch: (module, class_name)} (reference: ModelRegistry OOT
    register_model path)."""
    out: dict[str, tuple[str, str]] = {}
    from importlib.metadata import entry_points

    for ep in entry_points(group=MODELS_GROUP):
        if not _allowed(ep.name):
            continue
        try:
            mapping = ep.load()()
            for arch, target in mapping.items():
                module, _, cls = target.partition(":")
                out[arch] = (module, cls or arch)
        except Exception:
            logger.exception("model plugin %s failed to load", ep.name)
    return out
