"""Composite KV connector (reference behavior parity:
vllm/distributed/kv_transfer/kv_connector/v1/multi_connector.py
MultiConnector): chains children in priority order — external-prefix
lookups take the FIRST child that reports a match (and route that
request's loads to it), while finished-request saves fan out to every
child. Lets a deployment stack e.g. a fast local tier in front of a
durable shared tier behind one --kv-transfer-config.

Config shape (mirrors the reference's "connectors" list):
  kv_connector="MultiConnector",
  kv_connector_extra_config={"connectors": [
      {"kv_connector": "SharedStorageConnector",
       "kv_connector_extra_config": {...}},
      ...]}
"""

from __future__ import annotations

from types import SimpleNamespace
from typing import Any, Optional

from vllm_tpu.distributed.kv_transfer.base import (KVConnectorBase,
                                                   KVConnectorMetadata,
                                                   KVConnectorRole,
                                                   KVSaveSpec)
from vllm_tpu.request import Request


class MultiConnector(KVConnectorBase):

    def __init__(self, config: Any, role: KVConnectorRole) -> None:
        super().__init__(config, role)
        from vllm_tpu.distributed.kv_transfer.base import create_connector

        extra = getattr(config, "kv_connector_extra_config", None) or {}
        self.children: list[KVConnectorBase] = []
        for sub in extra.get("connectors", []):
            sub_cfg = SimpleNamespace(
                kv_connector=sub.get("kv_connector"),
                kv_connector_extra_config=sub.get(
                    "kv_connector_extra_config", {}),
            )
            child = create_connector(sub_cfg, role)
            if child is not None:
                self.children.append(child)
        if not self.children:
            raise ValueError("MultiConnector needs a non-empty "
                             "'connectors' list in extra config")
        # request_id -> child index that matched its external prefix
        self._owner: dict[str, int] = {}

    def set_block_size(self, block_size: int) -> None:
        for c in self.children:
            if hasattr(c, "set_block_size"):
                c.set_block_size(block_size)

    # ---------------------------------------------------- scheduler side

    def get_num_new_matched_tokens(
            self, request: Request,
            num_computed_tokens: int) -> tuple[int, bool]:
        for i, c in enumerate(self.children):
            n, is_async = c.get_num_new_matched_tokens(
                request, num_computed_tokens)
            if n > 0:
                self._owner[request.request_id] = i
                return n, is_async
        return 0, False

    def update_state_after_alloc(self, request: Request,
                                 block_ids: list[int],
                                 num_external_tokens: int) -> None:
        i = self._owner.get(request.request_id)
        if i is not None:
            self.children[i].update_state_after_alloc(
                request, block_ids, num_external_tokens)

    def build_connector_meta(self) -> Optional[KVConnectorMetadata]:
        merged = KVConnectorMetadata()
        for i, c in enumerate(self.children):
            meta = c.build_connector_meta()
            if meta is None:
                continue
            for load in meta.loads:
                load.connector_index = i
                merged.loads.append(load)
            for save in meta.saves:
                save.connector_index = i
                merged.saves.append(save)
        self._owner = {
            rid: i for rid, i in self._owner.items()
            if rid not in {ld.req_id for ld in merged.loads}
        }
        return merged if (merged.loads or merged.saves) else None

    def request_finished(self, request: Request, block_ids: list[int]):
        saves: list[KVSaveSpec] = []
        for i, c in enumerate(self.children):
            got = c.request_finished(request, block_ids)
            if got is None:
                continue
            for spec in (got if isinstance(got, list) else [got]):
                spec.connector_index = i
                saves.append(spec)
        return saves or None

    # ------------------------------------------------------- worker side

    def load_blocks(self, kv_caches: list, spec) -> list:
        return self.children[spec.connector_index].load_blocks(
            kv_caches, spec)

    def fetch_blocks(self, kv_caches: list, spec: KVSaveSpec):
        return self.children[spec.connector_index].fetch_blocks(
            kv_caches, spec)

    def write_blocks(self, spec: KVSaveSpec, fetched) -> None:
        self.children[spec.connector_index].write_blocks(spec, fetched)
