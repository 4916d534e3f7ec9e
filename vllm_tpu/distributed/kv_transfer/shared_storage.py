"""Shared-filesystem KV connector (reference behavior parity:
vllm/distributed/kv_transfer/kv_connector/v1/shared_storage_connector.py).

KV blocks persist as one .npz per content hash under a shared directory:
a prefill tier saves finished prompts' blocks, a decode tier (or a
restarted engine) pulls matching prefixes instead of recomputing them —
the minimal disaggregated-P/D transport; RDMA-class connectors plug in
behind the same API."""

from __future__ import annotations

import logging
import os
from typing import Any, Optional

import numpy as np

from vllm_tpu.core.kv_cache_utils import hash_request_tokens
from vllm_tpu.distributed.kv_transfer.base import (KVConnectorBase,
                                                   KVConnectorMetadata,
                                                   KVConnectorRole,
                                                   KVLoadSpec, KVSaveSpec)
from vllm_tpu.request import Request

logger = logging.getLogger(__name__)


class SharedStorageConnector(KVConnectorBase):

    def __init__(self, config: Any, role: KVConnectorRole) -> None:
        super().__init__(config, role)
        extra = getattr(config, "kv_connector_extra_config", None) or {}
        self.path = extra.get("shared_storage_path", "/tmp/vllm_tpu_kv")
        self.block_size = int(extra.get("block_size", 0))  # set later
        os.makedirs(self.path, exist_ok=True)
        self._pending_loads: list[KVLoadSpec] = []
        # request_id -> (hashes of externally matched blocks)
        self._matched: dict[str, list[int]] = {}

    def set_block_size(self, block_size: int) -> None:
        self.block_size = block_size

    def _file(self, block_hash: int) -> str:
        return os.path.join(self.path, f"{block_hash & (2**64-1):016x}.npz")

    # ---------------------------------------------------- scheduler side

    def get_num_new_matched_tokens(
            self, request: Request,
            num_computed_tokens: int) -> tuple[int, bool]:
        assert self.block_size > 0
        hashes = [
            bh.hash_value for bh in hash_request_tokens(
                request.prompt_token_ids, self.block_size)
        ]
        start_block = num_computed_tokens // self.block_size
        matched: list[int] = []
        for i in range(start_block, len(hashes)):
            if os.path.exists(self._file(hashes[i])):
                matched.append(hashes[i])
            else:
                break
        num_external = len(matched) * self.block_size
        # keep at least one prompt token uncomputed so logits exist
        max_external = (request.num_prompt_tokens - 1 -
                        num_computed_tokens)
        if num_external > max_external:
            full = max(max_external // self.block_size, 0)
            matched = matched[:full]
            num_external = full * self.block_size
        if matched:
            self._matched[request.request_id] = matched
        return num_external, False

    def update_state_after_alloc(self, request: Request,
                                 block_ids: list[int],
                                 num_external_tokens: int) -> None:
        hashes = self._matched.pop(request.request_id, [])
        if not hashes or num_external_tokens <= 0:
            return
        start = (request.num_computed_tokens // self.block_size)
        n = num_external_tokens // self.block_size
        dest = block_ids[start:start + n]
        self._pending_loads.append(
            KVLoadSpec(req_id=request.request_id, block_ids=dest,
                       block_hashes=hashes[:n],
                       num_tokens=num_external_tokens))

    def build_connector_meta(self) -> Optional[KVConnectorMetadata]:
        if not self._pending_loads:
            return None
        meta = KVConnectorMetadata(loads=self._pending_loads)
        self._pending_loads = []
        return meta

    def request_finished(self, request: Request,
                         block_ids: list[int]) -> Optional[KVSaveSpec]:
        assert self.block_size > 0
        hashes = [
            bh.hash_value for bh in hash_request_tokens(
                request.all_token_ids, self.block_size)
        ]
        save_hashes: list[int] = []
        save_ids: list[int] = []
        for i, h in enumerate(hashes):
            if i >= len(block_ids):
                break
            if os.path.exists(self._file(h)):
                continue
            save_hashes.append(h)
            save_ids.append(block_ids[i])
        if not save_hashes:
            return None
        return KVSaveSpec(req_id=request.request_id, block_ids=save_ids,
                          block_hashes=save_hashes)

    # ------------------------------------------------------- worker side

    def load_blocks(self, kv_caches: list, spec: KVLoadSpec) -> list:
        import jax
        import jax.numpy as jnp

        from vllm_tpu.ops.attention import KVSlabs

        out = []
        for g, kv in enumerate(kv_caches):
            datas = []
            for h in spec.block_hashes:
                with np.load(self._file(h)) as z:
                    datas.append(z[f"g{g}"])
            data = np.stack(datas, axis=1)  # [L, n, page, 2K, D]
            ids = jnp.asarray(spec.block_ids, jnp.int32)
            if isinstance(kv, KVSlabs):
                kv = kv.set_pages(ids, data)
            else:
                kv = jax.jit(
                    lambda kv, ids, d: kv.at[:, ids].set(d),
                    donate_argnums=(0,))(kv, ids,
                                         jnp.asarray(data, kv.dtype))
            out.append(kv)
        logger.info("kv load: %d blocks for %s", len(spec.block_ids),
                    spec.req_id)
        return out

    def fetch_blocks(self, kv_caches: list, spec: KVSaveSpec):
        """D2H fetch of the spec's block rows (must precede block
        reallocation; the file write may then happen async)."""
        from vllm_tpu.ops.attention import KVSlabs

        return [{
            f"g{g}": (kv.gather_pages(bid) if isinstance(kv, KVSlabs)
                      else np.asarray(kv[:, bid]))
            for g, kv in enumerate(kv_caches)
        } for bid in spec.block_ids]

    def write_blocks(self, spec: KVSaveSpec, fetched) -> None:
        for h, arrays in zip(spec.block_hashes, fetched):
            tmp = self._file(h) + ".tmp"
            with open(tmp, "wb") as f:
                np.savez(f, **arrays)
            os.replace(tmp, self._file(h))
        logger.info("kv save: %d blocks for %s", len(spec.block_ids),
                    spec.req_id)
