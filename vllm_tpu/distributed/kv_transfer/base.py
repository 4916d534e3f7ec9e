"""KV-transfer connector API for disaggregated prefill/decode and
external KV offload (reference behavior parity:
vllm/distributed/kv_transfer/kv_connector/v1/base.py KVConnectorBase_V1 —
scheduler-side: get_num_new_matched_tokens / update_state_after_alloc /
build_connector_meta / request_finished; worker-side: start_load_kv /
save_kv_layer semantics collapsed to block-level load/save since the TPU
runner executes one whole-model jitted step)."""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Any, Optional

from vllm_tpu.request import Request


class KVConnectorRole(enum.Enum):
    SCHEDULER = "scheduler"
    WORKER = "worker"


@dataclass
class KVLoadSpec:
    """One request's external KV to pull into local paged blocks."""
    req_id: str
    block_ids: list[int]  # destination physical blocks
    block_hashes: list[int]  # content keys
    num_tokens: int
    # which child of a MultiConnector owns this spec (0 otherwise)
    connector_index: int = 0


@dataclass
class KVSaveSpec:
    """One finished request's blocks to push to external storage."""
    req_id: str
    block_ids: list[int]
    block_hashes: list[int]
    connector_index: int = 0


@dataclass
class KVConnectorMetadata:
    loads: list[KVLoadSpec] = field(default_factory=list)
    saves: list[KVSaveSpec] = field(default_factory=list)


class KVConnectorBase:
    """Both roles in one class; the scheduler instantiates role=SCHEDULER
    (policy only, no tensors), workers role=WORKER (tensor movement)."""

    def __init__(self, config: Any, role: KVConnectorRole) -> None:
        self.config = config
        self.role = role

    # ---------------------------------------------------- scheduler side

    def get_num_new_matched_tokens(
            self, request: Request,
            num_computed_tokens: int) -> tuple[int, bool]:
        """How many tokens beyond the local prefix hit exist externally.
        Returns (num_tokens, is_async_load)."""
        return 0, False

    def update_state_after_alloc(self, request: Request,
                                 block_ids: list[int],
                                 num_external_tokens: int) -> None:
        pass

    def build_connector_meta(self) -> Optional[KVConnectorMetadata]:
        """Drain per-step metadata to ship to workers."""
        return None

    def request_finished(self, request: Request,
                         block_ids: list[int]):
        """Called before the request's blocks are freed; return a save
        spec (or a list of them) to persist its KV."""
        return None

    # ------------------------------------------------------- worker side

    def load_blocks(self, kv_caches: list, spec: KVLoadSpec) -> list:
        """Fill destination blocks of the paged caches; returns the
        (functionally updated) cache list."""
        return kv_caches

    def save_blocks(self, kv_caches: list, spec: KVSaveSpec) -> None:
        self.write_blocks(spec, self.fetch_blocks(kv_caches, spec))

    # Async-save split (reference: worker-side async KV save hooks):
    # fetch_blocks must run BEFORE the freed blocks can be reallocated
    # (device rows still intact); write_blocks holds only host arrays
    # and may run on a background thread.
    def fetch_blocks(self, kv_caches: list, spec: KVSaveSpec):
        return None

    def write_blocks(self, spec: KVSaveSpec, fetched) -> None:
        pass


def create_connector(kv_transfer_config: Any,
                     role: KVConnectorRole) -> Optional[KVConnectorBase]:
    if kv_transfer_config is None:
        return None
    name = getattr(kv_transfer_config, "kv_connector", None)
    if not name:
        return None
    if name == "SharedStorageConnector":
        from vllm_tpu.distributed.kv_transfer.shared_storage import \
            SharedStorageConnector

        return SharedStorageConnector(kv_transfer_config, role)
    if name == "MultiConnector":
        from vllm_tpu.distributed.kv_transfer.multi_connector import \
            MultiConnector

        return MultiConnector(kv_transfer_config, role)
    if name == "P2pZmqConnector":
        from vllm_tpu.distributed.kv_transfer.p2p_zmq import \
            P2pZmqConnector

        return P2pZmqConnector(kv_transfer_config, role)
    raise ValueError(f"unknown kv connector {name!r}")
