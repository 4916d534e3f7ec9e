"""Direct engine-to-engine (P2P) KV connector over ZMQ (reference
behavior parity: vllm/distributed/kv_transfer/kv_connector/v1/p2p/
p2p_nccl_connector.py — the NCCL P2P transport is replaced by a ZMQ
block server riding TCP, the same control-plane transport as the
multihost executor; this environment has no RDMA/NCCL fabric).

Topology: the PREFILL engine (kv_role=kv_producer) runs a REP block
server and keeps finished requests' KV blocks in a bounded host-RAM LRU
store; the DECODE engine (kv_role=kv_consumer) asks it EXISTS for the
prompt's block hashes at schedule time and GETs the block payloads at
load time — no shared filesystem, no recompute. kv_role=kv_both serves
and consumes (single-engine warm restarts)."""

from __future__ import annotations

import io
import json
import logging
import threading
from collections import OrderedDict
from typing import Any, Optional

import numpy as np

from vllm_tpu.core.kv_cache_utils import hash_request_tokens
from vllm_tpu.distributed.kv_transfer.base import (KVConnectorBase,
                                                   KVConnectorMetadata,
                                                   KVConnectorRole,
                                                   KVLoadSpec, KVSaveSpec)
from vllm_tpu.request import Request

logger = logging.getLogger(__name__)


def _key(block_hash: int) -> str:
    return f"{block_hash & (2**64 - 1):016x}"


class _BlockStore:
    """Bounded LRU of {hash-key: npz bytes} + a REP server thread."""

    def __init__(self, address: str, capacity: int) -> None:
        import zmq

        self.capacity = capacity
        self._store: OrderedDict[str, bytes] = OrderedDict()
        self._lock = threading.Lock()
        self._ctx = zmq.Context.instance()
        self._sock = self._ctx.socket(zmq.REP)
        self._sock.bind(address)
        self._stop = False
        self._thread = threading.Thread(target=self._serve, daemon=True,
                                        name="kv-p2p-server")
        self._thread.start()

    def put(self, key: str, payload: bytes) -> None:
        with self._lock:
            self._store[key] = payload
            self._store.move_to_end(key)
            while len(self._store) > self.capacity:
                self._store.popitem(last=False)

    def has(self, key: str) -> bool:
        with self._lock:
            return key in self._store

    def get(self, key: str) -> Optional[bytes]:
        with self._lock:
            v = self._store.get(key)
            if v is not None:
                self._store.move_to_end(key)
            return v

    def _serve(self) -> None:
        import zmq

        poller = zmq.Poller()
        poller.register(self._sock, zmq.POLLIN)
        while not self._stop:
            if not dict(poller.poll(timeout=200)):
                continue
            cmd, payload = self._sock.recv_multipart()
            if cmd == b"EXISTS":
                keys = json.loads(payload)
                self._sock.send_json([self.has(k) for k in keys])
            elif cmd == b"GET":
                data = self.get(payload.decode())
                self._sock.send(data if data is not None else b"")
            else:
                self._sock.send(b"")

    def close(self) -> None:
        self._stop = True
        self._thread.join(timeout=2)
        self._sock.close(linger=0)


class P2pZmqConnector(KVConnectorBase):

    def __init__(self, config: Any, role: KVConnectorRole) -> None:
        super().__init__(config, role)
        extra = getattr(config, "kv_connector_extra_config", None) or {}
        self.address = extra.get("p2p_address", "tcp://127.0.0.1:18530")
        self.kv_role = getattr(config, "kv_role", "kv_both")
        self.block_size = int(extra.get("block_size", 0))
        capacity = int(extra.get("capacity_blocks", 8192))
        self.timeout_ms = int(extra.get("timeout_ms", 5000))
        self._produces = self.kv_role in ("kv_producer", "kv_both")
        self._consumes = self.kv_role in ("kv_consumer", "kv_both")
        self._store: Optional[_BlockStore] = None
        if self._produces and role == KVConnectorRole.WORKER:
            self._store = _BlockStore(self.address, capacity)
        self._req: Any = None  # lazy REQ socket (scheduler + consumer)
        self._pending_loads: list[KVLoadSpec] = []
        self._matched: dict[str, list[int]] = {}

    def set_block_size(self, block_size: int) -> None:
        self.block_size = block_size

    # ------------------------------------------------------------ net

    def _request(self, *parts: bytes) -> Optional[list]:
        """One REQ round trip; None on timeout (producer down — the
        consumer then just recomputes, never wedges)."""
        import zmq

        if self._req is None:
            self._req = zmq.Context.instance().socket(zmq.REQ)
            self._req.connect(self.address)
        self._req.send_multipart(list(parts))
        if not self._req.poll(self.timeout_ms):
            logger.warning("kv p2p: no reply from %s", self.address)
            self._req.close(linger=0)
            self._req = None
            return None
        return self._req.recv_multipart()

    # ---------------------------------------------------- scheduler side

    def get_num_new_matched_tokens(
            self, request: Request,
            num_computed_tokens: int) -> tuple[int, bool]:
        if not self._consumes:
            return 0, False
        assert self.block_size > 0
        hashes = [
            bh.hash_value for bh in hash_request_tokens(
                request.prompt_token_ids, self.block_size)
        ]
        start_block = num_computed_tokens // self.block_size
        tail = hashes[start_block:]
        if not tail:
            return 0, False
        reply = self._request(b"EXISTS",
                              json.dumps([_key(h) for h in tail]).encode())
        if reply is None:
            return 0, False
        flags = json.loads(reply[0])
        matched: list[int] = []
        for h, ok in zip(tail, flags):
            if not ok:
                break
            matched.append(h)
        num_external = len(matched) * self.block_size
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
        start = request.num_computed_tokens // self.block_size
        n = num_external_tokens // self.block_size
        self._pending_loads.append(
            KVLoadSpec(req_id=request.request_id,
                       block_ids=block_ids[start:start + n],
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
        if not self._produces:
            return None
        assert self.block_size > 0
        hashes = [
            bh.hash_value for bh in hash_request_tokens(
                request.all_token_ids, self.block_size)
        ]
        n = min(len(hashes), len(block_ids))
        if not n:
            return None
        return KVSaveSpec(req_id=request.request_id,
                          block_ids=block_ids[:n],
                          block_hashes=hashes[:n])

    # ------------------------------------------------------- worker side

    def load_blocks(self, kv_caches: list, spec: KVLoadSpec) -> list:
        import jax
        import jax.numpy as jnp

        from vllm_tpu.ops.attention import KVSlabs

        blobs = []
        for h in spec.block_hashes:
            if self._store is not None and self._store.has(_key(h)):
                blobs.append(self._store.get(_key(h)))
                continue
            reply = self._request(b"GET", _key(h).encode())
            if reply is None or not reply[0]:
                logger.warning("kv p2p: block %s vanished; recompute "
                               "will be wrong — dropping load", _key(h))
                return kv_caches
            blobs.append(reply[0])
        out = []
        for g, kv in enumerate(kv_caches):
            datas = []
            for blob in blobs:
                with np.load(io.BytesIO(blob)) as z:
                    datas.append(z[f"g{g}"])
            data = np.stack(datas, axis=1)
            ids = jnp.asarray(spec.block_ids, jnp.int32)
            if isinstance(kv, KVSlabs):
                kv = kv.set_pages(ids, data)
            else:
                kv = jax.jit(
                    lambda kv, ids, d: kv.at[:, ids].set(d),
                    donate_argnums=(0,))(kv, ids,
                                         jnp.asarray(data, kv.dtype))
            out.append(kv)
        logger.info("kv p2p load: %d blocks for %s",
                    len(spec.block_ids), spec.req_id)
        return out

    def fetch_blocks(self, kv_caches: list, spec: KVSaveSpec):
        from vllm_tpu.ops.attention import KVSlabs

        return [{
            f"g{g}": (kv.gather_pages(bid) if isinstance(kv, KVSlabs)
                      else np.asarray(kv[:, bid]))
            for g, kv in enumerate(kv_caches)
        } for bid in spec.block_ids]

    def write_blocks(self, spec: KVSaveSpec, fetched) -> None:
        if self._store is None:
            return
        for h, arrays in zip(spec.block_hashes, fetched):
            key = _key(h)
            if self._store.has(key):
                continue
            buf = io.BytesIO()
            np.savez(buf, **arrays)
            self._store.put(key, buf.getvalue())
        logger.info("kv p2p save: %d blocks for %s",
                    len(spec.block_ids), spec.req_id)

    def close(self) -> None:
        if self._store is not None:
            self._store.close()
