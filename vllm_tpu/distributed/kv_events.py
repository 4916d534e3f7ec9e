"""KV-cache event publishing for external routers
(reference behavior parity: vllm/distributed/kv_events.py —
EventPublisherFactory, BlockStored/BlockRemoved/AllBlocksCleared over
ZMQ pub sockets with a replay side-channel).

External prefix-cache-aware routers subscribe to learn which block hashes
each engine holds, enabling cache-locality-aware request routing."""

from __future__ import annotations

import json
import logging
import queue
import threading
import time
from dataclasses import asdict, dataclass, field
from typing import Any, Optional

logger = logging.getLogger(__name__)


@dataclass
class KVCacheEvent:
    pass


@dataclass
class BlockStored(KVCacheEvent):
    block_hashes: list[int]
    parent_block_hash: Optional[int]
    token_ids: list[int]
    block_size: int
    lora_id: Optional[int] = None
    type: str = "block_stored"


@dataclass
class BlockRemoved(KVCacheEvent):
    block_hashes: list[int]
    type: str = "block_removed"


@dataclass
class AllBlocksCleared(KVCacheEvent):
    type: str = "all_blocks_cleared"


@dataclass
class EventBatch:
    ts: float
    events: list[Any]
    data_parallel_rank: int = 0


class NullEventPublisher:

    def publish(self, events) -> None:
        pass

    def shutdown(self) -> None:
        pass


class ZmqEventPublisher:
    """PUB socket with monotonically-sequenced JSON batches; a bounded
    in-memory replay buffer serves late subscribers over a ROUTER socket
    (reference: kv_events.py ZmqEventPublisher)."""

    def __init__(self, endpoint: str,
                 replay_endpoint: Optional[str] = None,
                 buffer_steps: int = 10_000,
                 topic: str = "") -> None:
        import zmq

        self._ctx = zmq.Context.instance()
        self._pub = self._ctx.socket(zmq.PUB)
        self._pub.bind(endpoint)
        self._topic = topic.encode()
        self._seq = 0
        self._replay: list[tuple[int, bytes]] = []
        self._buffer_steps = buffer_steps
        self._queue: queue.Queue = queue.Queue(maxsize=100_000)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="kv-event-publisher")
        self._thread.start()
        self._router = None
        if replay_endpoint:
            self._router = self._ctx.socket(zmq.ROUTER)
            self._router.bind(replay_endpoint)
            self._replay_thread = threading.Thread(
                target=self._serve_replay, daemon=True,
                name="kv-event-replay")
            self._replay_thread.start()

    def publish(self, events: EventBatch) -> None:
        try:
            self._queue.put_nowait(events)
        except queue.Full:
            logger.warning("kv event queue full; dropping batch")

    def _encode(self, batch: EventBatch) -> bytes:
        return json.dumps({
            "ts": batch.ts,
            "data_parallel_rank": batch.data_parallel_rank,
            "events": [asdict(e) for e in batch.events],
        }).encode()

    def _run(self) -> None:
        while not self._stop.is_set():
            try:
                batch = self._queue.get(timeout=0.2)
            except queue.Empty:
                continue
            payload = self._encode(batch)
            seq = self._seq
            self._seq += 1
            try:
                self._pub.send_multipart(
                    [self._topic,
                     seq.to_bytes(8, "big"), payload])
            except Exception as e:  # noqa: BLE001
                logger.warning("kv event publish failed: %s", e)
            self._replay.append((seq, payload))
            if len(self._replay) > self._buffer_steps:
                del self._replay[:len(self._replay) - self._buffer_steps]

    def _serve_replay(self) -> None:
        import zmq

        poller = zmq.Poller()
        poller.register(self._router, zmq.POLLIN)
        while not self._stop.is_set():
            if not dict(poller.poll(timeout=200)):
                continue
            try:
                frames = self._router.recv_multipart()
                ident, start_seq = frames[0], int.from_bytes(frames[-1],
                                                             "big")
                for seq, payload in self._replay:
                    if seq >= start_seq:
                        self._router.send_multipart(
                            [ident, seq.to_bytes(8, "big"), payload])
                self._router.send_multipart([ident, b"", b"END"])
            except Exception as e:  # noqa: BLE001
                logger.warning("kv event replay failed: %s", e)

    def shutdown(self) -> None:
        self._stop.set()
        self._thread.join(timeout=2)


class EventPublisherFactory:

    @staticmethod
    def create(config) -> Any:
        """config: KVEventsConfig-like (publisher, endpoint,
        replay_endpoint, buffer_steps, topic) or None."""
        if config is None or not getattr(config, "enable_kv_cache_events",
                                         False):
            return NullEventPublisher()
        publisher = getattr(config, "publisher", "zmq")
        if publisher in ("zmq", ""):
            return ZmqEventPublisher(
                endpoint=getattr(config, "endpoint",
                                 "tcp://*:5557"),
                replay_endpoint=getattr(config, "replay_endpoint", None),
                buffer_steps=getattr(config, "buffer_steps", 10_000),
                topic=getattr(config, "topic", ""))
        if publisher == "null":
            return NullEventPublisher()
        raise ValueError(f"unknown kv-event publisher {publisher!r}")
