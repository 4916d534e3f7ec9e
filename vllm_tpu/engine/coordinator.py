"""DP coordinator: cross-replica load stats + wave lockstep
(reference: vllm/v1/engine/coordinator.py:21 DPCoordinator).

Aggregates per-rank scheduler stats pushed by the DP front-ends and
publishes {load, current_wave, wave_active} so (a) the least-loaded
router uses REAL queue depths instead of the front-end's local
in-flight guess, and (b) idle replicas keep stepping while any replica
in the group is busy — a "wave". In the reference this alignment keeps
cross-rank MoE all-to-all collectives from deadlocking
(core.py:874 DPEngineCoreProc dummy batches); in this engine each
replica owns its own mesh and jit program so waves are not a
correctness requirement across replicas, but the stepping cadence is
kept for behavior parity: an idle replica still drains its async
pipeline and reports fresh stats every wave tick, and a request landing
mid-wave joins the ongoing cadence immediately.

Transport: ZMQ PULL (stats in) + PUB (aggregate out), run by a
background thread. Front-ends may also use the coordinator in-process
via report()/snapshot().
"""

from __future__ import annotations

import json
import logging
import threading
import time
from dataclasses import dataclass, field

logger = logging.getLogger(__name__)


@dataclass
class RankState:
    waiting: int = 0
    running: int = 0
    kv_usage: float = 0.0
    last_seen: float = field(default_factory=time.monotonic)

    @property
    def busy(self) -> bool:
        return self.waiting > 0 or self.running > 0

    @property
    def load(self) -> int:
        return self.waiting + self.running


class DPCoordinator:

    def __init__(self, num_ranks: int, bind: bool = False) -> None:
        self.num_ranks = num_ranks
        self.ranks = [RankState() for _ in range(num_ranks)]
        self.current_wave = 0
        self.wave_active = False
        self._lock = threading.Lock()
        self._stats_addr = None
        self._pub_addr = None
        self._stop = threading.Event()
        self._thread = None
        if bind:
            self._start_sockets()

    # ------------------------------------------------------- in-process

    def report(self, rank: int, waiting: int, running: int,
               kv_usage: float = 0.0) -> None:
        """Update one rank's stats; advances the wave state machine."""
        with self._lock:
            st = self.ranks[rank]
            st.waiting = waiting
            st.running = running
            st.kv_usage = kv_usage
            st.last_seen = time.monotonic()
            any_busy = any(r.busy for r in self.ranks)
            if any_busy and not self.wave_active:
                self.current_wave += 1
                self.wave_active = True
            elif not any_busy and self.wave_active:
                self.wave_active = False

    def snapshot(self) -> dict:
        with self._lock:
            return {
                "load": [r.load for r in self.ranks],
                "kv_usage": [r.kv_usage for r in self.ranks],
                "current_wave": self.current_wave,
                "wave_active": self.wave_active,
            }

    def least_loaded(self) -> int:
        with self._lock:
            return min(range(self.num_ranks),
                       key=lambda r: self.ranks[r].load)

    def resize(self, num_ranks: int) -> None:
        """Elastic scale: grow with fresh idle rank slots, or shrink by
        dropping the tail ranks (caller must have drained them first;
        reference: v1/engine/utils.py scale_up/down_elastic_ep)."""
        with self._lock:
            if num_ranks > self.num_ranks:
                self.ranks.extend(RankState()
                                  for _ in range(num_ranks - self.num_ranks))
            else:
                self.ranks = self.ranks[:num_ranks]
            self.num_ranks = num_ranks

    # ----------------------------------------------------------- sockets

    def _start_sockets(self) -> None:
        import zmq

        from vllm_tpu.utils import get_open_port

        self._ctx = zmq.Context()
        self._stats_sock = self._ctx.socket(zmq.PULL)
        port = get_open_port()
        self._stats_sock.bind(f"tcp://127.0.0.1:{port}")
        self._stats_addr = f"tcp://127.0.0.1:{port}"
        self._pub_sock = self._ctx.socket(zmq.PUB)
        port = get_open_port()
        self._pub_sock.bind(f"tcp://127.0.0.1:{port}")
        self._pub_addr = f"tcp://127.0.0.1:{port}"
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="dp-coordinator")
        self._thread.start()

    @property
    def stats_addr(self):
        return self._stats_addr

    @property
    def pub_addr(self):
        return self._pub_addr

    def _loop(self) -> None:
        import zmq

        poller = zmq.Poller()
        poller.register(self._stats_sock, zmq.POLLIN)
        while not self._stop.is_set():
            if not dict(poller.poll(timeout=100)):
                continue
            msg = json.loads(self._stats_sock.recv())
            self.report(msg["rank"], msg.get("waiting", 0),
                        msg.get("running", 0), msg.get("kv_usage", 0.0))
            self._pub_sock.send(json.dumps(self.snapshot()).encode())

    def shutdown(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2)
            self._stats_sock.close(linger=0)
            self._pub_sock.close(linger=0)
            self._ctx.term()
