"""Multi-host launch: ``jax.distributed`` + driver/follower topology
(reference: vllm/distributed/parallel_state.py:938
init_distributed_environment; vllm/v1/executor/multiproc_executor.py:42
MultiprocExecutor broadcast model; shm_broadcast.py:206 MessageQueue).

TPU-native multi-host is multi-controller SPMD: every host process runs
the SAME sequence of jitted computations over one global
``jax.sharding.Mesh``; the JAX runtime carries collectives over ICI
(intra-slice) and DCN (inter-slice). Host 0 ("driver") additionally runs
the scheduler + front-end and broadcasts every executor verb
(SchedulerOutput, control RPCs) to follower hosts over ZMQ so all hosts
issue identical device programs in identical order — the analog of the
reference's shared-memory MessageQueue broadcast, with the scheduler
playing the reference's rank-0 role.

``jax.distributed.initialize`` MUST run before the first device query in
the process (it installs the distributed runtime client the backends
attach to), so call :func:`maybe_init_multihost` before building any
worker.
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass
from typing import Any, Optional

logger = logging.getLogger(__name__)

_initialized = False


@dataclass(frozen=True)
class MultihostInfo:
    num_hosts: int
    host_id: int
    coordinator_address: str

    @property
    def is_driver(self) -> bool:
        return self.host_id == 0


def resolve_multihost(parallel_config) -> Optional[MultihostInfo]:
    """Read the multi-host topology from config or environment
    (VLLM_TPU_NUM_HOSTS / VLLM_TPU_HOST_ID / VLLM_TPU_COORDINATOR)."""
    from vllm_tpu import envs

    num_hosts = parallel_config.num_hosts or envs.VLLM_TPU_NUM_HOSTS
    if num_hosts <= 1:
        return None
    host_id = (parallel_config.host_id
               if parallel_config.host_id is not None else
               envs.VLLM_TPU_HOST_ID)
    coord = (parallel_config.coordinator_address
             or envs.VLLM_TPU_COORDINATOR)
    if not coord:
        raise ValueError(
            "multi-host launch needs --coordinator-address host:port "
            "(or VLLM_TPU_COORDINATOR)")
    return MultihostInfo(num_hosts=num_hosts, host_id=host_id,
                         coordinator_address=coord)


def maybe_init_multihost(parallel_config) -> Optional[MultihostInfo]:
    """Initialize the JAX distributed runtime once per process."""
    global _initialized
    info = resolve_multihost(parallel_config)
    if info is None:
        return None
    if not _initialized:
        import jax

        jax.distributed.initialize(
            coordinator_address=info.coordinator_address,
            num_processes=info.num_hosts,
            process_id=info.host_id,
        )
        _initialized = True
        logger.info("jax.distributed initialized: host %d/%d via %s",
                    info.host_id, info.num_hosts, info.coordinator_address)
    return info


# --------------------------------------------------------------------- wire

def _derive_port(coordinator_address: str, offset: int) -> str:
    host, _, port = coordinator_address.rpartition(":")
    return f"tcp://{host}:{int(port) + offset}"


def encode(obj: Any) -> bytes:
    """Verb-bus encoding: the engine wire codec (allowlisted unpickler
    + protocol 5; see engine/serial.py), single-frame variant since the
    ROUTER framing already carries identity frames."""
    from vllm_tpu.engine import serial

    return serial.encode_one(obj)


def decode(data: bytes) -> Any:
    from vllm_tpu.engine import serial

    return serial.decode_one(data)


class DriverBus:
    """ROUTER socket on the driver: broadcast verbs to every follower,
    gather replies. ROUTER/DEALER (not PUB/SUB) so the ready handshake
    proves connectivity — no slow-joiner message loss."""

    def __init__(self, info: MultihostInfo) -> None:
        import zmq

        self.num_followers = info.num_hosts - 1
        ctx = zmq.Context.instance()
        self.sock = ctx.socket(zmq.ROUTER)
        self.sock.bind(_derive_port(info.coordinator_address, 1).replace(
            "tcp://localhost", "tcp://*").replace("tcp://127.0.0.1",
                                                  "tcp://*"))
        self.idents: list[bytes] = []
        while len(self.idents) < self.num_followers:
            ident, data = self.sock.recv_multipart()
            msg = decode(data)
            assert msg[0] == "ready", msg
            self.idents.append(ident)
        logger.info("driver bus: %d followers connected",
                    self.num_followers)

    def broadcast(self, verb: str, payload: Any = None) -> None:
        data = encode((verb, payload))
        for ident in self.idents:
            self.sock.send_multipart([ident, data])

    def gather(self) -> list[Any]:
        out = []
        for _ in range(self.num_followers):
            _, data = self.sock.recv_multipart()
            out.append(decode(data))
        return out

    def close(self) -> None:
        self.sock.close(linger=0)


class FollowerBus:
    """DEALER socket on a follower host."""

    def __init__(self, info: MultihostInfo) -> None:
        import zmq

        ctx = zmq.Context.instance()
        self.sock = ctx.socket(zmq.DEALER)
        self.sock.setsockopt(zmq.IDENTITY,
                             f"host-{info.host_id}".encode())
        self.sock.connect(_derive_port(info.coordinator_address, 1))
        self.sock.send(encode(("ready", info.host_id)))

    def recv(self) -> tuple[str, Any]:
        return decode(self.sock.recv())

    def reply(self, value: Any) -> None:
        self.sock.send(encode(value))

    def close(self) -> None:
        self.sock.close(linger=0)
