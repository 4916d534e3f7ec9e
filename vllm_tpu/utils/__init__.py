"""Small shared utilities (reference analog: vllm/utils/)."""

from __future__ import annotations

import socket
import time
from contextlib import contextmanager


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def next_power_of_2(x: int) -> int:
    return 1 if x <= 1 else 1 << (x - 1).bit_length()


def get_open_port() -> int:
    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


class Counter:

    def __init__(self, start: int = 0) -> None:
        self.counter = start

    def __next__(self) -> int:
        v = self.counter
        self.counter += 1
        return v

    def reset(self) -> None:
        self.counter = 0


@contextmanager
def timed(label: str, sink: dict | None = None):
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if sink is not None:
        sink[label] = sink.get(label, 0.0) + dt


def make_zmq_socket(ctx, path: str, sock_type, bind: bool):
    """ZMQ socket helper (reference: vllm/utils make_zmq_socket)."""
    sock = ctx.socket(sock_type)
    if bind:
        sock.bind(path)
    else:
        sock.connect(path)
    return sock
