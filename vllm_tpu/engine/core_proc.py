"""EngineCore background-process wrapper + multiprocess clients
(reference behavior parity: vllm/v1/engine/core.py:413 EngineCoreProc —
ZMQ handshake, input/output IO, busy loop — and core_client.py
SyncMPClient/AsyncMPClient).

The engine core (scheduler + executor + device loop) runs in its own
process; the front-end talks to it over ZMQ PAIR sockets with pickled
messages. This isolates device work from the serving event loop exactly
like the reference's process split (there: msgspec over ROUTER/PULL; the
wire format is engine/serial.py's restricted codec (pickle-5 with an
allowlisted unpickler + out-of-band numpy buffers) —
the framing and lifecycle match).

Message types (client -> core): ("add", EngineCoreRequest),
("abort", [req_ids]), ("utility", call_id, method, args, kwargs),
("shutdown",). Core -> client: ("outputs", {client_idx: EngineCoreOutputs}),
("utility_result", call_id, result, error), ("ready",),
("engine_dead", traceback).
"""

from __future__ import annotations

import logging
import multiprocessing as mp
import queue as thread_queue
import threading
import traceback
from typing import Any, Optional

from vllm_tpu.engine import serial

logger = logging.getLogger(__name__)


def _core_main(engine_config, input_addr: str, output_addr: str) -> None:
    """Engine-core process entry (reference: EngineCoreProc.run_engine_core
    + run_busy_loop, core.py:660)."""
    import zmq

    ctx = zmq.Context()
    in_sock = ctx.socket(zmq.PULL)
    in_sock.bind(input_addr)
    out_sock = ctx.socket(zmq.PUSH)
    out_sock.bind(output_addr)

    from vllm_tpu.engine import serial

    def send(msg) -> None:
        out_sock.send_multipart(serial.encode(msg))

    try:
        from vllm_tpu.engine.core import EngineCore

        core = EngineCore(engine_config)
        send(("ready",))
    except BaseException:  # noqa: BLE001
        send(("engine_dead", traceback.format_exc()))
        raise

    poller = zmq.Poller()
    poller.register(in_sock, zmq.POLLIN)
    running = True
    try:
        while running:
            # drain the input queue; block only when idle
            # (reference: core.py:689 _process_input_queue)
            timeout = 0 if core.scheduler.has_requests() else 200
            while True:
                socks = dict(poller.poll(timeout=timeout))
                if in_sock not in socks:
                    break
                msg = serial.decode(in_sock.recv_multipart())
                kind = msg[0]
                if kind == "add":
                    core.add_request(msg[1])
                elif kind == "abort":
                    core.abort_requests(msg[1])
                elif kind == "utility":
                    _, call_id, method, args, kwargs = msg
                    try:
                        result = getattr(core, method)(*args,
                                                       **(kwargs or {}))
                        send(("utility_result", call_id, result, None))
                    except Exception:  # noqa: BLE001
                        send(("utility_result", call_id, None,
                              traceback.format_exc()))
                elif kind == "shutdown":
                    running = False
                    break
                timeout = 0
            if running and core.scheduler.has_requests():
                outputs = core.step()
                if outputs:
                    send(("outputs", outputs))
    except BaseException:  # noqa: BLE001 — propagate engine death
        logger.exception("engine core died")
        send(("engine_dead", traceback.format_exc()))
    finally:
        try:
            core.shutdown()
        except Exception:  # noqa: BLE001
            pass
        in_sock.close(linger=0)
        out_sock.close(linger=0)
        ctx.term()


class EngineDeadError(RuntimeError):
    pass


class SyncMPClient:
    """Synchronous client to a background EngineCoreProc
    (reference: core_client.py:558 SyncMPClient)."""

    def __init__(self, engine_config, startup_timeout: float = 600.0
                 ) -> None:
        import zmq

        from vllm_tpu.utils import get_open_port

        self.ctx = zmq.Context()
        input_addr = f"tcp://127.0.0.1:{get_open_port()}"
        output_addr = f"tcp://127.0.0.1:{get_open_port()}"

        mp_ctx = mp.get_context("spawn")
        self.proc = mp_ctx.Process(target=_core_main,
                                   args=(engine_config, input_addr,
                                         output_addr),
                                   name="vllm-tpu-engine-core",
                                   daemon=True)
        self.proc.start()

        self.input_sock = self.ctx.socket(zmq.PUSH)
        self.input_sock.connect(input_addr)
        self.output_sock = self.ctx.socket(zmq.PULL)
        self.output_sock.connect(output_addr)

        self.outputs_queue: thread_queue.Queue = thread_queue.Queue()
        self._utility_results: dict[int, tuple] = {}
        self._utility_event = threading.Event()
        self._call_counter = 0
        self._dead: Optional[str] = None
        self._lock = threading.Lock()
        self._stop = threading.Event()

        self._io_thread = threading.Thread(target=self._recv_loop,
                                           daemon=True,
                                           name="engine-core-recv")
        self._io_thread.start()

        # handshake (reference: core.py:478 startup handshake)
        ready = self.outputs_queue.get(timeout=startup_timeout)
        if ready != ("ready",):
            raise EngineDeadError(f"engine core failed to start: {ready}")

    def _recv_loop(self) -> None:
        import zmq

        poller = zmq.Poller()
        poller.register(self.output_sock, zmq.POLLIN)
        while not self._stop.is_set():
            try:
                if not dict(poller.poll(timeout=100)):
                    continue
                msg = serial.decode(self.output_sock.recv_multipart())
            except zmq.ZMQError:
                return
            kind = msg[0]
            if kind == "utility_result":
                _, call_id, result, error = msg
                with self._lock:
                    self._utility_results[call_id] = (result, error)
                self._utility_event.set()
            elif kind == "engine_dead":
                self._dead = msg[1]
                self.outputs_queue.put(msg)
                return
            else:
                self.outputs_queue.put(msg)

    def _check_dead(self) -> None:
        if self._dead is not None:
            raise EngineDeadError(self._dead)
        if not self.proc.is_alive():
            raise EngineDeadError("engine core process exited "
                                  f"(code {self.proc.exitcode})")

    # ------------------------------------------------------------- verbs

    def add_request(self, request) -> None:
        self._check_dead()
        self.input_sock.send_multipart(serial.encode(("add", request)))

    def abort_requests(self, request_ids: list[str]) -> None:
        self._check_dead()
        self.input_sock.send_multipart(
            serial.encode(("abort", request_ids)))

    def get_output(self, timeout: Optional[float] = None):
        """Blocking: next batch of EngineCoreOutputs by client index."""
        msg = self.outputs_queue.get(timeout=timeout)
        if msg[0] == "engine_dead":
            raise EngineDeadError(msg[1])
        return msg[1]

    def poll_output(self):
        try:
            return self.get_output(timeout=0.05)
        except thread_queue.Empty:
            return None

    def call_utility(self, method: str, *args, timeout: float = 300.0,
                     **kwargs) -> Any:
        """RPC any EngineCore method (reference: UTILITY msgs,
        core.py:700 _handle_client_request)."""
        self._check_dead()
        with self._lock:
            self._call_counter += 1
            call_id = self._call_counter
        self.input_sock.send_multipart(
            serial.encode(("utility", call_id, method, args, kwargs)))
        import time

        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            with self._lock:
                if call_id in self._utility_results:
                    result, error = self._utility_results.pop(call_id)
                    if error:
                        raise RuntimeError(error)
                    return result
            self._check_dead()
            self._utility_event.wait(timeout=0.05)
            self._utility_event.clear()
        raise TimeoutError(f"utility call {method} timed out")

    def shutdown(self) -> None:
        try:
            if self.proc.is_alive():
                self.input_sock.send_multipart(
                    serial.encode(("shutdown",)))
                self.proc.join(timeout=10)
        except Exception:  # noqa: BLE001
            pass
        if self.proc.is_alive():
            self.proc.terminate()
            self.proc.join(timeout=5)
        # stop the IO thread BEFORE closing its socket (libzmq aborts on
        # cross-thread socket use)
        self._stop.set()
        if self._io_thread.is_alive():
            self._io_thread.join(timeout=2)
        self.input_sock.close(linger=0)
        self.output_sock.close(linger=0)
        self.ctx.term()


class AsyncMPClient(SyncMPClient):
    """Asyncio client to a background EngineCoreProc (reference:
    core_client.py:720 AsyncMPClient). Same process + ZMQ plumbing as
    the sync client; blocking reads are parked on the default executor
    so an event loop can multiplex many requests over one core."""

    async def get_output_async(self, timeout: Optional[float] = None):
        import asyncio
        import functools

        loop = asyncio.get_running_loop()
        return await loop.run_in_executor(
            None, functools.partial(self.get_output, timeout=timeout))

    async def add_request_async(self, request) -> None:
        self.add_request(request)  # PUSH send never blocks meaningfully

    async def abort_requests_async(self, request_ids: list[str]) -> None:
        self.abort_requests(request_ids)

    async def call_utility_async(self, method: str, *args,
                                 timeout: float = 300.0, **kwargs):
        import asyncio
        import functools

        loop = asyncio.get_running_loop()
        return await loop.run_in_executor(
            None, functools.partial(self.call_utility, method, *args,
                                    timeout=timeout, **kwargs))
