"""Engine wire codec (reference: vllm/v1/serial_utils.py — msgspec
array-like structs with zero-copy tensor encoding; msgspec is not in
this image, so the same two properties are delivered differently):

1. **Deserialization safety**: a restricted unpickler that only
   constructs types from an allowlist (engine dataclasses, numpy,
   stdlib containers). Arbitrary-code-execution gadgets (os.system,
   subprocess, __reduce__ tricks importing other modules) fail with
   UnpicklingError, so a compromised peer on the socket cannot execute
   code in the engine process.
2. **Zero-copy arrays**: pickle protocol 5 out-of-band buffers; numpy
   payloads (grammar bitmasks, mm pixel arrays, block tables) travel as
   separate ZMQ frames with no serializer copy on either side.

Used by the engine-core ZMQ boundary (core_proc.py) and the multi-host
verb bus (distributed/multihost.py).
"""

from __future__ import annotations

import io
import pickle
from typing import Any

_SAFE_BUILTINS = {
    "list", "dict", "tuple", "set", "frozenset", "bytes", "bytearray",
    "str", "int", "float", "bool", "complex", "slice", "range",
    # NOTE: "getattr" and "object" are deliberately NOT here — together
    # they form the classic gadget chain getattr(object,
    # '__subclasses__')() -> arbitrary class -> __init__.__globals__ ->
    # os.system (ADVICE r02 high finding).
}

# Exact module names OR dotted prefixes (trailing "." so e.g.
# "numpy_evil" / "jaxlib" never match).
_SAFE_MODULES = {"numpy", "collections", "jax"}
_SAFE_MODULE_PREFIXES = (
    "vllm_tpu.",
    "numpy.",
    "collections.",
    "jax.",  # jnp scalars/dtypes occasionally ride in configs
)


class _RestrictedUnpickler(pickle.Unpickler):

    def find_class(self, module: str, name: str):
        if module == "builtins":
            if name in _SAFE_BUILTINS:
                return super().find_class(module, name)
            raise pickle.UnpicklingError(
                f"blocked builtins.{name} on the engine wire")
        if module in _SAFE_MODULES or module.startswith(
                _SAFE_MODULE_PREFIXES):
            return super().find_class(module, name)
        raise pickle.UnpicklingError(
            f"blocked {module}.{name} on the engine wire "
            "(not in the allowlist)")


def encode(obj: Any) -> list[bytes]:
    """-> multipart frames [header, *oob_buffers]."""
    buffers: list[pickle.PickleBuffer] = []
    head = pickle.dumps(obj, protocol=5,
                        buffer_callback=buffers.append)
    return [head] + [bytes(b.raw()) for b in buffers]


def decode(frames: list[bytes]) -> Any:
    return _RestrictedUnpickler(
        io.BytesIO(frames[0]),
        buffers=[memoryview(f) for f in frames[1:]]).load()


def encode_one(obj: Any) -> bytes:
    """Single-frame variant (no out-of-band buffers)."""
    return pickle.dumps(obj, protocol=5)


def decode_one(data: bytes) -> Any:
    return _RestrictedUnpickler(io.BytesIO(data)).load()
