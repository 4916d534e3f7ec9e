"""Native host-ops loader: compiles csrc/host_ops.cpp on first use and
binds it via ctypes (no pybind11 in this environment; the reference binds
its csrc/ through torch extensions, SURVEY.md §2.7 binding surface).

Everything here is optional: callers fall back to the pure-Python
implementations when a C++ toolchain is unavailable. The compiled library
is cached next to the sources keyed by their mtime.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_CSRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libvllm_tpu_host.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[str]:
    src = os.path.join(_CSRC, "host_ops.cpp")
    if not os.path.exists(src):
        return None
    if (os.path.exists(_LIB_PATH)
            and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(src)):
        return _LIB_PATH
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-march=native",
           src, "-o", _LIB_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        logger.warning("native host ops unavailable (%s); "
                       "using Python fallbacks", e)
        return None
    return _LIB_PATH


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        path = _build()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        i64, i32p, u8p, i64p = (ctypes.c_int64,
                                ctypes.POINTER(ctypes.c_int32),
                                ctypes.POINTER(ctypes.c_uint8),
                                ctypes.POINTER(ctypes.c_int64))
        lib.hash_request_tokens.restype = i64
        lib.hash_request_tokens.argtypes = [i32p, i64, i64, i64, u8p, i64,
                                            i64p]
        lib.hash_block.restype = i64
        lib.hash_block.argtypes = [i64, i32p, i64, u8p, i64]
        lib.ngram_propose.restype = i64
        lib.ngram_propose.argtypes = [i32p, i64, i64, i64, i64, i32p]
        _lib = lib
        logger.info("native host ops loaded from %s", path)
        return _lib


def _as_i32_ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def hash_request_tokens_native(token_ids, block_size: int, seed: int,
                               extra: bytes) -> Optional[np.ndarray]:
    """Chained block hashes as int64[num_full_blocks]; None if the native
    lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    tokens = np.ascontiguousarray(token_ids, dtype=np.int32)
    n_out = len(tokens) // block_size
    out = np.empty(n_out, np.int64)
    eb = np.frombuffer(extra, dtype=np.uint8) if extra else \
        np.empty(0, np.uint8)
    n = lib.hash_request_tokens(
        _as_i32_ptr(tokens), len(tokens), block_size, seed,
        eb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(eb),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out[:n]


def hash_block_native(parent: int, token_ids, extra: bytes
                      ) -> Optional[int]:
    lib = get_lib()
    if lib is None:
        return None
    tokens = np.ascontiguousarray(token_ids, dtype=np.int32)
    eb = np.frombuffer(extra, dtype=np.uint8) if extra else \
        np.empty(0, np.uint8)
    return int(lib.hash_block(
        parent, _as_i32_ptr(tokens), len(tokens),
        eb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(eb)))


def ngram_propose_native(token_ids, min_n: int, max_n: int,
                         k: int) -> Optional[list[int]]:
    lib = get_lib()
    if lib is None:
        return None
    tokens = np.ascontiguousarray(token_ids, dtype=np.int32)
    out = np.empty(k, np.int32)
    n = lib.ngram_propose(_as_i32_ptr(tokens), len(tokens), min_n, max_n,
                          k, _as_i32_ptr(out))
    return out[:n].tolist()
