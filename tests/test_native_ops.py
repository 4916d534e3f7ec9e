"""Native host-ops parity: the C++ batch hasher and ngram matcher must be
bit-identical with the pure-Python implementations (SURVEY.md §2.7 —
native components need behavior parity with the Python contracts)."""

import numpy as np
import pytest

from vllm_tpu import _native
from vllm_tpu.core.kv_cache_utils import (NONE_HASH, hash_block_tokens,
                                          hash_request_tokens)


def _python_chain(tokens, block_size, extra_keys):
    hashes = []
    parent = None
    for start in range(0, len(tokens) - block_size + 1, block_size):
        bh = hash_block_tokens(parent, tuple(tokens[start:start +
                                                    block_size]),
                               extra_keys, "sha256")
        hashes.append(bh.hash_value)
        parent = bh.hash_value
    return hashes


@pytest.fixture(scope="module")
def native_lib():
    lib = _native.get_lib()
    if lib is None:
        pytest.skip("C++ toolchain unavailable")
    return lib


def test_hash_parity_with_python(native_lib):
    rng = np.random.default_rng(0)
    for trial, extra in [(0, None), (1, ("salt",)), (2, ("lora", "x"))]:
        tokens = rng.integers(0, 50000, size=100 + trial * 37).tolist()
        expect = _python_chain(tokens, 16, extra)
        eb = repr(extra).encode() if extra else b""
        got = _native.hash_request_tokens_native(tokens, 16, NONE_HASH, eb)
        assert got.tolist() == expect

    # the public API routes through native transparently
    api = [b.hash_value for b in hash_request_tokens(tokens, 16, extra)]
    assert api == expect


def test_hash_block_native_parity(native_lib):
    tokens = list(range(32))
    py = hash_block_tokens(12345, tuple(tokens), ("k",), "sha256")
    nat = _native.hash_block_native(12345, tokens, repr(("k",)).encode())
    assert nat == py.hash_value


def test_ngram_parity_with_python(native_lib):
    from vllm_tpu.spec_decode.ngram import NgramProposer

    proposer = NgramProposer(num_speculative_tokens=4, prompt_lookup_min=1,
                             prompt_lookup_max=3)

    rng = np.random.default_rng(1)
    for _ in range(50):
        seq = rng.integers(0, 6, size=rng.integers(3, 60)).tolist()
        native = _native.ngram_propose_native(seq, 1, 3, 4)
        # force the Python path for the oracle
        import vllm_tpu._native as mod
        orig = mod.ngram_propose_native
        mod.ngram_propose_native = lambda *a, **k: None
        try:
            py = proposer.propose_for_tokens(seq)
        finally:
            mod.ngram_propose_native = orig
        assert native == py, (seq, native, py)
