"""Block hashing and free-block bookkeeping for prefix caching.

Reference behavior replicated (vllm/v1/core/kv_cache_utils.py): chained
block hashes over (parent_hash, token_ids, extra_keys); a doubly-linked
free queue giving O(1) LRU eviction with tail-first ordering.
"""

from __future__ import annotations

import hashlib
import struct
from dataclasses import dataclass, field
from typing import Any, NamedTuple, Optional


class BlockHash(NamedTuple):
    """Hash of one full block: chained over the parent block's hash."""

    hash_value: int
    token_ids: tuple[int, ...]
    extra_keys: Optional[tuple[Any, ...]] = None


def _sha256_hash(parent: int, token_ids: tuple[int, ...],
                 extra_keys: Optional[tuple[Any, ...]]) -> int:
    h = hashlib.sha256()
    h.update(struct.pack("<q", parent))
    h.update(struct.pack(f"<{len(token_ids)}i", *token_ids))
    if extra_keys:
        h.update(repr(extra_keys).encode())
    return int.from_bytes(h.digest()[:8], "little", signed=True)


def _builtin_hash(parent: int, token_ids: tuple[int, ...],
                  extra_keys: Optional[tuple[Any, ...]]) -> int:
    return hash((parent, token_ids, extra_keys))


_HASH_FNS = {"sha256": _sha256_hash, "builtin": _builtin_hash}

# Seed for the first block in a sequence (reference uses a process-random
# NONE_HASH; we use a fixed constant for cross-host determinism, which
# multi-host schedulers rely on).
NONE_HASH = -0x6A09E667F3BCC909


def hash_block_tokens(
    parent_hash: Optional[int],
    token_ids: tuple[int, ...],
    extra_keys: Optional[tuple[Any, ...]] = None,
    algo: str = "sha256",
) -> BlockHash:
    """Hash one full block chained on its parent
    (reference: kv_cache_utils.py:527)."""
    parent = NONE_HASH if parent_hash is None else parent_hash
    value = _HASH_FNS[algo](parent, token_ids, extra_keys)
    return BlockHash(value, token_ids, extra_keys)


def hash_request_tokens(
    token_ids: list[int],
    block_size: int,
    extra_keys: Optional[tuple[Any, ...]] = None,
    algo: str = "sha256",
) -> list[BlockHash]:
    """Hash all *full* blocks of a token sequence
    (reference: kv_cache_utils.py:558).

    The sha256 path uses the native batch hasher (csrc/host_ops.cpp) when
    available — one C call per request instead of one hashlib round-trip
    per block — and falls back to pure Python with identical values."""
    if algo == "sha256":
        from vllm_tpu import _native

        extra = repr(extra_keys).encode() if extra_keys else b""
        values = _native.hash_request_tokens_native(
            token_ids, block_size, NONE_HASH, extra)
        if values is not None:
            # token_ids are elided: nothing reads BlockHash.token_ids (the
            # 64-bit chained sha256 collision risk is the same one the
            # reference accepts, kv_cache_utils.py:527).
            return [BlockHash(int(v), (), extra_keys) for v in values]
    hashes: list[BlockHash] = []
    parent: Optional[int] = None
    for start in range(0, len(token_ids) - block_size + 1, block_size):
        block = tuple(token_ids[start:start + block_size])
        bh = hash_block_tokens(parent, block, extra_keys, algo)
        hashes.append(bh)
        parent = bh.hash_value
    return hashes


@dataclass
class KVCacheBlock:
    """One physical KV block (reference: kv_cache_utils.py:139)."""

    block_id: int
    ref_cnt: int = 0
    block_hash: Optional[BlockHash] = None
    # Free-queue links
    prev_free_block: Optional["KVCacheBlock"] = field(default=None,
                                                      repr=False)
    next_free_block: Optional["KVCacheBlock"] = field(default=None,
                                                      repr=False)

    def reset_hash(self) -> None:
        self.block_hash = None


class FreeKVCacheBlockQueue:
    """Doubly-linked LRU queue of free blocks
    (reference: kv_cache_utils.py:193).

    Blocks freed earlier (and block-sequence tails, freed in reverse order
    by the manager) sit at the head and are evicted first.
    """

    def __init__(self, blocks: list[KVCacheBlock]) -> None:
        self.num_free_blocks = 0
        # Sentinel head/tail keep the link logic branch-free.
        self._head = KVCacheBlock(block_id=-1)
        self._tail = KVCacheBlock(block_id=-2)
        self._head.next_free_block = self._tail
        self._tail.prev_free_block = self._head
        for blk in blocks:
            self.append(blk)

    def popleft(self) -> KVCacheBlock:
        block = self._head.next_free_block
        if block is self._tail:
            raise ValueError("No free blocks available")
        self.remove(block)
        return block

    def remove(self, block: KVCacheBlock) -> None:
        if block.prev_free_block is None or block.next_free_block is None:
            raise ValueError(f"Block {block.block_id} not in free queue")
        block.prev_free_block.next_free_block = block.next_free_block
        block.next_free_block.prev_free_block = block.prev_free_block
        block.prev_free_block = None
        block.next_free_block = None
        self.num_free_blocks -= 1

    def append(self, block: KVCacheBlock) -> None:
        last = self._tail.prev_free_block
        last.next_free_block = block
        block.prev_free_block = last
        block.next_free_block = self._tail
        self._tail.prev_free_block = block
        self.num_free_blocks += 1

    def get_all_free_blocks(self) -> list[KVCacheBlock]:
        out = []
        node = self._head.next_free_block
        while node is not self._tail:
            out.append(node)
            node = node.next_free_block
        return out
