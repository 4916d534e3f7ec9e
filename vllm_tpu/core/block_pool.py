"""Global paged-KV block store (reference: vllm/v1/core/block_pool.py:19).

Ref-counted physical blocks + a cached-block hash map enabling prefix-cache
hits, with LRU eviction through the free queue. Entirely device-free: block
contents live in the per-layer jax arrays owned by the model runner; this
class only manages block *ids*.
"""

from __future__ import annotations

from typing import Callable, Optional

from vllm_tpu.core.kv_cache_utils import (BlockHash, FreeKVCacheBlockQueue,
                                          KVCacheBlock, hash_block_tokens)


class BlockPool:

    def __init__(self, num_blocks: int, enable_caching: bool = True,
                 hash_algo: str = "sha256") -> None:
        if num_blocks < 1:
            raise ValueError("num_blocks must be >= 1")
        self.num_blocks = num_blocks
        self.enable_caching = enable_caching
        self.hash_algo = hash_algo
        # Block id 0 is reserved as the null block (padding rows of device
        # block tables point at it; never allocated, never cached).
        self.blocks = [KVCacheBlock(block_id=i) for i in range(num_blocks)]
        self.null_block = self.blocks[0]
        self.null_block.ref_cnt = 1
        self.free_block_queue = FreeKVCacheBlockQueue(self.blocks[1:])
        # {hash_value: {block_id: block}} — a hash can map to several blocks
        # transiently; first insertion wins on lookup.
        self.cached_block_hash_to_block: dict[int, dict[int,
                                                        KVCacheBlock]] = {}
        # Optional listener for KV events (block stored/removed), used by
        # the kv-events publisher.
        self.event_listener: Optional[Callable[[str, dict], None]] = None

    # -- queries ---------------------------------------------------------

    def get_num_free_blocks(self) -> int:
        return self.free_block_queue.num_free_blocks

    def get_usage(self) -> float:
        usable = self.num_blocks - 1
        return 1.0 - self.get_num_free_blocks() / max(usable, 1)

    def get_cached_block(self,
                         block_hash: BlockHash) -> Optional[KVCacheBlock]:
        cached = self.cached_block_hash_to_block.get(block_hash.hash_value)
        if cached:
            return next(iter(cached.values()))
        return None

    # -- allocation ------------------------------------------------------

    def get_new_blocks(self, num_blocks: int) -> list[KVCacheBlock]:
        """Pop `num_blocks` free blocks, evicting cached entries as needed
        (reference: block_pool.py:202)."""
        if num_blocks > self.get_num_free_blocks():
            raise ValueError(
                f"Cannot allocate {num_blocks} blocks "
                f"({self.get_num_free_blocks()} free)")
        out: list[KVCacheBlock] = []
        for _ in range(num_blocks):
            block = self.free_block_queue.popleft()
            self._maybe_evict_cached_block(block)
            assert block.ref_cnt == 0
            block.ref_cnt = 1
            out.append(block)
        return out

    def _maybe_evict_cached_block(self, block: KVCacheBlock) -> bool:
        """Drop a block's prefix-cache entry when it gets reused
        (reference: block_pool.py:231)."""
        if block.block_hash is None:
            return False
        hash_value = block.block_hash.hash_value
        cached = self.cached_block_hash_to_block.get(hash_value)
        if cached is not None and block.block_id in cached:
            del cached[block.block_id]
            if not cached:
                del self.cached_block_hash_to_block[hash_value]
            if self.event_listener is not None:
                self.event_listener("block_removed",
                                    {"block_hashes": [hash_value]})
        block.reset_hash()
        return True

    def touch(self, blocks: list[KVCacheBlock]) -> None:
        """Re-reference cached blocks for a prefix hit
        (reference: block_pool.py:265)."""
        for block in blocks:
            # A cached block may sit in the free queue (ref 0): revive it.
            if block.ref_cnt == 0 and block is not self.null_block:
                self.free_block_queue.remove(block)
            block.ref_cnt += 1

    def cache_full_blocks(
        self,
        request_token_ids: list[int],
        blocks: list[KVCacheBlock],
        block_hashes: list[BlockHash],
        num_cached_blocks: int,
        num_full_blocks: int,
        block_size: int,
        extra_keys: Optional[tuple] = None,
    ) -> None:
        """Register newly-full blocks in the prefix cache
        (reference: block_pool.py:96).

        `block_hashes` is the request's running hash list; it is extended
        in place for blocks not yet hashed.
        """
        if not self.enable_caching:
            return
        if num_cached_blocks == num_full_blocks:
            return
        new_full_blocks = blocks[num_cached_blocks:num_full_blocks]
        # Extend the hash chain as needed.
        if len(block_hashes) < num_full_blocks:
            parent = (block_hashes[-1].hash_value if block_hashes else None)
            for i in range(len(block_hashes), num_full_blocks):
                start = i * block_size
                token_ids = tuple(request_token_ids[start:start +
                                                    block_size])
                assert len(token_ids) == block_size
                bh = hash_block_tokens(parent, token_ids, extra_keys,
                                       self.hash_algo)
                block_hashes.append(bh)
                parent = bh.hash_value
        stored_hashes = []
        for i, block in enumerate(new_full_blocks):
            assert block.block_hash is None
            bh = block_hashes[num_cached_blocks + i]
            block.block_hash = bh
            self.cached_block_hash_to_block.setdefault(
                bh.hash_value, {})[block.block_id] = block
            stored_hashes.append(bh.hash_value)
        if self.event_listener is not None and stored_hashes:
            self.event_listener("block_stored",
                                {"block_hashes": stored_hashes})

    # -- freeing ---------------------------------------------------------

    def free_blocks(self, ordered_blocks: list[KVCacheBlock]) -> None:
        """Deref blocks; fully-freed blocks enter the free queue in the
        given order (callers pass tails first so they evict first)."""
        for block in ordered_blocks:
            if block is self.null_block:
                continue
            block.ref_cnt -= 1
            assert block.ref_cnt >= 0
            if block.ref_cnt == 0:
                self.free_block_queue.append(block)

    def reset_prefix_cache(self) -> bool:
        """Drop all cached entries; only safe when nothing is running."""
        num_used = self.num_blocks - 1 - self.get_num_free_blocks()
        if num_used != 0:
            return False
        self.cached_block_hash_to_block.clear()
        for block in self.blocks[1:]:
            block.reset_hash()
        if self.event_listener is not None:
            self.event_listener("all_blocks_cleared", {})
        return True
