"""Per-attention-type block allocation/caching policy
(reference: vllm/v1/core/single_type_kv_cache_manager.py).

One manager instance per KV-cache group; all managers share the BlockPool.
"""

from __future__ import annotations

from collections import defaultdict

from vllm_tpu.core.block_pool import BlockPool
from vllm_tpu.core.kv_cache_interface import (ChunkedLocalAttentionSpec,
                                              FullAttentionSpec, KVCacheSpec,
                                              MambaSpec, SlidingWindowSpec)
from vllm_tpu.core.kv_cache_utils import BlockHash, KVCacheBlock
from vllm_tpu.request import Request


class SingleTypeKVCacheManager:

    def __init__(self, kv_cache_spec: KVCacheSpec,
                 block_pool: BlockPool) -> None:
        self.kv_cache_spec = kv_cache_spec
        self.block_size = kv_cache_spec.block_size
        self.block_pool = block_pool
        self.req_to_blocks: dict[str, list[KVCacheBlock]] = defaultdict(list)
        # How many of a request's blocks are already in the prefix cache.
        self.num_cached_block: dict[str, int] = {}

    # -- allocation --------------------------------------------------------

    def get_num_blocks_to_allocate(
            self, request_id: str, num_tokens: int,
            new_computed_blocks: list[KVCacheBlock]) -> int:
        """Blocks that must come out of the free pool to cover the first
        `num_tokens` tokens of the request (incl. prefix-cache hits that
        only need a ref-count bump but no new memory)."""
        num_required = -(-num_tokens // self.block_size)
        num_have = len(self.req_to_blocks[request_id]) + len(
            new_computed_blocks)
        # Cached blocks with ref_cnt==0 sit in the free queue; touching
        # them removes them, so they count against the free pool.
        num_evictable = sum(1 for b in new_computed_blocks if b.ref_cnt == 0)
        return max(0, num_required - num_have) + num_evictable

    def save_new_computed_blocks(
            self, request_id: str,
            new_computed_blocks: list[KVCacheBlock]) -> None:
        """Attach prefix-cache-hit blocks to the request (first schedule)."""
        blocks = self.req_to_blocks[request_id]
        assert not blocks or not new_computed_blocks, (
            "computed blocks may only be attached before allocation")
        blocks.extend(new_computed_blocks)
        if request_id not in self.num_cached_block:
            self.num_cached_block[request_id] = len(new_computed_blocks)

    def allocate_new_blocks(self, request_id: str,
                            num_tokens: int) -> list[KVCacheBlock]:
        """Grow the request's block list to cover `num_tokens` tokens."""
        blocks = self.req_to_blocks[request_id]
        num_required = -(-num_tokens // self.block_size)
        num_new = num_required - len(blocks)
        if num_new <= 0:
            return []
        new_blocks = self.block_pool.get_new_blocks(num_new)
        blocks.extend(new_blocks)
        return new_blocks

    def cache_blocks(self, request: Request, block_hashes: list[BlockHash],
                     num_tokens: int) -> None:
        """Commit full blocks (of finalized tokens only) to the prefix
        cache."""
        num_full_blocks = num_tokens // self.block_size
        num_cached = self.num_cached_block.get(request.request_id, 0)
        if num_full_blocks <= num_cached:
            return
        self.block_pool.cache_full_blocks(
            request_token_ids=request.all_token_ids,
            blocks=self.req_to_blocks[request.request_id],
            block_hashes=block_hashes,
            num_cached_blocks=num_cached,
            num_full_blocks=num_full_blocks,
            block_size=self.block_size,
            extra_keys=self._extra_keys(request),
        )
        self.num_cached_block[request.request_id] = num_full_blocks

    @staticmethod
    def _extra_keys(request: Request):
        extras = []
        if request.cache_salt is not None:
            extras.append(request.cache_salt)
        if request.lora_request is not None:
            extras.append(getattr(request.lora_request, "lora_name",
                                  str(request.lora_request)))
        # Multimodal content hashes: image prompts prefix-cache against
        # requests carrying the SAME images (reference:
        # kv_cache_utils.py:24 extra_keys; coarser — every block carries
        # all of the request's mm hashes rather than per-placeholder
        # ranges, which forgoes text-only prefix sharing but is never
        # incorrect).
        mm_hashes = getattr(request, "mm_hashes", None)
        if mm_hashes:
            extras.extend(mm_hashes)
        return tuple(extras) if extras else None

    def free(self, request_id: str) -> list[KVCacheBlock]:
        """Detach and return the request's blocks in eviction order
        (reversed: tails evict first, reference kv_cache_manager.py:310)."""
        blocks = self.req_to_blocks.pop(request_id, [])
        self.num_cached_block.pop(request_id, None)
        return list(reversed(blocks))

    # -- prefix-cache lookup -------------------------------------------------

    def find_longest_cache_hit(
            self, block_hashes: list[BlockHash],
            max_num_blocks: int) -> list[KVCacheBlock]:
        raise NotImplementedError

    def remove_skipped_blocks(self, request_id: str,
                              num_computed_tokens: int) -> None:
        """Free blocks no longer attended to (sliding window)."""
        return None

    def get_num_common_prefix_blocks(self, request_id: str,
                                     num_running_requests: int) -> int:
        blocks = self.req_to_blocks[request_id]
        count = 0
        for block in blocks:
            if block.ref_cnt == num_running_requests:
                count += 1
            else:
                break
        return count


class FullAttentionManager(SingleTypeKVCacheManager):
    """(reference: single_type_kv_cache_manager.py:248)"""

    def find_longest_cache_hit(
            self, block_hashes: list[BlockHash],
            max_num_blocks: int) -> list[KVCacheBlock]:
        hit: list[KVCacheBlock] = []
        for bh in block_hashes[:max_num_blocks]:
            block = self.block_pool.get_cached_block(bh)
            if block is None:
                break
            hit.append(block)
        return hit


class SlidingWindowManager(SingleTypeKVCacheManager):
    """(reference: single_type_kv_cache_manager.py:299)

    Out-of-window blocks are replaced with the null block so the device
    block table keeps static shape while memory is reclaimed.
    """

    def __init__(self, kv_cache_spec: SlidingWindowSpec,
                 block_pool: BlockPool) -> None:
        super().__init__(kv_cache_spec, block_pool)
        self.sliding_window = kv_cache_spec.sliding_window

    def find_longest_cache_hit(
            self, block_hashes: list[BlockHash],
            max_num_blocks: int) -> list[KVCacheBlock]:
        # A sliding-window hit needs the *suffix* within the window to be
        # cached; supporting only full-prefix hits keeps correctness and is
        # what we do here: same scan as full attention (conservative).
        hit: list[KVCacheBlock] = []
        for bh in block_hashes[:max_num_blocks]:
            block = self.block_pool.get_cached_block(bh)
            if block is None:
                break
            hit.append(block)
        return hit

    def remove_skipped_blocks(self, request_id: str,
                              num_computed_tokens: int) -> None:
        # Tokens before this index are outside the window.
        last_useful_token = num_computed_tokens - self.sliding_window + 1
        last_useful_block = last_useful_token // self.block_size
        blocks = self.req_to_blocks[request_id]
        removed: list[KVCacheBlock] = []
        for i in range(min(last_useful_block, len(blocks)) - 1, -1, -1):
            if blocks[i] is self.block_pool.null_block:
                break  # everything before is already freed
            removed.append(blocks[i])
            blocks[i] = self.block_pool.null_block
        self.block_pool.free_blocks(removed)


class ChunkedLocalAttentionManager(SingleTypeKVCacheManager):
    """Chunked local attention (reference:
    single_type_kv_cache_manager.py:397): only the CURRENT chunk's
    tokens are attendable, so blocks wholly before the chunk start are
    replaced with the null block and reclaimed."""

    def __init__(self, kv_cache_spec, block_pool: BlockPool) -> None:
        super().__init__(kv_cache_spec, block_pool)
        self.chunk_size = kv_cache_spec.attention_chunk_size

    def find_longest_cache_hit(self, block_hashes, max_num_blocks):
        hit: list[KVCacheBlock] = []
        for bh in block_hashes[:max_num_blocks]:
            block = self.block_pool.get_cached_block(bh)
            if block is None:
                break
            hit.append(block)
        return hit

    def remove_skipped_blocks(self, request_id: str,
                              num_computed_tokens: int) -> None:
        # tokens before the current chunk's start are never attended
        chunk_start = (num_computed_tokens // self.chunk_size) * \
            self.chunk_size
        last_useful_block = chunk_start // self.block_size
        blocks = self.req_to_blocks[request_id]
        removed: list[KVCacheBlock] = []
        for i in range(min(last_useful_block, len(blocks)) - 1, -1, -1):
            if blocks[i] is self.block_pool.null_block:
                break
            removed.append(blocks[i])
            blocks[i] = self.block_pool.null_block
        self.block_pool.free_blocks(removed)


class MambaManager(SingleTypeKVCacheManager):
    """One state slot per request; no prefix caching
    (reference: single_type_kv_cache_manager.py:520). The recurrent
    state is constant-size, so exactly one bookkeeping block is
    allocated per request regardless of its length."""

    def find_longest_cache_hit(self, block_hashes, max_num_blocks):
        return []

    def cache_blocks(self, request, block_hashes, num_tokens) -> None:
        return None

    def get_num_blocks_to_allocate(self, request_id: str, num_tokens: int,
                                   new_computed_blocks) -> int:
        return super().get_num_blocks_to_allocate(
            request_id, min(num_tokens, self.block_size),
            new_computed_blocks)

    def allocate_new_blocks(self, request_id: str, num_tokens: int):
        return super().allocate_new_blocks(
            request_id, min(num_tokens, self.block_size))


def spec_manager_map(spec: KVCacheSpec) -> type[SingleTypeKVCacheManager]:
    if isinstance(spec, SlidingWindowSpec):
        return SlidingWindowManager
    if isinstance(spec, ChunkedLocalAttentionSpec):
        return ChunkedLocalAttentionManager
    if isinstance(spec, MambaSpec):
        return MambaManager
    if isinstance(spec, FullAttentionSpec):
        return FullAttentionManager
    raise ValueError(f"unsupported spec {spec}")
