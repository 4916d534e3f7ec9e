"""Facade the scheduler uses for paged-KV accounting
(reference: vllm/v1/core/kv_cache_manager.py:67).

Behavioral subtleties preserved from the reference:
- a full prefix-cache hit is capped at ``num_tokens - 1`` so the last
  token's logits are always recomputed (kv_cache_manager.py:177-186);
- only finalized (non-draft) tokens are committed to the prefix cache
  (:296-306);
- blocks are freed in reverse order so sequence tails evict first
  (:310-313);
- lookahead slots reserve space for speculative tokens.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from vllm_tpu.core.block_pool import BlockPool
from vllm_tpu.core.kv_cache_interface import KVCacheConfig
from vllm_tpu.core.kv_cache_utils import BlockHash, KVCacheBlock, \
    hash_request_tokens
from vllm_tpu.core.single_type_kv_cache_manager import (
    SingleTypeKVCacheManager, spec_manager_map)
from vllm_tpu.request import Request


@dataclass
class KVCacheBlocks:
    """Block ids grouped per KV-cache group (reference:
    kv_cache_manager.py:22)."""

    blocks: tuple[list[KVCacheBlock], ...]

    def __add__(self, other: "KVCacheBlocks") -> "KVCacheBlocks":
        return KVCacheBlocks(
            tuple(a + b for a, b in zip(self.blocks, other.blocks)))

    def get_block_ids(self) -> tuple[list[int], ...]:
        return tuple([b.block_id for b in group] for group in self.blocks)

    def new_empty(self) -> "KVCacheBlocks":
        return KVCacheBlocks(tuple([] for _ in self.blocks))


@dataclass
class KVCacheManagerStats:
    prefix_cache_queries: int = 0
    prefix_cache_hits: int = 0
    requests: int = 0
    preempted: int = 0
    extra: dict = field(default_factory=dict)


class KVCacheManager:

    def __init__(
        self,
        kv_cache_config: KVCacheConfig,
        max_model_len: int,
        enable_caching: bool = True,
        hash_algo: str = "sha256",
        num_preallocate_tokens: int = 0,
    ) -> None:
        self.kv_cache_config = kv_cache_config
        self.max_model_len = max_model_len
        self.enable_caching = enable_caching
        self.block_pool = BlockPool(kv_cache_config.num_blocks,
                                    enable_caching, hash_algo)
        self.managers: list[SingleTypeKVCacheManager] = [
            spec_manager_map(g.kv_cache_spec)(g.kv_cache_spec,
                                              self.block_pool)
            for g in kv_cache_config.kv_cache_groups
        ]
        assert self.managers, "at least one KV cache group required"
        # All groups must share a block size for a unified slot mapping.
        self.block_size = self.managers[0].block_size
        # Request id -> running list of full-block hashes.
        self.req_to_block_hashes: dict[str, list[BlockHash]] = {}
        self.stats = KVCacheManagerStats()

    @property
    def num_groups(self) -> int:
        return len(self.managers)

    @property
    def usage(self) -> float:
        return self.block_pool.get_usage()

    def make_empty_blocks(self) -> KVCacheBlocks:
        return KVCacheBlocks(tuple([] for _ in self.managers))

    # -- prefix cache -------------------------------------------------------

    def get_computed_blocks(
            self, request: Request) -> tuple[KVCacheBlocks, int]:
        """Longest cached prefix for a new request
        (reference: kv_cache_manager.py:144)."""
        if (not self.enable_caching
                or request.sampling_params is None
                # prompt logprobs need the forward to actually run over
                # every prompt position (reference:
                # kv_cache_manager.py get_computed_blocks skips caching
                # when prompt_logprobs is set)
                or request.sampling_params.prompt_logprobs is not None):
            return self.make_empty_blocks(), 0

        block_hashes = self.req_to_block_hashes.get(request.request_id)
        if block_hashes is None:
            extra = SingleTypeKVCacheManager._extra_keys(request)
            block_hashes = hash_request_tokens(
                request.prompt_token_ids, self.block_size, extra,
                self.block_pool.hash_algo)
            self.req_to_block_hashes[request.request_id] = block_hashes

        self.stats.prefix_cache_queries += 1
        # Cap: never serve the *entire* prompt from cache — the last token
        # must run through the model to produce logits.
        max_cache_hit_tokens = request.num_tokens - 1
        max_blocks = max_cache_hit_tokens // self.block_size

        hits = [
            m.find_longest_cache_hit(block_hashes, max_blocks)
            for m in self.managers
        ]
        # Hybrid groups must agree on the hit length; truncate to the min.
        num_hit_blocks = min(len(h) for h in hits)
        hits = [h[:num_hit_blocks] for h in hits]
        num_computed_tokens = num_hit_blocks * self.block_size
        if num_hit_blocks > 0:
            self.stats.prefix_cache_hits += 1
        return KVCacheBlocks(tuple(hits)), num_computed_tokens

    # -- allocation ----------------------------------------------------------

    def allocate_slots(
        self,
        request: Request,
        num_new_tokens: int,
        num_new_computed_tokens: int = 0,
        new_computed_blocks: Optional[KVCacheBlocks] = None,
        num_lookahead_tokens: int = 0,
        delay_cache_blocks: bool = False,
    ) -> Optional[KVCacheBlocks]:
        """Reserve blocks for `num_new_tokens` more tokens (plus lookahead
        slots); returns None if the pool can't satisfy it
        (reference: kv_cache_manager.py:195)."""
        if num_new_tokens == 0:
            raise ValueError("num_new_tokens must be > 0")
        if new_computed_blocks is None:
            new_computed_blocks = self.make_empty_blocks()

        num_computed_tokens = (request.num_computed_tokens +
                               num_new_computed_tokens)
        num_tokens_need_slot = min(
            num_computed_tokens + num_new_tokens + num_lookahead_tokens,
            self.max_model_len)

        num_blocks_to_allocate = sum(
            m.get_num_blocks_to_allocate(request.request_id,
                                         num_tokens_need_slot,
                                         new_computed_blocks.blocks[i])
            for i, m in enumerate(self.managers))
        if num_blocks_to_allocate > self.block_pool.get_num_free_blocks():
            return None

        # Commit the prefix-cache hit: bump refs & attach to the request.
        if self.enable_caching:
            flat = [b for grp in new_computed_blocks.blocks for b in grp]
            self.block_pool.touch(flat)
        else:
            assert not any(new_computed_blocks.blocks)

        new_blocks: list[list[KVCacheBlock]] = []
        for i, m in enumerate(self.managers):
            m.save_new_computed_blocks(request.request_id,
                                       new_computed_blocks.blocks[i])
            new_blocks.append(
                m.allocate_new_blocks(request.request_id,
                                      num_tokens_need_slot))
            # Sliding window: reclaim out-of-window blocks.
            m.remove_skipped_blocks(request.request_id, num_computed_tokens)

        if self.enable_caching and not delay_cache_blocks:
            # Commit only finalized tokens (exclude draft/spec tokens).
            num_tokens_to_cache = min(num_computed_tokens + num_new_tokens,
                                      request.num_tokens)
            block_hashes = self.req_to_block_hashes.setdefault(
                request.request_id, [])
            for m in self.managers:
                m.cache_blocks(request, block_hashes, num_tokens_to_cache)

        return KVCacheBlocks(tuple(new_blocks))

    # -- lifetime -------------------------------------------------------------

    def free(self, request: Request) -> None:
        """Release all blocks of a request (tails first)."""
        for m in self.managers:
            self.block_pool.free_blocks(m.free(request.request_id))

    def free_block_hashes(self, request: Request) -> None:
        self.req_to_block_hashes.pop(request.request_id, None)

    def get_block_ids(self, request_id: str) -> tuple[list[int], ...]:
        return tuple([b.block_id for b in m.req_to_blocks[request_id]]
                     for m in self.managers)

    def get_num_common_prefix_blocks(self, request: Request,
                                     num_running_requests: int) -> list[int]:
        return [
            m.get_num_common_prefix_blocks(request.request_id,
                                           num_running_requests)
            for m in self.managers
        ]

    def reset_prefix_cache(self) -> bool:
        return self.block_pool.reset_prefix_cache()
