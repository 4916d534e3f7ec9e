"""BlockPool + hashing unit tests (reference analog:
tests/v1/core/test_kv_cache_utils.py, test_prefix_caching.py)."""

import pytest

from vllm_tpu.core.block_pool import BlockPool
from vllm_tpu.core.kv_cache_utils import (FreeKVCacheBlockQueue, KVCacheBlock,
                                          hash_block_tokens,
                                          hash_request_tokens)


def test_hash_chain_determinism():
    tokens = list(range(48))
    h1 = hash_request_tokens(tokens, 16)
    h2 = hash_request_tokens(tokens, 16)
    assert len(h1) == 3
    assert [b.hash_value for b in h1] == [b.hash_value for b in h2]
    # Chained: changing an early token changes all downstream hashes.
    tokens2 = [999] + tokens[1:]
    h3 = hash_request_tokens(tokens2, 16)
    assert all(a.hash_value != b.hash_value for a, b in zip(h1, h3))


def test_hash_partial_block_excluded():
    tokens = list(range(40))  # 2.5 blocks of 16
    hashes = hash_request_tokens(tokens, 16)
    assert len(hashes) == 2


def test_hash_extra_keys():
    tokens = list(range(16))
    plain = hash_block_tokens(None, tuple(tokens))
    salted = hash_block_tokens(None, tuple(tokens), ("salt",))
    assert plain.hash_value != salted.hash_value


def test_free_queue_order():
    blocks = [KVCacheBlock(i) for i in range(4)]
    q = FreeKVCacheBlockQueue(blocks)
    assert q.num_free_blocks == 4
    assert q.popleft().block_id == 0
    q.remove(blocks[2])
    assert [b.block_id for b in q.get_all_free_blocks()] == [1, 3]
    q.append(blocks[0])
    assert [b.block_id for b in q.get_all_free_blocks()] == [1, 3, 0]


def test_pool_alloc_free():
    pool = BlockPool(num_blocks=9)
    assert pool.get_num_free_blocks() == 8  # block 0 is the null block
    blocks = pool.get_new_blocks(3)
    assert all(b.ref_cnt == 1 for b in blocks)
    assert pool.get_num_free_blocks() == 5
    pool.free_blocks(list(reversed(blocks)))
    assert pool.get_num_free_blocks() == 8
    with pytest.raises(ValueError):
        pool.get_new_blocks(9)


def test_pool_prefix_cache_and_eviction():
    pool = BlockPool(num_blocks=5)  # 4 usable
    tokens = list(range(32))
    blocks = pool.get_new_blocks(2)
    hashes = []
    pool.cache_full_blocks(tokens, blocks, hashes, 0, 2, 16)
    assert len(hashes) == 2
    assert pool.get_cached_block(hashes[0]) is blocks[0]
    # Free: blocks keep their cache entry while in the free queue.
    pool.free_blocks(list(reversed(blocks)))
    assert pool.get_cached_block(hashes[0]) is blocks[0]
    # touch revives a cached free block.
    pool.touch([blocks[0]])
    assert blocks[0].ref_cnt == 1
    assert pool.get_num_free_blocks() == 3
    pool.free_blocks([blocks[0]])
    # Allocating everything evicts cached entries (LRU from queue head).
    newly = pool.get_new_blocks(4)
    assert pool.get_cached_block(hashes[0]) is None
    assert pool.get_cached_block(hashes[1]) is None
    assert all(b.block_hash is None for b in newly)


def test_pool_reset_prefix_cache():
    pool = BlockPool(num_blocks=5)
    blocks = pool.get_new_blocks(2)
    hashes = []
    pool.cache_full_blocks(list(range(32)), blocks, hashes, 0, 2, 16)
    assert not pool.reset_prefix_cache()  # in-use blocks -> refuse
    pool.free_blocks(list(reversed(blocks)))
    assert pool.reset_prefix_cache()
    assert pool.get_cached_block(hashes[0]) is None


def test_eviction_order_tail_first():
    pool = BlockPool(num_blocks=4)  # 3 usable
    blocks = pool.get_new_blocks(3)
    hashes = []
    pool.cache_full_blocks(list(range(48)), blocks, hashes, 0, 3, 16)
    pool.free_blocks(list(reversed(blocks)))  # tail freed first
    # First eviction should hit the sequence TAIL (last block).
    got = pool.get_new_blocks(1)[0]
    assert got is blocks[2]
