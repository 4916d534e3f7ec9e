"""KVCacheManager tests (reference analog: tests/v1/core/test_prefix_caching.py)."""

from tests.utils import make_kv_cache_config
from vllm_tpu.core.kv_cache_manager import KVCacheManager
from vllm_tpu.request import Request
from vllm_tpu.sampling_params import SamplingParams


def make_manager(num_blocks=64, block_size=16, caching=True):
    return KVCacheManager(make_kv_cache_config(num_blocks, block_size),
                          max_model_len=1024,
                          enable_caching=caching)


def make_request(req_id="r0", num_tokens=48):
    return Request(request_id=req_id,
                   prompt_token_ids=list(range(num_tokens)),
                   sampling_params=SamplingParams(max_tokens=8),
                   eos_token_id=None)


def test_allocate_and_free():
    m = make_manager()
    req = make_request(num_tokens=48)  # 3 blocks
    blocks, hit = m.get_computed_blocks(req)
    assert hit == 0
    new = m.allocate_slots(req, 48, 0, blocks)
    assert new is not None
    assert len(new.blocks[0]) == 3
    assert m.block_pool.get_num_free_blocks() == 60
    m.free(req)
    assert m.block_pool.get_num_free_blocks() == 63


def test_prefix_cache_hit():
    m = make_manager()
    req = make_request("a", num_tokens=48)
    blocks, hit = m.get_computed_blocks(req)
    m.allocate_slots(req, 48, 0, blocks)
    req.num_computed_tokens = 48
    # Simulate one decode step so full blocks get committed.
    req.append_output_token_ids(100)
    m.allocate_slots(req, 1)
    m.free(req)

    # Identical prompt: should hit all 3 full blocks.
    req2 = make_request("b", num_tokens=48)
    blocks2, hit2 = m.get_computed_blocks(req2)
    assert hit2 == 32  # capped at num_tokens-1 -> 47//16 = 2 blocks
    assert len(blocks2.blocks[0]) == 2


def test_full_prompt_hit_capped():
    """A fully cached prompt must still recompute the last token."""
    m = make_manager()
    req = make_request("a", num_tokens=32)
    blocks, _ = m.get_computed_blocks(req)
    m.allocate_slots(req, 32, 0, blocks)
    req.num_computed_tokens = 32
    req.append_output_token_ids(7)
    m.allocate_slots(req, 1)
    m.free(req)

    req2 = make_request("b", num_tokens=32)
    _, hit = m.get_computed_blocks(req2)
    assert hit == 16  # not 32: cap at num_tokens-1


def test_cache_salt_separates_hits():
    m = make_manager()
    req = make_request("a", num_tokens=32)
    blocks, _ = m.get_computed_blocks(req)
    m.allocate_slots(req, 32, 0, blocks)
    req.num_computed_tokens = 32
    req.append_output_token_ids(7)
    m.allocate_slots(req, 1)
    m.free(req)

    req2 = make_request("b", num_tokens=32)
    req2.cache_salt = "tenant-2"
    _, hit = m.get_computed_blocks(req2)
    assert hit == 0


def test_allocate_returns_none_when_full():
    m = make_manager(num_blocks=5)  # 4 usable
    req = make_request("a", num_tokens=64)  # needs 4 blocks
    blocks, _ = m.get_computed_blocks(req)
    assert m.allocate_slots(req, 64, 0, blocks) is not None
    req2 = make_request("b", num_tokens=16)
    blocks2, _ = m.get_computed_blocks(req2)
    assert m.allocate_slots(req2, 16, 0, blocks2) is None


def test_lookahead_slots_reserved():
    m = make_manager(num_blocks=8)  # 7 usable
    req = make_request("a", num_tokens=16)
    blocks, _ = m.get_computed_blocks(req)
    new = m.allocate_slots(req, 16, 0, blocks, num_lookahead_tokens=16)
    # 16 tokens + 16 lookahead = 2 blocks
    assert len(new.blocks[0]) == 2


def test_no_caching_mode():
    m = make_manager(caching=False)
    req = make_request("a", num_tokens=32)
    blocks, hit = m.get_computed_blocks(req)
    assert hit == 0
    assert m.allocate_slots(req, 32, 0, blocks) is not None
    m.free(req)
    req2 = make_request("b", num_tokens=32)
    _, hit2 = m.get_computed_blocks(req2)
    assert hit2 == 0
