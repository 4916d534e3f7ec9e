"""EncoderCacheManager + multimodal prefix-caching scheduler tests
(reference analog: tests/v1/core/test_encoder_cache_manager.py)."""

from tests.utils import create_requests, create_scheduler
from vllm_tpu.core.encoder_cache_manager import EncoderCacheManager
from vllm_tpu.core.sched.output import ModelRunnerOutput


def _mm_request(rid: str, num_tokens: int, mm_hashes, encoder_tokens: int):
    req = create_requests(1, num_tokens=num_tokens, max_tokens=4)[0]
    req.request_id = rid
    req.mm_inputs = {"pixel_values": object()}
    req.mm_hashes = list(mm_hashes)
    req.encoder_token_count = encoder_tokens
    return req


def test_budget_and_dedup():
    m = EncoderCacheManager(cache_budget_tokens=100)
    r1 = _mm_request("r1", 8, ["imgA"], 60)
    r2 = _mm_request("r2", 8, ["imgA"], 60)  # same image: free
    r3 = _mm_request("r3", 8, ["imgB"], 60)  # would exceed budget

    assert m.can_schedule(r1)
    m.allocate(r1)
    assert m.used == 60
    # identical image costs nothing extra
    assert m.can_schedule(r2)
    m.allocate(r2)
    assert m.used == 60
    # different image over budget while imgA is referenced
    assert not m.can_schedule(r3)
    # both holders release: imgA becomes reclaimable -> r3 fits
    m.free_request(r1)
    assert not m.can_schedule(r3)
    m.free_request(r2)
    assert m.can_schedule(r3)
    m.allocate(r3)
    # imgA evicted to make room; its hash is shipped to workers
    assert "imgA" in m.take_freed_hashes()
    assert m.used == 60


def test_zero_ref_entry_is_reusable_without_reencode():
    m = EncoderCacheManager(cache_budget_tokens=200)
    r1 = _mm_request("r1", 8, ["imgA"], 50)
    m.allocate(r1)
    m.free_request(r1)
    # new request with the same image: entry still resident
    r2 = _mm_request("r2", 8, ["imgA"], 50)
    m.allocate(r2)
    assert m.used == 50
    assert not m.take_freed_hashes()


def test_scheduler_defers_over_budget_mm_request():
    scheduler = create_scheduler(max_num_batched_tokens=8192)
    scheduler.encoder_cache_manager = EncoderCacheManager(
        cache_budget_tokens=100)
    r1 = _mm_request("m1", 8, ["imgA"], 80)
    r2 = _mm_request("m2", 8, ["imgB"], 80)
    scheduler.add_request(r1)
    scheduler.add_request(r2)
    out = scheduler.schedule()
    # only m1 fits the encoder budget this step
    assert list(out.num_scheduled_tokens) == ["m1"]
    scheduler.update_from_output(
        out, ModelRunnerOutput(req_ids=["m1"], sampled_token_ids=[[100]]))


def test_mm_requests_prefix_cache_with_matching_images():
    scheduler = create_scheduler(block_size=16)
    r1 = _mm_request("m1", 64, ["imgA"], 8)
    scheduler.add_request(r1)
    out = scheduler.schedule()
    assert out.num_scheduled_tokens["m1"] == 64
    # finish r1 so its blocks enter the prefix cache
    from vllm_tpu.request import RequestStatus

    scheduler.finish_requests("m1", RequestStatus.FINISHED_ABORTED)
    scheduler.schedule()

    # same prompt + same image: prefix hit
    r2 = _mm_request("m2", 64, ["imgA"], 8)
    r2.prompt_token_ids = list(r1.prompt_token_ids)
    r2._all_token_ids = list(r1.prompt_token_ids)
    scheduler.add_request(r2)
    out2 = scheduler.schedule()
    assert out2.num_scheduled_tokens["m2"] < 64

    scheduler.finish_requests("m2", RequestStatus.FINISHED_ABORTED)
    scheduler.schedule()

    # same prompt, DIFFERENT image: must NOT hit (extra keys differ)
    r3 = _mm_request("m3", 64, ["imgZ"], 8)
    r3.prompt_token_ids = list(r1.prompt_token_ids)
    r3._all_token_ids = list(r1.prompt_token_ids)
    scheduler.add_request(r3)
    out3 = scheduler.schedule()
    assert out3.num_scheduled_tokens["m3"] == 64
