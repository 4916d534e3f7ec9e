"""Budgeted, content-hash-keyed cache manager for vision-encoder outputs
(reference: vllm/v1/core/encoder_cache_manager.py — EncoderCacheManager;
vllm/multimodal mm_input_cache.py hasher-keyed dedup).

Scheduler-side accounting only: the actual embedding arrays live in the
model runner, keyed by the same content hashes. The scheduler refuses to
schedule an image request whose encoder output would not fit the budget,
ref-counts cache entries by the requests that reference them, and ships
the hashes whose entries became evictable (freed_mm_hashes in
SchedulerOutput) so every worker drops the same entries — entries are
deduplicated across requests, so two requests with the same image encode
once.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from vllm_tpu.request import Request


class EncoderCacheManager:

    def __init__(self, cache_budget_tokens: int) -> None:
        self.budget = cache_budget_tokens
        self.used = 0
        # hash -> request ids currently referencing the entry
        self.refs: dict[str, set[str]] = {}
        self.sizes: dict[str, int] = {}
        # zero-ref entries in LRU order (still resident, reusable)
        self.freeable: OrderedDict[str, None] = OrderedDict()
        # drained into SchedulerOutput.freed_mm_hashes each step
        self._freed: list[str] = []

    @staticmethod
    def request_hashes(request: "Request") -> list[str]:
        return getattr(request, "mm_hashes", None) or []

    def _entry_size(self, request: "Request") -> int:
        # per-image encoder output length ~= the request's placeholder
        # tokens split evenly across its images (processor records the
        # total)
        total = int(getattr(request, "encoder_token_count", 0) or 0)
        n = max(len(self.request_hashes(request)), 1)
        return max(total // n, 1)

    def can_schedule(self, request: "Request") -> bool:
        """True if every encoder input is cached or fits the budget."""
        needed = 0
        for h in self.request_hashes(request):
            if h not in self.sizes:
                needed += self._entry_size(request)
        if needed == 0:
            return True
        reclaimable = sum(self.sizes[h] for h in self.freeable)
        return self.used + needed - reclaimable <= self.budget

    def allocate(self, request: "Request") -> None:
        """Account the request's encoder inputs; evict zero-ref entries
        (LRU) as needed. Call only after can_schedule()."""
        size = self._entry_size(request)
        for h in self.request_hashes(request):
            if h in self.sizes:
                self.refs[h].add(request.request_id)
                self.freeable.pop(h, None)
                continue
            while self.used + size > self.budget and self.freeable:
                evict, _ = self.freeable.popitem(last=False)
                self.used -= self.sizes.pop(evict)
                self.refs.pop(evict, None)
                self._freed.append(evict)
            self.sizes[h] = size
            self.used += size
            self.refs[h] = {request.request_id}

    def free_request(self, request: "Request") -> None:
        """Drop the request's references; zero-ref entries stay resident
        (reusable) until budget pressure evicts them."""
        for h in self.request_hashes(request):
            refs = self.refs.get(h)
            if refs is None:
                continue
            refs.discard(request.request_id)
            if not refs:
                self.freeable[h] = None
                self.freeable.move_to_end(h)

    def take_freed_hashes(self) -> list[str]:
        freed, self._freed = self._freed, []
        return freed
