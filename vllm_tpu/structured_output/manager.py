"""Structured-output manager (reference: vllm/v1/structured_output/__init__.py:32).

Builds per-step vocab bitmasks that the sampler applies on device
(ops in sample/sampler.py apply_grammar_bitmask); FSM state advances
host-side on accepted tokens only (reference: scheduler.py:831-851).

Backends: xgrammar / outlines are not available in this environment; the
builtin backend (structured_output/builtin.py) covers guided_choice,
guided_regex and guided_json via a character-level DFA composed with the
tokenizer vocabulary.
"""

from __future__ import annotations

import logging
from typing import TYPE_CHECKING, Optional

import numpy as np

from vllm_tpu.config import EngineConfig
from vllm_tpu.sampling_params import SamplingParams

if TYPE_CHECKING:
    from vllm_tpu.core.sched.output import SchedulerOutput
    from vllm_tpu.request import Request

logger = logging.getLogger(__name__)


class GrammarCompileError(ValueError):
    """A guided-decoding grammar failed to compile; the request must be
    finished with an error, not served unconstrained."""


def wants_structured_output(params: SamplingParams) -> bool:
    return any((params.guided_json, params.guided_regex,
                params.guided_choice, params.guided_grammar))


class _PendingGrammar:
    """Placeholder FSM state while the grammar compiles in the pool."""

    def __init__(self, cached, key: str,
                 manager: "StructuredOutputManager") -> None:
        self._cached = cached
        self._key = key
        self._manager = manager

    def poll(self):
        from concurrent.futures import Future

        cached = self._manager._grammar_cache.get(self._key, self._cached)
        if isinstance(cached, Future):
            if not cached.done():
                return None
            grammar = cached.result()  # propagate compile errors
            self._manager._grammar_cache[self._key] = grammar
            return grammar
        return cached


class StructuredOutputManager:

    _CACHE_CAP = 128

    def __init__(self, engine_config: EngineConfig) -> None:
        from collections import OrderedDict
        from concurrent.futures import ThreadPoolExecutor

        self.config = engine_config
        # LRU-bounded compiled-grammar cache (unbounded growth bites at
        # scale with many distinct schemas)
        self._grammar_cache: "OrderedDict[str, object]" = OrderedDict()
        self.tokenizer = None  # attached lazily by the engine front-end
        # Grammar compilation is O(vocab x DFA states) — run it off the
        # engine busy loop; requests sit in WAITING_FOR_FSM until the
        # future resolves (reference: async compile behind
        # WAITING_FOR_FSM, v1/structured_output/__init__.py:32).
        self._pool = ThreadPoolExecutor(
            max_workers=2, thread_name_prefix="grammar-compile")

    def attach_tokenizer(self, tokenizer) -> None:
        self.tokenizer = tokenizer

    def maybe_init_request(self, request: "Request",
                           params: SamplingParams) -> None:
        if not wants_structured_output(params):
            return
        if self.tokenizer is None:
            raise ValueError(
                "structured output requires a tokenizer-enabled engine")
        from vllm_tpu.structured_output.builtin import compile_grammar

        spec = (params.guided_choice, params.guided_regex,
                params.guided_json, params.guided_grammar)
        key = repr(spec)
        cached = self._grammar_cache.get(key)
        if cached is not None:
            self._grammar_cache.move_to_end(key)
        else:
            cached = self._pool.submit(compile_grammar, params,
                                       self.tokenizer)
            self._grammar_cache[key] = cached
            while len(self._grammar_cache) > self._CACHE_CAP:
                self._grammar_cache.popitem(last=False)
        request.structured_output_request = _PendingGrammar(cached, key,
                                                            self)

    def grammar_ready(self, request: "Request") -> bool:
        """True when compiled; False while pending. Raises
        GrammarCompileError on compile failure — the scheduler fails the
        request rather than silently serving unconstrained output
        (reference behavior: the request errors; ADVICE r02 medium)."""
        state = request.structured_output_request
        if isinstance(state, _PendingGrammar):
            try:
                grammar = state.poll()
            except Exception as e:
                logger.exception(
                    "grammar compilation failed for request %s",
                    request.request_id)
                request.structured_output_request = None
                raise GrammarCompileError(
                    f"grammar compilation failed: {e}") from e
            if grammar is None:
                return False
            request.structured_output_request = grammar.new_state()
        return True

    def build_bitmask(self, requests: dict[str, "Request"],
                      scheduler_output: "SchedulerOutput") -> None:
        rows: dict[str, int] = {}
        masks = []
        for req_id in scheduler_output.num_scheduled_tokens:
            request = requests[req_id]
            state = request.structured_output_request
            if state is None:
                continue
            rows[req_id] = len(masks)
            masks.append(state.allowed_bitmask())
        if masks:
            scheduler_output.structured_output_request_ids = rows
            scheduler_output.grammar_bitmask = np.stack(masks)

    def accept_tokens(self, request: "Request",
                      token_ids: list[int]) -> None:
        state = request.structured_output_request
        if state is None:
            return
        for t in token_ids:
            state.advance(t)
