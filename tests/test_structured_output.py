"""Structured-output backend tests: EBNF grammar front-end, async
compile through WAITING_FOR_FSM, bitmask semantics (reference analog:
tests/v1/structured_output/)."""

import numpy as np
import pytest


def test_ebnf_to_regex_basics():
    from vllm_tpu.structured_output.ebnf import ebnf_to_regex
    from vllm_tpu.structured_output.regex_dfa import regex_to_dfa

    grammar = '''
    # a tiny command grammar
    root ::= verb " " noun ("!" | ".")
    verb ::= "eat" | "throw"
    noun ::= [a-z]{2,5}
    '''
    pattern = ebnf_to_regex(grammar)
    dfa = regex_to_dfa(pattern)
    ok = ["eat abc!", "throw zz.", "eat abcde!"]
    bad = ["eat!", "run ab!", "eat abc", "eat ABC!"]
    for s in ok:
        assert dfa.step_string(0, s) in dfa.accepting, s
    for s in bad:
        assert dfa.step_string(0, s) not in dfa.accepting, s


def test_ebnf_rejects_recursion():
    from vllm_tpu.structured_output.ebnf import ebnf_to_regex

    with pytest.raises(ValueError, match="recursive"):
        ebnf_to_regex('root ::= "(" root ")" | "x"')


def test_ebnf_undefined_rule():
    from vllm_tpu.structured_output.ebnf import ebnf_to_regex

    with pytest.raises(ValueError, match="undefined"):
        ebnf_to_regex('root ::= missing_rule')


class _FakeTok:
    """Tokenizer stub: one char per token over a tiny alphabet."""

    def __init__(self):
        self.alphabet = list("abcdefgh !.")
        self.eos_token_id = len(self.alphabet)

    def __len__(self):
        return len(self.alphabet) + 1

    def convert_ids_to_tokens(self, ids):
        return [self.alphabet[i] if i < len(self.alphabet) else "<eos>"
                for i in ids]

    def convert_tokens_to_string(self, toks):
        return "".join(t for t in toks if t != "<eos>")


def _bit(mask, tid):
    return bool(mask[tid // 32] & np.uint32(1 << (tid % 32)))


def test_guided_grammar_compile_and_mask():
    from vllm_tpu.sampling_params import SamplingParams
    from vllm_tpu.structured_output.builtin import compile_grammar

    tok = _FakeTok()
    params = SamplingParams(guided_grammar='root ::= "ab" | "cd"')
    g = compile_grammar(params, tok)
    st = g.new_state()
    m = st.allowed_bitmask()
    a, b, c, d = (tok.alphabet.index(x) for x in "abcd")
    assert _bit(m, a) and _bit(m, c)
    assert not _bit(m, b) and not _bit(m, d)
    st.advance(a)
    m = st.allowed_bitmask()
    assert _bit(m, b) and not _bit(m, a)
    st.advance(b)
    assert _bit(st.allowed_bitmask(), tok.eos_token_id)


def test_async_compile_waits_for_fsm():
    """Requests sit in WAITING_FOR_FSM until the pool future resolves;
    grammar_ready swaps in the compiled state."""
    import time

    from vllm_tpu.config import EngineConfig
    from vllm_tpu.request import Request
    from vllm_tpu.sampling_params import SamplingParams
    from vllm_tpu.structured_output.manager import StructuredOutputManager

    mgr = StructuredOutputManager(EngineConfig())
    mgr.attach_tokenizer(_FakeTok())
    sp = SamplingParams(guided_regex="[ab]{3}")
    req = Request("r1", [1, 2], sampling_params=sp)
    mgr.maybe_init_request(req, sp)
    assert req.use_structured_output
    deadline = time.monotonic() + 10
    while not mgr.grammar_ready(req):
        assert time.monotonic() < deadline
        time.sleep(0.01)
    # after readiness the request carries a live FSM state
    assert hasattr(req.structured_output_request, "allowed_bitmask")
    # cache hit: a second request with the same spec resolves immediately
    req2 = Request("r2", [1], sampling_params=sp)
    mgr.maybe_init_request(req2, sp)
    deadline = time.monotonic() + 10
    while not mgr.grammar_ready(req2):
        time.sleep(0.01)
        assert time.monotonic() < deadline


def test_compile_failure_fails_request():
    """A bad grammar raises GrammarCompileError from grammar_ready, and
    the scheduler finishes the request with an ABORT output instead of
    serving it unconstrained (ADVICE r02)."""
    import time

    from tests.utils import create_requests, create_scheduler
    from vllm_tpu.config import EngineConfig
    from vllm_tpu.engine import FinishReason
    from vllm_tpu.request import Request, RequestStatus
    from vllm_tpu.sampling_params import SamplingParams
    from vllm_tpu.structured_output.manager import (GrammarCompileError,
                                                    StructuredOutputManager)

    mgr = StructuredOutputManager(EngineConfig())
    mgr.attach_tokenizer(_FakeTok())
    sp = SamplingParams(guided_regex="[unbalanced")  # invalid regex
    req = Request("bad", [1, 2], sampling_params=sp)
    mgr.maybe_init_request(req, sp)
    deadline = time.monotonic() + 10
    while True:
        try:
            ready = mgr.grammar_ready(req)
        except GrammarCompileError:
            break
        assert not ready and time.monotonic() < deadline
        time.sleep(0.01)

    # scheduler integration: the errored request is finished + reported
    scheduler = create_scheduler()
    scheduler.structured_output_manager = mgr
    bad = create_requests(1, num_tokens=4)[0]
    bad.sampling_params = sp
    mgr.maybe_init_request(bad, sp)
    scheduler.add_request(bad)
    assert bad.status == RequestStatus.WAITING_FOR_FSM
    deadline = time.monotonic() + 10
    while not bad.is_finished:
        out = scheduler.schedule()
        assert out.total_num_scheduled_tokens == 0
        assert time.monotonic() < deadline
        time.sleep(0.01)
    from vllm_tpu.core.sched.output import ModelRunnerOutput

    ec = scheduler.update_from_output(out, ModelRunnerOutput())
    eco = ec[0].outputs[0]
    assert eco.request_id == bad.request_id
    assert eco.finish_reason == FinishReason.ABORT
    assert "grammar compilation failed" in str(eco.stop_reason)
    assert not scheduler.has_unfinished_requests()
