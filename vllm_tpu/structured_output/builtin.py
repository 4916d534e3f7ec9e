"""Builtin structured-output backend.

Grammars compile to a character-level DFA; the token-level transition
relation is derived by walking each vocab token's decoded string through
the DFA once at compile time. ``allowed_bitmask()`` then returns the
precomputed u32 bitmask for the current DFA state (reference behavior:
xgrammar/outlines backends of vllm/v1/structured_output/).

Supported: guided_choice (literal alternation), guided_regex (via the
regex->DFA compiler in structured_output/regex_dfa.py), guided_json
(JSON-schema -> regex approximation).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from vllm_tpu.sampling_params import SamplingParams


class DFA:
    """Deterministic finite automaton over characters.

    states: 0..n-1, transition dict per state {char: next_state},
    accepting: set of states. State -1 = dead.
    """

    def __init__(self, transitions: list[dict[str, int]],
                 accepting: set[int]) -> None:
        self.transitions = transitions
        self.accepting = accepting

    def step_string(self, state: int, s: str) -> int:
        for ch in s:
            if state < 0:
                return -1
            state = self.transitions[state].get(ch, -1)
        return state

    @staticmethod
    def from_literals(literals: list[str]) -> "DFA":
        """Trie DFA accepting exactly the given strings."""
        transitions: list[dict[str, int]] = [{}]
        accepting: set[int] = set()
        for lit in literals:
            state = 0
            for ch in lit:
                nxt = transitions[state].get(ch)
                if nxt is None:
                    nxt = len(transitions)
                    transitions.append({})
                    transitions[state][ch] = nxt
                state = nxt
            accepting.add(state)
        return DFA(transitions, accepting)


class TokenGrammar:
    """A DFA lifted to the token vocabulary."""

    def __init__(self, dfa: DFA, tokenizer, eos_token_id: int) -> None:
        self.dfa = dfa
        self.eos_token_id = eos_token_id
        vocab_size = len(tokenizer)
        self.vocab_size = vocab_size
        num_states = len(dfa.transitions)
        words = -(-vocab_size // 32)
        # token_next[s, t] = DFA state after emitting token t from state s
        # (stored sparsely: {state: {token: next}}), plus per-state bitmask.
        self._bitmasks = np.zeros((num_states, words), np.uint32)
        self._token_next: list[dict[int, int]] = [
            {} for _ in range(num_states)
        ]
        token_strs = tokenizer.convert_ids_to_tokens(list(range(vocab_size)))
        decoded = [
            tokenizer.convert_tokens_to_string([t]) if t is not None else ""
            for t in token_strs
        ]
        for s in range(num_states):
            mask = self._bitmasks[s]
            for tid, text in enumerate(decoded):
                if not text:
                    continue
                nxt = dfa.step_string(s, text)
                if nxt >= 0:
                    self._token_next[s][tid] = nxt
                    mask[tid // 32] |= np.uint32(1 << (tid % 32))
            if s in dfa.accepting and eos_token_id is not None:
                mask[eos_token_id // 32] |= np.uint32(
                    1 << (eos_token_id % 32))
            if not mask.any() and eos_token_id is not None:
                # Dead-end state (tokenizer can't continue the grammar):
                # allow EOS so the request terminates cleanly instead of
                # sampling from an all-masked distribution.
                mask[eos_token_id // 32] |= np.uint32(
                    1 << (eos_token_id % 32))

    def new_state(self) -> "GrammarState":
        return GrammarState(self)


class GrammarState:

    def __init__(self, grammar: TokenGrammar) -> None:
        self.grammar = grammar
        self.state = 0
        self.finished = False

    def allowed_bitmask(self) -> np.ndarray:
        if self.finished or self.state < 0:
            # Only EOS allowed once finished/dead.
            words = self.grammar._bitmasks.shape[1]
            mask = np.zeros(words, np.uint32)
            eos = self.grammar.eos_token_id
            if eos is not None:
                mask[eos // 32] |= np.uint32(1 << (eos % 32))
            return mask
        return self.grammar._bitmasks[self.state]

    def advance(self, token_id: int) -> None:
        if self.finished or self.state < 0:
            return
        if token_id == self.grammar.eos_token_id:
            self.finished = True
            return
        self.state = self.grammar._token_next[self.state].get(token_id, -1)


def compile_grammar(params: SamplingParams, tokenizer) -> TokenGrammar:
    eos = tokenizer.eos_token_id
    if params.guided_choice is not None:
        dfa = DFA.from_literals(list(params.guided_choice))
        return TokenGrammar(dfa, tokenizer, eos)
    if params.guided_regex is not None:
        from vllm_tpu.structured_output.regex_dfa import regex_to_dfa

        return TokenGrammar(regex_to_dfa(params.guided_regex), tokenizer,
                            eos)
    if params.guided_json is not None:
        # pushdown backend: honors arbitrary nesting and recursive
        # $ref schemas (the regex approximation could not; reference:
        # backend_xgrammar.py:33)
        from vllm_tpu.structured_output.json_schema import schema_to_ebnf
        from vllm_tpu.structured_output.pushdown import compile_pushdown

        return compile_pushdown(schema_to_ebnf(params.guided_json),
                                tokenizer)
    if params.guided_grammar is not None:
        from vllm_tpu.structured_output.ebnf import ebnf_to_regex
        from vllm_tpu.structured_output.regex_dfa import regex_to_dfa

        try:
            pattern = ebnf_to_regex(params.guided_grammar)
        except ValueError as e:
            if "recursive" not in str(e):
                raise
            # recursive grammar: the DFA cannot express it — compile to
            # the pushdown automaton instead
            from vllm_tpu.structured_output.pushdown import \
                compile_pushdown

            return compile_pushdown(params.guided_grammar, tokenizer)
        return TokenGrammar(regex_to_dfa(pattern), tokenizer, eos)
    raise ValueError("no structured-output constraint in params")
