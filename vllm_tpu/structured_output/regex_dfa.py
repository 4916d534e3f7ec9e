"""Minimal regex -> DFA compiler for the builtin structured-output backend.

Thompson NFA construction + subset construction. Supported syntax:
literals, escapes (\\d \\w \\s \\n \\t \\\\ etc.), ``.``, character classes
``[a-z^...]``, grouping ``()``, alternation ``|``, quantifiers ``* + ?``
and bounded ``{m}``/``{m,n}``. The alphabet is the set of characters
appearing in the pattern plus a catch-all OTHER symbol, keeping DFA
transition tables small regardless of unicode.
"""

from __future__ import annotations

import json
from typing import Optional, Union

from vllm_tpu.structured_output.builtin import DFA

EPS = None  # epsilon edge label
OTHER = "\x00OTHER"  # catch-all symbol for chars not in the alphabet

_DIGIT = set("0123456789")
_WORD = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
            "0123456789_")
_SPACE = set(" \t\n\r\f\v")


class _Frag:
    """NFA fragment: start state, set of dangling (state) accepts."""

    def __init__(self, start: int, accepts: set[int]):
        self.start = start
        self.accepts = accepts


class _NFA:

    def __init__(self) -> None:
        # edges[state] = list of (label, next); label is a frozenset of
        # chars, OTHER marker inside the set, or EPS.
        self.edges: list[list[tuple[Optional[frozenset], int]]] = []

    def new_state(self) -> int:
        self.edges.append([])
        return len(self.edges) - 1

    def add_edge(self, a: int, label, b: int) -> None:
        self.edges[a].append((label, b))


class _Parser:
    """Recursive-descent regex parser building the NFA."""

    def __init__(self, pattern: str, nfa: _NFA):
        self.p = pattern
        self.i = 0
        self.nfa = nfa
        self.alphabet: set[str] = set()

    def peek(self) -> Optional[str]:
        return self.p[self.i] if self.i < len(self.p) else None

    def eat(self) -> str:
        ch = self.p[self.i]
        self.i += 1
        return ch

    # alternation := concat ('|' concat)*
    def parse_alt(self) -> _Frag:
        frag = self.parse_concat()
        while self.peek() == "|":
            self.eat()
            rhs = self.parse_concat()
            start = self.nfa.new_state()
            self.nfa.add_edge(start, EPS, frag.start)
            self.nfa.add_edge(start, EPS, rhs.start)
            frag = _Frag(start, frag.accepts | rhs.accepts)
        return frag

    def parse_concat(self) -> _Frag:
        frags: list[_Frag] = []
        while self.peek() is not None and self.peek() not in "|)":
            frags.append(self.parse_repeat())
        if not frags:
            s = self.nfa.new_state()
            return _Frag(s, {s})
        out = frags[0]
        for nxt in frags[1:]:
            for a in out.accepts:
                self.nfa.add_edge(a, EPS, nxt.start)
            out = _Frag(out.start, nxt.accepts)
        return out

    def parse_repeat(self) -> _Frag:
        frag = self.parse_atom()
        while True:
            ch = self.peek()
            if ch == "*":
                self.eat()
                start = self.nfa.new_state()
                self.nfa.add_edge(start, EPS, frag.start)
                for a in frag.accepts:
                    self.nfa.add_edge(a, EPS, frag.start)
                frag = _Frag(start, frag.accepts | {start})
            elif ch == "+":
                self.eat()
                for a in frag.accepts:
                    self.nfa.add_edge(a, EPS, frag.start)
                frag = _Frag(frag.start, frag.accepts)
            elif ch == "?":
                self.eat()
                start = self.nfa.new_state()
                self.nfa.add_edge(start, EPS, frag.start)
                frag = _Frag(start, frag.accepts | {start})
            elif ch == "{":
                frag = self._parse_bounded(frag)
            else:
                return frag

    def _parse_bounded(self, frag: _Frag) -> _Frag:
        # Re-parse the atom text m..n times (atoms are short; simple and
        # correct beats clever here).
        close = self.p.index("}", self.i)
        spec = self.p[self.i + 1:close]
        atom_end = self.i
        atom_start = self._last_atom_start
        self.i = close + 1
        if "," in spec:
            lo_s, hi_s = spec.split(",", 1)
            lo = int(lo_s) if lo_s else 0
            hi = int(hi_s) if hi_s.strip() else lo + 16  # unbounded cap
        else:
            lo = hi = int(spec)
        atom_src = self.p[atom_start:atom_end]
        sub = "".join([atom_src] * lo + [f"(?:{atom_src})?" if False else
                                         f"({atom_src})?"] * (hi - lo))
        subparser = _Parser(sub, self.nfa)
        f = subparser.parse_alt()
        self.alphabet |= subparser.alphabet
        return f

    def parse_atom(self) -> _Frag:
        self._last_atom_start = self.i
        ch = self.eat()
        if ch == "(":
            if self.p[self.i:self.i + 2] == "?:":
                self.i += 2
            frag = self.parse_alt()
            assert self.eat() == ")", "unbalanced group"
            return frag
        if ch == "[":
            return self._charclass()
        if ch == ".":
            return self._symbol_frag(None)  # any char
        if ch == "\\":
            return self._symbol_frag(self._escape(self.eat()))
        self.alphabet.add(ch)
        return self._symbol_frag(frozenset([ch]))

    def _escape(self, ch: str) -> frozenset:
        table = {
            "d": _DIGIT,
            "w": _WORD,
            "s": _SPACE,
            "n": {"\n"},
            "t": {"\t"},
            "r": {"\r"},
        }
        if ch in table:
            s = frozenset(table[ch])
        elif ch == "D":
            # negated classes are encoded as (OTHER + complement within
            # the known alphabet) at DFA build time; approximate with
            # "any but digits" via the negation marker.
            return frozenset({OTHER}) | frozenset()
        else:
            s = frozenset([ch])
        self.alphabet |= set(x for x in s if x != OTHER)
        return s

    def _charclass(self) -> _Frag:
        negate = False
        if self.peek() == "^":
            self.eat()
            negate = True
        chars: set[str] = set()
        while self.peek() != "]":
            ch = self.eat()
            if ch == "\\":
                chars |= set(self._escape(self.eat()))
                continue
            if self.peek() == "-" and self.p[self.i + 1] != "]":
                self.eat()
                hi = self.eat()
                chars |= {chr(c) for c in range(ord(ch), ord(hi) + 1)}
            else:
                chars.add(ch)
        self.eat()  # ]
        self.alphabet |= chars
        if negate:
            label = frozenset(chars | {"\x01NEG"})
        else:
            label = frozenset(chars)
        return self._symbol_frag(label)

    def _symbol_frag(self, label: Optional[frozenset]) -> _Frag:
        a = self.nfa.new_state()
        b = self.nfa.new_state()
        self.nfa.add_edge(a, label if label is not None else
                          frozenset({"\x02ANY"}), b)
        return _Frag(a, {b})


def _label_matches(label: frozenset, sym: str, alphabet: set[str]) -> bool:
    if "\x02ANY" in label:
        return sym != "\n" or True
    if "\x01NEG" in label:
        inner = label - {"\x01NEG"}
        if sym == OTHER:
            return True  # unknown char: not in the negated set
        return sym not in inner
    if sym == OTHER:
        return False
    return sym in label


def regex_to_dfa(pattern: str, max_states: int = 4096) -> DFA:
    nfa = _NFA()
    parser = _Parser(pattern, nfa)
    frag = parser.parse_alt()
    assert parser.i == len(pattern), \
        f"unparsed regex tail: {pattern[parser.i:]!r}"
    alphabet = sorted(parser.alphabet) + [OTHER]

    def eps_closure(states: frozenset) -> frozenset:
        stack = list(states)
        out = set(states)
        while stack:
            s = stack.pop()
            for label, nxt in nfa.edges[s]:
                if label is EPS and nxt not in out:
                    out.add(nxt)
                    stack.append(nxt)
        return frozenset(out)

    start = eps_closure(frozenset([frag.start]))
    dfa_states: dict[frozenset, int] = {start: 0}
    transitions: list[dict[str, int]] = [{}]
    accepting: set[int] = set()
    work = [start]
    while work:
        cur = work.pop()
        cur_id = dfa_states[cur]
        if cur & frag.accepts:
            accepting.add(cur_id)
        for sym in alphabet:
            nxt: set[int] = set()
            for s in cur:
                for label, t in nfa.edges[s]:
                    if label is not EPS and _label_matches(
                            label, sym, set(alphabet)):
                        nxt.add(t)
            if not nxt:
                continue
            closed = eps_closure(frozenset(nxt))
            nid = dfa_states.get(closed)
            if nid is None:
                nid = len(transitions)
                if nid >= max_states:
                    raise ValueError("regex too large for builtin DFA")
                dfa_states[closed] = nid
                transitions.append({})
                work.append(closed)
            if sym != OTHER:
                transitions[cur_id][sym] = nid
            # OTHER transitions are dropped at the token layer: unknown
            # chars only matter for negated classes, where conservative
            # rejection is safe.
    return DFA(transitions, accepting)


def json_schema_to_regex(schema: Union[str, dict]) -> str:
    """Very small JSON-schema -> regex approximation (types, enums,
    object with fixed properties). Good enough for function-call style
    constrained decoding; full JSON-schema support is a later milestone."""
    if isinstance(schema, str):
        schema = json.loads(schema)

    WS = ""  # no optional whitespace: keeps DFAs tiny

    def value_re(s: dict) -> str:
        t = s.get("type")
        if "enum" in s:
            return "(" + "|".join(
                json.dumps(v).replace("\\", "\\\\") for v in s["enum"]) + ")"
        if t == "string":
            return '"[^"]*"'
        if t == "integer":
            return "(-?(0|[1-9][0-9]*))"
        if t == "number":
            return "(-?(0|[1-9][0-9]*)(\\.[0-9]+)?)"
        if t == "boolean":
            return "(true|false)"
        if t == "null":
            return "null"
        if t == "array":
            item = value_re(s.get("items", {"type": "string"}))
            return f"\\[({item}(,{item})*)?\\]"
        if t == "object" or "properties" in s:
            props = s.get("properties", {})
            parts = []
            for name, sub in props.items():
                parts.append(f'"{name}":{value_re(sub)}')
            inner = ",".join(parts)
            return "\\{" + inner + "\\}"
        return '"[^"]*"'

    pattern = value_re(schema)
    # Escape braces we emitted literally: our parser treats { as bounded
    # repetition only when preceded by an atom; the \\{ escapes above keep
    # it literal.
    return WS + pattern + WS


# Escapes for literal { } [ ] in patterns
def _self_test() -> None:  # pragma: no cover
    dfa = regex_to_dfa("(ab|cd)+")
    assert dfa.step_string(0, "abcd") in dfa.accepting
