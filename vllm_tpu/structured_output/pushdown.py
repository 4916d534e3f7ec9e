"""Pushdown-automaton structured-output backend: RECURSIVE grammars.

The char-DFA backend (builtin.py) cannot express unbounded nesting, so
guided_json was a regex approximation and recursive EBNF was rejected.
This module compiles EBNF (with recursion) to a character-level
pushdown automaton and lifts it to the token vocabulary lazily
(reference behavior: vllm/v1/structured_output/backend_xgrammar.py:33 —
xgrammar's pushdown + adaptive token-mask cache, re-designed here).

Design:
- Each rule compiles to an NFA fragment whose edges are char classes,
  epsilon, or CALL(rule) edges. A CALL pushes the edge's return state
  and jumps to the callee's start; reaching a callee accept state pops.
- A runtime configuration is (state, stack) with stacks as interned
  cons cells so sets of configurations hash cheaply.
- Token masks are computed by a DFS over a vocabulary character trie
  (built once per tokenizer) propagating the configuration set, and
  memoized per configuration-set key — generation revisits the same
  configurations constantly (e.g. a JSON string interior), so steady
  state is one dict lookup per step.
"""

from __future__ import annotations

import threading
from typing import Optional

import numpy as np

# edge kinds
_EPS = 0
_CHARS = 1  # frozenset membership
_NOT_CHARS = 2  # complement membership
_CALL = 3


class _Frag:

    def __init__(self, start: int, accepts: list[int]):
        self.start = start
        self.accepts = accepts


class _PDA:
    """Compiled grammar: per-state edge lists + per-rule entry points."""

    def __init__(self) -> None:
        # edges[s] = list of (kind, payload, target); payload is a
        # frozenset for char edges, rule index for CALL
        self.edges: list[list[tuple[int, object, int]]] = []
        self.rule_start: dict[str, int] = {}
        # states that complete a rule body (trigger a pop / root accept)
        self.rule_accepts: set[int] = set()
        self.root_start = 0

    def new_state(self) -> int:
        self.edges.append([])
        return len(self.edges) - 1

    def add(self, a: int, kind: int, payload, b: int) -> None:
        self.edges[a].append((kind, payload, b))


class _BodyParser:
    """EBNF rule body -> fragment (same surface as ebnf.py's translator
    but emitting PDA fragments, so rule references become CALL edges
    instead of inline expansion — recursion is fine)."""

    def __init__(self, src: str, pda: _PDA, rule_index: dict[str, int]):
        self.src = src
        self.i = 0
        self.pda = pda
        self.rule_index = rule_index

    # ----- fragment combinators

    def _lit_frag(self, text: str) -> _Frag:
        start = self.pda.new_state()
        cur = start
        for ch in text:
            nxt = self.pda.new_state()
            self.pda.add(cur, _CHARS, frozenset((ch,)), nxt)
            cur = nxt
        return _Frag(start, [cur])

    def _class_frag(self, chars: frozenset, negated: bool) -> _Frag:
        a, b = self.pda.new_state(), self.pda.new_state()
        self.pda.add(a, _NOT_CHARS if negated else _CHARS, chars, b)
        return _Frag(a, [b])

    def _call_frag(self, rule: str) -> _Frag:
        a, b = self.pda.new_state(), self.pda.new_state()
        self.pda.add(a, _CALL, rule, b)
        return _Frag(a, [b])

    def _empty_frag(self) -> _Frag:
        s = self.pda.new_state()
        return _Frag(s, [s])

    def _concat(self, a: _Frag, b: _Frag) -> _Frag:
        for acc in a.accepts:
            self.pda.add(acc, _EPS, None, b.start)
        return _Frag(a.start, b.accepts)

    def _alt(self, frags: list[_Frag]) -> _Frag:
        if len(frags) == 1:
            return frags[0]
        start = self.pda.new_state()
        end = self.pda.new_state()
        for f in frags:
            self.pda.add(start, _EPS, None, f.start)
            for acc in f.accepts:
                self.pda.add(acc, _EPS, None, end)
        return _Frag(start, [end])

    def _repeat(self, f: _Frag, lo: int, hi: Optional[int]) -> _Frag:
        """{lo,hi}; hi None = unbounded. Implemented by duplication for
        the bounded part + a loop edge for the star tail."""
        parts: list[_Frag] = []
        for _ in range(lo):
            parts.append(self._clone(f))
        if hi is None:
            star = self._clone(f)
            s = self.pda.new_state()
            self.pda.add(s, _EPS, None, star.start)
            for acc in star.accepts:
                self.pda.add(acc, _EPS, None, s)
            parts.append(_Frag(s, [s]))
        else:
            for _ in range(hi - lo):
                opt = self._clone(f)
                s, e = self.pda.new_state(), self.pda.new_state()
                self.pda.add(s, _EPS, None, opt.start)
                self.pda.add(s, _EPS, None, e)
                for acc in opt.accepts:
                    self.pda.add(acc, _EPS, None, e)
                parts.append(_Frag(s, [e]))
        out = parts[0] if parts else self._empty_frag()
        for p in parts[1:]:
            out = self._concat(out, p)
        return out

    def _clone(self, f: _Frag) -> _Frag:
        """Deep-copy a fragment's subgraph (needed because repeats
        duplicate)."""
        mapping: dict[int, int] = {}
        stack = [f.start] + f.accepts
        while stack:
            s = stack.pop()
            if s in mapping:
                continue
            mapping[s] = self.pda.new_state()
            for _, _, t in self.pda.edges[s]:
                if t not in mapping:
                    stack.append(t)
        for s, ns in mapping.items():
            for kind, payload, t in self.pda.edges[s]:
                self.pda.add(ns, kind, payload, mapping[t])
        return _Frag(mapping[f.start], [mapping[a] for a in f.accepts])

    # ----- parsing (mirrors ebnf._BodyParser's surface)

    def parse(self) -> _Frag:
        alts = [self._concat_seq()]
        while self.i < len(self.src) and self.src[self.i] == "|":
            self.i += 1
            alts.append(self._concat_seq())
        return self._alt(alts)

    def _concat_seq(self) -> _Frag:
        out: Optional[_Frag] = None
        while self.i < len(self.src):
            ch = self.src[self.i]
            if ch.isspace():
                self.i += 1
                continue
            if ch in "|)":
                break
            atom = self._atom()
            atom = self._maybe_quantify(atom)
            out = atom if out is None else self._concat(out, atom)
        return out if out is not None else self._empty_frag()

    def _atom(self) -> _Frag:
        ch = self.src[self.i]
        if ch == '"':
            return self._lit_frag(self._string())
        if ch == "[":
            chars, neg = self._charclass()
            return self._class_frag(chars, neg)
        if ch == "(":
            self.i += 1
            f = self.parse()
            if self.i >= len(self.src) or self.src[self.i] != ")":
                raise ValueError("unbalanced parentheses in EBNF")
            self.i += 1
            return f
        if ch == ".":
            self.i += 1
            return self._class_frag(frozenset(("\n",)), True)
        if ch.isalpha() or ch == "_":
            j = self.i
            while j < len(self.src) and (self.src[j].isalnum()
                                         or self.src[j] in "_-"):
                j += 1
            name = self.src[self.i:j]
            self.i = j
            if name not in self.rule_index:
                raise ValueError(
                    f"EBNF references undefined rule {name!r}")
            return self._call_frag(name)
        raise ValueError(
            f"unsupported EBNF syntax at {self.src[self.i:]!r}")

    def _maybe_quantify(self, f: _Frag) -> _Frag:
        if self.i >= len(self.src):
            return f
        ch = self.src[self.i]
        if ch == "?":
            self.i += 1
            return self._repeat(f, 0, 1)
        if ch == "*":
            self.i += 1
            return self._repeat(f, 0, None)
        if ch == "+":
            self.i += 1
            return self._repeat(f, 1, None)
        if ch == "{":
            j = self.src.index("}", self.i)
            body = self.src[self.i + 1:j]
            self.i = j + 1
            if "," in body:
                lo_s, hi_s = body.split(",", 1)
                lo = int(lo_s) if lo_s.strip() else 0
                hi = int(hi_s) if hi_s.strip() else None
            else:
                lo = hi = int(body)
            return self._repeat(f, lo, hi)
        return f

    def _string(self) -> str:
        self.i += 1
        out = []
        while self.i < len(self.src):
            ch = self.src[self.i]
            if ch == '"':
                self.i += 1
                return "".join(out)
            if ch == "\\" and self.i + 1 < len(self.src):
                nxt = self.src[self.i + 1]
                out.append({"n": "\n", "t": "\t", "r": "\r", '"': '"',
                            "\\": "\\"}.get(nxt, nxt))
                self.i += 2
                continue
            out.append(ch)
            self.i += 1
        raise ValueError("unterminated string literal in EBNF")

    def _charclass(self) -> tuple[frozenset, bool]:
        self.i += 1
        negated = False
        if self.i < len(self.src) and self.src[self.i] == "^":
            negated = True
            self.i += 1
        chars: set[str] = set()
        prev: Optional[str] = None
        while self.i < len(self.src) and self.src[self.i] != "]":
            ch = self.src[self.i]
            if ch == "\\" and self.i + 1 < len(self.src):
                self.i += 1
                nxt = self.src[self.i]
                ch = {"n": "\n", "t": "\t", "r": "\r",
                      "\\": "\\", "]": "]", "-": "-",
                      "^": "^"}.get(nxt, nxt)
                chars.add(ch)
                prev = ch
                self.i += 1
                continue
            if (ch == "-" and prev is not None
                    and self.i + 1 < len(self.src)
                    and self.src[self.i + 1] != "]"):
                hi = self.src[self.i + 1]
                for o in range(ord(prev), ord(hi) + 1):
                    chars.add(chr(o))
                self.i += 2
                prev = None
                continue
            chars.add(ch)
            prev = ch
            self.i += 1
        if self.i >= len(self.src):
            raise ValueError("unterminated character class in EBNF")
        self.i += 1
        return frozenset(chars), negated


def compile_ebnf_pda(grammar: str, root: str = "root") -> _PDA:
    from vllm_tpu.structured_output.ebnf import _parse_rules

    rules = _parse_rules(grammar)
    if root not in rules:
        root = next(iter(rules))
    pda = _PDA()
    rule_index = {name: i for i, name in enumerate(rules)}
    frags: dict[str, _Frag] = {}
    for name, body in rules.items():
        p = _BodyParser(body, pda, rule_index)
        f = p.parse()
        if p.i < len(p.src):
            raise ValueError(
                f"trailing EBNF syntax in rule {name!r}: "
                f"{p.src[p.i:]!r}")
        frags[name] = f
    for name, f in frags.items():
        pda.rule_start[name] = f.start
        pda.rule_accepts.update(f.accepts)
    # resolve CALL payloads from rule names to start states
    for s, edges in enumerate(pda.edges):
        pda.edges[s] = [
            (kind,
             pda.rule_start[payload] if kind == _CALL else payload,
             t) for kind, payload, t in edges
        ]
    pda.root_start = pda.rule_start[root]
    return pda


# ---------------------------------------------------------------- runtime

# interned cons-cell stacks: (ret_state, parent_id) -> cell_id; cell 0 =
# empty stack
class _StackPool:

    def __init__(self) -> None:
        self._cells: list[tuple[int, int]] = [(-1, -1)]
        self._index: dict[tuple[int, int], int] = {(-1, -1): 0}

    def push(self, stack_id: int, ret_state: int) -> int:
        key = (ret_state, stack_id)
        cid = self._index.get(key)
        if cid is None:
            cid = len(self._cells)
            self._cells.append(key)
            self._index[key] = cid
        return cid

    def pop(self, stack_id: int) -> tuple[int, int]:
        """-> (ret_state, parent_id); (-1, -1) for the empty stack."""
        return self._cells[stack_id]

    def depth(self, stack_id: int) -> int:
        d = 0
        while stack_id != 0:
            stack_id = self._cells[stack_id][1]
            d += 1
        return d


class VocabTrie:
    """Character trie over the decoded token strings (shared per
    tokenizer)."""

    def __init__(self, tokenizer) -> None:
        vocab_size = len(tokenizer)
        self.vocab_size = vocab_size
        token_strs = tokenizer.convert_ids_to_tokens(
            list(range(vocab_size)))
        decoded = [
            tokenizer.convert_tokens_to_string([t])
            if t is not None else "" for t in token_strs
        ]
        # nodes: children dict + token id terminating here (-1 = none)
        self.children: list[dict[str, int]] = [{}]
        self.token_at: list[int] = [-1]
        for tid, text in enumerate(decoded):
            if not text or tid == tokenizer.eos_token_id:
                continue
            node = 0
            for ch in text:
                nxt = self.children[node].get(ch)
                if nxt is None:
                    nxt = len(self.children)
                    self.children.append({})
                    self.token_at.append(-1)
                    self.children[node][ch] = nxt
                node = nxt
            self.token_at[node] = tid


_TRIE_LOCK = threading.Lock()


def get_vocab_trie(tokenizer) -> VocabTrie:
    """Trie shared per tokenizer OBJECT — stashed on the instance, NOT
    in an id()-keyed module cache: a freed tokenizer's id() is reused
    by later allocations, which served a stale trie for a different
    vocab (wrong token masks; found by test-order-dependent pushdown
    failures)."""
    trie = getattr(tokenizer, "_vllm_tpu_vocab_trie", None)
    if trie is None:
        with _TRIE_LOCK:
            trie = getattr(tokenizer, "_vllm_tpu_vocab_trie", None)
            if trie is None:
                trie = VocabTrie(tokenizer)
                try:
                    tokenizer._vllm_tpu_vocab_trie = trie
                except (AttributeError, TypeError):
                    pass  # unsettable tokenizer: rebuild per grammar
    return trie


_MAX_CONFIGS = 256  # safety valve against pathological grammars
_MAX_DEPTH = 1024


class PushdownGrammar:
    """Grammar + tokenizer product with a lazily-filled token-mask
    cache. Thread-safe for concurrent states sharing the grammar."""

    def __init__(self, pda: _PDA, tokenizer,
                 eos_token_id: Optional[int]) -> None:
        self.pda = pda
        self.eos_token_id = eos_token_id
        self.trie = get_vocab_trie(tokenizer)
        self.vocab_size = self.trie.vocab_size
        self.words = -(-self.vocab_size // 32)
        self.pool = _StackPool()
        self._mask_cache: dict[frozenset, np.ndarray] = {}
        self._step_cache: dict[tuple[frozenset, int], frozenset] = {}
        self._lock = threading.Lock()
        self._init_configs = self._closure(
            frozenset(((pda.root_start, 0),)))

    # -- config-set algebra

    def _closure(self, configs: frozenset) -> frozenset:
        """Epsilon/call/return closure of a set of (state, stack_id)."""
        pda, pool = self.pda, self.pool
        seen = set(configs)
        work = list(configs)
        while work:
            state, stack = work.pop()
            for kind, payload, target in pda.edges[state]:
                if kind == _EPS:
                    c = (target, stack)
                    if c not in seen:
                        seen.add(c)
                        work.append(c)
                elif kind == _CALL:
                    if pool.depth(stack) >= _MAX_DEPTH:
                        continue
                    c = (payload, pool.push(stack, target))
                    if c not in seen:
                        seen.add(c)
                        work.append(c)
            if state in pda.rule_accepts and stack != 0:
                ret, parent = pool.pop(stack)
                c = (ret, parent)
                if c not in seen:
                    seen.add(c)
                    work.append(c)
        if len(seen) > _MAX_CONFIGS:
            raise ValueError(
                "grammar too ambiguous: configuration set exceeded "
                f"{_MAX_CONFIGS}")
        return frozenset(seen)

    def _step_char(self, configs: frozenset, ch: str) -> frozenset:
        pda = self.pda
        out = set()
        for state, stack in configs:
            for kind, payload, target in pda.edges[state]:
                if kind == _CHARS:
                    if ch in payload:
                        out.add((target, stack))
                elif kind == _NOT_CHARS:
                    if ch not in payload:
                        out.add((target, stack))
        if not out:
            return frozenset()
        return self._closure(frozenset(out))

    def _accepts(self, configs: frozenset) -> bool:
        return any(state in self.pda.rule_accepts and stack == 0
                   for state, stack in configs)

    # -- token-level API

    def token_mask(self, configs: frozenset) -> np.ndarray:
        with self._lock:
            mask = self._mask_cache.get(configs)
        if mask is not None:
            return mask
        mask = self._compute_mask(configs)
        with self._lock:
            self._mask_cache[configs] = mask
        return mask

    def _compute_mask(self, configs: frozenset) -> np.ndarray:
        mask = np.zeros(self.words, np.uint32)
        trie = self.trie
        native = _native_mask(self, configs)
        if native is not None:
            mask = native
        else:
            # DFS over the vocab trie propagating the config set
            stack = [(0, configs)]
            while stack:
                node, cfgs = stack.pop()
                tid = trie.token_at[node]
                if tid >= 0:
                    mask[tid // 32] |= np.uint32(1 << (tid % 32))
                for ch, child in trie.children[node].items():
                    nxt = self._step_char(cfgs, ch)
                    if nxt:
                        stack.append((child, nxt))
        if self._accepts(configs) and self.eos_token_id is not None:
            eos = self.eos_token_id
            mask[eos // 32] |= np.uint32(1 << (eos % 32))
        if not mask.any() and self.eos_token_id is not None:
            # dead end: allow EOS so the request terminates cleanly
            eos = self.eos_token_id
            mask[eos // 32] |= np.uint32(1 << (eos % 32))
        return mask

    def step_token(self, configs: frozenset,
                   token_id: int) -> frozenset:
        key = (configs, token_id)
        with self._lock:
            cached = self._step_cache.get(key)
        if cached is not None:
            return cached
        text = self._token_text(token_id)
        out = configs
        for ch in text:
            out = self._step_char(out, ch)
            if not out:
                break
        with self._lock:
            self._step_cache[key] = out
        return out

    def _token_text(self, token_id: int) -> str:
        # walk the trie backwards is awkward; keep a lazy decode cache
        cache = getattr(self, "_decode_cache", None)
        if cache is None:
            cache = {}
            self._decode_cache = cache
        text = cache.get(token_id)
        if text is None:
            tok = self._tokenizer_decode(token_id)
            cache[token_id] = tok
            text = tok
        return text

    def attach_tokenizer_decode(self, tokenizer) -> None:
        self._tok = tokenizer

    def _tokenizer_decode(self, token_id: int) -> str:
        tok = self._tok.convert_ids_to_tokens([token_id])[0]
        if tok is None:
            return ""
        return self._tok.convert_tokens_to_string([tok])

    def new_state(self) -> "PushdownState":
        return PushdownState(self)


def _native_mask(grammar: PushdownGrammar,
                 configs: frozenset) -> Optional[np.ndarray]:
    """Hook for the C fast path (csrc); None -> Python DFS."""
    return None


class PushdownState:
    """Per-request decoding state (same duck type as
    builtin.GrammarState)."""

    def __init__(self, grammar: PushdownGrammar) -> None:
        self.grammar = grammar
        self.configs = grammar._init_configs
        self.finished = False

    def allowed_bitmask(self) -> np.ndarray:
        if self.finished or not self.configs:
            mask = np.zeros(self.grammar.words, np.uint32)
            eos = self.grammar.eos_token_id
            if eos is not None:
                mask[eos // 32] |= np.uint32(1 << (eos % 32))
            return mask
        return self.grammar.token_mask(self.configs)

    def advance(self, token_id: int) -> None:
        if self.finished or not self.configs:
            return
        if token_id == self.grammar.eos_token_id:
            self.finished = True
            return
        self.configs = self.grammar.step_token(self.configs, token_id)


def compile_pushdown(grammar_text: str, tokenizer,
                     root: str = "root") -> PushdownGrammar:
    pda = compile_ebnf_pda(grammar_text, root)
    g = PushdownGrammar(pda, tokenizer, tokenizer.eos_token_id)
    g.attach_tokenizer_decode(tokenizer)
    return g
