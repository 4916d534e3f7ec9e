"""GBNF-style EBNF -> regex front-end for the builtin backend
(reference behavior: guided_grammar through xgrammar,
vllm/v1/structured_output/backend_xgrammar.py — here grammars compile by
inline-expanding rule references into one regex consumed by
regex_dfa.regex_to_dfa).

Supported: ``name ::= expr`` rules, string literals ("..."), character
classes ([a-z0-9] incl. negation), grouping, alternation ``|``,
quantifiers ``? * +`` and ``{m}``/``{m,n}``, rule references, ``#``
comments. Recursive rules are rejected with a clear error (a DFA cannot
express unbounded nesting); that covers the non-recursive grammars this
feature is overwhelmingly used for (enums, formats, tool-call shells).
"""

from __future__ import annotations

import re

_RULE_RE = re.compile(r"^\s*([A-Za-z_][\w-]*)\s*::=\s*(.*)$")
_REGEX_SPECIAL = set(".[](){}|?*+\\^$")


def _escape_literal(text: str) -> str:
    out = []
    for ch in text:
        if ch == "\n":
            out.append("\\n")
        elif ch == "\t":
            out.append("\\t")
        elif ch in _REGEX_SPECIAL:
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "".join(out)


def _strip_comments(line: str) -> str:
    # '#' starts a comment unless inside a string literal or char class
    out = []
    in_str = in_cls = False
    i = 0
    while i < len(line):
        ch = line[i]
        if ch == '"' and not in_cls:
            in_str = not in_str
        elif ch == "[" and not in_str:
            in_cls = True
        elif ch == "]" and not in_str:
            in_cls = False
        elif ch == "#" and not in_str and not in_cls:
            break
        elif ch == "\\" and (in_str or in_cls) and i + 1 < len(line):
            out.append(ch)
            i += 1
            ch = line[i]
        out.append(ch)
        i += 1
    return "".join(out)


def _parse_rules(grammar: str) -> dict[str, str]:
    """Split the grammar into {rule_name: body_source} (continuation
    lines without '::=' attach to the previous rule)."""
    rules: dict[str, str] = {}
    current = None
    for raw in grammar.splitlines():
        line = _strip_comments(raw).rstrip()
        if not line.strip():
            continue
        m = _RULE_RE.match(line)
        if m is not None:
            current = m.group(1)
            rules[current] = m.group(2).strip()
        elif current is not None:
            rules[current] += " " + line.strip()
    if not rules:
        raise ValueError("empty EBNF grammar")
    return rules


class _BodyParser:
    """Translate one rule body into regex source, collecting rule refs
    as placeholders resolved by the expander."""

    def __init__(self, src: str) -> None:
        self.src = src
        self.i = 0

    def peek(self):
        return self.src[self.i] if self.i < len(self.src) else None

    def translate(self, resolve) -> str:
        out = []
        while self.i < len(self.src):
            ch = self.src[self.i]
            if ch.isspace():
                self.i += 1
                continue
            if ch == '"':
                out.append(self._string())
            elif ch == "[":
                out.append(self._charclass())
            elif ch == "(":
                self.i += 1
                inner = self._until_close(resolve)
                out.append(f"({inner})")
            elif ch in "|?*+":
                out.append(ch)
                self.i += 1
            elif ch == "{":
                j = self.src.index("}", self.i)
                out.append(self.src[self.i:j + 1])
                self.i = j + 1
            elif ch.isalpha() or ch == "_":
                j = self.i
                while j < len(self.src) and (self.src[j].isalnum()
                                             or self.src[j] in "_-"):
                    j += 1
                name = self.src[self.i:j]
                self.i = j
                out.append(f"({resolve(name)})")
            else:
                raise ValueError(
                    f"unsupported EBNF syntax at {self.src[self.i:]!r}")
        return "".join(out)

    def _until_close(self, resolve) -> str:
        depth = 1
        start = self.i
        while self.i < len(self.src):
            ch = self.src[self.i]
            if ch == '"':
                self._skip_string()
                continue
            if ch == "[":
                self._skip_class()
                continue
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    inner_src = self.src[start:self.i]
                    self.i += 1
                    return _BodyParser(inner_src).translate(resolve)
            self.i += 1
        raise ValueError("unbalanced parentheses in EBNF")

    def _skip_string(self) -> None:
        self.i += 1
        while self.i < len(self.src) and self.src[self.i] != '"':
            if self.src[self.i] == "\\":
                self.i += 1
            self.i += 1
        self.i += 1

    def _skip_class(self) -> None:
        self.i += 1
        while self.i < len(self.src) and self.src[self.i] != "]":
            if self.src[self.i] == "\\":
                self.i += 1
            self.i += 1
        self.i += 1

    def _string(self) -> str:
        self.i += 1  # opening quote
        out = []
        while self.i < len(self.src):
            ch = self.src[self.i]
            if ch == '"':
                self.i += 1
                return _escape_literal("".join(out))
            if ch == "\\" and self.i + 1 < len(self.src):
                nxt = self.src[self.i + 1]
                out.append({"n": "\n", "t": "\t", '"': '"',
                            "\\": "\\"}.get(nxt, nxt))
                self.i += 2
                continue
            out.append(ch)
            self.i += 1
        raise ValueError("unterminated string literal in EBNF")

    def _charclass(self) -> str:
        j = self.i + 1
        while j < len(self.src) and self.src[j] != "]":
            if self.src[j] == "\\":
                j += 1
            j += 1
        if j >= len(self.src):
            raise ValueError("unterminated character class in EBNF")
        cls = self.src[self.i:j + 1]
        self.i = j + 1
        return cls


def ebnf_to_regex(grammar: str, root: str = "root") -> str:
    rules = _parse_rules(grammar)
    if root not in rules:
        root = next(iter(rules))
    expanding: list[str] = []
    cache: dict[str, str] = {}

    def resolve(name: str) -> str:
        if name in cache:
            return cache[name]
        if name not in rules:
            raise ValueError(f"EBNF references undefined rule {name!r}")
        if name in expanding:
            raise ValueError(
                f"recursive EBNF rule {name!r} is not supported by the "
                "builtin DFA backend (unbounded nesting has no finite "
                "automaton)")
        expanding.append(name)
        try:
            body = _BodyParser(rules[name]).translate(resolve)
        finally:
            expanding.pop()
        cache[name] = body
        return body

    return resolve(root)
