"""JSON-schema -> recursive EBNF for the pushdown backend.

Replaces the round-2 regex approximation: nesting is unbounded (objects
in arrays in objects...), recursive $ref/$defs compile to recursive
rules, and untyped values get the full JSON value grammar (reference
behavior: xgrammar's JSON-schema converter used by
vllm/v1/structured_output/backend_xgrammar.py).
"""

from __future__ import annotations

import json
import re
from typing import Union

# the classic JSON grammar; schema-specific rules reference these
_JSON_CORE = r'''
ws ::= [ \t\n\r]*
jvalue ::= jobject | jarray | jstring | jnumber | "true" | "false" | "null"
jobject ::= "{" ws ( jmember ( ws "," ws jmember )* )? ws "}"
jmember ::= jstring ws ":" ws jvalue
jarray ::= "[" ws ( jvalue ( ws "," ws jvalue )* )? ws "]"
jstring ::= "\"" jchar* "\""
jchar ::= [^"\\] | "\\" jescape
jescape ::= ["\\/bfnrt] | "u" jhex jhex jhex jhex
jhex ::= [0-9a-fA-F]
jnumber ::= "-"? jint jfrac? jexp?
jint ::= "0" | [1-9] [0-9]*
jfrac ::= "." [0-9]+
jexp ::= [eE] [-+]? [0-9]+
'''


def _quote(lit: str) -> str:
    """A JSON string literal (with quotes) as an EBNF string terminal."""
    return _const_rule(lit)


def _raw_char_rule(ch: str) -> str:
    """EBNF terminal matching one RAW character (used by _dfa_rules)."""
    esc = {"\n": "\\n", "\t": "\\t", "\r": "\\r", '"': '\\"',
           "\\": "\\\\"}.get(ch, ch)
    return '"' + esc + '"'


def _const_rule(value) -> str:
    """EBNF terminal matching exactly json.dumps(value)."""
    text = json.dumps(value, ensure_ascii=False)
    body = []
    for ch in text:
        if ch == '"':
            body.append('\\"')
        elif ch == "\\":
            body.append("\\\\")
        elif ch == "\n":
            body.append("\\n")
        elif ch == "\t":
            body.append("\\t")
        else:
            body.append(ch)
    return '"' + "".join(body) + '"'


class _SchemaCompiler:

    def __init__(self, root_schema: dict) -> None:
        self.root_schema = root_schema
        self.rules: dict[str, str] = {}
        self.counter = 0
        self._ref_rules: dict[str, str] = {}  # $ref path -> rule name

    def fresh(self, hint: str) -> str:
        self.counter += 1
        name = re.sub(r"[^A-Za-z0-9_]", "_", hint) or "r"
        return f"s{self.counter}_{name}"[:40]

    def resolve_ref(self, ref: str) -> dict:
        if not ref.startswith("#"):
            raise ValueError(f"unsupported external $ref {ref!r}")
        node = self.root_schema
        for part in ref.lstrip("#/").split("/"):
            if not part:
                continue
            part = part.replace("~1", "/").replace("~0", "~")
            node = node[part]
        return node

    def compile(self, schema: Union[dict, bool], hint: str = "v") -> str:
        """-> rule name (or inline core-rule name) for this schema."""
        if schema is True or schema == {}:
            return "jvalue"
        if schema is False:
            raise ValueError("schema `false` matches nothing")
        if "$ref" in schema:
            ref = schema["$ref"]
            if ref in self._ref_rules:
                return self._ref_rules[ref]
            name = self.fresh(ref.rsplit("/", 1)[-1])
            # register BEFORE compiling the target: recursion lands here
            self._ref_rules[ref] = name
            target = self.resolve_ref(ref)
            body_rule = self.compile(target, name)
            self.rules[name] = body_rule
            return name

        if "enum" in schema:
            name = self.fresh(hint + "_enum")
            self.rules[name] = " | ".join(
                _const_rule(v) for v in schema["enum"])
            return name
        if "const" in schema:
            name = self.fresh(hint + "_const")
            self.rules[name] = _const_rule(schema["const"])
            return name
        for comb in ("anyOf", "oneOf"):
            if comb in schema:
                name = self.fresh(hint + "_any")
                subs = [
                    self.compile(s, f"{hint}{i}")
                    for i, s in enumerate(schema[comb])
                ]
                self.rules[name] = " | ".join(subs)
                return name
        if "allOf" in schema and len(schema["allOf"]) == 1:
            return self.compile(schema["allOf"][0], hint)

        stype = schema.get("type")
        if isinstance(stype, list):
            name = self.fresh(hint + "_union")
            subs = [
                self.compile({**schema, "type": t}, f"{hint}_{t}")
                for t in stype
            ]
            self.rules[name] = " | ".join(subs)
            return name

        if stype == "object" or (stype is None and (
                "properties" in schema or "additionalProperties" in schema
                or "required" in schema)):
            return self._object(schema, hint)
        if stype == "array":
            return self._array(schema, hint)
        if stype == "string":
            return self._string(schema, hint)
        if stype == "integer":
            return "jintval" if self._use_core_int(schema) else \
                self._number(schema, hint, integer=True)
        if stype == "number":
            return "jnumber"
        if stype == "boolean":
            name = self.fresh(hint + "_bool")
            self.rules[name] = '"true" | "false"'
            return name
        if stype == "null":
            name = self.fresh(hint + "_null")
            self.rules[name] = '"null"'
            return name
        return "jvalue"

    def _use_core_int(self, schema: dict) -> bool:
        return not any(k in schema
                       for k in ("minimum", "maximum",
                                 "exclusiveMinimum", "exclusiveMaximum"))

    def _number(self, schema: dict, hint: str, integer: bool) -> str:
        # bounded numerics degrade to the unbounded shape (the sampler
        # cannot do arithmetic comparisons in a CFG anyway; xgrammar
        # does the same for most bounds)
        name = self.fresh(hint + "_int")
        self.rules[name] = '"-"? jint' if integer else "jnumber"
        return name

    def _string(self, schema: dict, hint: str) -> str:
        name = self.fresh(hint + "_str")
        if "pattern" in schema:
            # regex -> DFA -> right-linear EBNF rules (raw regex is not
            # valid EBNF body syntax; the DFA compiler is already tested)
            pat = schema["pattern"].lstrip("^").rstrip("$")
            inner = self._dfa_rules(pat, name)
            self.rules[name] = f'"\\"" {inner} "\\""'
            return name
        parts = "jchar"
        lo = schema.get("minLength")
        hi = schema.get("maxLength")
        if lo is None and hi is None:
            self.rules[name] = '"\\"" jchar* "\\""'
        else:
            lo = int(lo or 0)
            quant = f"{{{lo},{int(hi)}}}" if hi is not None else \
                f"{{{lo},}}"
            self.rules[name] = f'"\\"" {parts}{quant} "\\""'
        return name

    def _dfa_rules(self, pattern: str, hint: str) -> str:
        """Compile a regex via regex_dfa and emit it as right-linear
        EBNF rules; returns the start rule name."""
        from vllm_tpu.structured_output.regex_dfa import regex_to_dfa

        dfa = regex_to_dfa(pattern)
        names = [self.fresh(f"{hint}_q{i}")
                 for i in range(len(dfa.transitions))]

        def cls(chars: list[str]) -> str:
            if len(chars) == 1:
                return _raw_char_rule(chars[0])
            out = []
            for ch in sorted(chars):
                if ch in "]\\^-":
                    out.append("\\" + ch)
                elif ch == "\n":
                    out.append("\\n")
                elif ch == "\t":
                    out.append("\\t")
                else:
                    out.append(ch)
            return "[" + "".join(out) + "]"

        for s, trans in enumerate(dfa.transitions):
            by_target: dict[int, list[str]] = {}
            for ch, t in trans.items():
                by_target.setdefault(t, []).append(ch)
            alts = [f"{cls(chars)} {names[t]}"
                    for t, chars in by_target.items()]
            if s in dfa.accepting:
                alts.append('""')
            if not alts:
                alts = ['""']  # dead state (unreachable in practice)
            self.rules[names[s]] = " | ".join(alts)
        return names[0]

    def _array(self, schema: dict, hint: str) -> str:
        item_rule = self.compile(schema.get("items", True),
                                 hint + "_item")
        name = self.fresh(hint + "_arr")
        lo = int(schema.get("minItems", 0))
        hi = schema.get("maxItems")
        sep = f'( ws "," ws {item_rule} )'
        if hi is not None:
            hi = int(hi)
            if hi == 0:
                self.rules[name] = '"[" ws "]"'
                return name
            tail = f"{sep}{{{max(lo - 1, 0)},{hi - 1}}}"
            inner = f"{item_rule} {tail}"
            if lo == 0:
                inner = f"( {inner} )?"
            self.rules[name] = f'"[" ws {inner} ws "]"'
            return name
        if lo <= 0:
            self.rules[name] = f'"[" ws ( {item_rule} {sep}* )? ws "]"'
        else:
            self.rules[name] = (f'"[" ws {item_rule} '
                                f"{sep}{{{lo - 1},}} ws \"]\"")
        return name

    def _object(self, schema: dict, hint: str) -> str:
        name = self.fresh(hint + "_obj")
        props: dict = schema.get("properties", {})
        required = set(schema.get("required", []))
        addl = schema.get("additionalProperties", len(props) == 0)

        member_rules: list[tuple[str, bool]] = []  # (rule, required)
        for key, sub in props.items():
            vr = self.compile(sub, f"{hint}_{key}")
            mr = self.fresh(f"{hint}_{key}_m")
            self.rules[mr] = f'{_quote(key)} ws ":" ws {vr}'
            member_rules.append((mr, key in required))

        extra_rule = None
        if addl:
            sub = addl if isinstance(addl, dict) else True
            vr = self.compile(sub, hint + "_extra")
            extra_rule = self.fresh(hint + "_xm")
            self.rules[extra_rule] = f'jstring ws ":" ws {vr}'

        # Ordered-properties construction (the standard CFG-backend
        # shape, matching xgrammar): properties appear in declaration
        # order, optional ones skippable, extras appended at the end.
        return self._object_seq(name, member_rules, extra_rule)

    def _object_seq(self, name: str,
                    member_rules: list[tuple[str, bool]],
                    extra_rule) -> str:
        """Build `{ m1? , m2 , m3? ... extras* }` honoring comma
        placement: generate alternatives over which optional members
        are present. To stay polynomial we chain via suffix rules:
        tail_i matches members i..n (with leading comma when a member
        is emitted after at least one prior member)."""
        n = len(member_rules)
        # first_i: members i..n when NOTHING emitted yet
        # rest_i: members i..n when something was already emitted
        first = [self.fresh(f"{name}_f{i}") for i in range(n + 1)]
        rest = [self.fresh(f"{name}_r{i}") for i in range(n + 1)]
        extra_first = f'{extra_rule} ( ws "," ws {extra_rule} )*' \
            if extra_rule else ""
        extra_rest = f'( ws "," ws {extra_rule} )*' if extra_rule else ""
        # terminal cases
        self.rules[first[n]] = extra_first or '""'
        self.rules[rest[n]] = extra_rest or '""'
        for i in range(n - 1, -1, -1):
            mr, req = member_rules[i]
            take_f = f"{mr} ws {rest[i + 1]}"
            take_r = f'"," ws {mr} ws {rest[i + 1]}'
            if req:
                self.rules[first[i]] = take_f
                self.rules[rest[i]] = take_r
            else:
                self.rules[first[i]] = f"{take_f} | {first[i + 1]}"
                self.rules[rest[i]] = f"{take_r} | {rest[i + 1]}"
        body = first[0]
        self.rules[name] = f'"{{" ws {body} ws "}}"'
        return name


def schema_to_ebnf(schema: Union[str, dict, bool]) -> str:
    """Full grammar text (root rule + JSON core) for a JSON schema."""
    if isinstance(schema, str):
        schema = json.loads(schema)
    if schema is True or schema == {} or schema is None:
        return _JSON_CORE + "\nroot ::= ws jvalue ws\n"
    comp = _SchemaCompiler(schema)
    root_rule = comp.compile(schema, "root")
    lines = [_JSON_CORE, 'jintval ::= "-"? jint']
    for rname, body in comp.rules.items():
        lines.append(f"{rname} ::= {body}")
    lines.append(f"root ::= ws {root_rule} ws")
    return "\n".join(lines) + "\n"
