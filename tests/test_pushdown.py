"""Pushdown (CFG) structured-output backend: recursive grammars and
arbitrarily-nested guided_json (reference:
vllm/v1/structured_output/backend_xgrammar.py:33)."""

import json

import numpy as np
import pytest

from vllm_tpu.structured_output.json_schema import schema_to_ebnf
from vllm_tpu.structured_output.pushdown import (compile_ebnf_pda,
                                                 compile_pushdown)


class CharTok:
    """One token per char over a JSON-ish alphabet + a few multi-char
    tokens (to exercise trie sharing)."""

    def __init__(self, extra=("true", "false", "null", '":', '",')):
        base = list("{}[]\",:abcdefghijklmnopqrstuvwxyz0123456789 .-+exE")
        self.toks = base + list(extra)
        self.eos_token_id = len(self.toks)

    def __len__(self):
        return len(self.toks) + 1

    def convert_ids_to_tokens(self, ids):
        return [self.toks[i] if i < len(self.toks) else "<eos>"
                for i in ids]

    def convert_tokens_to_string(self, toks):
        return "".join(t for t in toks if t != "<eos>")


def _allowed(mask, tid):
    return bool(mask[tid // 32] & np.uint32(1 << (tid % 32)))


def greedy_generate(state, tok, pick, max_steps=400):
    """Drive the grammar with `pick(allowed_token_texts) -> token_id`."""
    out = []
    for _ in range(max_steps):
        mask = state.allowed_bitmask()
        allowed = [t for t in range(len(tok)) if _allowed(mask, t)]
        assert allowed, "empty mask"
        tid = pick(allowed)
        if tid == tok.eos_token_id:
            return "".join(out)
        out.append(tok.convert_tokens_to_string(
            tok.convert_ids_to_tokens([tid])))
        state.advance(tid)
    raise AssertionError("did not terminate")


def drive_text(grammar, tok, text):
    """Advance through `text` one char-token at a time; returns state
    (asserts every char was allowed)."""
    state = grammar.new_state()
    tok_of = {t: i for i, t in enumerate(tok.toks)}
    for ch in text:
        mask = state.allowed_bitmask()
        tid = tok_of[ch]
        assert _allowed(mask, tid), f"char {ch!r} masked out in {text!r}"
        state.advance(tid)
    return state


def test_recursive_balanced_parens():
    g = compile_pushdown('root ::= "(" root ")" | "x"', CharTok(
        extra=("(", ")", "x")))
    tok = CharTok(extra=("(", ")", "x"))
    tok_of = {t: i for i, t in enumerate(tok.toks)}
    state = g.new_state()
    for ch in "((x))":
        mask = state.allowed_bitmask()
        assert _allowed(mask, tok_of[ch])
        state.advance(tok_of[ch])
    mask = state.allowed_bitmask()
    assert _allowed(mask, tok.eos_token_id)
    # unbalanced close is rejected
    assert not _allowed(mask, tok_of[")"])


def test_recursive_json_value_grammar():
    tok = CharTok()
    g = compile_pushdown(schema_to_ebnf(True), tok)
    text = '{"a": [1, {"b": [true, null]}], "c": "x"}'
    st = drive_text(g, tok, text)
    assert _allowed(st.allowed_bitmask(), tok.eos_token_id)
    json.loads(text)  # sanity


def test_deep_nesting_beyond_any_dfa():
    tok = CharTok()
    g = compile_pushdown(schema_to_ebnf(True), tok)
    depth = 60
    text = "[" * depth + "1" + "]" * depth
    st = drive_text(g, tok, text)
    assert _allowed(st.allowed_bitmask(), tok.eos_token_id)
    # one extra close bracket must be masked
    close = tok.toks.index("]")
    assert not _allowed(st.allowed_bitmask(), close)


def test_schema_object_required_and_optional():
    schema = {
        "type": "object",
        "properties": {
            "name": {"type": "string"},
            "age": {"type": "integer"},
            "tag": {"enum": ["a", "b"]},
        },
        "required": ["name", "age"],
    }
    tok = CharTok()
    g = compile_pushdown(schema_to_ebnf(schema), tok)
    ok = '{"name": "bob", "age": 41, "tag": "a"}'
    st = drive_text(g, tok, ok)
    assert _allowed(st.allowed_bitmask(), tok.eos_token_id)
    ok2 = '{"name": "x", "age": 7}'
    st = drive_text(g, tok, ok2)
    assert _allowed(st.allowed_bitmask(), tok.eos_token_id)
    # missing required member: after {"name": "x"} a "}" is masked
    st = drive_text(g, tok, '{"name": "x"')
    close = tok.toks.index("}")
    assert not _allowed(st.allowed_bitmask(), close)


def test_recursive_ref_schema_tree():
    schema = {
        "$defs": {
            "node": {
                "type": "object",
                "properties": {
                    "v": {"type": "integer"},
                    "kids": {"type": "array",
                             "items": {"$ref": "#/$defs/node"}},
                },
                "required": ["v"],
            }
        },
        "$ref": "#/$defs/node",
    }
    tok = CharTok()
    g = compile_pushdown(schema_to_ebnf(schema), tok)
    text = ('{"v": 1, "kids": [{"v": 2, "kids": [{"v": 3}]}, '
            '{"v": 4}]}')
    st = drive_text(g, tok, text)
    assert _allowed(st.allowed_bitmask(), tok.eos_token_id)
    json.loads(text)


def test_generation_produces_valid_json():
    """Random-greedy walk through the grammar must yield parseable JSON
    matching the schema shape."""
    import random

    schema = {
        "type": "object",
        "properties": {
            "items": {"type": "array",
                      "items": {"type": "object",
                                "properties": {"id": {"type": "integer"}},
                                "required": ["id"]}},
        },
        "required": ["items"],
    }
    tok = CharTok()
    g = compile_pushdown(schema_to_ebnf(schema), tok)
    rng = random.Random(7)

    def pick(allowed):
        # prefer EOS when legal to terminate; else random
        if tok.eos_token_id in allowed and rng.random() < 0.3:
            return tok.eos_token_id
        choices = [t for t in allowed if t != tok.eos_token_id]
        return rng.choice(choices or allowed)

    for seed in range(3):
        rng.seed(seed)
        text = greedy_generate(g.new_state(), tok, pick)
        obj = json.loads(text)
        assert "items" in obj and isinstance(obj["items"], list)
        for it in obj["items"]:
            assert isinstance(it["id"], int)


def test_string_pattern_via_dfa_rules():
    schema = {"type": "object",
              "properties": {"zip": {"type": "string",
                                     "pattern": "^[0-9]{5}$"}},
              "required": ["zip"]}
    tok = CharTok()
    g = compile_pushdown(schema_to_ebnf(schema), tok)
    st = drive_text(g, tok, '{"zip": "12345"}')
    assert _allowed(st.allowed_bitmask(), tok.eos_token_id)
    st = drive_text(g, tok, '{"zip": "1234')
    q = tok.toks.index('"')
    assert not _allowed(st.allowed_bitmask(), q)  # 4 digits: no close yet


def test_guided_json_via_compile_grammar():
    from vllm_tpu.sampling_params import SamplingParams
    from vllm_tpu.structured_output.builtin import compile_grammar

    tok = CharTok()
    schema = {"type": "array", "items": {"type": "array",
                                         "items": {"type": "integer"}}}
    params = SamplingParams(guided_json=json.dumps(schema))
    g = compile_grammar(params, tok)
    st = g.new_state()
    tok_of = {t: i for i, t in enumerate(tok.toks)}
    for ch in "[[1, 2], [3]]":
        assert _allowed(st.allowed_bitmask(), tok_of[ch]), ch
        st.advance(tok_of[ch])
    assert _allowed(st.allowed_bitmask(), tok.eos_token_id)


def test_recursive_guided_grammar_no_longer_rejected():
    from vllm_tpu.sampling_params import SamplingParams
    from vllm_tpu.structured_output.builtin import compile_grammar

    tok = CharTok(extra=("(", ")", "x"))
    params = SamplingParams(
        guided_grammar='root ::= "(" root ")" | "x"')
    g = compile_grammar(params, tok)  # must not raise
    st = g.new_state()
    tok_of = {t: i for i, t in enumerate(tok.toks)}
    for ch in "(x)":
        assert _allowed(st.allowed_bitmask(), tok_of[ch])
        st.advance(tok_of[ch])
    assert _allowed(st.allowed_bitmask(), tok.eos_token_id)


def test_multichar_tokens_cross_structure():
    """Multi-char tokens spanning string-close + comma must be legal
    exactly when the grammar allows the whole sequence."""
    tok = CharTok()
    g = compile_pushdown(schema_to_ebnf(True), tok)
    st = drive_text(g, tok, '{"a')
    # '":' (close quote + colon) is a single token and must be allowed
    t = tok.toks.index('":')
    assert _allowed(st.allowed_bitmask(), t)
    st.advance(t)
    st2 = drive_text(g, tok, '{"a": "b')
    # '",' then needs another member; allowed
    t2 = tok.toks.index('",')
    assert _allowed(st2.allowed_bitmask(), t2)


def test_mask_cache_reused():
    tok = CharTok()
    g = compile_pushdown(schema_to_ebnf(True), tok)
    st = g.new_state()
    m1 = st.allowed_bitmask()
    m2 = g.new_state().allowed_bitmask()
    assert m1 is m2  # same config key -> cached array
