"""Tool-call + reasoning parsers (reference analog:
tests/tool_use + tests/reasoning in the reference repo)."""

import json

import pytest

from vllm_tpu.entrypoints.openai.tool_parsers import (get_tool_parser,
                                                      list_tool_parsers)
from vllm_tpu.reasoning import get_reasoning_parser


def test_hermes_parser():
    p = get_tool_parser("hermes")
    text = ('I will check the weather.\n<tool_call>\n'
            '{"name": "get_weather", "arguments": {"city": "Paris"}}\n'
            '</tool_call>')
    out = p.extract(text)
    assert out.tools_called
    assert out.tool_calls[0]["function"]["name"] == "get_weather"
    assert json.loads(out.tool_calls[0]["function"]["arguments"]) == \
        {"city": "Paris"}
    assert out.content == "I will check the weather."

    plain = p.extract("no tools here")
    assert not plain.tools_called and plain.content == "no tools here"


def test_llama3_json_parser():
    p = get_tool_parser("llama3_json")
    out = p.extract('{"name": "add", "parameters": {"a": 1, "b": 2}}')
    assert out.tools_called
    assert out.tool_calls[0]["function"]["name"] == "add"
    out2 = p.extract('<|python_tag|>{"name": "f", "parameters": {}}; '
                     '{"name": "g", "parameters": {"x": 3}}')
    assert out2.tools_called and len(out2.tool_calls) == 2
    assert not p.extract("hello there").tools_called


def test_mistral_parser():
    p = get_tool_parser("mistral")
    out = p.extract('[TOOL_CALLS] [{"name": "f", "arguments": {"k": 1}}]')
    assert out.tools_called
    assert out.tool_calls[0]["function"]["name"] == "f"
    assert not p.extract("nothing").tools_called


def test_pythonic_parser():
    p = get_tool_parser("pythonic")
    out = p.extract('[get_weather(city="SF"), add(a=1, b=2)]')
    assert out.tools_called and len(out.tool_calls) == 2
    args = json.loads(out.tool_calls[1]["function"]["arguments"])
    assert args == {"a": 1, "b": 2}
    assert not p.extract("[1, 2, 3]").tools_called


def test_reasoning_parser():
    p = get_reasoning_parser("deepseek_r1")
    out = p.extract("<think>step 1... step 2...</think>\nThe answer is 4.")
    assert out.reasoning_content == "step 1... step 2..."
    assert out.content == "The answer is 4."
    # template-emitted open tag (R1 style): no explicit <think>
    out2 = p.extract("reasoning here</think>answer")
    assert out2.reasoning_content == "reasoning here"
    assert out2.content == "answer"
    # unterminated
    out3 = p.extract("<think>still thinking")
    assert out3.reasoning_content == "still thinking"
    assert out3.content is None
    # no tags at all
    out4 = p.extract("plain answer")
    assert out4.reasoning_content is None and out4.content == "plain answer"


def test_registry():
    assert "hermes" in list_tool_parsers()
    with pytest.raises(ValueError):
        get_tool_parser("nope")
    with pytest.raises(ValueError):
        get_reasoning_parser("nope")


# ------------------------------------------------- round-2 parser breadth

import json as _json

import pytest as _pytest

from vllm_tpu.entrypoints.openai.tool_parsers import get_tool_parser

_CASES = [
    ("deepseek_v3",
     "thinking<｜tool▁calls▁begin｜><｜tool▁call▁begin｜>function"
     "<｜tool▁sep｜>get_weather\n```json\n{\"city\": \"SF\"}\n```"
     "<｜tool▁call▁end｜><｜tool▁calls▁end｜>",
     [("get_weather", {"city": "SF"})], "thinking"),
    ("kimi_k2",
     "<|tool_calls_section_begin|><|tool_call_begin|>"
     "functions.get_weather:0<|tool_call_argument_begin|>"
     "{\"city\": \"SF\"}<|tool_call_end|><|tool_calls_section_end|>",
     [("get_weather", {"city": "SF"})], None),
    ("internlm",
     "I will check.<|action_start|><|plugin|>"
     "{\"name\": \"get_weather\", \"parameters\": {\"city\": \"SF\"}}"
     "<|action_end|>",
     [("get_weather", {"city": "SF"})], "I will check."),
    ("jamba",
     " <tool_calls>[{\"name\": \"f\", \"arguments\": {\"a\": 1}}]"
     "</tool_calls>",
     [("f", {"a": 1})], None),
    ("hunyuan_a13b",
     "<tool_calls>[{\"name\": \"f\", \"arguments\": {}}]</tool_calls>",
     [("f", {})], None),
    ("minimax",
     "ok\n<tool_calls>\n{\"name\": \"a\", \"arguments\": {\"x\": 2}}\n"
     "{\"name\": \"b\", \"arguments\": {}}\n</tool_calls>",
     [("a", {"x": 2}), ("b", {})], "ok"),
    ("granite",
     "<|tool_call|>[{\"name\": \"f\", \"arguments\": {\"q\": \"hi\"}}]",
     [("f", {"q": "hi"})], None),
    ("granite-20b-fc",
     "<function_call> {\"name\": \"f\", \"arguments\": {\"q\": 1}}"
     "<function_call> {\"name\": \"g\", \"arguments\": {}}",
     [("f", {"q": 1}), ("g", {})], None),
    ("phi4_mini_json",
     "functools[{\"name\": \"f\", \"arguments\": {\"u\": \"v\"}}]",
     [("f", {"u": "v"})], None),
    ("qwen3_coder",
     "<tool_call><function=get_weather><parameter=city>SF</parameter>"
     "<parameter=days>3</parameter></function></tool_call>",
     [("get_weather", {"city": "SF", "days": 3})], None),
    ("glm45",
     "<tool_call>get_weather\n<arg_key>city</arg_key>"
     "<arg_value>SF</arg_value></tool_call>",
     [("get_weather", {"city": "SF"})], None),
    ("xlam",
     "```json\n[{\"name\": \"f\", \"arguments\": {\"k\": true}}]\n```",
     [("f", {"k": True})], None),
]


@_pytest.mark.parametrize("name,text,expected,content",
                          _CASES, ids=[c[0] for c in _CASES])
def test_round2_parsers_extract(name, text, expected, content):
    out = get_tool_parser(name).extract(text)
    assert out.tools_called
    got = [(c["function"]["name"],
            _json.loads(c["function"]["arguments"]))
           for c in out.tool_calls]
    assert got == expected
    assert out.content == content


@_pytest.mark.parametrize("name", [c[0] for c in _CASES])
def test_round2_parsers_plain_text_passthrough(name):
    out = get_tool_parser(name).extract("just a normal answer")
    assert not out.tools_called
    assert out.content == "just a normal answer"
