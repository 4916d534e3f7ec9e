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
