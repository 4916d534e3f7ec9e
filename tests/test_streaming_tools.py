"""Streaming tool-call parsing: argument fragments must arrive DURING
the stream, not after completion (reference:
vllm/entrypoints/openai/tool_parsers/abstract_tool_parser.py:61
extract_tool_calls_streaming)."""

import json

import pytest

from vllm_tpu.entrypoints.openai.streaming_tools import \
    get_streaming_tool_parser


def drive(fmt: str, text: str, chunk: int = 3):
    """Feed `text` in `chunk`-char deltas; returns (content, calls,
    deltas_per_push) where calls[i] = {"name", "arguments"}."""
    p = get_streaming_tool_parser(fmt)
    content = []
    calls: dict[int, dict] = {}
    timeline = []  # (push_idx, kind)
    pushes = [text[i:i + chunk] for i in range(0, len(text), chunk)]
    for pi, piece in enumerate(pushes):
        d = p.push(piece)
        if d.content:
            content.append(d.content)
            timeline.append((pi, "content"))
        for tc in d.tool_calls:
            idx = tc["index"]
            c = calls.setdefault(idx, {"name": None, "arguments": ""})
            fn = tc.get("function", {})
            if fn.get("name"):
                c["name"] = fn["name"]
                timeline.append((pi, f"name{idx}"))
            if fn.get("arguments"):
                c["arguments"] += fn["arguments"]
                timeline.append((pi, f"args{idx}"))
    d = p.finish()
    if d.content:
        content.append(d.content)
        timeline.append((len(pushes), "content"))
    for tc in d.tool_calls:
        idx = tc["index"]
        c = calls.setdefault(idx, {"name": None, "arguments": ""})
        fn = tc.get("function", {})
        if fn.get("name"):
            c["name"] = fn["name"]
        if fn.get("arguments"):
            c["arguments"] += fn["arguments"]
            timeline.append((len(pushes), f"args{idx}"))
    return "".join(content), calls, timeline, len(pushes)


HERMES_TEXT = ('I will check the weather.\n<tool_call>\n{"name": '
               '"get_weather", "arguments": {"city": "Paris", "days": 3}}'
               '\n</tool_call>')


def test_hermes_streams_incrementally():
    content, calls, timeline, n = drive("hermes", HERMES_TEXT)
    assert content.strip() == "I will check the weather."
    assert calls[0]["name"] == "get_weather"
    assert json.loads(calls[0]["arguments"]) == {"city": "Paris",
                                                 "days": 3}
    # argument deltas must begin well before the final push
    first_args = min(pi for pi, k in timeline if k == "args0")
    assert first_args < n - 5, timeline


def test_hermes_two_calls():
    text = ('<tool_call>{"name": "a", "arguments": {"x": 1}}</tool_call>'
            '<tool_call>{"name": "b", "arguments": {"y": "z"}}'
            '</tool_call>')
    content, calls, timeline, _ = drive("hermes", text, chunk=2)
    assert calls[0]["name"] == "a"
    assert json.loads(calls[0]["arguments"]) == {"x": 1}
    assert calls[1]["name"] == "b"
    assert json.loads(calls[1]["arguments"]) == {"y": "z"}
    assert not content.strip()


def test_hermes_holds_back_partial_marker():
    p = get_streaming_tool_parser("hermes")
    d = p.push("hello <tool_")
    assert d.content == "hello "  # "<tool_" held back
    d = p.push("me>")  # "<tool_me>" is NOT the marker
    d2 = p.finish()
    got = (d.content or "") + (d2.content or "")
    assert got == "<tool_me>"


def test_mistral_streaming():
    text = ('[TOOL_CALLS] [{"name": "add", "arguments": {"a": 2, '
            '"b": 40}}, {"name": "neg", "arguments": {"v": -7}}]')
    content, calls, timeline, n = drive("mistral", text)
    assert calls[0]["name"] == "add"
    assert json.loads(calls[0]["arguments"]) == {"a": 2, "b": 40}
    assert calls[1]["name"] == "neg"
    assert json.loads(calls[1]["arguments"]) == {"v": -7}
    first_args = min(pi for pi, k in timeline if k == "args0")
    assert first_args < n - 3


def test_llama3_json_streaming():
    text = ('{"name": "search", "parameters": {"q": "tpu pallas", '
            '"k": 5}}')
    content, calls, timeline, n = drive("llama3_json", text)
    assert calls[0]["name"] == "search"
    assert json.loads(calls[0]["arguments"]) == {"q": "tpu pallas",
                                                 "k": 5}
    first_args = min(pi for pi, k in timeline if k == "args0")
    assert first_args < n - 3


def test_llama3_json_plain_content():
    text = "The answer is 42; nothing else."
    content, calls, _, _ = drive("llama3_json", text)
    assert not calls
    assert content == text


def test_pythonic_per_call_emission():
    text = '[get_weather(city="Paris"), sum(a=1, b=2)]'
    content, calls, timeline, n = drive("pythonic", text)
    assert calls[0]["name"] == "get_weather"
    assert json.loads(calls[0]["arguments"]) == {"city": "Paris"}
    assert calls[1]["name"] == "sum"
    assert json.loads(calls[1]["arguments"]) == {"a": 1, "b": 2}
    # first call must be emitted before the stream ends
    first = min(pi for pi, k in timeline if k.startswith("args0")
                or k.startswith("name0"))
    assert first < n


def test_fallback_buffers_until_finish():
    text = ('<|tool▁calls▁begin|>... not actually parseable ...')
    p = get_streaming_tool_parser("deepseek_v3")
    out = []
    for ch in text:
        d = p.push(ch)
        assert not d.tool_calls
        if d.content:
            out.append(d.content)
    d = p.finish()
    if d.content:
        out.append(d.content)
    assert "".join(out) == text


def test_string_valued_arguments():
    text = ('<tool_call>{"name": "run", "arguments": "{\\"cmd\\": '
            '\\"ls\\"}"}</tool_call>')
    content, calls, _, _ = drive("hermes", text, chunk=4)
    assert calls[0]["name"] == "run"
    # raw slice keeps the JSON-string encoding
    assert json.loads(calls[0]["arguments"]) == '{"cmd": "ls"}'


def test_name_after_arguments():
    text = ('<tool_call>{"arguments": {"x": 1}, "name": "late"}'
            '</tool_call>')
    content, calls, _, _ = drive("hermes", text, chunk=2)
    assert calls[0]["name"] == "late"
    assert json.loads(calls[0]["arguments"]) == {"x": 1}


def test_stream_chat_e2e_argument_deltas_before_finish():
    """Serving-level SSE: tool-call argument deltas must arrive in
    chunks BEFORE the finish chunk, and finish_reason must become
    tool_calls (reference: serving_chat.py streaming tool path)."""
    import asyncio
    from types import SimpleNamespace

    from vllm_tpu.entrypoints.openai.protocol import ChatCompletionRequest
    from vllm_tpu.entrypoints.openai.serving import OpenAIServingChat

    pieces = ['I need a tool. ', '<tool', '_call>{"na', 'me": "calc"',
              ', "argum', 'ents": {"expr"', ': "2+', '2"}}</tool_call>']

    class FakeTok:
        def apply_chat_template(self, *a, **kw):
            return "prompt"

    class FakeEngine:
        tokenizer = FakeTok()

        async def generate(self, prompt, params, request_id,
                           lora_request=None, priority=0):
            for i, t in enumerate(pieces):
                yield SimpleNamespace(outputs=[SimpleNamespace(
                    text=t,
                    finish_reason="stop" if i == len(pieces) - 1 else
                    None,
                    stop_reason=None)])

    serving = OpenAIServingChat(FakeEngine(), "m",
                                tool_call_parser="hermes")
    req = ChatCompletionRequest(
        messages=[{"role": "user", "content": "hi"}], stream=True,
        tools=[{"type": "function",
                "function": {"name": "calc", "parameters": {}}}])

    async def collect():
        gen = await serving.create_chat_completion(req)
        return [c async for c in gen]

    chunks = asyncio.run(collect())
    assert chunks[-1] == "data: [DONE]\n\n"
    parsed = [json.loads(c[5:]) for c in chunks[:-1]]
    arg_chunks = [
        i for i, p in enumerate(parsed)
        if p["choices"][0]["delta"].get("tool_calls") and any(
            tc.get("function", {}).get("arguments")
            for tc in p["choices"][0]["delta"]["tool_calls"])
    ]
    finish_idx = [i for i, p in enumerate(parsed)
                  if p["choices"][0].get("finish_reason")]
    assert arg_chunks and finish_idx
    assert len(arg_chunks) >= 2, "arguments must stream in fragments"
    assert min(arg_chunks) < finish_idx[0]
    assert parsed[finish_idx[-1]]["choices"][0][
        "finish_reason"] == "tool_calls"
    # reassemble the full call
    name = None
    args = []
    for p in parsed:
        for tc in p["choices"][0]["delta"].get("tool_calls") or []:
            fn = tc.get("function", {})
            if fn.get("name"):
                name = fn["name"]
            if fn.get("arguments"):
                args.append(fn["arguments"])
    assert name == "calc"
    assert json.loads("".join(args)) == {"expr": "2+2"}
    # content before the tool call streamed as content
    contents = "".join(p["choices"][0]["delta"].get("content") or ""
                       for p in parsed)
    assert contents.strip() == "I need a tool."


def _assert_streamed_before_finish(timeline, n, idx=0):
    args_pushes = [pi for pi, kind in timeline if kind == f"args{idx}"]
    assert args_pushes and args_pushes[0] < n, timeline


def test_internlm_streaming():
    text = ('Let me call a tool.<|action_start|><|plugin|>'
            '{"name": "search", "parameters": {"q": "tpu kernels"}}'
            '<|action_end|>')
    content, calls, timeline, n = drive("internlm", text)
    assert content.strip() == "Let me call a tool."
    assert calls[0]["name"] == "search"
    assert json.loads(calls[0]["arguments"]) == {"q": "tpu kernels"}
    _assert_streamed_before_finish(timeline, n)


def test_jamba_streaming():
    text = (' <tool_calls>[{"name": "a", "arguments": {"x": 1}}, '
            '{"name": "b", "arguments": {"y": "z"}}]</tool_calls>')
    content, calls, timeline, n = drive("jamba", text)
    assert calls[0]["name"] == "a"
    assert json.loads(calls[0]["arguments"]) == {"x": 1}
    assert calls[1]["name"] == "b"
    assert json.loads(calls[1]["arguments"]) == {"y": "z"}
    _assert_streamed_before_finish(timeline, n)


def test_granite_streaming():
    text = ('<|tool_call|>[{"name": "lookup", "arguments": '
            '{"key": "value", "n": 7}}]')
    content, calls, timeline, n = drive("granite", text)
    assert calls[0]["name"] == "lookup"
    assert json.loads(calls[0]["arguments"]) == {"key": "value", "n": 7}
    _assert_streamed_before_finish(timeline, n)


def test_deepseek_v3_streaming():
    text = ("I'll check.<｜tool▁calls▁begin｜><｜tool▁call▁begin｜>"
            "function<｜tool▁sep｜>get_weather\n```json\n"
            '{"city": "Paris", "days": 3}\n```<｜tool▁call▁end｜>'
            "<｜tool▁calls▁end｜>")
    content, calls, timeline, n = drive("deepseek_v3", text)
    assert content.strip() == "I'll check."
    assert calls[0]["name"] == "get_weather"
    assert json.loads(calls[0]["arguments"]) == {"city": "Paris",
                                                 "days": 3}
    _assert_streamed_before_finish(timeline, n)


def test_kimi_k2_streaming():
    text = ("<|tool_calls_section_begin|><|tool_call_begin|>"
            "functions.get_time:0<|tool_call_argument_begin|>"
            '{"tz": "UTC"}<|tool_call_end|>'
            "<|tool_call_begin|>functions.add:1"
            '<|tool_call_argument_begin|>{"a": 1, "b": 2}'
            "<|tool_call_end|><|tool_calls_section_end|>")
    content, calls, timeline, n = drive("kimi_k2", text)
    assert calls[0]["name"] == "get_time"
    assert json.loads(calls[0]["arguments"]) == {"tz": "UTC"}
    assert calls[1]["name"] == "add"
    assert json.loads(calls[1]["arguments"]) == {"a": 1, "b": 2}
    _assert_streamed_before_finish(timeline, n)
    _assert_streamed_before_finish(timeline, n, idx=1)
