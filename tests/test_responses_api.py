"""Responses API unit tests over a stub engine (reference analog:
tests for vllm/entrypoints/openai/serving_responses.py)."""

import asyncio

import pytest

from vllm_tpu.entrypoints.openai.protocol import ErrorResponse
from vllm_tpu.entrypoints.openai.responses import (OpenAIServingResponses,
                                                   ResponsesRequest,
                                                   ResponsesResponse)


class _Out:

    def __init__(self, text, finish="stop"):
        self.text = text
        self.finish_reason = finish
        self.token_ids = list(range(len(text.split())))
        self.stop_reason = None


class _Final:

    def __init__(self, text):
        self.outputs = [_Out(text)]
        self.prompt_token_ids = [1, 2, 3]


class _Tok:

    def apply_chat_template(self, messages, tokenize=False,
                            add_generation_prompt=True):
        return "|".join(f"{m['role']}:{m['content']}" for m in messages)


class _StubEngine:

    def __init__(self, reply="hello world", delay=0.0):
        self.tokenizer = _Tok()
        self.reply = reply
        self.delay = delay
        self.prompts = []
        self.aborted = []

    async def generate(self, prompt, params, request_id, **kw):
        self.prompts.append(prompt)
        if self.delay:
            await asyncio.sleep(self.delay)
        yield _Final(self.reply)

    async def abort(self, request_id):
        self.aborted.append(request_id)


def _run(coro):
    return asyncio.new_event_loop().run_until_complete(coro)


def test_basic_response():
    h = OpenAIServingResponses(_StubEngine(), "m")
    resp = _run(h.create_responses(
        ResponsesRequest(input="hi", instructions="be nice")))
    assert isinstance(resp, ResponsesResponse)
    assert resp.status == "completed"
    assert resp.output[0].content[0].text == "hello world"
    assert resp.usage.input_tokens == 3
    assert "system:be nice|user:hi" in h.engine.prompts[0]


def test_previous_response_chaining():
    eng = _StubEngine()
    h = OpenAIServingResponses(eng, "m")
    r1 = _run(h.create_responses(ResponsesRequest(input="first")))
    r2 = _run(h.create_responses(
        ResponsesRequest(input="second", previous_response_id=r1.id)))
    assert r2.status == "completed"
    # second prompt contains the whole first turn
    assert eng.prompts[1] == (
        "user:first|assistant:hello world|user:second")


def test_previous_response_missing_404():
    h = OpenAIServingResponses(_StubEngine(), "m")
    err = _run(h.create_responses(
        ResponsesRequest(input="x", previous_response_id="resp_nope")))
    assert isinstance(err, ErrorResponse)
    assert err.error.code == 404


def test_store_false_not_retrievable():
    h = OpenAIServingResponses(_StubEngine(), "m")
    r = _run(h.create_responses(ResponsesRequest(input="x", store=False)))
    got = _run(h.retrieve_responses(r.id))
    assert isinstance(got, ErrorResponse)


def test_background_and_retrieve():

    async def go():
        h = OpenAIServingResponses(_StubEngine(delay=0.01), "m")
        r = await h.create_responses(
            ResponsesRequest(input="x", background=True))
        assert r.status in ("queued", "in_progress")
        for _ in range(100):
            await asyncio.sleep(0.01)
            got = await h.retrieve_responses(r.id)
            if got.status == "completed":
                break
        assert got.status == "completed"
        assert got.output[0].content[0].text == "hello world"

    _run(go())


def test_background_cancel():

    async def go():
        eng = _StubEngine(delay=5.0)
        h = OpenAIServingResponses(eng, "m")
        r = await h.create_responses(
            ResponsesRequest(input="x", background=True))
        await asyncio.sleep(0.01)
        got = await h.cancel_responses(r.id)
        assert got.status == "cancelled"
        assert eng.aborted == [r.id]

    _run(go())


def test_cancel_non_background_rejected():
    h = OpenAIServingResponses(_StubEngine(), "m")
    r = _run(h.create_responses(ResponsesRequest(input="x")))
    err = _run(h.cancel_responses(r.id))
    assert isinstance(err, ErrorResponse)


def test_streaming_events():

    async def go():
        h = OpenAIServingResponses(_StubEngine(), "m")
        gen = await h.create_responses(
            ResponsesRequest(input="x", stream=True))
        events = []
        async for ev in gen:
            events.append(ev)
        names = [e.split("\n")[0] for e in events]
        assert names[0] == "event: response.created"
        assert "event: response.output_text.delta" in names
        assert names[-1] == "event: response.completed"
        assert '"hello world"' in events[1]  # the delta payload

    _run(go())


def test_instructions_replace_previous_system():
    eng = _StubEngine()
    h = OpenAIServingResponses(eng, "m")
    r1 = _run(h.create_responses(
        ResponsesRequest(input="a", instructions="old sys")))
    _run(h.create_responses(
        ResponsesRequest(input="b", previous_response_id=r1.id,
                         instructions="new sys")))
    assert eng.prompts[1].startswith("system:new sys|")
    assert "old sys" not in eng.prompts[1]
