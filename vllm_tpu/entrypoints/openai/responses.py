"""OpenAI Responses API (reference: vllm/entrypoints/openai/
serving_responses.py + api_server.py:564,599,614 — /v1/responses,
GET /v1/responses/{id}, POST /v1/responses/{id}/cancel).

Supports: string or message-list ``input``, ``instructions`` (system
message), ``previous_response_id`` conversation chaining through the
in-memory store, ``store``, ``background`` execution, SSE streaming
(response.created / response.output_text.delta / response.completed),
and cancellation of in-flight background responses."""

from __future__ import annotations

import asyncio
import time
from typing import Any, AsyncGenerator, Optional, Union

from pydantic import BaseModel, ConfigDict, Field

from vllm_tpu.entrypoints.openai.protocol import (ErrorInfo, ErrorResponse,
                                                  random_uuid)
from vllm_tpu.entrypoints.openai.serving import OpenAIServing
from vllm_tpu.sampling_params import SamplingParams


class ResponsesRequest(BaseModel):
    model_config = ConfigDict(extra="allow")

    background: bool = False
    input: Union[str, list[dict[str, Any]]] = ""
    instructions: Optional[str] = None
    max_output_tokens: Optional[int] = None
    metadata: Optional[dict[str, Any]] = None
    model: Optional[str] = None
    previous_response_id: Optional[str] = None
    store: bool = True
    stream: bool = False
    temperature: Optional[float] = None
    top_p: Optional[float] = None
    tool_choice: Union[str, dict, None] = "auto"
    tools: list[dict[str, Any]] = Field(default_factory=list)
    user: Optional[str] = None
    # vllm extensions (reference: protocol.py responses-extra-params)
    request_id: str = Field(default_factory=lambda: f"resp_{random_uuid()}")
    priority: int = 0

    def to_sampling_params(self) -> SamplingParams:
        return SamplingParams(
            temperature=1.0 if self.temperature is None else
            self.temperature,
            top_p=1.0 if self.top_p is None else self.top_p,
            max_tokens=self.max_output_tokens,
        )


class ResponseOutputText(BaseModel):
    type: str = "output_text"
    text: str = ""
    annotations: list = Field(default_factory=list)


class ResponseOutputMessage(BaseModel):
    id: str = Field(default_factory=lambda: f"msg_{random_uuid()}")
    type: str = "message"
    role: str = "assistant"
    status: str = "completed"
    content: list[ResponseOutputText] = Field(default_factory=list)


class ResponseUsage(BaseModel):
    input_tokens: int = 0
    output_tokens: int = 0
    total_tokens: int = 0


class ResponsesResponse(BaseModel):
    id: str
    object: str = "response"
    created_at: int = Field(default_factory=lambda: int(time.time()))
    status: str = "completed"  # queued|in_progress|completed|failed|
    # cancelled|incomplete
    background: bool = False
    model: str = ""
    instructions: Optional[str] = None
    previous_response_id: Optional[str] = None
    metadata: Optional[dict[str, Any]] = None
    output: list[ResponseOutputMessage] = Field(default_factory=list)
    error: Optional[dict[str, Any]] = None
    usage: Optional[ResponseUsage] = None

    @property
    def output_text(self) -> str:
        return "".join(part.text for item in self.output
                       for part in item.content)


def _error(message: str, code: int = 400,
           err_type: str = "BadRequestError") -> ErrorResponse:
    return ErrorResponse(error=ErrorInfo(message=message, type=err_type,
                                         code=code))


class _StoredResponse:
    """Book-keeping for one response (store/background/cancel)."""

    def __init__(self, response: ResponsesResponse,
                 messages: list[dict[str, Any]]) -> None:
        self.response = response
        self.messages = messages  # full conversation incl. the answer
        self.task: Optional[asyncio.Task] = None


class OpenAIServingResponses(OpenAIServing):
    """Responses API over the chat machinery. The message list for a
    chained conversation is reconstructed from the stored predecessor
    (reference: serving_responses.py _construct_input_messages)."""

    def __init__(self, engine, served_model_name: str,
                 lora_registry: Optional[dict] = None) -> None:
        super().__init__(engine, served_model_name, lora_registry)
        self._store: dict[str, _StoredResponse] = {}
        self._max_stored = 1000

    # ------------------------------------------------------------ helpers

    def _build_messages(self, request: ResponsesRequest
                        ) -> list[dict[str, Any]]:
        messages: list[dict[str, Any]] = []
        prev: list[dict[str, Any]] = []
        if request.previous_response_id:
            stored = self._store.get(request.previous_response_id)
            if stored is None:
                raise KeyError(request.previous_response_id)
            prev = list(stored.messages)
        if request.instructions:
            # new instructions REPLACE the predecessor's system message
            prev = [m for m in prev if m.get("role") != "system"]
            messages.append({
                "role": "system",
                "content": request.instructions
            })
        messages.extend(prev)
        if isinstance(request.input, str):
            messages.append({"role": "user", "content": request.input})
        else:
            for item in request.input:
                role = item.get("role", "user")
                content = item.get("content", "")
                if isinstance(content, list):
                    content = "".join(
                        p.get("text", "") for p in content
                        if isinstance(p, dict)
                        and p.get("type") in ("input_text", "output_text",
                                              "text"))
                messages.append({"role": role, "content": content})
        return messages

    def _prompt(self, messages: list[dict[str, Any]]) -> str:
        return self.engine.tokenizer.apply_chat_template(
            messages, tokenize=False, add_generation_prompt=True)

    def _remember(self, request: ResponsesRequest, stored: _StoredResponse
                  ) -> None:
        if not request.store:
            return
        if len(self._store) >= self._max_stored:
            self._store.pop(next(iter(self._store)))
        self._store[stored.response.id] = stored

    # ------------------------------------------------------------- create

    async def create_responses(
            self, request: ResponsesRequest
    ) -> Union[ResponsesResponse, ErrorResponse,
               AsyncGenerator[str, None]]:
        try:
            messages = self._build_messages(request)
        except KeyError as e:
            return _error(f"previous response not found: {e}", 404,
                          "NotFoundError")
        model = request.model or self.model_name
        response = ResponsesResponse(
            id=request.request_id, model=model, status="in_progress",
            background=request.background,
            instructions=request.instructions,
            previous_response_id=request.previous_response_id,
            metadata=request.metadata)
        stored = _StoredResponse(response, messages)
        params = request.to_sampling_params()
        prompt = self._prompt(messages)

        if request.stream:
            return self._stream(request, response, stored, prompt, params)

        if request.background:
            response.status = "queued"
            # background REQUIRES store so the result is retrievable
            self._store[response.id] = stored
            stored.task = asyncio.ensure_future(
                self._run(request, response, stored, prompt, params))
            return response.model_copy(deep=True)

        await self._run(request, response, stored, prompt, params)
        self._remember(request, stored)
        return response

    async def _run(self, request: ResponsesRequest,
                   response: ResponsesResponse, stored: _StoredResponse,
                   prompt: str, params: SamplingParams) -> None:
        response.status = "in_progress"
        try:
            final = await self._collect(
                self.engine.generate(prompt, params, response.id,
                                     lora_request=self._lora_for(
                                         request.model),
                                     priority=request.priority))
        except asyncio.CancelledError:
            response.status = "cancelled"
            return
        except Exception as e:  # noqa: BLE001
            response.status = "failed"
            response.error = {"code": "server_error", "message": str(e)}
            return
        c = final.outputs[0]
        response.output = [
            ResponseOutputMessage(
                content=[ResponseOutputText(text=c.text)])
        ]
        n_in = len(final.prompt_token_ids or [])
        response.usage = ResponseUsage(input_tokens=n_in,
                                       output_tokens=len(c.token_ids),
                                       total_tokens=n_in +
                                       len(c.token_ids))
        response.status = ("incomplete"
                           if c.finish_reason == "length" else "completed")
        stored.messages = stored.messages + [{
            "role": "assistant",
            "content": c.text
        }]

    async def _stream(self, request: ResponsesRequest,
                      response: ResponsesResponse,
                      stored: _StoredResponse, prompt: str,
                      params: SamplingParams
                      ) -> AsyncGenerator[str, None]:
        seq = 0

        def event(name: str, payload: BaseModel | dict) -> str:
            nonlocal seq
            seq += 1
            body = (payload.model_dump_json() if isinstance(
                payload, BaseModel) else __import__("json").dumps(payload))
            return f"event: {name}\ndata: {body}\n\n"

        yield event("response.created",
                    {"type": "response.created", "sequence_number": seq,
                     "response": response.model_dump()})
        text = ""
        finish_reason = None
        prompt_tokens = 0
        out_tokens = 0
        async for out in self.engine.generate(
                prompt, params, response.id,
                lora_request=self._lora_for(request.model),
                priority=request.priority):
            c = out.outputs[0]
            delta = c.text[len(text):]
            text = c.text
            finish_reason = c.finish_reason
            prompt_tokens = len(out.prompt_token_ids or [])
            out_tokens = len(c.token_ids)
            if delta:
                yield event(
                    "response.output_text.delta", {
                        "type": "response.output_text.delta",
                        "sequence_number": seq,
                        "delta": delta,
                    })
        response.output = [
            ResponseOutputMessage(content=[ResponseOutputText(text=text)])
        ]
        response.usage = ResponseUsage(
            input_tokens=prompt_tokens, output_tokens=out_tokens,
            total_tokens=prompt_tokens + out_tokens)
        response.status = ("incomplete"
                           if finish_reason == "length" else "completed")
        stored.messages = stored.messages + [{
            "role": "assistant",
            "content": text
        }]
        self._remember(request, stored)
        yield event("response.completed",
                    {"type": "response.completed", "sequence_number": seq,
                     "response": response.model_dump()})

    # ------------------------------------------------- retrieve / cancel

    async def retrieve_responses(
            self, response_id: str
    ) -> Union[ResponsesResponse, ErrorResponse]:
        stored = self._store.get(response_id)
        if stored is None:
            return _error(f"response '{response_id}' not found", 404,
                          "NotFoundError")
        return stored.response.model_copy(deep=True)

    async def cancel_responses(
            self, response_id: str
    ) -> Union[ResponsesResponse, ErrorResponse]:
        stored = self._store.get(response_id)
        if stored is None:
            return _error(f"response '{response_id}' not found", 404,
                          "NotFoundError")
        if not stored.response.background:
            return _error("only background responses can be cancelled")
        if stored.response.status in ("queued", "in_progress"):
            if stored.task is not None and not stored.task.done():
                stored.task.cancel()
                try:
                    await stored.task
                except (asyncio.CancelledError, Exception):  # noqa: BLE001
                    pass
            try:
                await self.engine.abort(response_id)
            except Exception:  # noqa: BLE001
                pass
            stored.response.status = "cancelled"
        return stored.response.model_copy(deep=True)
