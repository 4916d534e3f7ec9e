"""OpenAI serving handlers (reference: vllm/entrypoints/openai/serving_chat.py,
serving_completion.py — behavior parity, aiohttp-native implementation)."""

from __future__ import annotations

import asyncio
import json
import time
from typing import Any, AsyncGenerator, Optional, Union

from vllm_tpu.engine.async_llm import AsyncLLM
from vllm_tpu.entrypoints.openai.protocol import (
    ChatCompletionChunk, ChatCompletionChunkChoice, ChatCompletionRequest,
    ChatCompletionResponse, ChatCompletionChoice, ChatMessage,
    CompletionChoice, CompletionLogProbs, CompletionRequest,
    CompletionResponse, DeltaMessage, UsageInfo, random_uuid)
from vllm_tpu.outputs import RequestOutput
from vllm_tpu.sampling_params import SamplingParams


class OpenAIServing:

    def __init__(self, engine: AsyncLLM, served_model_name: str,
                 lora_registry: Optional[dict] = None) -> None:
        self.engine = engine
        self.model_name = served_model_name
        # adapter name -> LoRARequest; shared across handlers so runtime
        # load/unload is visible everywhere (reference:
        # api_server.py:1193-1205 load/unload_lora_adapter)
        self.lora_registry = lora_registry if lora_registry is not None \
            else {}

    def _lora_for(self, model_name: Optional[str]):
        if model_name and model_name in self.lora_registry:
            return self.lora_registry[model_name]
        return None

    def _default_max_tokens(self) -> Optional[int]:
        return None  # processor caps to context window

    async def _collect(self, gen) -> RequestOutput:
        final = None
        async for out in gen:
            final = out
        return final

    def _make_logprobs(self, logprobs_list, tokenizer
                       ) -> Optional[CompletionLogProbs]:
        if logprobs_list is None:
            return None
        out = CompletionLogProbs()
        for pos in logprobs_list:
            if not pos:
                continue
            best = max(pos.items(), key=lambda kv: kv[1].logprob)
            out.tokens.append(best[1].decoded_token or "")
            out.token_logprobs.append(best[1].logprob)
            out.top_logprobs.append({
                (lp.decoded_token or str(tid)): lp.logprob
                for tid, lp in pos.items()
            })
            out.text_offset.append(0)
        return out


class OpenAIServingCompletion(OpenAIServing):

    async def create_completion(self, request: CompletionRequest
                                ) -> Union[CompletionResponse,
                                           AsyncGenerator[str, None]]:
        prompts = request.prompt
        if isinstance(prompts, str):
            prompts = [prompts]
        elif prompts and isinstance(prompts[0], int):
            prompts = [prompts]

        params = request.to_sampling_params(self._default_max_tokens())
        request_id = f"cmpl-{random_uuid()}"

        gens = []
        for i, prompt in enumerate(prompts):
            for j in range(request.n):
                p = prompt if isinstance(prompt, str) else {
                    "prompt_token_ids": prompt
                }
                child = params if request.n == 1 else params.clone()
                if request.n > 1 and child.seed is not None:
                    child.seed += j
                gens.append(
                    ((i * request.n + j),
                     self.engine.generate(
                         p, child, f"{request_id}-{i}-{j}",
                         lora_request=self._lora_for(request.model),
                         priority=request.priority)))

        if request.stream:
            return self._stream_completion(request, request_id, gens)

        tokenizer = self.engine.tokenizer
        choices = []
        usage = UsageInfo()
        results = await asyncio.gather(*[self._collect(g) for _, g in gens])
        for (idx, _), out in zip(gens, results):
            c = out.outputs[0]
            text = c.text
            if request.echo:
                text = (out.prompt or "") + text
            choices.append(
                CompletionChoice(
                    index=idx,
                    text=text,
                    logprobs=self._make_logprobs(c.logprobs, tokenizer),
                    finish_reason=c.finish_reason,
                    stop_reason=c.stop_reason,
                ))
            usage.prompt_tokens += len(out.prompt_token_ids or [])
            usage.completion_tokens += len(c.token_ids)
        usage.total_tokens = usage.prompt_tokens + usage.completion_tokens
        return CompletionResponse(id=request_id,
                                  model=request.model or self.model_name,
                                  choices=choices, usage=usage)

    async def _stream_completion(self, request: CompletionRequest,
                                 request_id: str,
                                 gens) -> AsyncGenerator[str, None]:
        model = request.model or self.model_name

        async def stream_one(idx, gen):
            async for out in gen:
                c = out.outputs[0]
                chunk = CompletionResponse(
                    id=request_id,
                    model=model,
                    choices=[
                        CompletionChoice(index=idx, text=c.text,
                                         finish_reason=c.finish_reason,
                                         stop_reason=c.stop_reason)
                    ])
                yield f"data: {chunk.model_dump_json()}\n\n"

        for idx, gen in gens:
            async for chunk in stream_one(idx, gen):
                yield chunk
        yield "data: [DONE]\n\n"


class OpenAIServingChat(OpenAIServing):

    def __init__(self, engine: AsyncLLM, served_model_name: str,
                 lora_registry: Optional[dict] = None,
                 tool_call_parser: Optional[str] = None,
                 reasoning_parser: Optional[str] = None) -> None:
        super().__init__(engine, served_model_name, lora_registry)
        self.tool_parser = None
        if tool_call_parser:
            from vllm_tpu.entrypoints.openai.tool_parsers import \
                get_tool_parser

            self.tool_parser = get_tool_parser(tool_call_parser)
        self.reasoning_parser = None
        if reasoning_parser:
            from vllm_tpu.reasoning import get_reasoning_parser

            self.reasoning_parser = get_reasoning_parser(reasoning_parser)

    def _postprocess_message(self, request: ChatCompletionRequest,
                             text: str,
                             finish_reason) -> tuple[ChatMessage, Any]:
        """Apply reasoning extraction + tool-call parsing
        (reference: serving_chat.py full-generation path)."""
        reasoning = None
        if self.reasoning_parser is not None:
            r = self.reasoning_parser.extract(text)
            reasoning, text = r.reasoning_content, r.content or ""
        tool_calls = None
        if (self.tool_parser is not None and request.tools
                and request.tool_choice != "none"):
            extracted = self.tool_parser.extract(text)
            if extracted.tools_called:
                tool_calls = extracted.tool_calls
                text = extracted.content
                finish_reason = "tool_calls"
        return ChatMessage(role="assistant", content=text,
                           tool_calls=tool_calls,
                           reasoning_content=reasoning), finish_reason

    def _render(self, request: ChatCompletionRequest) -> str:
        tokenizer = self.engine.tokenizer
        return tokenizer.apply_chat_template(
            request.messages,
            tokenize=False,
            add_generation_prompt=request.add_generation_prompt,
            chat_template=request.chat_template,
            tools=request.tools,
        )

    async def create_chat_completion(
            self, request: ChatCompletionRequest
    ) -> Union[ChatCompletionResponse, AsyncGenerator[str, None]]:
        prompt = self._render(request)
        params = request.to_sampling_params(self._default_max_tokens())
        request_id = f"chatcmpl-{random_uuid()}"

        if request.stream:
            return self._stream_chat(request, request_id, prompt, params)

        gens = []
        for j in range(request.n):
            child = params if request.n == 1 else params.clone()
            if request.n > 1 and child.seed is not None:
                child.seed += j
            gens.append(
                self.engine.generate(
                    prompt, child, f"{request_id}-{j}",
                    lora_request=self._lora_for(request.model),
                    priority=request.priority))
        results = await asyncio.gather(*[self._collect(g) for g in gens])
        choices = []
        usage = UsageInfo()
        for j, out in enumerate(results):
            c = out.outputs[0]
            message, finish_reason = self._postprocess_message(
                request, c.text, c.finish_reason)
            choices.append(
                ChatCompletionChoice(
                    index=j,
                    message=message,
                    finish_reason=finish_reason,
                    stop_reason=c.stop_reason,
                ))
            usage.prompt_tokens = len(out.prompt_token_ids or [])
            usage.completion_tokens += len(c.token_ids)
        usage.total_tokens = usage.prompt_tokens + usage.completion_tokens
        return ChatCompletionResponse(id=request_id,
                                      model=request.model or
                                      self.model_name,
                                      choices=choices, usage=usage)

    async def _stream_chat(self, request: ChatCompletionRequest,
                           request_id: str, prompt: str,
                           params: SamplingParams
                           ) -> AsyncGenerator[str, None]:
        """SSE chat stream with INCREMENTAL reasoning + tool-call deltas
        (reference: serving_chat.py chat_completion_stream_generator +
        abstract_tool_parser.py:61 extract_tool_calls_streaming)."""
        model = request.model or self.model_name
        first = ChatCompletionChunk(
            id=request_id, model=model,
            choices=[
                ChatCompletionChunkChoice(index=0,
                                          delta=DeltaMessage(
                                              role="assistant", content=""))
            ])
        yield f"data: {first.model_dump_json()}\n\n"

        tool_stream = None
        if (self.tool_parser is not None and request.tools
                and request.tool_choice != "none"):
            from vllm_tpu.entrypoints.openai.streaming_tools import \
                get_streaming_tool_parser

            tool_stream = get_streaming_tool_parser(self.tool_parser.name)
        reason_stream = None
        if self.reasoning_parser is not None:
            from vllm_tpu.reasoning import StreamingReasoningSplitter

            reason_stream = StreamingReasoningSplitter(
                self.reasoning_parser)

        def chunk_json(content=None, reasoning=None, tool_calls=None,
                       finish_reason=None, stop_reason=None) -> str:
            chunk = ChatCompletionChunk(
                id=request_id, model=model,
                choices=[
                    ChatCompletionChunkChoice(
                        index=0,
                        delta=DeltaMessage(
                            content=content or None,
                            reasoning_content=reasoning or None,
                            tool_calls=tool_calls or None),
                        finish_reason=finish_reason,
                        stop_reason=stop_reason)
                ])
            return f"data: {chunk.model_dump_json()}\n\n"

        finish_reason = None
        stop_reason = None
        async for out in self.engine.generate(
                prompt, params, request_id,
                lora_request=self._lora_for(request.model),
                priority=request.priority):
            c = out.outputs[0]
            text = c.text
            reasoning = None
            if reason_stream is not None:
                reasoning, text = reason_stream.push(text)
            if tool_stream is not None:
                d = tool_stream.push(text) if text else None
                content, tool_calls = ((d.content, d.tool_calls)
                                       if d is not None else (None, None))
            else:
                content, tool_calls = text, None
            if c.finish_reason:
                finish_reason, stop_reason = c.finish_reason, c.stop_reason
            if content or reasoning or tool_calls:
                yield chunk_json(content, reasoning, tool_calls)

        # flush held-back text / buffered formats, then the finish chunk
        tail_reason = tail_content = ""
        if reason_stream is not None:
            tail_reason, tail_content = reason_stream.finish()
        tail_calls = None
        if tool_stream is not None:
            if tail_content:
                d = tool_stream.push(tail_content)
                if d.content or d.tool_calls:
                    yield chunk_json(d.content, tail_reason or None,
                                     d.tool_calls)
                    tail_reason = ""
            d = tool_stream.finish()
            tail_content, tail_calls = d.content, d.tool_calls
            if tool_stream.tools_called:
                finish_reason = "tool_calls"
        if tail_reason or tail_content or tail_calls:
            yield chunk_json(tail_content, tail_reason, tail_calls)
        yield chunk_json(finish_reason=finish_reason,
                         stop_reason=stop_reason)
        yield "data: [DONE]\n\n"
