"""OpenAI-compatible API schema (reference: vllm/entrypoints/openai/protocol.py).

Pydantic v2 models for the subset of the OpenAI API the server exposes,
plus the reference's extensions (guided decoding, priority, ...).
"""

from __future__ import annotations

import time
import uuid
from typing import Any, Literal, Optional, Union

from pydantic import BaseModel, ConfigDict, Field

from vllm_tpu.sampling_params import RequestOutputKind, SamplingParams


def random_uuid() -> str:
    return uuid.uuid4().hex


class ErrorInfo(BaseModel):
    message: str
    type: str
    param: Optional[str] = None
    code: Optional[int] = None


class ErrorResponse(BaseModel):
    error: ErrorInfo


class ModelCard(BaseModel):
    id: str
    object: str = "model"
    created: int = Field(default_factory=lambda: int(time.time()))
    owned_by: str = "vllm-tpu"
    max_model_len: Optional[int] = None
    root: Optional[str] = None
    parent: Optional[str] = None


class ModelList(BaseModel):
    object: str = "list"
    data: list[ModelCard] = Field(default_factory=list)


class UsageInfo(BaseModel):
    prompt_tokens: int = 0
    completion_tokens: int = 0
    total_tokens: int = 0


class _SamplingMixin(BaseModel):
    model_config = ConfigDict(extra="allow")

    model: Optional[str] = None
    frequency_penalty: float = 0.0
    presence_penalty: float = 0.0
    repetition_penalty: float = 1.0
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = 0
    min_p: float = 0.0
    seed: Optional[int] = None
    stop: Union[None, str, list[str]] = None
    stop_token_ids: Optional[list[int]] = None
    max_tokens: Optional[int] = None
    min_tokens: int = 0
    n: int = 1
    logit_bias: Optional[dict[str, float]] = None
    ignore_eos: bool = False
    skip_special_tokens: bool = True
    stream: bool = False
    stream_options: Optional[dict] = None
    priority: int = 0
    # guided decoding extensions
    guided_json: Optional[Union[str, dict]] = None
    guided_regex: Optional[str] = None
    guided_choice: Optional[list[str]] = None
    guided_grammar: Optional[str] = None
    response_format: Optional[dict] = None

    def _base_sampling_params(self, default_max_tokens: Optional[int],
                              logprobs: Optional[int],
                              stream: bool) -> SamplingParams:
        lb = None
        if self.logit_bias:
            lb = {int(k): float(v) for k, v in self.logit_bias.items()}
        guided_json = self.guided_json
        if (self.response_format
                and self.response_format.get("type") == "json_schema"):
            guided_json = self.response_format["json_schema"].get("schema")
        return SamplingParams(
            n=1,  # fan-out handled at the serving layer
            presence_penalty=self.presence_penalty,
            frequency_penalty=self.frequency_penalty,
            repetition_penalty=self.repetition_penalty,
            temperature=self.temperature,
            top_p=self.top_p,
            top_k=self.top_k,
            min_p=self.min_p,
            seed=self.seed,
            stop=self.stop,
            stop_token_ids=self.stop_token_ids,
            max_tokens=self.max_tokens or default_max_tokens,
            min_tokens=self.min_tokens,
            logprobs=logprobs,
            ignore_eos=self.ignore_eos,
            skip_special_tokens=self.skip_special_tokens,
            logit_bias=lb,
            guided_json=guided_json,
            guided_regex=self.guided_regex,
            guided_choice=self.guided_choice,
            guided_grammar=self.guided_grammar,
            output_kind=(RequestOutputKind.DELTA
                         if stream else RequestOutputKind.CUMULATIVE),
        )


class CompletionRequest(_SamplingMixin):
    prompt: Union[str, list[str], list[int], list[list[int]]] = ""
    echo: bool = False
    logprobs: Optional[int] = None
    best_of: Optional[int] = None
    user: Optional[str] = None

    def to_sampling_params(self,
                           default_max_tokens: Optional[int]
                           ) -> SamplingParams:
        if self.max_tokens is None and default_max_tokens is None:
            default_max_tokens = 16  # OpenAI completions default
        return self._base_sampling_params(
            self.max_tokens or default_max_tokens or 16, self.logprobs,
            self.stream)


class ChatCompletionRequest(_SamplingMixin):
    messages: list[dict[str, Any]] = Field(default_factory=list)
    max_completion_tokens: Optional[int] = None
    logprobs: bool = False
    top_logprobs: Optional[int] = None
    tools: Optional[list[dict]] = None
    tool_choice: Optional[Union[str, dict]] = None
    chat_template: Optional[str] = None
    add_generation_prompt: bool = True
    user: Optional[str] = None

    def to_sampling_params(self,
                           default_max_tokens: Optional[int]
                           ) -> SamplingParams:
        logprobs = None
        if self.logprobs:
            logprobs = self.top_logprobs or 1
        max_tokens = (self.max_completion_tokens or self.max_tokens
                      or default_max_tokens)
        params = self._base_sampling_params(max_tokens, logprobs,
                                            self.stream)
        return params


class CompletionLogProbs(BaseModel):
    text_offset: list[int] = Field(default_factory=list)
    token_logprobs: list[Optional[float]] = Field(default_factory=list)
    tokens: list[str] = Field(default_factory=list)
    top_logprobs: list[Optional[dict[str, float]]] = Field(
        default_factory=list)


class CompletionChoice(BaseModel):
    index: int
    text: str
    logprobs: Optional[CompletionLogProbs] = None
    finish_reason: Optional[str] = None
    stop_reason: Optional[Union[int, str]] = None


class CompletionResponse(BaseModel):
    id: str = Field(default_factory=lambda: f"cmpl-{random_uuid()}")
    object: str = "text_completion"
    created: int = Field(default_factory=lambda: int(time.time()))
    model: str = ""
    choices: list[CompletionChoice] = Field(default_factory=list)
    usage: UsageInfo = Field(default_factory=UsageInfo)


class ChatMessage(BaseModel):
    role: str = "assistant"
    content: Optional[str] = None
    tool_calls: Optional[list[dict]] = None
    reasoning_content: Optional[str] = None


class ChatCompletionChoice(BaseModel):
    index: int
    message: ChatMessage
    logprobs: Optional[dict] = None
    finish_reason: Optional[str] = None
    stop_reason: Optional[Union[int, str]] = None


class ChatCompletionResponse(BaseModel):
    id: str = Field(default_factory=lambda: f"chatcmpl-{random_uuid()}")
    object: str = "chat.completion"
    created: int = Field(default_factory=lambda: int(time.time()))
    model: str = ""
    choices: list[ChatCompletionChoice] = Field(default_factory=list)
    usage: UsageInfo = Field(default_factory=UsageInfo)


class DeltaMessage(BaseModel):
    role: Optional[str] = None
    content: Optional[str] = None
    reasoning_content: Optional[str] = None
    # incremental tool-call fragments: [{"index", "id"?, "type"?,
    # "function": {"name"?, "arguments" fragment}}]
    tool_calls: Optional[list[dict]] = None


class ChatCompletionChunkChoice(BaseModel):
    index: int
    delta: DeltaMessage
    logprobs: Optional[dict] = None
    finish_reason: Optional[str] = None


class ChatCompletionChunk(BaseModel):
    id: str = Field(default_factory=lambda: f"chatcmpl-{random_uuid()}")
    object: str = "chat.completion.chunk"
    created: int = Field(default_factory=lambda: int(time.time()))
    model: str = ""
    choices: list[ChatCompletionChunkChoice] = Field(default_factory=list)
    usage: Optional[UsageInfo] = None


class TokenizeRequest(BaseModel):
    model: Optional[str] = None
    prompt: Optional[str] = None
    messages: Optional[list[dict]] = None
    add_special_tokens: bool = True


class TokenizeResponse(BaseModel):
    count: int
    max_model_len: int
    tokens: list[int]


class DetokenizeRequest(BaseModel):
    model: Optional[str] = None
    tokens: list[int] = Field(default_factory=list)


class DetokenizeResponse(BaseModel):
    prompt: str


class ScoreRequest(BaseModel):
    """Cross-encoder scoring (reference: protocol.py ScoreRequest)."""
    model: Optional[str] = None
    text_1: Union[str, list[str]] = ""
    text_2: Union[str, list[str]] = ""


class RerankRequest(BaseModel):
    """Document reranking (reference: protocol.py RerankRequest)."""
    model: Optional[str] = None
    query: str = ""
    documents: list[str] = []
    top_n: Optional[int] = None


class PoolingRequest(BaseModel):
    """Raw pooled hidden states (reference: protocol.py PoolingRequest —
    the /pooling route returns un-normalized vectors)."""
    model: Optional[str] = None
    input: Union[str, list[str], list[int], list[list[int]]] = ""
    encoding_format: str = "float"
    dimensions: Optional[int] = None
    task: str = "embed"


class ClassificationRequest(BaseModel):
    """Sequence classification (reference: protocol.py
    ClassificationRequest)."""
    model: Optional[str] = None
    input: Union[str, list[str]] = ""


class EmbeddingRequest(BaseModel):
    model: Optional[str] = None
    input: Union[str, list[str], list[int], list[list[int]]] = ""
    encoding_format: str = "float"
    dimensions: Optional[int] = None
