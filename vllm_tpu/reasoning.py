"""Reasoning-content extraction (reference behavior parity:
vllm/reasoning/ — deepseek_r1 / qwen3 <think> parsers; splits a
completion into reasoning_content + content)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional


@dataclass
class ExtractedReasoning:
    reasoning_content: Optional[str]
    content: Optional[str]


class ReasoningParser:
    name = "base"

    def extract(self, text: str) -> ExtractedReasoning:
        return ExtractedReasoning(None, text)


class ThinkTagReasoningParser(ReasoningParser):
    """<think>...</think> prefix (DeepSeek-R1, Qwen3, GLM-4.5).
    R1 convention: the opening tag may be absent because the template
    already emitted it — everything before </think> is reasoning."""

    name = "deepseek_r1"
    start = "<think>"
    end = "</think>"

    def extract(self, text: str) -> ExtractedReasoning:
        if self.end not in text:
            if text.lstrip().startswith(self.start):
                # unterminated reasoning (hit max_tokens mid-thought)
                body = text.lstrip()[len(self.start):]
                return ExtractedReasoning(body.strip() or None, None)
            return ExtractedReasoning(None, text)
        head, _, tail = text.partition(self.end)
        if head.lstrip().startswith(self.start):
            head = head.lstrip()[len(self.start):]
        return ExtractedReasoning(head.strip() or None,
                                  tail.lstrip("\n") or None)


_PARSERS = {
    "deepseek_r1": ThinkTagReasoningParser,
    "qwen3": ThinkTagReasoningParser,
    "glm45": ThinkTagReasoningParser,
}


def get_reasoning_parser(name: str) -> ReasoningParser:
    if name not in _PARSERS:
        raise ValueError(f"unknown reasoning parser {name!r}; "
                         f"available: {sorted(_PARSERS)}")
    return _PARSERS[name]()


def list_reasoning_parsers() -> list[str]:
    return sorted(_PARSERS)
