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


class StreamingReasoningSplitter:
    """Splits an SSE delta stream into (reasoning_delta, content_delta)
    pairs as tokens arrive (reference:
    vllm/reasoning/deepseek_r1_reasoning_parser.py streaming path —
    everything before the end tag is reasoning; the opening tag is
    optional because the chat template may have emitted it)."""

    def __init__(self, parser: ReasoningParser):
        self.start = getattr(parser, "start", "<think>")
        self.end = getattr(parser, "end", "</think>")
        # qwen3 semantics: no opening tag means NO reasoning block at
        # all (enable_thinking=False); R1's template pre-emits the tag
        self.require_start = getattr(parser, "require_start", False)
        self._buf = ""
        self._mode = "head"  # head -> reasoning -> content

    def _held(self, marker: str) -> int:
        for k in range(min(len(marker) - 1, len(self._buf)), 0, -1):
            if self._buf.endswith(marker[:k]):
                return k
        return 0

    def push(self, delta: str) -> tuple[str, str]:
        self._buf += delta
        reasoning, content = [], []
        if self._mode == "head":
            s = self._buf.lstrip()
            if s.startswith(self.start):
                ws = len(self._buf) - len(s)
                self._buf = self._buf[ws + len(self.start):]
                self._mode = "reasoning"
            elif not s or self.start.startswith(s[:len(self.start)]) \
                    and len(s) < len(self.start):
                return "", ""  # could still become the opening tag
            else:
                self._mode = "content" if self.require_start \
                    else "reasoning"
        if self._mode == "reasoning":
            pos = self._buf.find(self.end)
            if pos >= 0:
                reasoning.append(self._buf[:pos])
                self._buf = self._buf[pos + len(self.end):].lstrip("\n")
                self._mode = "content"
            else:
                keep = self._held(self.end)
                reasoning.append(self._buf[:len(self._buf) - keep])
                self._buf = self._buf[len(self._buf) - keep:]
        if self._mode == "content":
            content.append(self._buf)
            self._buf = ""
        return "".join(reasoning), "".join(content)

    def finish(self) -> tuple[str, str]:
        buf, self._buf = self._buf, ""
        if self._mode == "content":
            return "", buf
        return buf, ""  # unterminated thought: stays reasoning


class Qwen3ReasoningParser(ThinkTagReasoningParser):
    """Qwen3 semantics (reference qwen3_reasoning_parser.py): BOTH tags
    must be present — with enable_thinking=False the model emits no
    <think> block and the whole completion is content (unlike R1, whose
    template pre-emits the opening tag so it may be absent)."""

    name = "qwen3"
    require_start = True

    def extract(self, text: str) -> ExtractedReasoning:
        if self.start not in text or self.end not in text:
            return ExtractedReasoning(None, text)
        head, _, tail = text.partition(self.end)
        _, _, body = head.partition(self.start)
        return ExtractedReasoning(body.strip() or None,
                                  tail.lstrip("\n") or None)


class GraniteReasoningParser(ReasoningParser):
    """IBM Granite textual markers (reference
    granite_reasoning_parser.py): "Here is my thought process:" ...
    "Here is my response:" (both also appear as "Here's ...")."""

    name = "granite"
    _THOUGHT = ("Here is my thought process:", "Here's my thought process:")
    _RESPONSE = ("Here is my response:", "Here's my response:")

    def extract(self, text: str) -> ExtractedReasoning:
        start = end = None
        for m in self._THOUGHT:
            i = text.find(m)
            if i >= 0:
                start = (i, i + len(m))
                break
        if start is None:
            return ExtractedReasoning(None, text)
        for m in self._RESPONSE:
            i = text.find(m, start[1])
            if i >= 0:
                end = (i, i + len(m))
                break
        if end is None:
            return ExtractedReasoning(text[start[1]:].strip() or None,
                                      None)
        return ExtractedReasoning(text[start[1]:end[0]].strip() or None,
                                  text[end[1]:].lstrip() or None)


class HunyuanA13BReasoningParser(ReasoningParser):
    """Hunyuan-A13B (reference hunyuan_a13b_reasoning_parser.py):
    "<think>...\\n</think>\\n<answer>...</answer>" — the answer rides its
    own tag pair; reasoning precedes "</think>"."""

    name = "hunyuan_a13b"

    def extract(self, text: str) -> ExtractedReasoning:
        head, sep, tail = text.partition("</think>")
        if not sep:
            return ExtractedReasoning(None, text)
        _, _, reasoning = head.partition("<think>")
        answer = tail
        a_head, a_sep, a_tail = tail.partition("<answer>")
        if a_sep:
            answer = a_tail.partition("</answer>")[0]
        return ExtractedReasoning(reasoning.strip() or None,
                                  answer.strip() or None)


_PARSERS = {
    "deepseek_r1": ThinkTagReasoningParser,
    "qwen3": Qwen3ReasoningParser,
    "glm45": ThinkTagReasoningParser,
    "granite": GraniteReasoningParser,
    "hunyuan_a13b": HunyuanA13BReasoningParser,
}


def get_reasoning_parser(name: str) -> ReasoningParser:
    if name not in _PARSERS:
        raise ValueError(f"unknown reasoning parser {name!r}; "
                         f"available: {sorted(_PARSERS)}")
    return _PARSERS[name]()


def list_reasoning_parsers() -> list[str]:
    return sorted(_PARSERS)
