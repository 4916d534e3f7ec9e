"""Tool-call parsers: extract structured tool invocations from generated
text (reference behavior parity: vllm/entrypoints/openai/tool_parsers/ —
hermes, llama3_json, mistral variants; registry-dispatch like
ToolParserManager)."""

from __future__ import annotations

import json
import re
import uuid
from dataclasses import dataclass, field
from typing import Callable, Optional


@dataclass
class ExtractedToolCalls:
    tools_called: bool
    tool_calls: list[dict] = field(default_factory=list)
    content: Optional[str] = None  # text outside the tool-call markup


def _mk_call(name: str, arguments) -> dict:
    if not isinstance(arguments, str):
        arguments = json.dumps(arguments, ensure_ascii=False)
    return {
        "id": f"chatcmpl-tool-{uuid.uuid4().hex}",
        "type": "function",
        "function": {"name": name, "arguments": arguments},
    }


class ToolParser:
    name = "base"

    def extract(self, text: str) -> ExtractedToolCalls:
        return ExtractedToolCalls(False, content=text)


class HermesToolParser(ToolParser):
    """<tool_call>{"name": ..., "arguments": ...}</tool_call> blocks
    (Hermes / Qwen2.5; reference: tool_parsers/hermes_tool_parser.py)."""

    name = "hermes"
    _RE = re.compile(r"<tool_call>\s*(.*?)\s*</tool_call>", re.DOTALL)

    def extract(self, text: str) -> ExtractedToolCalls:
        calls = []
        for m in self._RE.finditer(text):
            try:
                obj = json.loads(m.group(1))
            except json.JSONDecodeError:
                continue
            calls.append(_mk_call(obj.get("name", ""),
                                  obj.get("arguments", {})))
        if not calls:
            return ExtractedToolCalls(False, content=text)
        content = self._RE.sub("", text).strip() or None
        return ExtractedToolCalls(True, calls, content)


class Llama3JsonToolParser(ToolParser):
    """Bare JSON `{"name": ..., "parameters": ...}` (optionally after
    <|python_tag|>, ';'-separated) — reference:
    tool_parsers/llama_tool_parser.py."""

    name = "llama3_json"

    def extract(self, text: str) -> ExtractedToolCalls:
        body = text.split("<|python_tag|>", 1)[-1].strip()
        if not body.startswith("{"):
            return ExtractedToolCalls(False, content=text)
        calls = []
        for part in body.split(";"):
            part = part.strip()
            if not part:
                continue
            try:
                obj = json.loads(part)
            except json.JSONDecodeError:
                return ExtractedToolCalls(False, content=text)
            name = obj.get("name")
            if not name:
                return ExtractedToolCalls(False, content=text)
            calls.append(
                _mk_call(name, obj.get("parameters",
                                       obj.get("arguments", {}))))
        return ExtractedToolCalls(bool(calls), calls,
                                  None if calls else text)


class MistralToolParser(ToolParser):
    """[TOOL_CALLS] [{...}, ...] (reference:
    tool_parsers/mistral_tool_parser.py)."""

    name = "mistral"
    _TOKEN = "[TOOL_CALLS]"

    def extract(self, text: str) -> ExtractedToolCalls:
        if self._TOKEN not in text:
            return ExtractedToolCalls(False, content=text)
        pre, _, post = text.partition(self._TOKEN)
        try:
            arr = json.loads(post.strip())
        except json.JSONDecodeError:
            return ExtractedToolCalls(False, content=text)
        if isinstance(arr, dict):
            arr = [arr]
        calls = [
            _mk_call(o.get("name", ""), o.get("arguments", {}))
            for o in arr if isinstance(o, dict)
        ]
        if not calls:
            return ExtractedToolCalls(False, content=text)
        return ExtractedToolCalls(True, calls, pre.strip() or None)


class PythonicToolParser(ToolParser):
    """[fn(a=1, b="x"), ...] pythonic call lists (Llama-4 style;
    reference: tool_parsers/pythonic_tool_parser.py)."""

    name = "pythonic"
    _RE = re.compile(r"^\[(.+)\]$", re.DOTALL)

    def extract(self, text: str) -> ExtractedToolCalls:
        import ast

        m = self._RE.match(text.strip())
        if m is None:
            return ExtractedToolCalls(False, content=text)
        try:
            tree = ast.parse(text.strip(), mode="eval")
            if not isinstance(tree.body, ast.List):
                raise ValueError
            calls = []
            for el in tree.body.elts:
                if not isinstance(el, ast.Call) or not isinstance(
                        el.func, ast.Name):
                    raise ValueError
                args = {
                    kw.arg: ast.literal_eval(kw.value)
                    for kw in el.keywords
                }
                calls.append(_mk_call(el.func.id, args))
        except (ValueError, SyntaxError):
            return ExtractedToolCalls(False, content=text)
        return ExtractedToolCalls(bool(calls), calls, None)


_PARSERS: dict[str, Callable[[], ToolParser]] = {
    "hermes": HermesToolParser,
    "llama3_json": Llama3JsonToolParser,
    "llama4_pythonic": PythonicToolParser,
    "pythonic": PythonicToolParser,
    "mistral": MistralToolParser,
}


def get_tool_parser(name: str) -> ToolParser:
    if name not in _PARSERS:
        raise ValueError(
            f"unknown tool parser {name!r}; available: {sorted(_PARSERS)}")
    return _PARSERS[name]()


def list_tool_parsers() -> list[str]:
    return sorted(_PARSERS)
