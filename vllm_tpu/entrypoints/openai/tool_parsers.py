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


class DeepSeekV3ToolParser(ToolParser):
    """DeepSeek V3/R1 markers (reference:
    tool_parsers/deepseekv3_tool_parser.py):
    <｜tool▁calls▁begin｜><｜tool▁call▁begin｜>TYPE<｜tool▁sep｜>NAME
    ```json ARGS ``` <｜tool▁call▁end｜> ... <｜tool▁calls▁end｜>."""

    name = "deepseek_v3"
    _RE = re.compile(
        r"<｜tool▁call▁begin｜>.*?<｜tool▁sep｜>(?P<name>.*?)\n"
        r"```json\n(?P<args>.*?)\n```<｜tool▁call▁end｜>", re.DOTALL)

    def extract(self, text: str) -> ExtractedToolCalls:
        start = "<｜tool▁calls▁begin｜>"
        if start not in text:
            return ExtractedToolCalls(False, content=text)
        calls = []
        for m in self._RE.finditer(text):
            try:
                args = json.loads(m.group("args"))
            except json.JSONDecodeError:
                continue
            calls.append(_mk_call(m.group("name").strip(), args))
        if not calls:
            return ExtractedToolCalls(False, content=text)
        return ExtractedToolCalls(True, calls,
                                  text.split(start, 1)[0].strip() or None)


class KimiK2ToolParser(ToolParser):
    """Kimi K2 (reference: tool_parsers/kimi_k2_tool_parser.py):
    <|tool_call_begin|> functions.NAME:IDX
    <|tool_call_argument_begin|> {json} <|tool_call_end|>."""

    name = "kimi_k2"
    _RE = re.compile(
        r"<\|tool_call_begin\|>\s*(?P<id>[\w\.]+:\d+)\s*"
        r"<\|tool_call_argument_begin\|>\s*(?P<args>.*?)\s*"
        r"<\|tool_call_end\|>", re.DOTALL)

    def extract(self, text: str) -> ExtractedToolCalls:
        start = "<|tool_calls_section_begin|>"
        if start not in text:
            return ExtractedToolCalls(False, content=text)
        calls = []
        for m in self._RE.finditer(text):
            fid = m.group("id")  # functions.NAME:index
            fname = fid.split(":")[0].split(".", 1)[-1]
            try:
                args = json.loads(m.group("args"))
            except json.JSONDecodeError:
                continue
            calls.append(_mk_call(fname, args))
        if not calls:
            return ExtractedToolCalls(False, content=text)
        return ExtractedToolCalls(True, calls,
                                  text.split(start, 1)[0].strip() or None)


class InternLM2ToolParser(ToolParser):
    """<|action_start|><|plugin|>{json}<|action_end|> (reference:
    tool_parsers/internlm2_tool_parser.py)."""

    name = "internlm"
    _RE = re.compile(
        r"<\|action_start\|><\|plugin\|>\s*(?P<json>.*?)\s*"
        r"(?:<\|action_end\|>|$)", re.DOTALL)

    def extract(self, text: str) -> ExtractedToolCalls:
        m = self._RE.search(text)
        if m is None:
            return ExtractedToolCalls(False, content=text)
        try:
            obj = json.loads(m.group("json"))
        except json.JSONDecodeError:
            return ExtractedToolCalls(False, content=text)
        call = _mk_call(obj.get("name", ""),
                        obj.get("parameters", obj.get("arguments", {})))
        content = text[:m.start()].strip() or None
        return ExtractedToolCalls(True, [call], content)


class JambaToolParser(ToolParser):
    """<tool_calls>[{...}, ...]</tool_calls> (reference:
    tool_parsers/jamba_tool_parser.py)."""

    name = "jamba"
    _RE = re.compile(r"<tool_calls>(.*?)</tool_calls>", re.DOTALL)
    _ARG_KEY = "arguments"

    def extract(self, text: str) -> ExtractedToolCalls:
        m = self._RE.search(text)
        if m is None:
            return ExtractedToolCalls(False, content=text)
        try:
            arr = json.loads(m.group(1).strip())
        except json.JSONDecodeError:
            return ExtractedToolCalls(False, content=text)
        if isinstance(arr, dict):
            arr = [arr]
        calls = [
            _mk_call(o.get("name", ""), o.get(self._ARG_KEY, {}))
            for o in arr if isinstance(o, dict)
        ]
        if not calls:
            return ExtractedToolCalls(False, content=text)
        return ExtractedToolCalls(True, calls,
                                  text[:m.start()].strip() or None)


class HunyuanA13BToolParser(JambaToolParser):
    """Same <tool_calls> JSON array markup (reference:
    tool_parsers/hunyuan_a13b_tool_parser.py)."""

    name = "hunyuan_a13b"


class MinimaxToolParser(ToolParser):
    """<tool_calls> with newline-separated JSON objects (reference:
    tool_parsers/minimax_tool_parser.py)."""

    name = "minimax"
    _RE = re.compile(r"<tool_calls>(.*?)(?:</tool_calls>|$)", re.DOTALL)

    def extract(self, text: str) -> ExtractedToolCalls:
        m = self._RE.search(text)
        if m is None:
            return ExtractedToolCalls(False, content=text)
        calls = []
        for line in m.group(1).strip().splitlines():
            line = line.strip()
            if not line:
                continue
            try:
                obj = json.loads(line)
            except json.JSONDecodeError:
                continue
            if isinstance(obj, dict) and obj.get("name"):
                calls.append(
                    _mk_call(obj["name"],
                             obj.get("arguments",
                                     obj.get("parameters", {}))))
        if not calls:
            return ExtractedToolCalls(False, content=text)
        return ExtractedToolCalls(True, calls,
                                  text[:m.start()].strip() or None)


class GraniteToolParser(ToolParser):
    """<|tool_call|> (or <tool_call>) prefix + JSON list (reference:
    tool_parsers/granite_tool_parser.py)."""

    name = "granite"

    def extract(self, text: str) -> ExtractedToolCalls:
        body = text.strip()
        for bot in ("<|tool_call|>", "<tool_call>"):
            if body.startswith(bot):
                body = body[len(bot):].strip()
                break
        else:
            if not body.startswith("["):
                return ExtractedToolCalls(False, content=text)
        try:
            arr = json.loads(body)
        except json.JSONDecodeError:
            return ExtractedToolCalls(False, content=text)
        if not isinstance(arr, list):
            return ExtractedToolCalls(False, content=text)
        calls = [
            _mk_call(o.get("name", ""),
                     o.get("arguments", o.get("parameters", {})))
            for o in arr if isinstance(o, dict) and o.get("name")
        ]
        if not calls:
            return ExtractedToolCalls(False, content=text)
        return ExtractedToolCalls(True, calls, None)


class Granite20bFCToolParser(ToolParser):
    """<function_call> {json} blocks (reference:
    tool_parsers/granite_20b_fc_tool_parser.py)."""

    name = "granite-20b-fc"
    _RE = re.compile(r"<function_call>\s*(\{.*?\})\s*(?=<function_call>|$)",
                     re.DOTALL)

    def extract(self, text: str) -> ExtractedToolCalls:
        if not text.strip().startswith("<function_call>"):
            return ExtractedToolCalls(False, content=text)
        calls = []
        for m in self._RE.finditer(text):
            try:
                obj = json.loads(m.group(1))
            except json.JSONDecodeError:
                continue
            if obj.get("name"):
                calls.append(
                    _mk_call(obj["name"],
                             obj.get("arguments",
                                     obj.get("parameters", {}))))
        if not calls:
            return ExtractedToolCalls(False, content=text)
        return ExtractedToolCalls(True, calls, None)


class Phi4MiniToolParser(ToolParser):
    """functools[{...}, ...] (reference:
    tool_parsers/phi4mini_tool_parser.py)."""

    name = "phi4_mini_json"
    _RE = re.compile(r"functools\[(.*)\]", re.DOTALL)

    def extract(self, text: str) -> ExtractedToolCalls:
        m = self._RE.search(text)
        if m is None:
            return ExtractedToolCalls(False, content=text)
        try:
            arr = json.loads(f"[{m.group(1)}]")
        except json.JSONDecodeError:
            return ExtractedToolCalls(False, content=text)
        calls = [
            _mk_call(o.get("name", ""),
                     o.get("arguments", o.get("parameters", {})))
            for o in arr if isinstance(o, dict) and o.get("name")
        ]
        if not calls:
            return ExtractedToolCalls(False, content=text)
        return ExtractedToolCalls(True, calls,
                                  text[:m.start()].strip() or None)


class Qwen3CoderToolParser(ToolParser):
    """XML-ish <tool_call><function=NAME><parameter=KEY>value
    </parameter>...</function></tool_call> (reference:
    tool_parsers/qwen3coder_tool_parser.py)."""

    name = "qwen3_coder"
    _CALL = re.compile(r"<tool_call>(.*?)</tool_call>", re.DOTALL)
    _FUNC = re.compile(r"<function=([^>]+)>(.*?)(?:</function>|$)",
                       re.DOTALL)
    _PARAM = re.compile(r"<parameter=([^>]+)>(.*?)</parameter>",
                        re.DOTALL)

    @staticmethod
    def _coerce(v: str):
        v = v.strip()
        try:
            return json.loads(v)
        except json.JSONDecodeError:
            return v

    def extract(self, text: str) -> ExtractedToolCalls:
        calls = []
        for cm in self._CALL.finditer(text):
            fm = self._FUNC.search(cm.group(1))
            if fm is None:
                continue
            args = {
                pm.group(1).strip(): self._coerce(pm.group(2))
                for pm in self._PARAM.finditer(fm.group(2))
            }
            calls.append(_mk_call(fm.group(1).strip(), args))
        if not calls:
            return ExtractedToolCalls(False, content=text)
        content = self._CALL.sub("", text).strip() or None
        return ExtractedToolCalls(True, calls, content)


class Glm4MoeToolParser(ToolParser):
    """<tool_call>NAME\\n<arg_key>K</arg_key><arg_value>V</arg_value>...
    </tool_call> (GLM-4.5; reference:
    tool_parsers/glm4_moe_tool_parser.py)."""

    name = "glm45"
    _CALL = re.compile(r"<tool_call>(.*?)</tool_call>", re.DOTALL)
    _DETAIL = re.compile(r"([^\n]*)\n(.*)", re.DOTALL)
    _ARG = re.compile(r"<arg_key>(.*?)</arg_key>\s*<arg_value>(.*?)"
                      r"</arg_value>", re.DOTALL)

    def extract(self, text: str) -> ExtractedToolCalls:
        calls = []
        for cm in self._CALL.finditer(text):
            dm = self._DETAIL.match(cm.group(1).strip())
            if dm is None:
                continue
            name = dm.group(1).strip()
            args = {}
            for am in self._ARG.finditer(dm.group(2)):
                v = am.group(2).strip()
                try:
                    v = json.loads(v)
                except json.JSONDecodeError:
                    pass
                args[am.group(1).strip()] = v
            if name:
                calls.append(_mk_call(name, args))
        if not calls:
            return ExtractedToolCalls(False, content=text)
        content = self._CALL.sub("", text).strip() or None
        return ExtractedToolCalls(True, calls, content)


class XLAMToolParser(ToolParser):
    """Bare JSON list of {"name", "arguments"} objects, optionally in a
    ```json fence (reference: tool_parsers/xlam_tool_parser.py)."""

    name = "xlam"
    _FENCE = re.compile(r"```(?:json)?\s*(.*?)```", re.DOTALL)

    def extract(self, text: str) -> ExtractedToolCalls:
        body = text.strip()
        content = None
        fm = self._FENCE.search(body)
        if fm is not None:
            content = body[:fm.start()].strip() or None
            body = fm.group(1).strip()
        if not body.startswith("["):
            return ExtractedToolCalls(False, content=text)
        try:
            arr = json.loads(body)
        except json.JSONDecodeError:
            return ExtractedToolCalls(False, content=text)
        calls = [
            _mk_call(o.get("name", ""),
                     o.get("arguments", o.get("parameters", {})))
            for o in arr if isinstance(o, dict) and o.get("name")
        ]
        if not calls:
            return ExtractedToolCalls(False, content=text)
        return ExtractedToolCalls(True, calls, content)


_PARSERS: dict[str, Callable[[], ToolParser]] = {
    "hermes": HermesToolParser,
    "llama3_json": Llama3JsonToolParser,
    "llama4_pythonic": PythonicToolParser,
    "pythonic": PythonicToolParser,
    "mistral": MistralToolParser,
    "deepseek_v3": DeepSeekV3ToolParser,
    "kimi_k2": KimiK2ToolParser,
    "internlm": InternLM2ToolParser,
    "jamba": JambaToolParser,
    "hunyuan_a13b": HunyuanA13BToolParser,
    "minimax": MinimaxToolParser,
    "granite": GraniteToolParser,
    "granite-20b-fc": Granite20bFCToolParser,
    "phi4_mini_json": Phi4MiniToolParser,
    "qwen3_coder": Qwen3CoderToolParser,
    "glm45": Glm4MoeToolParser,
    "xlam": XLAMToolParser,
}


def get_tool_parser(name: str) -> ToolParser:
    if name not in _PARSERS:
        raise ValueError(
            f"unknown tool parser {name!r}; available: {sorted(_PARSERS)}")
    return _PARSERS[name]()


def list_tool_parsers() -> list[str]:
    return sorted(_PARSERS)
