"""Incremental (streaming) tool-call parsing for SSE chat deltas.

The reference streams tool-call name/argument fragments DURING
generation (vllm/entrypoints/openai/tool_parsers/
abstract_tool_parser.py:61 extract_tool_calls_streaming) so agent
clients can begin acting before the model finishes. This module is the
TPU engine's answer: a char-level incremental scanner per format
instead of a per-token re-parse — hermes, mistral, llama3_json and
pythonic get true streaming; every other registered format falls back
to buffer-then-extract at finish.

Emitted fragments follow the OpenAI delta shape: the first fragment of
call *i* carries {"index": i, "id", "type", "function": {"name",
"arguments": ""}}; later fragments carry only {"index": i,
"function": {"arguments": <raw JSON slice>}}.
"""

from __future__ import annotations

import json
import uuid
from dataclasses import dataclass, field
from typing import Optional

from vllm_tpu.entrypoints.openai.tool_parsers import get_tool_parser


@dataclass
class StreamDelta:
    content: Optional[str] = None
    tool_calls: list[dict] = field(default_factory=list)

    @property
    def empty(self) -> bool:
        return not self.content and not self.tool_calls


def _held(buf: str, markers: tuple[str, ...]) -> int:
    """Length of the longest buffer suffix that is a proper prefix of a
    marker (must be held back from the content stream)."""
    best = 0
    for m in markers:
        top = min(len(m) - 1, len(buf))
        for k in range(top, best, -1):
            if buf.endswith(m[:k]):
                best = k
                break
    return best


class _JsonCallStreamer:
    """Incremental scanner over ONE JSON tool-call object like
    {"name": "...", "arguments": {...}}. Feed chars; collects the name,
    then streams the raw text of the arguments value. Name-after-args
    orderings buffer argument fragments until the name is known."""

    def __init__(self, args_keys: tuple[str, ...] = ("arguments",
                                                     "parameters")):
        self.args_keys = args_keys
        self.name: Optional[str] = None
        self.done = False
        # tokenizer state
        self._depth = 0
        self._in_str = False
        self._esc = False
        self._str_chars: list[str] = []
        self._last_str: Optional[str] = None
        self._expect_value_key: Optional[str] = None  # depth-1 key seen
        self._args_active = False
        self._args_depth0: Optional[int] = None
        self._args_is_str = False
        self._args_started = False
        self._args_buffer: list[str] = []  # held until name known
        self._name_emitted = False
        self._started = False

    def feed(self, text: str) -> tuple[list[dict], int]:
        """-> (fragments [{"name"?: str, "arguments"?: str}], number of
        chars consumed — stops right after the object closes)."""
        out: list[dict] = []
        consumed = 0
        for ch in text:
            if self.done:
                break
            self._feed_char(ch, out)
            consumed += 1
        return out, consumed

    def _emit_args(self, s: str, out: list[dict]) -> None:
        if not s:
            return
        if self.name is None:
            self._args_buffer.append(s)
            return
        if not self._name_emitted:
            out.append({"name": self.name})
            self._name_emitted = True
            pend = "".join(self._args_buffer)
            self._args_buffer = []
            if pend:
                out.append({"arguments": pend})
        out.append({"arguments": s})

    def _maybe_emit_name(self, out: list[dict]) -> None:
        if self.name is not None and not self._name_emitted:
            out.append({"name": self.name})
            self._name_emitted = True
            pend = "".join(self._args_buffer)
            self._args_buffer = []
            if pend:
                out.append({"arguments": pend})

    def _feed_char(self, ch: str, out: list[dict]) -> None:
        if self._in_str:
            if self._esc:
                self._esc = False
                self._str_chars.append(ch)
                if self._args_active:
                    self._emit_args(ch, out)
            elif ch == "\\":
                self._esc = True
                self._str_chars.append(ch)
                if self._args_active:
                    self._emit_args(ch, out)
            elif ch == '"':
                self._in_str = False
                closed = "".join(self._str_chars)
                self._str_chars = []
                if self._args_active:
                    self._emit_args(ch, out)
                    if self._args_is_str and \
                            self._depth == self._args_depth0:
                        # string-valued arguments end at their quote
                        self._end_args()
                elif self._expect_value_key == "name":
                    self.name = closed
                    self._expect_value_key = None
                    self._maybe_emit_name(out)
                else:
                    self._last_str = closed  # candidate object key
            else:
                self._str_chars.append(ch)
                if self._args_active:
                    self._emit_args(ch, out)
            return

        if ch == '"':
            self._in_str = True
            self._str_chars = []
            if self._args_active:
                if not self._args_started:
                    self._args_started = True
                    self._args_is_str = True
                self._emit_args(ch, out)
            return

        if ch == "{" or ch == "[":
            self._depth += 1
            self._started = True
            if self._args_active:
                if not self._args_started:
                    self._args_started = True
                self._emit_args(ch, out)
            return

        if ch == "}" or ch == "]":
            self._depth -= 1
            if self._args_active:
                if self._args_depth0 is not None and \
                        self._depth < self._args_depth0:
                    # argument value closed by the object's own brace
                    self._end_args()
                else:
                    self._emit_args(ch, out)
                    if (self._depth == self._args_depth0
                            and self._args_started
                            and not self._args_is_str):
                        self._end_args()
            if self._depth <= 0 and self._started:
                self.done = True
                self._maybe_emit_name(out)
                if not self._name_emitted and self.name is None:
                    # nameless call: flush buffered args anyway
                    pend = "".join(self._args_buffer)
                    self._args_buffer = []
                    if pend:
                        out.append({"arguments": pend})
            return

        if (ch == ":" and self._depth == 1
                and self._last_str is not None
                and not self._args_active):
            key, self._last_str = self._last_str, None
            if key == "name":
                self._expect_value_key = "name"
            elif key in self.args_keys:
                self._args_active = True
                self._args_depth0 = self._depth
                self._args_is_str = False
                self._args_started = False
            return

        if self._args_active:
            if not self._args_started:
                if ch.isspace():
                    return
                self._args_started = True
            if (ch == "," and self._depth == self._args_depth0
                    and not self._args_is_str):
                # scalar argument value ended at the separator
                self._end_args()
                return
            self._emit_args(ch, out)

    def _end_args(self) -> None:
        self._args_active = False
        self._args_depth0 = None
        self._args_is_str = False


class StreamingToolParser:
    """Base: buffer everything, extract at finish (matches the round-2
    behavior for formats without a dedicated incremental scanner)."""

    def __init__(self, fmt: str):
        self.fmt = fmt
        self._parser = get_tool_parser(fmt)
        self._all: list[str] = []
        self.tools_called = False

    def push(self, delta_text: str) -> StreamDelta:
        self._all.append(delta_text)
        return StreamDelta()

    def finish(self) -> StreamDelta:
        text = "".join(self._all)
        ex = self._parser.extract(text)
        if not ex.tools_called:
            return StreamDelta(content=text)
        self.tools_called = True
        calls = []
        for i, c in enumerate(ex.tool_calls):
            calls.append({
                "index": i,
                "id": c["id"],
                "type": "function",
                "function": c["function"],
            })
        return StreamDelta(content=ex.content, tool_calls=calls)


def _new_call_fragment(index: int, name: str) -> dict:
    return {
        "index": index,
        "id": f"chatcmpl-tool-{uuid.uuid4().hex}",
        "type": "function",
        "function": {"name": name, "arguments": ""},
    }


class _MarkeredJsonStreaming(StreamingToolParser):
    """Shared engine for formats shaped as:  content* MARKER json-call
    (SEP json-call)* — hermes, mistral, llama3_json."""

    markers: tuple[str, ...] = ()
    args_keys: tuple[str, ...] = ("arguments",)
    # markers whose PREFIXES must be held back from the content stream
    # (defaults to `markers`; hermes also holds its close tag)
    hold_markers: tuple[str, ...] = ()
    # chars permitted between calls (e.g. list separators)
    inter_chars: str = " \t\r\n,;[]"
    content_allowed = True

    def __init__(self, fmt: str):
        super().__init__(fmt)
        if not self.hold_markers:
            self.hold_markers = self.markers
        self._buf = ""
        self._state = "content"
        self._cur: Optional[_JsonCallStreamer] = None
        self._index = -1

    def push(self, delta_text: str) -> StreamDelta:
        self._all.append(delta_text)
        self._buf += delta_text
        return self._drain(final=False)

    def finish(self) -> StreamDelta:
        return self._drain(final=True)

    def _frag(self, d: StreamDelta, piece: dict) -> None:
        if "name" in piece:
            self.tools_called = True
            d.tool_calls.append(_new_call_fragment(self._index,
                                                   piece["name"]))
        else:
            d.tool_calls.append({
                "index": self._index,
                "function": {"arguments": piece["arguments"]},
            })

    def _drain(self, final: bool) -> StreamDelta:
        d = StreamDelta()
        progress = True
        while progress and self._buf:
            progress = False
            if self._state == "content":
                hit = None
                for m in self.markers:
                    pos = self._buf.find(m)
                    if pos >= 0 and (hit is None or pos < hit[0]):
                        hit = (pos, m)
                if hit is not None:
                    pre = self._buf[:hit[0]]
                    if pre and self.content_allowed:
                        d.content = (d.content or "") + pre
                    self._buf = self._buf[hit[0] + len(hit[1]):]
                    self._state = "between"
                    progress = True
                else:
                    keep = _held(self._buf, self.hold_markers)
                    flush = (self._buf[:len(self._buf) - keep]
                             if not final else self._buf)
                    if flush and self.content_allowed:
                        d.content = (d.content or "") + flush
                    self._buf = "" if final else self._buf[
                        len(self._buf) - keep:]
                    break
            elif self._state == "between":
                i = 0
                while i < len(self._buf) and self._buf[i] in \
                        self.inter_chars:
                    i += 1
                self._buf = self._buf[i:]
                if not self._buf:
                    break
                if self._buf[0] == "{":
                    self._cur = _JsonCallStreamer(self.args_keys)
                    self._index += 1
                    self._state = "call"
                    progress = True
                else:
                    # not a call: whatever follows is trailing content
                    self._state = "trailing"
                    progress = True
            elif self._state == "call":
                text, self._buf = self._buf, ""
                pieces, consumed = self._cur.feed(text)
                for piece in pieces:
                    self._frag(d, piece)
                if self._cur.done:
                    # leftover chars after the object close stay in buf
                    self._buf = text[consumed:]
                    self._state = "content" if self.re_marker \
                        else "between"
                    self._cur = None
                    progress = True
                else:
                    break
            elif self._state == "trailing":
                if self.content_allowed:
                    d.content = (d.content or "") + self._buf
                self._buf = ""
                break
        return d

    # set by subclasses: whether a NEW call needs its own marker again
    re_marker = False


class HermesStreaming(_MarkeredJsonStreaming):
    markers = ("<tool_call>",)
    hold_markers = ("<tool_call>", "</tool_call>")
    args_keys = ("arguments",)
    re_marker = True
    inter_chars = " \t\r\n"

    def _drain(self, final: bool) -> StreamDelta:
        # strip closing tags before generic processing
        self._buf = self._buf.replace("</tool_call>", "")
        if not final:
            keep = _held(self._buf, ("</tool_call>",))
            if keep and self._state == "between":
                self._buf = self._buf[:len(self._buf) - keep]
        return super()._drain(final)


class MistralStreaming(_MarkeredJsonStreaming):
    markers = ("[TOOL_CALLS]",)
    args_keys = ("arguments",)
    re_marker = False


class Llama3JsonStreaming(_MarkeredJsonStreaming):
    """Bare {"name": ..., "parameters": ...} (optionally after
    <|python_tag|>), ';'-separated. A body not starting with '{' is
    plain content."""

    markers = ("<|python_tag|>",)
    args_keys = ("parameters", "arguments")
    re_marker = False

    def __init__(self, fmt: str):
        super().__init__(fmt)
        self._decided = False

    def push(self, delta_text: str) -> StreamDelta:
        self._all.append(delta_text)
        self._buf += delta_text
        if not self._decided:
            stripped = self._buf.lstrip()
            if not stripped:
                return StreamDelta()
            if stripped.startswith("{") or stripped.startswith(
                    "<|python_tag|>"):
                self._state = ("between" if stripped.startswith("{")
                               else "content")
                self._decided = True
            elif _held(self._buf, ("<|python_tag|>",)) == 0:
                self._decided = True  # plain content stream
            else:
                return StreamDelta()  # could still become the tag
        return self._drain(final=False)

    def finish(self) -> StreamDelta:
        if not self._decided:
            self._decided = True
        return self._drain(final=True)


class PythonicStreaming(StreamingToolParser):
    """[fn(a=1), g(b="x")] — whole message is the call list. Each call
    is emitted as soon as its closing paren arrives (name + full
    arguments in one fragment; kwargs->JSON needs the complete call)."""

    def __init__(self, fmt: str):
        super().__init__(fmt)
        self._buf = ""
        self._is_calls: Optional[bool] = None
        self._index = -1
        self._cursor = 0

    def push(self, delta_text: str) -> StreamDelta:
        self._all.append(delta_text)
        self._buf += delta_text
        if self._is_calls is None:
            s = self._buf.lstrip()
            if not s:
                return StreamDelta()
            if s.startswith("["):
                self._is_calls = True
            else:
                self._is_calls = False
        if not self._is_calls:
            out, self._buf = self._buf, ""
            return StreamDelta(content=out)
        return self._emit_ready(final=False)

    def finish(self) -> StreamDelta:
        if self._is_calls is None or not self._is_calls:
            out, self._buf = self._buf, ""
            return StreamDelta(content=out or None)
        return self._emit_ready(final=True)

    def _emit_ready(self, final: bool) -> StreamDelta:
        d = StreamDelta()
        text = self._buf
        depth = 0
        in_str: Optional[str] = None
        start = self._cursor
        i = self._cursor
        while i < len(text):
            ch = text[i]
            if in_str:
                if ch == "\\":
                    i += 2
                    continue
                if ch == in_str:
                    in_str = None
            elif ch in "\"'":
                in_str = ch
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    call_text = text[start:i + 1].lstrip(" \t\r\n,[")
                    self._parse_one(call_text, d)
                    start = i + 1
            i += 1
        self._cursor = start
        return d

    def _parse_one(self, call_text: str, d: StreamDelta) -> None:
        ex = self._parser.extract(f"[{call_text}]")
        if not ex.tools_called or not ex.tool_calls:
            return
        self.tools_called = True
        self._index += 1
        c = ex.tool_calls[0]
        d.tool_calls.append({
            "index": self._index,
            "id": c["id"],
            "type": "function",
            "function": c["function"],
        })


class InternLMStreaming(_MarkeredJsonStreaming):
    """<|action_start|><|plugin|>{json}<|action_end|>."""

    markers = ("<|action_start|><|plugin|>",)
    hold_markers = ("<|action_start|><|plugin|>", "<|action_end|>")
    args_keys = ("parameters", "arguments")
    re_marker = True

    def _drain(self, final: bool) -> StreamDelta:
        self._buf = self._buf.replace("<|action_end|>", "")
        if not final:
            keep = _held(self._buf, ("<|action_end|>",))
            if keep and self._state == "between":
                self._buf = self._buf[:len(self._buf) - keep]
        return super()._drain(final)


class JambaStreaming(_MarkeredJsonStreaming):
    """<tool_calls>[{...}, ...]</tool_calls>."""

    markers = ("<tool_calls>",)
    hold_markers = ("<tool_calls>", "</tool_calls>")
    args_keys = ("arguments",)
    re_marker = False

    def _drain(self, final: bool) -> StreamDelta:
        self._buf = self._buf.replace("</tool_calls>", "")
        if not final:
            keep = _held(self._buf, ("</tool_calls>",))
            if keep and self._state == "between":
                self._buf = self._buf[:len(self._buf) - keep]
        return super()._drain(final)


class GraniteStreaming(_MarkeredJsonStreaming):
    """<|tool_call|> (or <tool_call>) + JSON list of calls."""

    markers = ("<|tool_call|>", "<tool_call>")
    args_keys = ("arguments", "parameters")
    re_marker = False


class _HeaderArgsStreaming(StreamingToolParser):
    """Formats whose calls carry the NAME in a marker header and the
    arguments json VERBATIM between an args-begin and an end marker
    (deepseek_v3, kimi_k2): stream the args region through as raw
    argument deltas (reference: deepseekv3/kimi_k2 tool parsers'
    extract_tool_calls_streaming)."""

    section_begin = ""
    call_begin = ""
    name_re: "re.Pattern" = None  # matches header after call_begin
    args_end = ""
    swallow: tuple = ()

    def __init__(self, fmt: str):
        super().__init__(fmt)
        self._buf = ""
        self._state = "content"
        self._index = -1

    def push(self, delta_text: str) -> StreamDelta:
        self._all.append(delta_text)
        self._buf += delta_text
        return self._drain(final=False)

    def finish(self) -> StreamDelta:
        return self._drain(final=True)

    def _drain(self, final: bool) -> StreamDelta:
        import re as _re

        d = StreamDelta()
        progress = True
        while progress and self._buf:
            progress = False
            if self._state == "content":
                pos = self._buf.find(self.call_begin)
                if pos >= 0:
                    pre = self._buf[:pos]
                    pre = pre.replace(self.section_begin, "")                         if self.section_begin else pre
                    if pre.strip():
                        d.content = (d.content or "") + pre
                    self._buf = self._buf[pos + len(self.call_begin):]
                    self._state = "header"
                    progress = True
                else:
                    hold = _held(self._buf, (self.call_begin,
                                             self.section_begin)
                                 + tuple(self.swallow))
                    flush = (self._buf if final else
                             self._buf[:len(self._buf) - hold])
                    if self.section_begin:
                        flush = flush.replace(self.section_begin, "")
                    for tok in self.swallow:
                        flush = flush.replace(tok, "")
                    if flush:
                        d.content = (d.content or "") + flush
                    self._buf = "" if final else self._buf[
                        len(self._buf) - hold:]
                    break
            elif self._state == "header":
                m = self.name_re.match(self._buf)
                if m is None:
                    if final:
                        self._buf = ""
                    break
                self._index += 1
                self.tools_called = True
                d.tool_calls.append(
                    _new_call_fragment(self._index, m.group("name")))
                self._buf = self._buf[m.end():]
                self._state = "args"
                progress = True
            elif self._state == "args":
                pos = self._buf.find(self.args_end)
                if pos >= 0:
                    frag, self._buf = self._buf[:pos], self._buf[
                        pos + len(self.args_end):]
                    if frag:
                        d.tool_calls.append({
                            "index": self._index,
                            "function": {"arguments": frag},
                        })
                    self._state = "content"
                    progress = True
                else:
                    hold = _held(self._buf, (self.args_end,))
                    frag = self._buf if final else                         self._buf[:len(self._buf) - hold]
                    if frag:
                        d.tool_calls.append({
                            "index": self._index,
                            "function": {"arguments": frag},
                        })
                    self._buf = "" if final else self._buf[
                        len(self._buf) - hold:]
                    break
        if d.content:
            for tok in self.swallow:
                d.content = d.content.replace(tok, "")
            if not d.content:
                d.content = None
        return d


class DeepSeekV3Streaming(_HeaderArgsStreaming):
    import re as _re

    section_begin = "<｜tool▁calls▁begin｜>"
    call_begin = "<｜tool▁call▁begin｜>"
    name_re = _re.compile(
        r".*?<｜tool▁sep｜>(?P<name>.*?)\n```json\n", _re.DOTALL)
    args_end = "\n```<｜tool▁call▁end｜>"
    swallow = ("<｜tool▁calls▁end｜>", "<｜end▁of▁sentence｜>")


class KimiK2Streaming(_HeaderArgsStreaming):
    import re as _re

    section_begin = "<|tool_calls_section_begin|>"
    call_begin = "<|tool_call_begin|>"
    name_re = _re.compile(
        r"\s*functions\.(?P<name>[\w\.]+):\d+\s*"
        r"<\|tool_call_argument_begin\|>\s*")
    args_end = "<|tool_call_end|>"
    swallow = ("<|tool_calls_section_end|>",)


_STREAMING = {
    "hermes": HermesStreaming,
    "mistral": MistralStreaming,
    "llama3_json": Llama3JsonStreaming,
    "pythonic": PythonicStreaming,
    "internlm": InternLMStreaming,
    "jamba": JambaStreaming,
    "granite": GraniteStreaming,
    "deepseek_v3": DeepSeekV3Streaming,
    "kimi_k2": KimiK2Streaming,
}


def get_streaming_tool_parser(fmt: str) -> StreamingToolParser:
    cls = _STREAMING.get(fmt, StreamingToolParser)
    return cls(fmt)
