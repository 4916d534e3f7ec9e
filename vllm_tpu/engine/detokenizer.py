"""Incremental detokenization
(reference: vllm/v1/engine/detokenizer.py:29 IncrementalDetokenizer).

Classic prefix_offset/read_offset algorithm: hold back trailing tokens
until their decoded text is stable (no dangling byte-pair / replacement
char), then emit the delta.
"""

from __future__ import annotations

from typing import Optional

from vllm_tpu.sampling_params import SamplingParams


class IncrementalDetokenizer:

    def __init__(self, tokenizer, params: SamplingParams,
                 prompt_token_ids: list[int]) -> None:
        self.tokenizer = tokenizer
        self.skip_special_tokens = params.skip_special_tokens
        self.token_ids: list[int] = list(prompt_token_ids)
        self.prompt_len = len(prompt_token_ids)
        # Start reading right after the prompt; keep a small context window
        # of prompt tokens so the first generated token joins correctly.
        ctx = min(self.prompt_len, 8)
        self.prefix_offset = self.prompt_len - ctx
        self.read_offset = self.prompt_len
        self.output_text = ""
        self.stop_strings = list(params.stop or [])
        self.include_stop_str_in_output = getattr(
            params, "include_stop_str_in_output", False)
        # Longest stop string: how much text to hold back from streaming.
        self.stop_buffer = (max(len(s) for s in self.stop_strings) -
                            1 if self.stop_strings else 0)
        self._last_streamed = 0

    def update(self, new_token_ids: list[int]) -> Optional[str]:
        """Append tokens; returns the stop string hit (or None)."""
        if self.tokenizer is None:
            return None
        stop_hit = None
        for tok in new_token_ids:
            self.token_ids.append(tok)
            self.output_text += self._next_delta()
            if self.stop_strings:
                stop_hit = self._check_stop_strings()
                if stop_hit is not None:
                    break
        return stop_hit

    def _next_delta(self) -> str:
        tk = self.tokenizer
        prefix_text = tk.decode(
            self.token_ids[self.prefix_offset:self.read_offset],
            skip_special_tokens=self.skip_special_tokens)
        new_text = tk.decode(self.token_ids[self.prefix_offset:],
                             skip_special_tokens=self.skip_special_tokens)
        if new_text.endswith("�"):
            # partial multi-byte sequence: hold back
            return ""
        delta = new_text[len(prefix_text):]
        self.prefix_offset = self.read_offset
        self.read_offset = len(self.token_ids)
        return delta

    def _check_stop_strings(self) -> Optional[str]:
        """Find a stop string; truncate output_text at it
        (reference: vllm stop-string semantics — text up to but excluding
        the stop string unless include_stop_str_in_output)."""
        for stop in self.stop_strings:
            pos = self.output_text.find(stop)
            if pos != -1:
                if self.include_stop_str_in_output:
                    self.output_text = self.output_text[:pos + len(stop)]
                else:
                    self.output_text = self.output_text[:pos]
                return stop
        return None

    def get_next_output_text(self, finished: bool, delta: bool) -> str:
        """Streamable text (holds back stop_buffer chars until finished)."""
        if finished:
            text = self.output_text
        else:
            hold = self.stop_buffer
            text = self.output_text[:len(self.output_text) -
                                    hold] if hold else self.output_text
        if delta:
            out = text[self._last_streamed:]
            self._last_streamed = len(text)
            return out
        return text
