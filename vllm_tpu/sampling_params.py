"""Sampling parameters for text generation.

API surface mirrors the reference engine's ``SamplingParams``
(reference: vllm/sampling_params.py) so users can switch engines without
changing call sites; the implementation is independent and the device-side
realization is a static-shape JAX sampler (vllm_tpu/sample/).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Any, Optional, Union


class SamplingType(enum.IntEnum):
    GREEDY = 0
    RANDOM = 1
    RANDOM_SEED = 2


class RequestOutputKind(enum.IntEnum):
    # Return the full accumulated output text in every RequestOutput.
    CUMULATIVE = 0
    # Return only the newly generated delta in each RequestOutput.
    DELTA = 1
    # Return only the final output, on finish.
    FINAL_ONLY = 2


@dataclass
class SamplingParams:
    """Sampling parameters for a single generation request.

    Follows OpenAI API semantics plus the reference engine's extensions
    (reference: vllm/sampling_params.py:88).
    """

    n: int = 1
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    repetition_penalty: float = 1.0
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = 0  # 0 or -1 -> disabled
    min_p: float = 0.0
    seed: Optional[int] = None
    stop: Union[None, str, list[str]] = None
    stop_token_ids: Optional[list[int]] = None
    bad_words: Optional[list[str]] = None
    ignore_eos: bool = False
    max_tokens: Optional[int] = 16
    min_tokens: int = 0
    logprobs: Optional[int] = None
    prompt_logprobs: Optional[int] = None
    detokenize: bool = True
    skip_special_tokens: bool = True
    spaces_between_special_tokens: bool = True
    logit_bias: Optional[dict[int, float]] = None
    # Structured output constraints (one of)
    guided_json: Optional[Union[str, dict]] = None
    guided_regex: Optional[str] = None
    guided_choice: Optional[list[str]] = None
    guided_grammar: Optional[str] = None
    # Output streaming mode
    output_kind: RequestOutputKind = RequestOutputKind.CUMULATIVE
    # Internal: extra args passthrough
    extra_args: Optional[dict[str, Any]] = None

    # Filled by the engine front-end
    _all_stop_token_ids: set[int] = field(default_factory=set, repr=False)
    # Tokenized bad_words (filled by Processor.update_bad_words)
    _bad_words_token_ids: Optional[list[list[int]]] = field(
        default=None, repr=False)

    def __post_init__(self) -> None:
        if self.stop is None:
            self.stop = []
        elif isinstance(self.stop, str):
            self.stop = [self.stop]
        else:
            self.stop = list(self.stop)
        if self.stop_token_ids is None:
            self.stop_token_ids = []
        if self.top_k == -1:
            self.top_k = 0
        if self.seed == -1:
            self.seed = None
        self._verify()
        if self.temperature < 1e-2:
            # Near-zero temperature degenerates to greedy; clamp to avoid
            # numeric blow-up in the on-device logits scaling.
            self.temperature = 0.0
        self._all_stop_token_ids = set(self.stop_token_ids)

    def _verify(self) -> None:
        if self.n < 1:
            raise ValueError(f"n must be >= 1, got {self.n}.")
        if not -2.0 <= self.presence_penalty <= 2.0:
            raise ValueError("presence_penalty must be in [-2, 2], got "
                             f"{self.presence_penalty}.")
        if not -2.0 <= self.frequency_penalty <= 2.0:
            raise ValueError("frequency_penalty must be in [-2, 2], got "
                             f"{self.frequency_penalty}.")
        if self.repetition_penalty <= 0.0:
            raise ValueError("repetition_penalty must be > 0, got "
                             f"{self.repetition_penalty}.")
        if self.temperature < 0.0:
            raise ValueError(
                f"temperature must be non-negative, got {self.temperature}.")
        if not 0.0 < self.top_p <= 1.0:
            raise ValueError(f"top_p must be in (0, 1], got {self.top_p}.")
        if self.top_k < 0:
            raise ValueError(f"top_k must be >= 0, got {self.top_k}.")
        if not 0.0 <= self.min_p <= 1.0:
            raise ValueError(f"min_p must be in [0, 1], got {self.min_p}.")
        if self.max_tokens is not None and self.max_tokens < 1:
            raise ValueError(
                f"max_tokens must be >= 1, got {self.max_tokens}.")
        if self.min_tokens < 0:
            raise ValueError(
                f"min_tokens must be >= 0, got {self.min_tokens}.")
        if self.logprobs is not None and self.logprobs < 0:
            raise ValueError(f"logprobs must be >= 0, got {self.logprobs}.")
        if self.prompt_logprobs is not None and self.prompt_logprobs < 0:
            raise ValueError(
                f"prompt_logprobs must be >= 0, got {self.prompt_logprobs}.")

    @property
    def sampling_type(self) -> SamplingType:
        if self.temperature == 0.0:
            return SamplingType.GREEDY
        if self.seed is not None:
            return SamplingType.RANDOM_SEED
        return SamplingType.RANDOM

    @property
    def all_stop_token_ids(self) -> set[int]:
        return self._all_stop_token_ids

    def update_from_generation_config(
            self,
            eos_token_id: Optional[int] = None) -> None:
        """Register the model EOS token as an implicit stop token."""
        if eos_token_id is not None and not self.ignore_eos:
            self._all_stop_token_ids.add(eos_token_id)

    def update_bad_words(self, tokenizer) -> None:
        """Tokenize ``bad_words`` into banned token sequences, each word
        encoded both bare and with a leading space (reference:
        vllm/sampling_params.py _verify_with_tokenizer /
        v1/sample/logits_processor.py bad-words processor)."""
        if not self.bad_words:
            return
        seqs: list[list[int]] = []
        for word in self.bad_words:
            for text in (word, " " + word.lstrip()):
                ids = tokenizer.encode(text, add_special_tokens=False)
                if ids and ids not in seqs:
                    seqs.append(ids)
        self._bad_words_token_ids = seqs

    def clone(self) -> "SamplingParams":
        import copy

        return copy.deepcopy(self)


@dataclass
class BeamSearchParams:
    """(reference: vllm/sampling_params.py BeamSearchParams)"""

    beam_width: int = 4
    max_tokens: int = 16
    ignore_eos: bool = False
    temperature: float = 0.0
    length_penalty: float = 1.0


@dataclass
class PoolingParams:
    """Parameters for pooling (embedding/classify/score) requests."""

    dimensions: Optional[int] = None
    normalize: bool = True
    softmax: bool = False
    task: str = "embed"
    pooling_type: str = "last"  # last | mean

    def clone(self) -> "PoolingParams":
        import copy

        return copy.deepcopy(self)
