"""GritLM — generative + embedding Mistral/Llama (reference behavior
parity: vllm/model_executor/models/gritlm.py).

Generation is plain Llama. Embedding requests MEAN-pool the hidden
states of the non-instruction tokens only: the prompt's instruction
segment (everything through the ``<|embed|>\\n`` marker, with a
``<|user|>`` prefix selecting the newline variant) is pattern-matched
over token IDS (gritlm.py:94 _get_instruction_len) and excluded from
the pooled mean. Here the exclusion rides the runner's segment-sum
pooler: tokens before the pool-start index map to the scratch segment
(input_batch.pool_start_fn)."""

from __future__ import annotations

import logging
from typing import Optional

import numpy as np

from vllm_tpu.config import ModelConfig
from vllm_tpu.models.llama import LlamaForCausalLM

logger = logging.getLogger(__name__)


class GritLM(LlamaForCausalLM):

    force_mean_pool = True  # reference: GritLMMeanPool

    def __init__(self, model_config: ModelConfig) -> None:
        super().__init__(model_config)
        self._pool_tokens: Optional[dict] = None

    def _patterns(self) -> Optional[dict]:
        """Token-id patterns, resolved once from the checkpoint's
        tokenizer (gritlm.py:42). None if no tokenizer is loadable."""
        if self._pool_tokens is not None:
            return self._pool_tokens
        try:
            from transformers import AutoTokenizer

            tok = AutoTokenizer.from_pretrained(self.model_config.model)
            ids = {
                t: tok.convert_tokens_to_ids([t])[0]
                for t in ["<s>", "▁<", "<", "|", "embed", ">", "<0x0A>",
                          "user"]
            }
        except Exception:  # noqa: BLE001 — no tokenizer: pool over all
            logger.warning("GritLM: tokenizer unavailable; embedding "
                           "requests pool over ALL prompt tokens")
            self._pool_tokens = {}
            return self._pool_tokens

        def seq(toks):
            return np.array([ids[t] for t in toks])

        self._pool_tokens = {
            "bos": ids["<s>"],
            "user": seq(["▁<", "|", "user", "|", ">", "<0x0A>"]),
            "embed_newline": seq(["<0x0A>", "<", "|", "embed", "|", ">",
                                  "<0x0A>"]),
            "embed": seq(["▁<", "|", "embed", "|", ">", "<0x0A>"]),
        }
        return self._pool_tokens

    @staticmethod
    def _find(arr: np.ndarray, target: np.ndarray, start: int = 0,
              end: Optional[int] = None) -> int:
        n, m = len(arr), len(target)
        if end is None:
            end = n
        for i in range(start, min(end, n - m + 1)):
            if (arr[i:i + m] == target).all():
                return i
        return -1

    def pool_start_index(self, prompt_token_ids: np.ndarray) -> int:
        """Length of the instruction prefix to EXCLUDE from pooling
        (reference: gritlm.py:94 _get_instruction_len)."""
        pats = self._patterns()
        if not pats:
            return 0
        ids = np.asarray(prompt_token_ids)
        if len(ids) == 0 or ids[0] != pats["bos"]:
            return 0
        embed_pat = pats["embed"]
        if self._find(ids, pats["user"], start=1, end=2) == 1:
            embed_pat = pats["embed_newline"]
        at = self._find(ids, embed_pat, start=1)
        if at != -1:
            return at + len(embed_pat)
        return 1  # BOS only (reference fallback)
