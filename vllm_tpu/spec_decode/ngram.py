"""N-gram (prompt-lookup) speculative proposer
(reference: vllm/v1/spec_decode/ngram_proposer.py:11).

Pure host logic: after each step, find the longest recent n-gram suffix
elsewhere in the sequence and propose the tokens that followed it. Drafts
ride in Request.spec_token_ids; the scheduler schedules them as lookahead
tokens and the runner verifies them in the next step's ragged batch.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np

if TYPE_CHECKING:
    from vllm_tpu.core.sched.output import ModelRunnerOutput
    from vllm_tpu.request import Request


class NgramProposer:

    def __init__(self, num_speculative_tokens: int, prompt_lookup_min: int,
                 prompt_lookup_max: int) -> None:
        self.k = num_speculative_tokens
        self.min_n = max(prompt_lookup_min, 1)
        self.max_n = max(prompt_lookup_max, self.min_n)

    def propose_for_tokens(self, token_ids: list[int]) -> list[int]:
        from vllm_tpu import _native

        native = _native.ngram_propose_native(token_ids, self.min_n,
                                              self.max_n, self.k)
        if native is not None:
            return native
        seq = np.asarray(token_ids, dtype=np.int64)
        L = len(seq)
        for n in range(self.max_n, self.min_n - 1, -1):
            if L <= n:
                continue
            suffix = seq[-n:]
            # Find the most recent earlier occurrence of the suffix.
            windows = np.lib.stride_tricks.sliding_window_view(
                seq[:-1], n)
            matches = np.all(windows == suffix, axis=1)
            idx = np.nonzero(matches)[0]
            if len(idx) == 0:
                continue
            start = int(idx[-1]) + n
            draft = seq[start:start + self.k]
            if len(draft):
                return draft.astype(np.int32).tolist()
        return []

    def propose(self, requests: dict[str, "Request"],
                runner_output: "ModelRunnerOutput") -> list[list[int]]:
        out: list[list[int]] = []
        for i, req_id in enumerate(runner_output.req_ids):
            request = requests.get(req_id)
            if request is None or not runner_output.sampled_token_ids[i]:
                out.append([])
                continue
            # Include this step's accepted tokens (not yet appended by the
            # scheduler at proposal time inside EngineCore.step).
            tokens = request.all_token_ids + \
                runner_output.sampled_token_ids[i]
            out.append(self.propose_for_tokens(tokens))
        return out
