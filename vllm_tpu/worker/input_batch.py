"""Persistent struct-of-arrays input batch
(reference: vllm/v1/worker/gpu_input_batch.py:61 InputBatch).

Host-side numpy state mirroring the scheduler's view of every running
request; each step ``prepare_inputs`` turns the SchedulerOutput diff into
padded, bucket-shaped device arrays. Slots are kept dense by moving the
last occupied slot into holes on removal (condense), so padding is always
a suffix.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import numpy as np

from vllm_tpu.core.sched.output import (CachedRequestData, NewRequestData,
                                        SchedulerOutput)
from vllm_tpu.sampling_params import SamplingParams, SamplingType
from vllm_tpu.utils import cdiv


@dataclass
class PreparedInputs:
    """Numpy arrays, already padded to (token_bucket, req_bucket)."""

    input_ids: np.ndarray  # i32[T]
    positions: np.ndarray  # i32[T]
    slot_mapping: np.ndarray  # i32[T]
    query_start_loc: np.ndarray  # i32[R+1]
    seq_lens: np.ndarray  # i32[R]
    block_tables: np.ndarray  # i32[R, max_blocks]
    logits_indices: np.ndarray  # i32[R]
    lb_seq: np.ndarray  # i32[MAXLB] logical q blocks (pallas kernel)
    lb_q_start: np.ndarray  # i32[MAXLB]
    # sampling (padded rows: temperature 0 => greedy)
    temperature: np.ndarray
    top_k: np.ndarray
    top_p: np.ndarray
    min_p: np.ndarray
    seeds: np.ndarray
    # host bookkeeping (unpadded)
    req_ids: list[str]  # active request ids in row order
    # rows whose prompt completes this step (sampling is valid)
    sample_valid: np.ndarray  # bool[num_active]
    num_active: int
    # penalties: None unless some active request uses them
    presence_penalty: Optional[np.ndarray] = None
    frequency_penalty: Optional[np.ndarray] = None
    repetition_penalty: Optional[np.ndarray] = None
    # logprobs requested per row (-1 = no)
    num_logprobs: Optional[np.ndarray] = None
    # speculative decoding (S = num_speculative_tokens; None when S == 0)
    spec_logits_indices: Optional[np.ndarray] = None  # i32[R, 1+S]
    # SSM models: persistent state slot per row + slots to zero this step
    state_slots: Optional[np.ndarray] = None  # i32[R]
    state_reset: Optional[np.ndarray] = None  # i32[R]
    spec_fold_positions: Optional[np.ndarray] = None  # i32[R, 1+S]
    spec_draft_tokens: Optional[np.ndarray] = None  # i32[R, S]
    # prefix-LM bidirectional spans (see AttentionMetadata.bidir_spans)
    bidir_spans: Optional[np.ndarray] = None  # i32[R, 2]
    spec_num_drafts: Optional[np.ndarray] = None  # i32[R]
    # multi-LoRA: per-token adapter slot (value == num_slots means none)
    token_lora: Optional[np.ndarray] = None  # i32[T]
    # pooling: per-active-row PoolingParams (None for generate rows);
    # token_req maps each token to its row (padding -> req_bucket)
    pooling_params: Optional[list] = None
    token_req: Optional[np.ndarray] = None  # i32[T]
    # multimodal: token-embedding overrides at image-placeholder slots
    # (idx == T means "no override"; see llama.forward embed_override)
    embed_idx: Optional[np.ndarray] = None  # i32[T]
    # prompt logprobs: (entries, k, device handles) stashed by the
    # runner's aux pass (model_runner._dispatch_prompt_lp)
    prompt_lp: Optional[tuple] = None
    embed_vecs: Optional[np.ndarray] = None  # f32[T, H]
    # async scheduling: per-token index into the PREVIOUS step's sampled
    # tokens for placeholder inputs (R_prev == none)
    subst_idx: Optional[np.ndarray] = None  # i32[T]
    # bad_words conditional bans (see SamplingMetadata.banned_tokens)
    banned_tokens: Optional[np.ndarray] = None  # i32[R, B]
    banned_required: Optional[np.ndarray] = None  # i32[R, B]
    # MRoPE 3D positions (None for standard-rope models)
    mrope_positions: Optional[np.ndarray] = None  # i32[3, T]
    # cascade attention: [0]=num shared pages, [1:]=page ids
    cascade_meta: Optional[np.ndarray] = None  # i32[max_blocks+1]
    # encoder-decoder: state slots needing a cross-KV write this step
    cross_slots: Optional[np.ndarray] = None  # i32[B]


class InputBatch:

    def __init__(
        self,
        max_num_reqs: int,
        max_model_len: int,
        max_blocks_per_req: int,
        block_size: int,
        num_kv_groups: int = 1,
        image_token_index: Optional[int] = None,
        bidir_mode: Optional[str] = None,
        lb_skip_single: bool = True,
    ) -> None:
        # prefill-bucket logical blocks leave q_len==1 rows out (they
        # ride the batched-row decode kernel); MLA models keep them in
        # (the MLA kernel serves every row from lb_seq)
        self.lb_skip_single = lb_skip_single
        self.image_token_index = image_token_index
        # "prompt" (PaliGemma prefix-LM) | "mm_span" (Gemma3 image span)
        self.bidir_mode = bidir_mode
        self.max_num_reqs = max_num_reqs
        self.max_model_len = max_model_len
        self.max_blocks_per_req = max_blocks_per_req
        self.block_size = block_size
        self.num_kv_groups = num_kv_groups
        # which KV group holds the paged attention blocks (hybrid SSM
        # models put Mamba state groups first)
        self.attn_group = 0

        self.req_ids: list[Optional[str]] = [None] * max_num_reqs
        self.req_id_to_index: dict[str, int] = {}
        self.num_reqs = 0
        # meta of rows evicted at preemption, keyed by req_id (see
        # update_states / _restore_preempted)
        self._preempt_stash: dict[str, dict] = {}

        self.token_ids = np.zeros((max_num_reqs, max_model_len), np.int32)
        self.num_tokens = np.zeros(max_num_reqs, np.int32)
        self.num_prompt_tokens = np.zeros(max_num_reqs, np.int32)
        self.num_computed_tokens = np.zeros(max_num_reqs, np.int32)
        self.block_tables = np.zeros(
            (num_kv_groups, max_num_reqs, max_blocks_per_req), np.int32)
        self.num_blocks = np.zeros((num_kv_groups, max_num_reqs), np.int32)

        # Sampling params per slot
        self.temperature = np.zeros(max_num_reqs, np.float32)
        self.top_k = np.zeros(max_num_reqs, np.int32)
        self.top_p = np.ones(max_num_reqs, np.float32)
        self.min_p = np.zeros(max_num_reqs, np.float32)
        self.seeds = np.zeros(max_num_reqs, np.uint32)
        self.presence_penalty = np.zeros(max_num_reqs, np.float32)
        self.frequency_penalty = np.zeros(max_num_reqs, np.float32)
        self.repetition_penalty = np.ones(max_num_reqs, np.float32)
        self.num_logprobs = np.full(max_num_reqs, -1, np.int32)
        self.sampling_params: list[Optional[SamplingParams]] = \
            [None] * max_num_reqs
        self.lora_requests: list[Optional[Any]] = [None] * max_num_reqs
        self.pooling_params: list[Optional[Any]] = [None] * max_num_reqs
        # multimodal: raw inputs, placeholder positions, encoded embeds
        self.mm_inputs: list[Optional[dict]] = [None] * max_num_reqs
        self.mm_hashes: list[Optional[list]] = [None] * max_num_reqs
        # MRoPE (Qwen2-VL family): set by the runner to the model's
        # compute_mrope; per-slot 3D prompt positions + decode delta
        self.mrope_fn = None
        # optional model hook: prompt token ids -> index of the first
        # POOLED token (GritLM-style instruction-masked mean pooling;
        # reference: gritlm.py _get_instruction_len)
        self.pool_start_fn = None
        self.mrope_pos: list[Optional[np.ndarray]] = [None] * max_num_reqs
        self.mrope_delta = np.zeros(max_num_reqs, np.int32)
        self.mm_positions: list[Optional[np.ndarray]] = \
            [None] * max_num_reqs
        self.mm_embeds: list[Optional[np.ndarray]] = [None] * max_num_reqs

    # ------------------------------------------------------------- mutation

    def add_request(self, data: NewRequestData,
                    rng: np.random.Generator) -> int:
        idx = self.num_reqs
        assert idx < self.max_num_reqs
        req_id = data.req_id
        self.req_ids[idx] = req_id
        self.req_id_to_index[req_id] = idx
        self.num_reqs += 1

        n = len(data.prompt_token_ids)
        self.token_ids[idx, :n] = data.prompt_token_ids
        self.num_tokens[idx] = n
        self.num_prompt_tokens[idx] = n
        self.num_computed_tokens[idx] = data.num_computed_tokens
        for g, ids in enumerate(data.block_ids):
            self.num_blocks[g, idx] = len(ids)
            self.block_tables[g, idx, :len(ids)] = ids

        sp = data.sampling_params or SamplingParams()
        self.sampling_params[idx] = sp
        self.temperature[idx] = sp.temperature
        self.top_k[idx] = sp.top_k
        self.top_p[idx] = sp.top_p
        self.min_p[idx] = sp.min_p
        if sp.sampling_type == SamplingType.RANDOM_SEED:
            self.seeds[idx] = np.uint32(sp.seed & 0xFFFFFFFF)
        else:
            self.seeds[idx] = rng.integers(0, 2**32, dtype=np.uint32)
        self.presence_penalty[idx] = sp.presence_penalty
        self.frequency_penalty[idx] = sp.frequency_penalty
        self.repetition_penalty[idx] = sp.repetition_penalty
        self.num_logprobs[idx] = -1 if sp.logprobs is None else sp.logprobs
        self.lora_requests[idx] = data.lora_request
        self.pooling_params[idx] = data.pooling_params
        self.mm_inputs[idx] = data.mm_inputs
        self.mm_hashes[idx] = data.mm_hashes
        self.mm_embeds[idx] = None
        if self.mrope_fn is not None:
            self.mrope_pos[idx], self.mrope_delta[idx] = self.mrope_fn(
                data.prompt_token_ids, data.mm_inputs)
        self.mm_positions[idx] = None
        if data.mm_inputs is not None and self.image_token_index is not None:
            self.mm_positions[idx] = np.nonzero(
                np.asarray(data.prompt_token_ids) ==
                self.image_token_index)[0].astype(np.int32)
        return idx

    def remove_request(self, req_id: str) -> None:
        idx = self.req_id_to_index.pop(req_id, None)
        if idx is None:
            return
        last = self.num_reqs - 1
        if idx != last:
            # condense: move the last slot into the hole
            self._copy_slot(last, idx)
            moved_id = self.req_ids[last]
            self.req_ids[idx] = moved_id
            self.req_id_to_index[moved_id] = idx
        self.req_ids[last] = None
        self.mm_hashes[last] = None
        self.mrope_pos[last] = None
        self.sampling_params[last] = None
        self.lora_requests[last] = None
        self.pooling_params[last] = None
        self.mm_inputs[last] = None
        self.mm_positions[last] = None
        self.mm_embeds[last] = None
        self.num_reqs -= 1

    def _copy_slot(self, src: int, dst: int) -> None:
        self.token_ids[dst] = self.token_ids[src]
        self.num_tokens[dst] = self.num_tokens[src]
        self.num_prompt_tokens[dst] = self.num_prompt_tokens[src]
        self.num_computed_tokens[dst] = self.num_computed_tokens[src]
        self.block_tables[:, dst] = self.block_tables[:, src]
        self.num_blocks[:, dst] = self.num_blocks[:, src]
        for arr in (self.temperature, self.top_k, self.top_p, self.min_p,
                    self.seeds, self.presence_penalty,
                    self.frequency_penalty, self.repetition_penalty,
                    self.num_logprobs):
            arr[dst] = arr[src]
        self.sampling_params[dst] = self.sampling_params[src]
        self.lora_requests[dst] = self.lora_requests[src]
        self.pooling_params[dst] = self.pooling_params[src]
        self.mm_inputs[dst] = self.mm_inputs[src]
        self.mm_hashes[dst] = self.mm_hashes[src]
        self.mrope_pos[dst] = self.mrope_pos[src]
        self.mrope_delta[dst] = self.mrope_delta[src]
        self.mm_positions[dst] = self.mm_positions[src]
        self.mm_embeds[dst] = self.mm_embeds[src]

    # ---------------------------------------------------------- update/step

    def update_states(self, scheduler_output: SchedulerOutput,
                      rng: np.random.Generator) -> None:
        """Apply the SchedulerOutput diff
        (reference: gpu_model_runner._update_states:368)."""
        for req_id in scheduler_output.finished_req_ids:
            self.remove_request(req_id)
            self._preempt_stash.pop(req_id, None)

        # Preempted rows leave the batch (their slots must be free for
        # newly admitted requests — the reference evicts every
        # unscheduled row, gpu_model_runner.py:399); the immutable
        # per-request meta is stashed so the resumed path can rebuild
        # the row without the scheduler resending params.
        for req_id in getattr(scheduler_output, "preempted_req_ids", ()):
            idx = self.req_id_to_index.get(req_id)
            if idx is None:
                continue
            self._preempt_stash[req_id] = dict(
                sampling_params=self.sampling_params[idx],
                seed=self.seeds[idx],
                num_prompt_tokens=int(self.num_prompt_tokens[idx]),
                lora_request=self.lora_requests[idx],
                pooling_params=self.pooling_params[idx],
                mm_inputs=self.mm_inputs[idx],
                mm_hashes=self.mm_hashes[idx],
                mm_positions=self.mm_positions[idx],
                mrope_pos=self.mrope_pos[idx],
                mrope_delta=self.mrope_delta[idx],
                num_logprobs=int(self.num_logprobs[idx]),
            )
            self.remove_request(req_id)

        cached: CachedRequestData = scheduler_output.scheduled_cached_reqs
        for i, req_id in enumerate(cached.req_ids):
            if (cached.resumed_from_preemption[i]
                    and req_id not in self.req_id_to_index):
                self._restore_preempted(
                    req_id, cached.resumed_req_token_ids[i],
                    cached.new_block_ids[i],
                    cached.num_computed_tokens[i], rng)
                continue
            idx = self.req_id_to_index[req_id]
            if cached.resumed_from_preemption[i]:
                toks = cached.resumed_req_token_ids[i]
                self.token_ids[idx, :len(toks)] = toks
                self.num_tokens[idx] = len(toks)
                # block ids replace wholesale
                for g, ids in enumerate(cached.new_block_ids[i]):
                    self.num_blocks[g, idx] = len(ids)
                    self.block_tables[g, idx, :len(ids)] = ids
            elif cached.new_block_ids[i] is not None:
                for g, ids in enumerate(cached.new_block_ids[i]):
                    n0 = self.num_blocks[g, idx]
                    self.num_blocks[g, idx] = n0 + len(ids)
                    self.block_tables[g, idx, n0:n0 + len(ids)] = ids
            self.num_computed_tokens[idx] = cached.num_computed_tokens[i]

        for data in scheduler_output.scheduled_new_reqs:
            self.add_request(data, rng)

        # Spec-decode drafts ride in the token stream: append scheduled
        # draft tokens after the committed tokens.
        for req_id, spec in (
                scheduler_output.scheduled_spec_decode_tokens.items()):
            idx = self.req_id_to_index[req_id]
            n = self.num_tokens[idx]
            self.token_ids[idx, n:n + len(spec)] = spec

    def _restore_preempted(self, req_id: str, token_ids: list[int],
                           block_ids, num_computed: int,
                           rng: np.random.Generator) -> None:
        """Rebuild a row evicted at preemption: token ids + blocks come
        from the scheduler's resumed delta, the immutable meta (params,
        seed, prompt length) from the stash."""
        meta = self._preempt_stash.pop(req_id)
        data = NewRequestData(
            req_id=req_id,
            prompt_token_ids=token_ids,
            sampling_params=meta["sampling_params"],
            block_ids=block_ids,
            num_computed_tokens=num_computed,
            lora_request=meta["lora_request"],
            pooling_params=meta["pooling_params"],
            mm_inputs=meta["mm_inputs"],
            mm_hashes=meta["mm_hashes"],
        )
        idx = self.add_request(data, rng)
        # restore what add_request derives differently for a fresh request
        self.num_prompt_tokens[idx] = meta["num_prompt_tokens"]
        self.seeds[idx] = meta["seed"]
        self.num_logprobs[idx] = meta["num_logprobs"]
        self.mm_positions[idx] = meta["mm_positions"]
        self.mrope_pos[idx] = meta["mrope_pos"]
        self.mrope_delta[idx] = meta["mrope_delta"]

    def append_sampled(self, req_id: str, token_ids: list[int]) -> None:
        """Commit accepted tokens after a step (host mirror of the
        scheduler's append)."""
        idx = self.req_id_to_index.get(req_id)
        if idx is None:
            return
        n = self.num_tokens[idx]
        self.token_ids[idx, n:n + len(token_ids)] = token_ids
        self.num_tokens[idx] += len(token_ids)

    def scheduled_lora_requests(
            self, scheduler_output: SchedulerOutput) -> list[Any]:
        """Distinct LoRA requests among this step's scheduled requests."""
        num_sched = scheduler_output.num_scheduled_tokens
        seen: dict[int, Any] = {}
        for idx, rid in enumerate(self.req_ids):
            if rid is None or rid not in num_sched:
                continue
            lr = self.lora_requests[idx]
            if lr is not None:
                seen[lr.lora_int_id] = lr
        return list(seen.values())

    def prepare_inputs(self, scheduler_output: SchedulerOutput,
                       token_bucket: int, req_bucket: int,
                       num_spec_tokens: int = 0,
                       lora_slots: Optional[dict[int, int]] = None,
                       num_lora_slots: int = 0,
                       async_prev: Optional[tuple] = None,
                       emit_state_slots: bool = False
                       ) -> PreparedInputs:
        """Build padded flat arrays for one device step
        (reference: gpu_model_runner._prepare_inputs:631; ragged-batch
        contract documented in SURVEY.md §3.4)."""
        num_sched = scheduler_output.num_scheduled_tokens
        # Row order: batch-slot order restricted to scheduled requests
        # (keeps rows stable across steps for sampler determinism).
        active = [(idx, rid) for idx, rid in enumerate(self.req_ids)
                  if rid is not None and rid in num_sched]
        num_active = len(active)
        total = scheduler_output.total_num_scheduled_tokens
        assert total <= token_bucket, (total, token_bucket)
        assert num_active <= req_bucket

        T, R = token_bucket, req_bucket
        input_ids = np.zeros(T, np.int32)
        positions = np.zeros(T, np.int32)
        slot_mapping = np.zeros(T, np.int32)
        qsl = np.zeros(R + 1, np.int32)
        seq_lens = np.zeros(R, np.int32)
        block_tables = np.zeros((R, self.max_blocks_per_req), np.int32)
        logits_indices = np.zeros(R, np.int32)
        sample_valid = np.zeros(num_active, bool)

        subst_idx = None
        if async_prev is not None:
            # async_prev: [(row_map, size), ...] newest pending step
            # first; subst_idx addresses the CONCATENATION of their
            # token arrays (total size = out-of-range = no substitution)
            r_prev = sum(r for _, r in async_prev)
            subst_idx = np.full(T, r_prev, np.int32)

        # SSM state routing: slot = persistent batch row (stable across
        # steps); the scratch slot (max_num_reqs) absorbs padding rows
        # and no-op resets
        state_slots = state_reset = None
        if emit_state_slots:
            state_slots = np.full(R, self.max_num_reqs, np.int32)
            state_reset = np.full(R, self.max_num_reqs, np.int32)

        offset = 0
        for row, (idx, rid) in enumerate(active):
            n = num_sched[rid]
            start = self.num_computed_tokens[idx]
            if state_slots is not None:
                state_slots[row] = idx
                if start == 0:  # fresh prefill (or preempt-restart)
                    state_reset[row] = idx
            input_ids[offset:offset + n] = \
                self.token_ids[idx, start:start + n]
            if subst_idx is not None and \
                    start + n > self.num_tokens[idx]:
                # trailing positions are un-materialized samples from an
                # in-flight step: substitute on device from the newest
                # pending step that sampled this request
                n_known = max(self.num_tokens[idx] - start, 0)
                prev_row = r_prev
                base = 0
                for row_map, size in async_prev:
                    r = row_map.get(rid)
                    if r is not None:
                        prev_row = base + r
                        break
                    base += size
                subst_idx[offset + n_known:offset + n] = prev_row
                input_ids[offset + n_known:offset + n] = 0
            pos = np.arange(start, start + n, dtype=np.int32)
            positions[offset:offset + n] = pos
            bt = self.block_tables[self.attn_group, idx]
            slot_mapping[offset:offset + n] = (
                bt[pos // self.block_size] * self.block_size +
                pos % self.block_size)
            block_tables[row] = bt
            seq_lens[row] = start + n
            qsl[row + 1] = offset + n
            logits_indices[row] = offset + n - 1
            # Sampling is valid only when every committed token is computed
            # after this step (partial prefills and resume-catch-up steps
            # must not emit).
            sample_valid[row] = start + n >= self.num_tokens[idx]
            offset += n
        qsl[num_active + 1:] = offset
        # padding rows sample garbage at index 0; discarded host-side
        logits_indices[num_active:] = 0

        # Cascade gate: a batch-wide shared block-table prefix worth
        # streaming once (reference decision: gpu_model_runner.py:873).
        # Verified here against the ACTUAL scheduled rows, not just the
        # scheduler's running-set hint.
        # Always emitted (zeros = disabled): a conditional slot would
        # change the static jit `layout` and trigger a mid-serving
        # recompile on the first cascade-eligible batch (ADVICE r02).
        cascade_meta = np.zeros(self.max_blocks_per_req + 1, np.int32)
        if num_active >= 8 and total <= 2 * num_active:
            rows_arr = [idx for idx, _ in active]
            nb = self.num_blocks[self.attn_group, rows_arr]
            max_nc = int(nb.min()) - 1
            if max_nc >= max(256 // self.block_size, 1):
                bt0 = self.block_tables[self.attn_group, rows_arr[0],
                                        :max_nc]
                eq = (self.block_tables[self.attn_group, rows_arr,
                                        :max_nc] == bt0).all(axis=0)
                nc = int(np.argmin(eq)) if not eq.all() else max_nc
                if nc * self.block_size >= 256:
                    cascade_meta[0] = nc
                    cascade_meta[1:1 + nc] = bt0[:nc]

        mrope_positions = None
        if self.mrope_fn is not None:
            mrope_positions = np.zeros((3, T), np.int32)
            off = 0
            for row, (idx, rid) in enumerate(active):
                n = num_sched[rid]
                start = self.num_computed_tokens[idx]
                ppos = self.mrope_pos[idx]
                P = ppos.shape[1] if ppos is not None else 0
                pos = np.arange(start, start + n)
                n_prompt = max(min(P - start, n), 0)
                if n_prompt > 0:
                    mrope_positions[:, off:off + n_prompt] = \
                        ppos[:, start:start + n_prompt]
                if n_prompt < n:
                    tail = pos[n_prompt:] + self.mrope_delta[idx]
                    mrope_positions[:, off + n_prompt:off + n] = \
                        tail[None, :]
                off += n

        # Logical q-block assignment for the Pallas ragged kernel.
        from vllm_tpu.ops.pallas.ragged_paged_attention import \
            build_logical_blocks

        lb_seq, lb_q_start = build_logical_blocks(
            qsl, T, R, skip_single=self.lb_skip_single)

        spec_kw = {}
        if num_spec_tokens > 0:
            S1 = num_spec_tokens + 1
            sli = np.zeros((R, S1), np.int32)
            sfp = np.zeros((R, S1), np.int32)
            sdt = np.zeros((R, num_spec_tokens), np.int32)
            snd = np.zeros(R, np.int32)
            spec_map = scheduler_output.scheduled_spec_decode_tokens
            for row, (idx, rid) in enumerate(active):
                end = qsl[row + 1] - 1  # last scheduled token index
                drafts = spec_map.get(rid, [])
                s_r = len(drafts)
                snd[row] = s_r
                sdt[row, :s_r] = drafts
                # verify positions: the last (1 + s_r) scheduled tokens
                for j in range(S1):
                    jj = min(j, s_r)
                    sli[row, j] = end - s_r + jj
                    sfp[row, j] = seq_lens[row] - s_r + jj
            spec_kw = dict(spec_logits_indices=sli, spec_fold_positions=sfp,
                           spec_draft_tokens=sdt, spec_num_drafts=snd)

        rows = [idx for idx, _ in active]
        temperature = np.zeros(R, np.float32)
        top_k = np.zeros(R, np.int32)
        top_p = np.ones(R, np.float32)
        min_p = np.zeros(R, np.float32)
        seeds = np.zeros(R, np.uint32)
        temperature[:num_active] = self.temperature[rows]
        top_k[:num_active] = self.top_k[rows]
        top_p[:num_active] = self.top_p[rows]
        min_p[:num_active] = self.min_p[rows]
        seeds[:num_active] = self.seeds[rows]

        use_penalties = bool(
            np.any(self.presence_penalty[rows] != 0.0)
            or np.any(self.frequency_penalty[rows] != 0.0)
            or np.any(self.repetition_penalty[rows] != 1.0))
        pp = fp = rp = None
        if use_penalties:
            pp = np.zeros(R, np.float32)
            fp = np.zeros(R, np.float32)
            rp = np.ones(R, np.float32)
            pp[:num_active] = self.presence_penalty[rows]
            fp[:num_active] = self.frequency_penalty[rows]
            rp[:num_active] = self.repetition_penalty[rows]

        nl = self.num_logprobs[rows] if num_active else \
            np.empty(0, np.int32)

        # bad_words: emit (required_prev_token, banned_token) pairs per
        # row. The host matches every sequence token except the LAST
        # INPUT token (which may be async-in-flight); the device checks
        # that final condition (reference: v1/sample/logits_processor.py
        # bad-words processor).
        banned = banned_req = None
        if any(
                getattr(self.sampling_params[idx], "_bad_words_token_ids",
                        None) for idx, _ in active):
            pairs_per_row: list[list[tuple[int, int]]] = []
            maxb = 0
            for row, (idx, rid) in enumerate(active):
                pairs: list[tuple[int, int]] = []
                sp = self.sampling_params[idx]
                seqs = sp._bad_words_token_ids if sp is not None else None
                if seqs and sample_valid[row]:
                    q = int(seq_lens[row]) - 1  # last input position
                    toks = self.token_ids[idx]
                    for s in seqs:
                        L = len(s)
                        if L == 1:
                            pairs.append((-1, s[0]))
                        elif q >= L - 2 and (L == 2 or list(
                                toks[q - (L - 2):q]) == s[:-2]):
                            pairs.append((s[-2], s[-1]))
                pairs_per_row.append(pairs)
                maxb = max(maxb, len(pairs))
            if maxb:
                B = max(4, 1 << (maxb - 1).bit_length())
                banned = np.full((R, B), -1, np.int32)
                banned_req = np.full((R, B), -1, np.int32)
                for row, pairs in enumerate(pairs_per_row):
                    for j, (req, tok) in enumerate(pairs):
                        banned_req[row, j] = req
                        banned[row, j] = tok

        # multimodal embedding overrides for scheduled image-placeholder
        # tokens (encoded by the runner before prepare; see mm_embeds)
        embed_idx = embed_vecs = None
        if self.image_token_index is not None and any(
                self.mm_embeds[idx] is not None for idx, _ in active):
            H = next(e.shape[-1] for e in self.mm_embeds if e is not None)
            embed_idx = np.full(T, T, np.int32)
            embed_vecs = np.zeros((T, H), np.float32)
            off = 0
            for row, (idx, rid) in enumerate(active):
                n = num_sched[rid]
                emb = self.mm_embeds[idx]
                pos = self.mm_positions[idx]
                if emb is not None and pos is not None and len(pos):
                    start = self.num_computed_tokens[idx]
                    toks = self.token_ids[idx, start:start + n]
                    local = np.nonzero(
                        toks == self.image_token_index)[0]
                    if len(local):
                        # only PROMPT placeholder positions map to
                        # embeddings — a sampled token that happens to
                        # equal the placeholder id is ordinary text
                        cand = start + local
                        j = np.searchsorted(pos, cand)
                        ok = (j < len(pos)) & (
                            pos[np.minimum(j, len(pos) - 1)] == cand)
                        local, j = local[ok], np.minimum(
                            j, len(pos) - 1)[ok]
                    if len(local):
                        embed_idx[off + local] = off + local
                        embed_vecs[off + local] = emb[np.minimum(
                            j, emb.shape[0] - 1)]
                off += n

        bidir_spans = None
        if self.bidir_mode is not None:
            R = len(seq_lens)
            bidir_spans = np.zeros((R, 2), np.int32)
            for row, (idx, _) in enumerate(active):
                if self.bidir_mode == "prompt":
                    bidir_spans[row] = (0, self.num_prompt_tokens[idx])
                else:  # "mm_span": the image placeholder token range
                    mp = self.mm_positions[idx]
                    if mp is not None and len(mp):
                        bidir_spans[row] = (mp[0], mp[-1] + 1)

        pooling = [self.pooling_params[idx] for idx, _ in active]
        token_req = None
        if any(p is not None for p in pooling):
            token_req = np.full(T, R, np.int32)
            off = 0
            for row, (idx, rid) in enumerate(active):
                n = num_sched[rid]
                token_req[off:off + n] = row
                if pooling[row] is not None and self.pool_start_fn:
                    # instruction tokens are excluded from the pooled
                    # mean: map them to the scratch segment
                    start = self.pool_start_fn(
                        self.token_ids[idx,
                                       :self.num_prompt_tokens[idx]])
                    base = int(self.num_computed_tokens[idx])
                    skip = min(max(start - base, 0), n)
                    if skip:
                        token_req[off:off + skip] = R
                off += n
        else:
            pooling = None

        token_lora = None
        if num_lora_slots > 0:
            token_lora = np.full(T, num_lora_slots, np.int32)
            off = 0
            for row, (idx, rid) in enumerate(active):
                n = num_sched[rid]
                lr = self.lora_requests[idx]
                if lr is not None:
                    token_lora[off:off + n] = \
                        (lora_slots or {}).get(lr.lora_int_id,
                                               num_lora_slots)
                off += n
        return PreparedInputs(
            input_ids=input_ids,
            positions=positions,
            slot_mapping=slot_mapping,
            query_start_loc=qsl,
            seq_lens=seq_lens,
            block_tables=block_tables,
            logits_indices=logits_indices,
            lb_seq=lb_seq,
            lb_q_start=lb_q_start,
            temperature=temperature,
            top_k=top_k,
            top_p=top_p,
            min_p=min_p,
            seeds=seeds,
            req_ids=[rid for _, rid in active],
            sample_valid=sample_valid,
            num_active=num_active,
            presence_penalty=pp,
            frequency_penalty=fp,
            repetition_penalty=rp,
            num_logprobs=nl if np.any(nl >= 0) else None,
            token_lora=token_lora,
            pooling_params=pooling,
            token_req=token_req,
            embed_idx=embed_idx,
            embed_vecs=embed_vecs,
            subst_idx=subst_idx,
            state_slots=state_slots,
            state_reset=state_reset,
            banned_tokens=banned,
            banned_required=banned_req,
            mrope_positions=mrope_positions,
            cascade_meta=cascade_meta,
            bidir_spans=bidir_spans,
            **spec_kw,
        )

    def make_penalty_arrays(self, req_ids: list[str], req_bucket: int,
                            vocab_size: int
                            ) -> tuple[np.ndarray, np.ndarray]:
        """Dense [R, V] output-token counts + prompt one-hot mask for the
        penalty path (host-built; only when penalties are active)."""
        counts = np.zeros((req_bucket, vocab_size), np.int32)
        prompt_mask = np.zeros((req_bucket, vocab_size), bool)
        for row, rid in enumerate(req_ids):
            idx = self.req_id_to_index[rid]
            np_tok = int(self.num_prompt_tokens[idx])
            n_tok = int(self.num_tokens[idx])
            prompt = self.token_ids[idx, :np_tok]
            out = self.token_ids[idx, np_tok:n_tok]
            prompt_mask[row, prompt[prompt < vocab_size]] = True
            if len(out):
                np.add.at(counts[row], out[out < vocab_size], 1)
        return counts, prompt_mask
