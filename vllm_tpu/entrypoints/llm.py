"""Offline inference API (reference: vllm/entrypoints/llm.py:63 LLM)."""

from __future__ import annotations

import itertools
from typing import Any, Optional, Sequence, Union

from tqdm import tqdm as _tqdm

from vllm_tpu.engine.args import EngineArgs
from vllm_tpu.engine.llm_engine import LLMEngine
from vllm_tpu.outputs import (BeamSearchOutput, BeamSearchSequence,
                              PoolingRequestOutput, RequestOutput)
from vllm_tpu.sampling_params import (BeamSearchParams, PoolingParams,
                                      SamplingParams)
from vllm_tpu.utils import Counter


class _Beam:
    __slots__ = ("tokens", "cum_logprob", "finished")

    def __init__(self, tokens: list[int], cum_logprob: float) -> None:
        self.tokens = tokens
        self.cum_logprob = cum_logprob
        self.finished = False


class LLM:

    def __init__(self, model: str, **kwargs: Any) -> None:
        engine_args = EngineArgs(model=model, **kwargs)
        self.llm_engine = LLMEngine.from_engine_args(engine_args)
        self.request_counter = Counter()

    def get_tokenizer(self):
        return self.llm_engine.tokenizer

    # ------------------------------------------------------------- generate

    def generate(
        self,
        prompts: Union[str, dict, Sequence[Union[str, dict]]],
        sampling_params: Union[SamplingParams, Sequence[SamplingParams],
                               None] = None,
        *,
        use_tqdm: bool = False,
        lora_request: Optional[Any] = None,
        priority: Optional[list[int]] = None,
    ) -> list[RequestOutput]:
        if isinstance(prompts, (str, dict)):
            prompts = [prompts]
        if sampling_params is None:
            sampling_params = SamplingParams()
        if isinstance(sampling_params, SamplingParams):
            params_per_prompt = itertools.repeat(sampling_params)
        else:
            if len(sampling_params) != len(prompts):
                raise ValueError(
                    "sampling_params list length must match prompts")
            params_per_prompt = iter(sampling_params)

        request_ids = []
        for i, (prompt, params) in enumerate(zip(prompts,
                                                 params_per_prompt)):
            # n>1: fan out into n child requests sharing the prompt
            # (reference: v1/engine/parallel_sampling.py).
            n = params.n
            for j in range(n):
                rid = f"{next(self.request_counter)}"
                child = params if n == 1 else params.clone()
                if n > 1:
                    child.n = 1
                    if child.seed is not None:
                        child.seed += j
                self.llm_engine.add_request(
                    rid, prompt, child,
                    lora_request=lora_request,
                    priority=priority[i] if priority else 0)
                request_ids.append((rid, i, j))

        return self._run_engine(request_ids, len(prompts), use_tqdm)

    def _run_engine(self, request_ids, num_prompts: int,
                    use_tqdm: bool,
                    regroup: bool = True) -> list[RequestOutput]:
        id_map = {rid: (i, j) for rid, i, j in request_ids}
        results: dict[str, RequestOutput] = {}
        pbar = _tqdm(total=len(id_map),
                     desc="generating") if use_tqdm else None
        while self.llm_engine.has_unfinished_requests():
            for out in self.llm_engine.step():
                if out.finished:
                    results[out.request_id] = out
                    if pbar:
                        pbar.update(1)
        if pbar:
            pbar.close()

        if not regroup:  # pooling: one output per prompt, in order
            ordered = sorted(id_map.items(), key=lambda kv: kv[1])
            return [results[rid] for rid, _ in ordered if rid in results]

        # Regroup n>1 children under their parent prompt.
        grouped: dict[int, list[tuple[int, RequestOutput]]] = {}
        for rid, (i, j) in id_map.items():
            if rid in results:
                grouped.setdefault(i, []).append((j, results[rid]))
        outputs = []
        for i in range(num_prompts):
            children = sorted(grouped.get(i, []))
            if not children:
                continue
            base = children[0][1]
            for j, child in children[1:]:
                child.outputs[0].index = j
                base.outputs.append(child.outputs[0])
            outputs.append(base)
        return outputs

    # ----------------------------------------------------------------- chat

    def chat(
        self,
        messages: Union[list[dict], list[list[dict]]],
        sampling_params: Optional[SamplingParams] = None,
        *,
        chat_template: Optional[str] = None,
        add_generation_prompt: bool = True,
        use_tqdm: bool = False,
    ) -> list[RequestOutput]:
        if messages and isinstance(messages[0], dict):
            messages = [messages]
        tokenizer = self.get_tokenizer()
        prompts = [
            tokenizer.apply_chat_template(
                conv,
                tokenize=False,
                add_generation_prompt=add_generation_prompt,
                chat_template=chat_template) for conv in messages
        ]
        return self.generate(prompts, sampling_params, use_tqdm=use_tqdm)

    # ---------------------------------------------------------- beam search

    def beam_search(self, prompts: Union[str, dict,
                                         Sequence[Union[str, dict]]],
                    params: "BeamSearchParams") -> list["BeamSearchOutput"]:
        """Iterative beam search on top of the engine (reference:
        vllm/entrypoints/llm.py beam_search — one engine step per beam
        token with top-2*width logprobs, expand, keep best beams)."""
        if isinstance(prompts, (str, dict)):
            prompts = [prompts]
        tokenizer = self.get_tokenizer()

        def encode(p):
            if isinstance(p, dict):
                return list(p["prompt_token_ids"]) if "prompt_token_ids" \
                    in p else tokenizer.encode(p["prompt"])
            return tokenizer.encode(p)

        width = params.beam_width
        eos = tokenizer.eos_token_id if tokenizer is not None else None
        all_outputs = []
        for prompt in prompts:
            prompt_ids = encode(prompt)
            beams = [_Beam(list(prompt_ids), 0.0)]
            completed: list[_Beam] = []
            for _ in range(params.max_tokens):
                active = [b for b in beams if not b.finished]
                if not active:
                    break
                sp = SamplingParams(temperature=0.0, max_tokens=1,
                                    logprobs=2 * width, ignore_eos=True)
                rids = []
                for j, beam in enumerate(active):
                    rid = f"beam-{next(self.request_counter)}"
                    self.llm_engine.add_request(
                        rid, {"prompt_token_ids": list(beam.tokens)},
                        sp.clone())
                    rids.append(rid)
                results: dict[str, Any] = {}
                while self.llm_engine.has_unfinished_requests():
                    for out in self.llm_engine.step():
                        if out.finished:
                            results[out.request_id] = out
                candidates: list[_Beam] = [b for b in beams if b.finished]
                for rid, beam in zip(rids, active):
                    out = results[rid]
                    lp_dict = (out.outputs[0].logprobs or [{}])[0]
                    for tid, lp in lp_dict.items():
                        nb = _Beam(beam.tokens + [tid],
                                   beam.cum_logprob + lp.logprob)
                        if (eos is not None and tid == eos
                                and not params.ignore_eos):
                            nb.finished = True
                        candidates.append(nb)
                lp_pen = params.length_penalty

                def score(b: _Beam) -> float:
                    gen = max(len(b.tokens) - len(prompt_ids), 1)
                    return b.cum_logprob / (gen ** lp_pen)

                candidates.sort(key=score, reverse=True)
                beams = candidates[:width]
            completed = sorted(beams, key=lambda b: b.cum_logprob,
                               reverse=True)
            seqs = []
            for b in completed:
                gen_ids = b.tokens[len(prompt_ids):]
                seqs.append(
                    BeamSearchSequence(
                        tokens=b.tokens,
                        text=(tokenizer.decode(gen_ids)
                              if tokenizer is not None else ""),
                        cum_logprob=b.cum_logprob))
            all_outputs.append(BeamSearchOutput(sequences=seqs))
        return all_outputs

    # -------------------------------------------------------------- pooling

    def encode(self, prompts: Union[str, dict, Sequence[Union[str, dict]]],
               pooling_params: Optional[PoolingParams] = None
               ) -> list[PoolingRequestOutput]:
        """Generic pooling pass (reference: LLM.encode, llm.py).

        Any causal LM serves as an embedding model via last/mean pooling
        of final hidden states (the reference's as_embedding_model
        adapter)."""
        if isinstance(prompts, (str, dict)):
            prompts = [prompts]
        pooling_params = pooling_params or PoolingParams()
        rid_list = []
        for i, prompt in enumerate(prompts):
            rid = f"{next(self.request_counter)}"
            self.llm_engine.add_request(rid, prompt,
                                        pooling_params.clone())
            rid_list.append((rid, i, 0))
        outs = self._run_engine(rid_list, len(prompts), use_tqdm=False,
                                regroup=False)
        return outs

    def embed(self, prompts: Union[str, Sequence[str]],
              pooling_params: Optional[PoolingParams] = None
              ) -> list[PoolingRequestOutput]:
        pooling_params = pooling_params or PoolingParams(task="embed")
        return self.encode(prompts, pooling_params)

    def classify(self, prompts: Union[str, Sequence[str]]
                 ) -> list[PoolingRequestOutput]:
        return self.encode(
            prompts, PoolingParams(task="classify", normalize=False,
                                   softmax=True))

    def score(self, text_1: Union[str, Sequence[str]],
              text_2: Union[str, Sequence[str]]
              ) -> list[PoolingRequestOutput]:
        """Cross-encoder relevance scores for (query, document) pairs
        (reference: entrypoints/llm.py LLM.score). Each pair is encoded
        as a single sequence (tokenizer text-pair encoding) and scored
        by the model's classification head."""
        if isinstance(text_1, str):
            text_1 = [text_1]
        if isinstance(text_2, str):
            text_2 = [text_2]
        if len(text_1) == 1 and len(text_2) > 1:
            text_1 = list(text_1) * len(text_2)
        if len(text_1) != len(text_2):
            raise ValueError("text_1 and text_2 length mismatch")
        tok = self.llm_engine.tokenizer
        prompts = [{
            "prompt_token_ids": tok(a, text_pair=b).input_ids
        } for a, b in zip(text_1, text_2)]
        return self.encode(
            prompts, PoolingParams(task="score", normalize=False,
                                   softmax=False))

    # -------------------------------------------------------------- control

    def sleep(self, level: int = 1) -> None:
        self.llm_engine.sleep(level)

    def wake_up(self, tags: Optional[list[str]] = None) -> None:
        self.llm_engine.wake_up(tags)

    def reset_prefix_cache(self) -> bool:
        return self.llm_engine.reset_prefix_cache()

    def collective_rpc(self, method: str, args: tuple = (),
                       kwargs: dict | None = None) -> list[Any]:
        return self.llm_engine.collective_rpc(method, args, kwargs)

    def add_lora(self, lora_request) -> bool:
        return self.llm_engine.add_lora(lora_request)

    def remove_lora(self, lora_id: int) -> bool:
        return self.llm_engine.remove_lora(lora_id)

    def list_loras(self) -> set[int]:
        return self.llm_engine.list_loras()

    def start_profile(self) -> None:
        self.llm_engine.start_profile()

    def stop_profile(self) -> None:
        self.llm_engine.stop_profile()
