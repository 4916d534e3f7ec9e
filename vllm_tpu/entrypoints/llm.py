"""Offline inference API (reference: vllm/entrypoints/llm.py:63 LLM)."""

from __future__ import annotations

import itertools
from typing import Any, Optional, Sequence, Union

from tqdm import tqdm as _tqdm

from vllm_tpu.engine.args import EngineArgs
from vllm_tpu.engine.llm_engine import LLMEngine
from vllm_tpu.outputs import PoolingRequestOutput, RequestOutput
from vllm_tpu.sampling_params import PoolingParams, SamplingParams
from vllm_tpu.utils import Counter


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
