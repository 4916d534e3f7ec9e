"""Input processing: tokenize, validate, normalize
(reference: vllm/v1/engine/processor.py:219 Processor.process_inputs)."""

from __future__ import annotations

import time
from typing import Any, Optional, Union

from vllm_tpu.config import EngineConfig
from vllm_tpu.engine import EngineCoreRequest
from vllm_tpu.sampling_params import PoolingParams, SamplingParams

PromptType = Union[str, dict]


class Processor:

    def __init__(self, engine_config: EngineConfig, tokenizer) -> None:
        self.config = engine_config
        self.model_config = engine_config.model_config
        self.tokenizer = tokenizer
        self.max_model_len = engine_config.scheduler_config.max_model_len

    @property
    def eos_token_id(self) -> Optional[int]:
        if self.tokenizer is None:
            return None
        return self.tokenizer.eos_token_id

    def process_inputs(
        self,
        request_id: str,
        prompt: PromptType,
        params: Union[SamplingParams, PoolingParams, None],
        arrival_time: Optional[float] = None,
        lora_request: Optional[Any] = None,
        priority: int = 0,
    ) -> EngineCoreRequest:
        if arrival_time is None:
            arrival_time = time.monotonic()

        cache_salt = None
        mm_inputs = None
        if isinstance(prompt, str):
            if self.tokenizer is None:
                raise ValueError("text prompts require a tokenizer")
            prompt_token_ids = self.tokenizer.encode(prompt)
        elif isinstance(prompt, dict):
            cache_salt = prompt.get("cache_salt")
            mm_inputs = prompt.get("multi_modal_data")
            if "prompt_token_ids" in prompt:
                prompt_token_ids = list(prompt["prompt_token_ids"])
            elif "prompt" in prompt:
                prompt_token_ids = self.tokenizer.encode(prompt["prompt"])
            else:
                raise ValueError(
                    "prompt dict needs 'prompt' or 'prompt_token_ids'")
        else:
            raise TypeError(f"unsupported prompt type {type(prompt)}")

        # Encoder-decoder TEXT models (BART family): the prompt is the
        # ENCODER input; the decoder generates from decoder_start_token
        # (reference: vllm encoder-decoder inputs,
        # inputs/preprocess.py ExplicitEncoderDecoderPrompt). An explicit
        # {"encoder_prompt_token_ids", "decoder_prompt_token_ids"} dict
        # overrides the implicit rewrite.
        hf_cfg = getattr(self.model_config, "hf_config", None)
        if (getattr(hf_cfg, "is_encoder_decoder", False)
                and getattr(hf_cfg, "model_type", "")
                in ("bart", "mbart", "plbart")
                and mm_inputs is None):
            import numpy as _np

            enc_ids = prompt_token_ids
            dec_ids = None
            if isinstance(prompt, dict):
                if "encoder_prompt_token_ids" in prompt:
                    enc_ids = list(prompt["encoder_prompt_token_ids"])
                dec_ids = prompt.get("decoder_prompt_token_ids")
            start = int(getattr(hf_cfg, "decoder_start_token_id", None)
                        or 2)
            prompt_token_ids = (list(dec_ids) if dec_ids
                                else [start])
            mm_inputs = {
                "encoder_input_ids": _np.asarray(enc_ids, _np.int32)
            }

        self._validate(request_id, prompt_token_ids, params,
                       has_mm=mm_inputs is not None)

        # Content-hash multimodal inputs so encoder outputs dedup across
        # requests and image prompts stay prefix-cacheable (reference:
        # vllm/multimodal mm hasher + kv_cache_utils.py:24 extra_keys).
        mm_hashes = None
        encoder_token_count = 0
        if mm_inputs is not None:
            import hashlib

            import numpy as np

            if "encoder_input_ids" in mm_inputs:
                # encoder-decoder text (BART family): hash the encoder
                # token ids; the budget counts encoder positions
                ids = np.asarray(mm_inputs["encoder_input_ids"])
                mm_hashes = [
                    hashlib.sha256(
                        np.ascontiguousarray(ids).tobytes())
                    .hexdigest()[:32]
                ]
                encoder_token_count = int(ids.shape[-1])
                imgs = []
            elif "input_features" in mm_inputs:
                # audio (Whisper-family): hash the mel features; the
                # encoder budget counts encoder positions (frames/2)
                feats = np.asarray(mm_inputs["input_features"])
                mm_hashes = [
                    hashlib.sha256(
                        np.ascontiguousarray(feats).tobytes())
                    .hexdigest()[:32]
                ]
                encoder_token_count = int(feats.shape[-1]) // 2
                imgs = []
            else:
                pv = np.asarray(mm_inputs.get("pixel_values"))
                imgs = pv if pv.ndim == 4 else pv[None]
                mm_hashes = [
                    hashlib.sha256(np.ascontiguousarray(img).tobytes())
                    .hexdigest()[:32] for img in imgs
                ]
            # Resolve the image placeholder token the way the models do:
            # LLaVA-family configs call it image_token_index, Qwen2-VL
            # image_token_id (ADVICE r02: using only the former made the
            # encoder budget count 0 tokens/image for Qwen2-VL).
            hf = getattr(self.model_config, "hf_config", None)
            itok = (getattr(hf, "image_token_index", None)
                    or getattr(hf, "image_token_id", None))
            if itok is not None:
                encoder_token_count = sum(
                    1 for t in prompt_token_ids if t == itok)

        sampling_params = None
        pooling_params = None
        if isinstance(params, PoolingParams):
            pooling_params = params
        else:
            sampling_params = (params or SamplingParams()).clone()
            # Convert stop strings' implied token budget: cap max_tokens to
            # what fits the context window.
            room = self.max_model_len - len(prompt_token_ids)
            if sampling_params.max_tokens is None:
                sampling_params.max_tokens = room
            else:
                sampling_params.max_tokens = min(sampling_params.max_tokens,
                                                 room)
            if self.tokenizer is not None:
                sampling_params.update_from_generation_config(
                    self.tokenizer.eos_token_id)
                if sampling_params.bad_words:
                    sampling_params.update_bad_words(self.tokenizer)

        return EngineCoreRequest(
            request_id=request_id,
            prompt_token_ids=prompt_token_ids,
            sampling_params=sampling_params,
            pooling_params=pooling_params,
            eos_token_id=self.eos_token_id,
            arrival_time=arrival_time,
            lora_request=lora_request,
            cache_salt=cache_salt,
            mm_inputs=mm_inputs,
            mm_hashes=mm_hashes,
            encoder_token_count=encoder_token_count,
            priority=priority,
        )

    def _validate(self, request_id: str, prompt_token_ids: list[int],
                  params, has_mm: bool = False) -> None:
        if not prompt_token_ids:
            raise ValueError(f"request {request_id}: empty prompt")
        if len(prompt_token_ids) >= self.max_model_len:
            raise ValueError(
                f"request {request_id}: prompt length "
                f"{len(prompt_token_ids)} >= max_model_len "
                f"{self.max_model_len}")
        if isinstance(params, SamplingParams):
            if params.logprobs and \
                    params.logprobs > self.model_config.max_logprobs:
                raise ValueError(
                    f"logprobs {params.logprobs} > max_logprobs "
                    f"{self.model_config.max_logprobs}")
        elif isinstance(params, PoolingParams):
            # pooling prompts must fit one device step (the scheduler
            # schedules them all-or-nothing so every token's hidden state
            # is available to the pooler)
            budget = self.config.scheduler_config.max_num_batched_tokens
            if len(prompt_token_ids) > budget:
                raise ValueError(
                    f"request {request_id}: pooling prompt length "
                    f"{len(prompt_token_ids)} > max_num_batched_tokens "
                    f"{budget}")
        if has_mm:
            return  # placeholder ids may exceed the tokenizer vocab
        # validate against the MODEL vocab (embeddings width) — sampled
        # ids from the padded vocab region are legal inputs even when the
        # tokenizer has no string for them
        vocab = None
        hf = getattr(self.model_config, "hf_config", None)
        if hf is not None:
            vocab = getattr(hf, "vocab_size", None)
        if not vocab and self.tokenizer is not None:
            vocab = max(getattr(self.tokenizer, "vocab_size", 0),
                        len(self.tokenizer))
        if vocab:
            bad = [t for t in prompt_token_ids if t < 0 or t >= vocab]
            if bad:
                raise ValueError(
                    f"request {request_id}: token ids out of vocab: "
                    f"{bad[:5]}")
