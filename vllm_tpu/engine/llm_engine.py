"""Synchronous engine facade (reference: vllm/v1/engine/llm_engine.py:41)."""

from __future__ import annotations

import logging
from typing import Any, Optional, Union

from vllm_tpu.config import EngineConfig
from vllm_tpu.engine.core import EngineCore
from vllm_tpu.engine.output_processor import OutputProcessor
from vllm_tpu.engine.processor import Processor, PromptType
from vllm_tpu.outputs import RequestOutput
from vllm_tpu.sampling_params import PoolingParams, SamplingParams

logger = logging.getLogger(__name__)


def build_tokenizer(model_config) -> Any:
    if model_config.skip_tokenizer_init:
        return None
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(
        model_config.tokenizer,
        trust_remote_code=model_config.trust_remote_code)


class LLMEngine:

    def __init__(self, engine_config: EngineConfig,
                 log_stats: bool = False) -> None:
        self.config = engine_config
        self.tokenizer = build_tokenizer(engine_config.model_config)
        self.processor = Processor(engine_config, self.tokenizer)
        from vllm_tpu.tracing import init_tracer

        self.tracer = init_tracer(
            "vllm_tpu",
            engine_config.observability_config.otlp_traces_endpoint
            if engine_config.observability_config else None)
        self.output_processor = OutputProcessor(
            self.tokenizer, log_stats, tracer=self.tracer,
            model_name=engine_config.model_config.served_model_name)
        self.engine_core = EngineCore(engine_config, log_stats=log_stats)
        if self.engine_core.structured_output_manager is not None:
            self.engine_core.structured_output_manager.attach_tokenizer(
                self.tokenizer)
        # anonymous usage telemetry (reference: usage_lib.py:123; local
        # sink only — no egress here). Opt out: VLLM_NO_USAGE_STATS=1
        from vllm_tpu.usage import UsageContext, usage_message

        mc = engine_config.model_config
        pc = engine_config.parallel_config
        usage_message.report_usage(
            mc.architecture or "", UsageContext.ENGINE_CONTEXT,
            extra_kvs={
                "dtype": str(mc.dtype),
                "quantization": str(mc.quantization),
                "kv_cache_dtype": str(
                    engine_config.cache_config.cache_dtype),
                "block_size": engine_config.cache_config.block_size,
                "max_model_len":
                engine_config.scheduler_config.max_model_len,
                "max_num_seqs":
                engine_config.scheduler_config.max_num_seqs,
                "tensor_parallel_size": pc.tensor_parallel_size,
                "pipeline_parallel_size": pc.pipeline_parallel_size,
                "data_parallel_size": pc.data_parallel_size,
                "enable_expert_parallel": pc.enable_expert_parallel,
            })

    @classmethod
    def from_engine_args(cls, engine_args) -> "LLMEngine":
        return cls(engine_args.create_engine_config())

    # ------------------------------------------------------------- requests

    def add_request(
        self,
        request_id: str,
        prompt: PromptType,
        params: Union[SamplingParams, PoolingParams, None] = None,
        arrival_time: Optional[float] = None,
        lora_request: Optional[Any] = None,
        priority: int = 0,
    ) -> None:
        request = self.processor.process_inputs(request_id, prompt, params,
                                                arrival_time, lora_request,
                                                priority)
        prompt_text = prompt if isinstance(prompt, str) else (
            prompt.get("prompt") if isinstance(prompt, dict) else None)
        self.output_processor.add_request(request, prompt_text)
        self.engine_core.add_request(request)

    def abort_request(self, request_ids: list[str]) -> None:
        self.output_processor.abort_requests(request_ids)
        self.engine_core.abort_requests(request_ids)

    # ---------------------------------------------------------------- step

    def step(self) -> list[RequestOutput]:
        outputs_by_client = self.engine_core.step()
        all_outputs: list[RequestOutput] = []
        for ec_outputs in outputs_by_client.values():
            result = self.output_processor.process_outputs(
                ec_outputs.outputs)
            all_outputs.extend(result.request_outputs)
            if result.reqs_to_abort:
                # stop-string hits detected post-detokenization
                self.engine_core.abort_requests(result.reqs_to_abort)
        return all_outputs

    def has_unfinished_requests(self) -> bool:
        return (self.engine_core.has_unfinished_requests()
                or self.output_processor.has_unfinished_requests())

    def get_num_unfinished_requests(self) -> int:
        return self.output_processor.get_num_unfinished_requests()

    # ------------------------------------------------------------- control

    def reset_prefix_cache(self) -> bool:
        return self.engine_core.reset_prefix_cache()

    def collective_rpc(self, method: str, args: tuple = (),
                       kwargs: dict | None = None) -> list[Any]:
        return self.engine_core.collective_rpc(method, args, kwargs)

    def save_sharded_state(self, path: str) -> None:
        self.engine_core.save_sharded_state(path)

    def sleep(self, level: int = 1) -> None:
        self.engine_core.sleep(level)

    def wake_up(self, tags: Optional[list[str]] = None) -> None:
        self.engine_core.wake_up(tags)

    def add_lora(self, lora_request) -> bool:
        return self.engine_core.add_lora(lora_request)

    def remove_lora(self, lora_id: int) -> bool:
        return self.engine_core.remove_lora(lora_id)

    def list_loras(self) -> set[int]:
        return self.engine_core.list_loras()

    def pin_lora(self, lora_id: int) -> bool:
        return self.engine_core.pin_lora(lora_id)

    def start_profile(self) -> None:
        self.engine_core.profile(True)

    def stop_profile(self) -> None:
        self.engine_core.profile(False)

    def shutdown(self) -> None:
        self.engine_core.shutdown()
