"""CLI/programmatic engine arguments -> EngineConfig
(reference: vllm/engine/arg_utils.py EngineArgs)."""

from __future__ import annotations

import argparse
from dataclasses import dataclass, field, fields
from typing import Optional

from vllm_tpu.config import (CacheConfig, CompilationConfig, DeviceConfig,
                             EngineConfig, KVEventsConfig,
                             KVTransferConfig, LoadConfig, LoRAConfig,
                             ModelConfig, ObservabilityConfig,
                             ParallelConfig, SchedulerConfig,
                             SpeculativeConfig, StructuredOutputConfig)


@dataclass
class EngineArgs:
    model: str = ""
    tokenizer: Optional[str] = None
    trust_remote_code: bool = False
    dtype: str = "bfloat16"
    seed: int = 0
    max_model_len: Optional[int] = None
    quantization: Optional[str] = None
    kv_cache_dtype: str = "auto"
    served_model_name: Optional[str] = None
    enforce_eager: bool = False
    skip_tokenizer_init: bool = False
    task: str = "generate"

    block_size: int = 32
    gpu_memory_utilization: float = 0.9
    num_gpu_blocks_override: Optional[int] = None
    enable_prefix_caching: bool = True
    prefix_caching_hash_algo: str = "sha256"

    tensor_parallel_size: int = 1
    pipeline_parallel_size: int = 1
    data_parallel_size: int = 1
    enable_expert_parallel: bool = False
    enable_eplb: bool = False
    eplb_window_size: int = 1000
    eplb_step_interval: int = 3000
    eplb_num_redundant_experts: int = 0
    distributed_executor_backend: str = "uniproc"
    # Multi-host: host 0 is the driver (scheduler + front-end), others
    # run the follower verb loop (vllm-tpu serve --headless).
    num_hosts: int = 1
    host_id: int = 0
    coordinator_address: Optional[str] = None

    max_num_batched_tokens: int = 8192
    max_num_seqs: int = 256
    enable_chunked_prefill: bool = True
    long_prefill_token_threshold: int = 0
    scheduling_policy: str = "fcfs"
    async_scheduling: bool = False

    load_format: str = "auto"
    device: str = "auto"

    speculative_method: Optional[str] = None
    num_speculative_tokens: int = 0
    speculative_model: Optional[str] = None

    enable_lora: bool = False
    max_loras: int = 1
    max_lora_rank: int = 16
    max_cpu_loras: Optional[int] = None
    lora_dtype: str = "auto"

    otlp_traces_endpoint: Optional[str] = None
    guided_decoding_backend: str = "auto"
    # JSON string (reference: --kv-transfer-config / --kv-events-config)
    kv_transfer_config: Optional[str] = None
    kv_events_config: Optional[str] = None
    # Programmatic-only: inject a transformers config instead of reading
    # one from the model path (dummy-weight benchmarks, tests).
    hf_config: Optional[object] = None

    def create_engine_config(self) -> EngineConfig:
        model_config = ModelConfig(
            model=self.model,
            tokenizer=self.tokenizer,
            trust_remote_code=self.trust_remote_code,
            dtype=self.dtype,
            seed=self.seed,
            max_model_len=self.max_model_len,
            quantization=self.quantization,
            kv_cache_dtype=self.kv_cache_dtype,
            served_model_name=self.served_model_name,
            enforce_eager=self.enforce_eager,
            skip_tokenizer_init=self.skip_tokenizer_init,
            task=self.task,
            hf_config=self.hf_config,
        )
        # Resolve max_model_len from the checkpoint before wiring the
        # scheduler config.
        model_config.resolve_hf_config()
        cache_config = CacheConfig(
            block_size=self.block_size,
            gpu_memory_utilization=self.gpu_memory_utilization,
            num_gpu_blocks_override=self.num_gpu_blocks_override,
            enable_prefix_caching=self.enable_prefix_caching,
            prefix_caching_hash_algo=self.prefix_caching_hash_algo,
            cache_dtype=self.kv_cache_dtype,
        )
        backend = self.distributed_executor_backend
        if self.num_hosts > 1 and backend in ("uniproc", "auto"):
            backend = "multihost"
        parallel_config = ParallelConfig(
            tensor_parallel_size=self.tensor_parallel_size,
            pipeline_parallel_size=self.pipeline_parallel_size,
            data_parallel_size=self.data_parallel_size,
            enable_expert_parallel=self.enable_expert_parallel,
            enable_eplb=self.enable_eplb,
            eplb_window_size=self.eplb_window_size,
            eplb_step_interval=self.eplb_step_interval,
            eplb_num_redundant_experts=self.eplb_num_redundant_experts,
            distributed_executor_backend=backend,
            num_hosts=self.num_hosts,
            host_id=self.host_id,
            coordinator_address=self.coordinator_address,
        )
        scheduler_config = SchedulerConfig(
            max_num_batched_tokens=self.max_num_batched_tokens,
            max_num_seqs=self.max_num_seqs,
            max_model_len=model_config.max_model_len or 2048,
            enable_chunked_prefill=self.enable_chunked_prefill,
            long_prefill_token_threshold=self.long_prefill_token_threshold,
            policy=self.scheduling_policy,
            async_scheduling=self.async_scheduling,
        )
        if self.async_scheduling and self.speculative_method:
            raise ValueError(
                "--async-scheduling is incompatible with speculative "
                "decoding (drafts need the previous step's tokens)")
        speculative_config = SpeculativeConfig(
            method=self.speculative_method,
            num_speculative_tokens=self.num_speculative_tokens,
            model=self.speculative_model,
        )
        return EngineConfig(
            model_config=model_config,
            cache_config=cache_config,
            parallel_config=parallel_config,
            scheduler_config=scheduler_config,
            device_config=DeviceConfig(device=self.device),
            compilation_config=CompilationConfig(
                precompile=not self.enforce_eager),
            load_config=LoadConfig(load_format=self.load_format),
            speculative_config=speculative_config,
            observability_config=ObservabilityConfig(
                otlp_traces_endpoint=self.otlp_traces_endpoint),
            structured_output_config=StructuredOutputConfig(
                backend=self.guided_decoding_backend),
            lora_config=(LoRAConfig(
                max_lora_rank=self.max_lora_rank,
                max_loras=self.max_loras,
                max_cpu_loras=self.max_cpu_loras,
                lora_dtype=self.lora_dtype,
            ) if self.enable_lora else None),
            kv_transfer_config=self._parse_json_config(
                self.kv_transfer_config, KVTransferConfig),
            kv_events_config=self._parse_json_config(
                self.kv_events_config, KVEventsConfig),
        )

    @staticmethod
    def _parse_json_config(raw, cls):
        if raw is None:
            return None
        if isinstance(raw, cls):
            return raw
        import json

        data = json.loads(raw) if isinstance(raw, str) else dict(raw)
        return cls(**data)

    @staticmethod
    def add_cli_args(parser: argparse.ArgumentParser
                     ) -> argparse.ArgumentParser:
        for f in fields(EngineArgs):
            if f.name == "hf_config":
                continue
            name = "--" + f.name.replace("_", "-")
            default = f.default
            ann = str(f.type)
            if "bool" in ann or isinstance(default, bool):
                parser.add_argument(name, action="store_true"
                                    if not default else "store_false",
                                    default=default)
            elif "float" in ann:
                parser.add_argument(name, type=float, default=default)
            elif "int" in ann:
                parser.add_argument(name, type=int, default=default)
            else:
                parser.add_argument(name, type=str, default=default)
        return parser

    @classmethod
    def from_cli_args(cls, args: argparse.Namespace) -> "EngineArgs":
        names = {f.name for f in fields(cls)}
        return cls(**{k: v for k, v in vars(args).items() if k in names})
