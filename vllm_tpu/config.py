"""Engine configuration tree.

Mirrors the reference's ``VllmConfig`` dataclass tree (reference:
vllm/config.py:280 ModelConfig, :1733 CacheConfig, :1896 ParallelConfig, ...)
with a TPU-native shape: device configuration is a JAX mesh description
(axes dp/pp/tp over chips), compilation settings are token-bucket tables
instead of CUDA-graph options.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass, field
from typing import Any, Optional

# ---------------------------------------------------------------------------
# Model


@dataclass
class ModelConfig:
    """What model to run and how to interpret its checkpoint."""

    model: str = ""
    tokenizer: Optional[str] = None
    trust_remote_code: bool = False
    dtype: str = "bfloat16"  # bfloat16 | float32 | float16(mapped to bf16)
    seed: int = 0
    max_model_len: Optional[int] = None
    quantization: Optional[str] = None  # int8 | int4 | fp8 | gptq | awq | ...
    kv_cache_dtype: str = "auto"  # auto | fp8 | int8
    revision: Optional[str] = None
    tokenizer_mode: str = "auto"
    enforce_eager: bool = False  # disable precompiled buckets (debug)
    hf_config: Any = None  # transformers.PretrainedConfig, resolved lazily
    hf_overrides: Optional[dict[str, Any]] = None
    skip_tokenizer_init: bool = False
    served_model_name: Optional[str] = None
    generation_config: Optional[str] = "auto"
    logprobs_mode: str = "raw_logprobs"
    max_logprobs: int = 20
    # Pooling / task selection ("generate" | "embed" | "classify" | "score")
    task: str = "generate"

    def __post_init__(self) -> None:
        if self.tokenizer is None:
            self.tokenizer = self.model
        if self.dtype in ("float16", "half", "fp16"):
            # TPU has no native fp16 matmul advantage; bf16 is the native type.
            self.dtype = "bfloat16"
        if self.served_model_name is None:
            self.served_model_name = self.model

    def resolve_hf_config(self) -> Any:
        """Load the HF config for `model` (local path or hub id)."""
        if self.hf_config is not None:
            return self.hf_config
        from transformers import AutoConfig

        try:
            self.hf_config = AutoConfig.from_pretrained(
                self.model,
                trust_remote_code=self.trust_remote_code,
                revision=self.revision,
            )
        except (ValueError, KeyError, OSError) as e:
            # remote-code-only model types (Baichuan, ChatGLM, ...):
            # transformers has no config class and this environment has
            # no egress to fetch one — fall back to a generic attribute
            # view of config.json (our model classes only read plain
            # attributes; reference analog: trust_remote_code configs,
            # vllm/transformers_utils/configs/)
            import json
            import os

            from transformers import PretrainedConfig

            cfg_path = os.path.join(self.model, "config.json")
            if not os.path.exists(cfg_path):
                raise e
            with open(cfg_path) as f:
                self.hf_config = PretrainedConfig.from_dict(json.load(f))
            # composite configs (audio/vision + text) nest sub-configs as
            # raw dicts under the generic fallback; model classes expect
            # attribute access (cfg.audio_config.d_model)
            for sub in ("text_config", "audio_config", "vision_config"):
                v = getattr(self.hf_config, sub, None)
                if isinstance(v, dict):
                    setattr(self.hf_config, sub,
                            PretrainedConfig.from_dict(v))
        if self.hf_overrides:
            for k, v in self.hf_overrides.items():
                setattr(self.hf_config, k, v)
        if self.max_model_len is None:
            cfg = self.hf_config
            # multimodal configs nest the LM under text_config
            if not hasattr(cfg, "max_position_embeddings") and \
                    getattr(cfg, "text_config", None) is not None:
                cfg = cfg.text_config
            self.max_model_len = int(
                getattr(cfg, "max_position_embeddings", 2048))
        return self.hf_config

    @property
    def architecture(self) -> str:
        cfg = self.resolve_hf_config()
        archs = getattr(cfg, "architectures", None) or []
        if archs:
            return archs[0]
        # Programmatic configs often lack `architectures`.
        model_type = getattr(cfg, "model_type", "")
        guess = {
            "llama": "LlamaForCausalLM",
            "mistral": "MistralForCausalLM",
            "qwen2": "Qwen2ForCausalLM",
            "qwen3": "Qwen3ForCausalLM",
            "gemma": "GemmaForCausalLM",
            "gemma2": "Gemma2ForCausalLM",
            "mixtral": "MixtralForCausalLM",
            "gpt2": "GPT2LMHeadModel",
            "opt": "OPTForCausalLM",
        }
        return guess.get(model_type, "")

    def get_vocab_size(self) -> int:
        return int(self.resolve_hf_config().vocab_size)

    def get_hidden_size(self) -> int:
        return int(self.resolve_hf_config().hidden_size)


# ---------------------------------------------------------------------------
# Cache


@dataclass
class CacheConfig:
    """Paged KV-cache configuration (reference: vllm/config.py:1733)."""

    block_size: int = 32  # tokens per KV block (page)
    gpu_memory_utilization: float = 0.9  # fraction of HBM to use
    swap_space: float = 0.0  # unused on TPU (no CPU swap; recompute on preempt)
    num_gpu_blocks_override: Optional[int] = None
    enable_prefix_caching: bool = True
    prefix_caching_hash_algo: str = "sha256"  # "sha256" | "builtin"
    cache_dtype: str = "auto"
    # Filled in after memory profiling:
    num_gpu_blocks: Optional[int] = None

    def __post_init__(self) -> None:
        if self.block_size & (self.block_size - 1):
            raise ValueError(
                f"block_size must be a power of two, got {self.block_size}")


# ---------------------------------------------------------------------------
# Parallel


@dataclass
class ParallelConfig:
    """Device-mesh parallelism (reference: vllm/config.py:1896).

    TPU-native: rather than process groups per axis, one
    ``jax.sharding.Mesh`` with named axes ("dp", "pp", "tp") is built over
    the chip topology; layers shard weights with PartitionSpecs and XLA
    inserts ICI/DCN collectives.
    """

    tensor_parallel_size: int = 1
    pipeline_parallel_size: int = 1
    data_parallel_size: int = 1
    expert_parallel_size: int = 1
    enable_expert_parallel: bool = False
    # EPLB (expert-parallel load balancing; reference:
    # vllm/distributed/eplb/): physical expert slots = logical +
    # redundant, per-step load stats recorded in the engine loop,
    # periodic weight rearrangement.
    enable_eplb: bool = False
    eplb_window_size: int = 1000
    eplb_step_interval: int = 3000
    eplb_num_redundant_experts: int = 0
    eplb_log_balancedness: bool = False
    # Sequence-sharded prefill over the TP axis (long-context helper).
    enable_sequence_parallel: bool = False
    distributed_executor_backend: str = "uniproc"  # uniproc | mp
    # Multi-host:
    num_hosts: int = 1
    host_id: int = 0
    coordinator_address: Optional[str] = None

    @property
    def world_size(self) -> int:
        return (self.tensor_parallel_size * self.pipeline_parallel_size *
                self.data_parallel_size)


# ---------------------------------------------------------------------------
# Scheduler


@dataclass
class SchedulerConfig:
    """Continuous-batching scheduler knobs (reference: vllm/config.py:2327)."""

    max_num_batched_tokens: int = 8192  # per-step token budget
    max_num_seqs: int = 256  # max concurrent requests in a batch
    max_model_len: int = 2048
    enable_chunked_prefill: bool = True
    long_prefill_token_threshold: int = 0  # 0 = no per-request cap
    policy: str = "fcfs"  # fcfs | priority
    num_lookahead_tokens: int = 0  # spec-decode lookahead slots
    disable_hybrid_kv_cache_manager: bool = False
    # Lagged sampling: schedule step N before fetching earlier steps'
    # sampled tokens; placeholders substitute on device (reference:
    # vllm --async-scheduling). async_depth = number of dispatched-but-
    # unfetched steps kept in flight. Depth 2 fully hides the fixed D2H
    # fetch RTT behind a whole extra device step (depth 1 leaves the
    # RTT on the loop's critical path: the fetch cannot begin until the
    # step completes, so it serializes with the next dispatch).
    async_scheduling: bool = False
    async_depth: int = 2

    def __post_init__(self) -> None:
        if self.max_num_batched_tokens < 1:
            raise ValueError("max_num_batched_tokens must be >= 1")
        if not self.enable_chunked_prefill:
            # Without chunking, a single prompt must fit the token budget.
            self.max_num_batched_tokens = max(self.max_num_batched_tokens,
                                              self.max_model_len)


# ---------------------------------------------------------------------------
# Device / compilation


@dataclass
class DeviceConfig:
    device: str = "auto"  # auto | tpu | cpu

    def resolved(self) -> str:
        if self.device != "auto":
            return self.device
        import jax

        platform = jax.default_backend()
        return "tpu" if platform in ("tpu", "axon") else platform


@dataclass
class CompilationConfig:
    """Bucketed-precompile settings (TPU analog of CUDA graphs;
    reference precedent: tpu_model_runner._get_token_paddings:1862)."""

    # Token buckets grow exponentially to this limit then linearly by step.
    min_token_bucket: int = 16
    token_bucket_linear_step: int = 1024
    # Request-count buckets (powers of two up to max_num_seqs).
    min_req_bucket: int = 8
    precompile: bool = True

    def token_buckets(self, max_tokens: int) -> list[int]:
        buckets: list[int] = []
        n = self.min_token_bucket
        while n < self.token_bucket_linear_step and n < max_tokens:
            buckets.append(n)
            n *= 2
        while n < max_tokens:
            buckets.append(n)
            n += self.token_bucket_linear_step
        buckets.append(max_tokens)
        return sorted(set(buckets))

    def req_buckets(self, max_reqs: int) -> list[int]:
        buckets: list[int] = []
        n = self.min_req_bucket
        while n < max_reqs:
            buckets.append(n)
            n *= 2
        buckets.append(max_reqs)
        return sorted(set(buckets))


# ---------------------------------------------------------------------------
# Load / LoRA / speculative / observability


@dataclass
class LoadConfig:
    load_format: str = "auto"  # auto | safetensors | dummy | sharded
    download_dir: Optional[str] = None


@dataclass
class LoRAConfig:
    max_lora_rank: int = 16
    max_loras: int = 1
    max_cpu_loras: Optional[int] = None
    lora_dtype: str = "auto"


@dataclass
class SpeculativeConfig:
    """Speculative decoding (reference: vllm/config.py:2699)."""

    method: Optional[str] = None  # ngram | eagle | medusa
    num_speculative_tokens: int = 0
    model: Optional[str] = None  # draft model path (eagle/medusa)
    prompt_lookup_max: int = 5
    prompt_lookup_min: int = 1

    # draft-arch name -> method, mirroring the reference's auto-detect
    # from the draft config (vllm/config.py SpeculativeConfig)
    _ARCH_METHODS = {
        "EagleLlamaForCausalLM": "eagle",
        "EagleLlama4ForCausalLM": "eagle",
        "EagleMiniCPMForCausalLM": "eagle",
        "Eagle3LlamaForCausalLM": "eagle3",
        "LlamaForCausalLMEagle3": "eagle3",
        "MedusaModel": "medusa",
        "MLPSpeculatorPreTrainedModel": "mlp_speculator",
        # multi-token-prediction draft layers shipped inside/alongside
        # the main checkpoint (reference registry: deepseek_mtp.py,
        # mimo_mtp.py, glm4_moe_mtp.py)
        "MiMoMTPModel": "mtp",
        "DeepSeekMTPModel": "mtp",
        "Glm4MoeMTPModel": "mtp",
    }

    def __post_init__(self):
        if self.method is None and self.model:
            import json
            import os

            cfg = os.path.join(self.model, "config.json")
            if os.path.exists(cfg):
                with open(cfg) as f:
                    raw = json.load(f)
                archs = raw.get("architectures") or []
                for a in archs:
                    if a in self._ARCH_METHODS:
                        self.method = self._ARCH_METHODS[a]
                        break
                else:
                    if any("mtp" in a.lower() for a in archs):
                        raise NotImplementedError(
                            f"speculative draft architectures {archs} "
                            "not supported (supported: EAGLE-1/EAGLE-3, "
                            "Medusa, MLPSpeculator, ngram)")

    @property
    def enabled(self) -> bool:
        return self.method is not None and self.num_speculative_tokens > 0


@dataclass
class ObservabilityConfig:
    otlp_traces_endpoint: Optional[str] = None
    collect_detailed_traces: bool = False
    log_stats_interval: float = 10.0


@dataclass
class StructuredOutputConfig:
    backend: str = "auto"  # auto | outlines | xgrammar | builtin
    disable_any_whitespace: bool = False


@dataclass
class KVTransferConfig:
    """Disaggregated prefill/decode connector config (reference:
    vllm/config.py KVTransferConfig)."""

    kv_connector: Optional[str] = None  # e.g. "SharedStorageConnector"
    kv_role: str = "kv_both"  # kv_producer | kv_consumer | kv_both
    kv_connector_extra_config: dict = field(default_factory=dict)


@dataclass
class KVEventsConfig:
    """KV-cache event publishing (reference: vllm/config.py
    KVEventsConfig; events defined in distributed/kv_events.py)."""

    enable_kv_cache_events: bool = False
    publisher: str = "zmq"
    endpoint: str = "tcp://*:5557"
    replay_endpoint: Optional[str] = None
    buffer_steps: int = 10_000
    topic: str = ""


# ---------------------------------------------------------------------------
# Root


@dataclass
class EngineConfig:
    """Root config (reference analog: VllmConfig, vllm/config.py:4025)."""

    model_config: ModelConfig = field(default_factory=ModelConfig)
    cache_config: CacheConfig = field(default_factory=CacheConfig)
    parallel_config: ParallelConfig = field(default_factory=ParallelConfig)
    scheduler_config: SchedulerConfig = field(default_factory=SchedulerConfig)
    device_config: DeviceConfig = field(default_factory=DeviceConfig)
    compilation_config: CompilationConfig = field(
        default_factory=CompilationConfig)
    load_config: LoadConfig = field(default_factory=LoadConfig)
    lora_config: Optional[LoRAConfig] = None
    speculative_config: SpeculativeConfig = field(
        default_factory=SpeculativeConfig)
    observability_config: ObservabilityConfig = field(
        default_factory=ObservabilityConfig)
    structured_output_config: StructuredOutputConfig = field(
        default_factory=StructuredOutputConfig)
    kv_events_config: Optional[KVEventsConfig] = None
    kv_transfer_config: Optional[KVTransferConfig] = None

    def __post_init__(self) -> None:
        # Cross-validation: keep scheduler's view of max_model_len in sync.
        if self.model_config.max_model_len is not None:
            self.scheduler_config.max_model_len = (
                self.model_config.max_model_len)

    def compute_hash(self) -> str:
        """Stable hash of the config, usable as a compile-cache key."""

        def default(o: Any) -> Any:
            if hasattr(o, "__dict__"):
                return {k: v for k, v in vars(o).items()
                        if not k.startswith("_")}
            return str(o)

        payload = json.dumps(self, default=default, sort_keys=True)
        return hashlib.sha256(payload.encode()).hexdigest()[:16]


def get_env_flag(name: str, default: str = "") -> str:
    """Environment flags use the VLLM_TPU_ prefix."""
    return os.environ.get(f"VLLM_TPU_{name}", default)
