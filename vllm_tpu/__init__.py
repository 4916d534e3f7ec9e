"""vllm-tpu: a TPU-native LLM inference serving engine.

Built from scratch in JAX/XLA/Pallas with the capabilities of vLLM
(reference: ROCm/vllm): PagedAttention over a block-table KV cache,
continuous batching with chunked prefill and prefix caching, weight-only
INT4/INT8 + FP8 quantization, OpenAI-compatible serving, and multi-chip
scaling via jax.sharding meshes.
"""

__version__ = "0.1.0"

from vllm_tpu.sampling_params import SamplingParams
from vllm_tpu.outputs import CompletionOutput, RequestOutput


def __getattr__(name):
    # Lazy imports: keep `import vllm_tpu` cheap (no jax / model imports).
    if name == "LLM":
        from vllm_tpu.entrypoints.llm import LLM

        return LLM
    if name == "EngineArgs":
        from vllm_tpu.engine.args import EngineArgs

        return EngineArgs
    if name == "AsyncLLM":
        from vllm_tpu.engine.async_llm import AsyncLLM

        return AsyncLLM
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = [
    "LLM",
    "AsyncLLM",
    "EngineArgs",
    "SamplingParams",
    "CompletionOutput",
    "RequestOutput",
    "__version__",
]
