from vllm_tpu.profiler.layerwise import (layerwise_profile,
                                         summarize_trace)

__all__ = ["layerwise_profile", "summarize_trace"]
