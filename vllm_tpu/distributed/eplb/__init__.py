"""Expert-parallel load balancing (reference: vllm/distributed/eplb/)."""

from vllm_tpu.distributed.eplb.eplb_state import EplbConfig, EplbState
from vllm_tpu.distributed.eplb.rebalance_algo import (balanced_packing,
                                                      rebalance_experts,
                                                      replicate_experts)
from vllm_tpu.distributed.eplb.rebalance_execute import (
    expand_to_physical, map_to_physical, permute_expert_weights)

__all__ = [
    "EplbConfig", "EplbState", "balanced_packing", "rebalance_experts",
    "replicate_experts", "expand_to_physical", "map_to_physical",
    "permute_expert_weights"
]
