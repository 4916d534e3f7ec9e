from vllm_tpu.lora.request import LoRARequest

__all__ = ["LoRARequest"]
