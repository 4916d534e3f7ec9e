"""LoRA adapter request (reference behavior parity: vllm/lora/request.py
LoRARequest — identifies one adapter for a generation request)."""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class LoRARequest:
    lora_name: str
    lora_int_id: int
    lora_path: str

    def __post_init__(self) -> None:
        if self.lora_int_id < 1:
            raise ValueError(
                f"lora_int_id must be > 0, got {self.lora_int_id}")

    def __hash__(self) -> int:
        return hash(self.lora_int_id)

    def __eq__(self, other) -> bool:
        return (isinstance(other, LoRARequest)
                and self.lora_int_id == other.lora_int_id)
