"""Phi-3 (reference parity: vllm/model_executor/models/phi3.py — a Llama
variant whose checkpoint ships pre-fused qkv_proj and gate_up_proj)."""

from __future__ import annotations

from vllm_tpu.models.llama import LlamaForCausalLM, ModelArgs


class Phi3ForCausalLM(LlamaForCausalLM):

    def _hf_layer_map(self):
        m = super()._hf_layer_map()
        # Phi-3 fuses in the checkpoint already; map the whole tensors.
        m["self_attn.qkv_proj.weight"] = ("qkv.w", "", True)
        m["mlp.gate_up_proj.weight"] = ("gate_up.w", "", True)
        return m
