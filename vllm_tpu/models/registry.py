"""Model registry (reference: vllm/model_executor/models/registry.py:37).

Maps HF ``architectures[0]`` strings to lazily-imported model classes.
Plugin-extensible via ``register_model``.
"""

from __future__ import annotations

import importlib
from typing import TYPE_CHECKING, Callable

if TYPE_CHECKING:
    from vllm_tpu.config import ModelConfig

# arch name -> (module, class name)
_TEXT_GENERATION_MODELS: dict[str, tuple[str, str]] = {
    "LlamaForCausalLM": ("vllm_tpu.models.llama", "LlamaForCausalLM"),
    "MistralForCausalLM": ("vllm_tpu.models.llama", "MistralForCausalLM"),
    "Qwen2ForCausalLM": ("vllm_tpu.models.llama", "Qwen2ForCausalLM"),
    "Qwen3ForCausalLM": ("vllm_tpu.models.llama", "Qwen3ForCausalLM"),
    "Gemma2ForCausalLM": ("vllm_tpu.models.gemma", "Gemma2ForCausalLM"),
    "Gemma3ForCausalLM": ("vllm_tpu.models.gemma", "Gemma3ForCausalLM"),
    "Gemma3nForCausalLM": ("vllm_tpu.models.gemma3n",
                           "Gemma3nForCausalLM"),
    "Gemma3nForConditionalGeneration": (
        "vllm_tpu.models.gemma3n", "Gemma3nForConditionalGeneration"),
    "GemmaForCausalLM": ("vllm_tpu.models.gemma", "GemmaForCausalLM"),
    "OPTForCausalLM": ("vllm_tpu.models.opt", "OPTForCausalLM"),
    "GPT2LMHeadModel": ("vllm_tpu.models.gpt2", "GPT2LMHeadModel"),
    "GPTBigCodeForCausalLM": ("vllm_tpu.models.gpt2",
                              "GPTBigCodeForCausalLM"),
    "MixtralForCausalLM": ("vllm_tpu.models.mixtral", "MixtralForCausalLM"),
    "DbrxForCausalLM": ("vllm_tpu.models.moe_variants",
                        "DbrxForCausalLM"),
    # checkpoint configs spell it PhiMoEForCausalLM; transformers'
    # class is PhimoeForCausalLM — accept both
    "PhiMoEForCausalLM": ("vllm_tpu.models.moe_variants",
                          "PhiMoEForCausalLM"),
    "PhimoeForCausalLM": ("vllm_tpu.models.moe_variants",
                          "PhiMoEForCausalLM"),
    "Qwen2MoeForCausalLM": ("vllm_tpu.models.mixtral",
                            "Qwen2MoeForCausalLM"),
    "Qwen3MoeForCausalLM": ("vllm_tpu.models.mixtral",
                            "Qwen3MoeForCausalLM"),
    "Phi3ForCausalLM": ("vllm_tpu.models.phi3", "Phi3ForCausalLM"),
    "GPTNeoXForCausalLM": ("vllm_tpu.models.neox", "GPTNeoXForCausalLM"),
    "PhiForCausalLM": ("vllm_tpu.models.neox", "PhiForCausalLM"),
    "StableLmForCausalLM": ("vllm_tpu.models.neox",
                            "StableLmForCausalLM"),
    "Starcoder2ForCausalLM": ("vllm_tpu.models.neox",
                              "Starcoder2ForCausalLM"),
    "CohereForCausalLM": ("vllm_tpu.models.neox", "CohereForCausalLM"),
    "Cohere2ForCausalLM": ("vllm_tpu.models.neox", "CohereForCausalLM"),
    "DeepseekV2ForCausalLM": ("vllm_tpu.models.deepseek",
                              "DeepseekV2ForCausalLM"),
    "DeepseekV3ForCausalLM": ("vllm_tpu.models.deepseek",
                              "DeepseekV3ForCausalLM"),
    "InternLM2ForCausalLM": ("vllm_tpu.models.llama_variants",
                             "InternLM2ForCausalLM"),
    "InternLM2ForRewardModel": ("vllm_tpu.models.llama_variants",
                                "InternLM2ForRewardModel"),
    "RobertaForMaskedLM": ("vllm_tpu.models.bert", "XLMRobertaModel"),
    "TinyLlamaForCausalLM": ("vllm_tpu.models.llama", "LlamaForCausalLM"),
    "OlmoeForCausalLM": ("vllm_tpu.models.mixtral", "OlmoeForCausalLM"),
    "Qwen2VLForConditionalGeneration": (
        "vllm_tpu.models.qwen2_vl", "Qwen2VLForConditionalGeneration"),
    "Glm4vForConditionalGeneration": (
        "vllm_tpu.models.glm4v", "Glm4vForConditionalGeneration"),
    "Qwen2_5_VLForConditionalGeneration": (
        "vllm_tpu.models.qwen2_vl", "Qwen25VLForConditionalGeneration"),
    "XLMRobertaModel": ("vllm_tpu.models.bert", "XLMRobertaModel"),
    "RobertaModel": ("vllm_tpu.models.bert", "XLMRobertaModel"),
    "XLMRobertaForSequenceClassification": (
        "vllm_tpu.models.bert", "XLMRobertaForSequenceClassification"),
    "RobertaForSequenceClassification": (
        "vllm_tpu.models.bert", "XLMRobertaForSequenceClassification"),
    "GraniteMoeForCausalLM": ("vllm_tpu.models.mixtral",
                              "GraniteMoeForCausalLM"),
    "FalconForCausalLM": ("vllm_tpu.models.misc_archs",
                          "FalconForCausalLM"),
    "RWForCausalLM": ("vllm_tpu.models.misc_archs", "FalconForCausalLM"),
    "GPTJForCausalLM": ("vllm_tpu.models.misc_archs", "GPTJForCausalLM"),
    "PersimmonForCausalLM": ("vllm_tpu.models.misc_archs",
                             "PersimmonForCausalLM"),
    "BloomForCausalLM": ("vllm_tpu.models.misc_archs",
                         "BloomForCausalLM"),
    "MptForCausalLM": ("vllm_tpu.models.misc_archs", "MptForCausalLM"),
    "MPTForCausalLM": ("vllm_tpu.models.misc_archs", "MptForCausalLM"),
    # llama-compatible arch aliases (reference registry.py maps these
    # straight to LlamaForCausalLM; InternLM's `bias` / InternLM3's
    # `qkv_bias` ride ModelArgs.from_hf_config)
    "AquilaForCausalLM": ("vllm_tpu.models.llama", "LlamaForCausalLM"),
    "AquilaModel": ("vllm_tpu.models.llama", "LlamaForCausalLM"),
    "LLaMAForCausalLM": ("vllm_tpu.models.llama", "LlamaForCausalLM"),
    "XverseForCausalLM": ("vllm_tpu.models.llama", "LlamaForCausalLM"),
    "InternLMForCausalLM": ("vllm_tpu.models.llama", "LlamaForCausalLM"),
    "InternLM3ForCausalLM": ("vllm_tpu.models.llama",
                             "LlamaForCausalLM"),
    "MllamaForConditionalGeneration": ("vllm_tpu.models.mllama",
                                       "MllamaForConditionalGeneration"),
    "BaiChuanForCausalLM": ("vllm_tpu.models.misc_archs",
                            "BaiChuanForCausalLM"),
    "BaichuanForCausalLM": ("vllm_tpu.models.misc_archs",
                            "BaichuanForCausalLM"),
    # bare-backbone embedding archs (e5-mistral, gte-Qwen2, ...)
    "LlamaModel": ("vllm_tpu.models.decoder_embed", "LlamaModel"),
    "MistralModel": ("vllm_tpu.models.decoder_embed", "MistralModel"),
    "Qwen2Model": ("vllm_tpu.models.decoder_embed", "Qwen2Model"),
    "Gemma2Model": ("vllm_tpu.models.decoder_embed", "Gemma2Model"),
    "GPT2ForSequenceClassification": ("vllm_tpu.models.gpt2",
                                      "GPT2ForSequenceClassification"),
    "Qwen2ForRewardModel": ("vllm_tpu.models.qwen2_rm",
                            "Qwen2ForRewardModel"),
    "Qwen2ForProcessRewardModel": ("vllm_tpu.models.qwen2_rm",
                                   "Qwen2ForProcessRewardModel"),
    "OlmoForCausalLM": ("vllm_tpu.models.misc_archs",
                        "OlmoForCausalLM"),
    "ChatGLMModel": ("vllm_tpu.models.misc_archs", "ChatGLMForCausalLM"),
    "ChatGLMForConditionalGeneration": ("vllm_tpu.models.misc_archs",
                                        "ChatGLMForCausalLM"),
    "Olmo2ForCausalLM": ("vllm_tpu.models.llama_variants",
                         "Olmo2ForCausalLM"),
    "Fairseq2LlamaForCausalLM": ("vllm_tpu.models.llama_variants",
                                 "Fairseq2LlamaForCausalLM"),
    "Ernie4_5ForCausalLM": ("vllm_tpu.models.llama_variants",
                            "Ernie4_5ForCausalLM"),
    "SmolLM3ForCausalLM": ("vllm_tpu.models.llama_variants",
                           "SmolLM3ForCausalLM"),
    "SeedOssForCausalLM": ("vllm_tpu.models.llama_variants",
                           "SeedOssForCausalLM"),
    "HunYuanDenseV1ForCausalLM": ("vllm_tpu.models.llama_variants",
                                  "HunYuanDenseV1ForCausalLM"),
    "GraniteForCausalLM": ("vllm_tpu.models.llama_variants",
                           "GraniteForCausalLM"),
    "Glm4ForCausalLM": ("vllm_tpu.models.llama_variants",
                        "Glm4ForCausalLM"),
    "GlmForCausalLM": ("vllm_tpu.models.llama_variants",
                       "Glm4ForCausalLM"),
    "MiniCPMForCausalLM": ("vllm_tpu.models.llama_variants",
                           "MiniCPMForCausalLM"),
    "MiniCPM3ForCausalLM": ("vllm_tpu.models.deepseek",
                            "MiniCPM3ForCausalLM"),
    "Exaone4ForCausalLM": ("vllm_tpu.models.llama_variants",
                           "Exaone4ForCausalLM"),
    "NemotronForCausalLM": ("vllm_tpu.models.llama_variants",
                            "NemotronForCausalLM"),
    "ArceeForCausalLM": ("vllm_tpu.models.llama_variants",
                         "ArceeForCausalLM"),
    "ApertusForCausalLM": ("vllm_tpu.models.llama_variants",
                           "ApertusForCausalLM"),
    "Dots1ForCausalLM": ("vllm_tpu.models.gqa_moe", "Dots1ForCausalLM"),
    "Glm4MoeForCausalLM": ("vllm_tpu.models.gqa_moe",
                           "Glm4MoeForCausalLM"),
    "Ernie4_5_MoeForCausalLM": ("vllm_tpu.models.gqa_moe",
                                "Ernie45MoeForCausalLM"),
    "HunYuanMoEV1ForCausalLM": ("vllm_tpu.models.moe_variants",
                                "HunYuanMoEV1ForCausalLM"),
    "Llama4ForCausalLM": ("vllm_tpu.models.llama4", "Llama4ForCausalLM"),
    "Llama4ForConditionalGeneration": ("vllm_tpu.models.llama4",
                                       "Llama4ForCausalLM"),
    # encoder (embedding / cross-encoder) models
    "BertModel": ("vllm_tpu.models.bert", "BertEmbeddingModel"),
    "BertForSequenceClassification": ("vllm_tpu.models.bert",
                                      "BertForSequenceClassification"),
    "ModernBertModel": ("vllm_tpu.models.modernbert", "ModernBertModel"),
    "ModernBertForSequenceClassification": (
        "vllm_tpu.models.modernbert", "ModernBertForSequenceClassification"),
    # state-space models
    "Mamba2ForCausalLM": ("vllm_tpu.models.mamba2", "Mamba2ForCausalLM"),
    "MambaForCausalLM": ("vllm_tpu.models.mamba", "MambaForCausalLM"),
    "FalconMambaForCausalLM": ("vllm_tpu.models.mamba",
                               "FalconMambaForCausalLM"),
    "BambaForCausalLM": ("vllm_tpu.models.bamba", "BambaForCausalLM"),
    "Zamba2ForCausalLM": ("vllm_tpu.models.zamba2", "Zamba2ForCausalLM"),
    "NemotronHForCausalLM": ("vllm_tpu.models.nemotron_h",
                             "NemotronHForCausalLM"),
    "FalconH1ForCausalLM": ("vllm_tpu.models.falcon_h1",
                            "FalconH1ForCausalLM"),
    "GritLM": ("vllm_tpu.models.gritlm", "GritLM"),
    "Blip2ForConditionalGeneration": (
        "vllm_tpu.models.blip2", "Blip2ForConditionalGeneration"),
    "ChameleonForConditionalGeneration": (
        "vllm_tpu.models.chameleon", "ChameleonForConditionalGeneration"),
    "ChameleonForCausalLM": (
        "vllm_tpu.models.chameleon", "ChameleonForCausalLM"),
    "AriaForConditionalGeneration": (
        "vllm_tpu.models.aria", "AriaForConditionalGeneration"),
    "AriaTextForCausalLM": ("vllm_tpu.models.aria",
                            "AriaTextForCausalLM"),
    "GraniteMoeHybridForCausalLM": ("vllm_tpu.models.granite_hybrid",
                                    "GraniteMoeHybridForCausalLM"),
    "MiniMaxText01ForCausalLM": ("vllm_tpu.models.minimax",
                                 "MiniMaxText01ForCausalLM"),
    "MiniMaxM1ForCausalLM": ("vllm_tpu.models.minimax",
                             "MiniMaxM1ForCausalLM"),
    "MiniMaxForCausalLM": ("vllm_tpu.models.minimax",
                           "MiniMaxForCausalLM"),
    "JambaForCausalLM": ("vllm_tpu.models.jamba", "JambaForCausalLM"),
    "JambaForSequenceClassification": (
        "vllm_tpu.models.jamba", "JambaForSequenceClassification"),
    # Mantis is Llava with a different chat processor
    # (reference: llava.py:886 MantisForConditionalGeneration(Llava))
    "MantisForConditionalGeneration": (
        "vllm_tpu.models.llava", "LlavaForConditionalGeneration"),
    # Tarsier: Llava tower+projector (reference: tarsier.py:142 — the
    # image-newline splitting lives in the processor, not the model);
    # Tarsier2 rides Qwen2-VL (reference: registry.py:242)
    "TarsierForConditionalGeneration": (
        "vllm_tpu.models.llava", "LlavaForConditionalGeneration"),
    "Tarsier2ForConditionalGeneration": (
        "vllm_tpu.models.qwen2_vl", "Qwen2VLForConditionalGeneration"),
    "WhisperForConditionalGeneration":
    ("vllm_tpu.models.whisper", "WhisperForConditionalGeneration"),
    "BartForConditionalGeneration": ("vllm_tpu.models.bart",
                                     "BartForConditionalGeneration"),
    "BartModel": ("vllm_tpu.models.bart", "BartForConditionalGeneration"),
    "MBartForConditionalGeneration": ("vllm_tpu.models.bart",
                                      "BartForConditionalGeneration"),
    "Qwen2AudioForConditionalGeneration": (
        "vllm_tpu.models.qwen2_audio",
        "Qwen2AudioForConditionalGeneration"),
    "VoxtralForConditionalGeneration": (
        "vllm_tpu.models.qwen2_audio", "VoxtralForConditionalGeneration"),
    "UltravoxModel": ("vllm_tpu.models.ultravox", "UltravoxModel"),
    "FuyuForCausalLM": ("vllm_tpu.models.fuyu", "FuyuForCausalLM"),
    # multimodal
    "LlavaForConditionalGeneration": ("vllm_tpu.models.llava",
                                      "LlavaForConditionalGeneration"),
    "LlavaNextForConditionalGeneration": (
        "vllm_tpu.models.llava_next", "LlavaNextForConditionalGeneration"),
    "LlavaOnevisionForConditionalGeneration": (
        "vllm_tpu.models.llava_onevision",
        "LlavaOnevisionForConditionalGeneration"),
    # LlavaNextVideo's image path IS llava-next (video frames become
    # extra mm tokens processor-side; reference: llava_next_video.py)
    "LlavaNextVideoForConditionalGeneration": (
        "vllm_tpu.models.llava_next", "LlavaNextForConditionalGeneration"),
    # H2OVL (non-mono) subclasses InternVL with only processor-side
    # tiling changes (reference: h2ovl.py:523)
    "H2OVLChatModel": (
        "vllm_tpu.models.internvl", "InternVLForConditionalGeneration"),
    "Idefics3ForConditionalGeneration": (
        "vllm_tpu.models.idefics3", "Idefics3ForConditionalGeneration"),
    "SmolVLMForConditionalGeneration": (
        "vllm_tpu.models.idefics3", "Idefics3ForConditionalGeneration"),
    "AyaVisionForConditionalGeneration": (
        "vllm_tpu.models.aya_vision", "AyaVisionForConditionalGeneration"),
    "InternVLForConditionalGeneration": (
        "vllm_tpu.models.internvl", "InternVLForConditionalGeneration"),
    "InternVLChatModel": (
        "vllm_tpu.models.internvl", "InternVLForConditionalGeneration"),
    "PaliGemmaForConditionalGeneration": (
        "vllm_tpu.models.paligemma", "PaliGemmaForConditionalGeneration"),
    "Gemma3ForConditionalGeneration": (
        "vllm_tpu.models.paligemma", "Gemma3ForConditionalGeneration"),
    "Mistral3ForConditionalGeneration": (
        "vllm_tpu.models.mistral3", "Mistral3ForConditionalGeneration"),
    "OrionForCausalLM": ("vllm_tpu.models.neox", "OrionForCausalLM"),
    "QWenLMHeadModel": ("vllm_tpu.models.neox", "QWenLMHeadModel"),
    "StableLMEpochForCausalLM": ("vllm_tpu.models.neox",
                                 "StableLmForCausalLM"),
    "TeleFLMForCausalLM": ("vllm_tpu.models.llama_variants",
                           "TeleFLMForCausalLM"),
    "SolarForCausalLM": ("vllm_tpu.models.llama_variants",
                         "SolarForCausalLM"),
    "TeleChat2ForCausalLM": ("vllm_tpu.models.llama_variants",
                             "TeleChat2ForCausalLM"),
    "DeciLMForCausalLM": ("vllm_tpu.models.llama_variants",
                          "DeciLMForCausalLM"),
    "MiMoForCausalLM": ("vllm_tpu.models.llama", "Qwen2ForCausalLM"),
    "QuantMixtralForCausalLM": ("vllm_tpu.models.mixtral",
                                "MixtralForCausalLM"),
    "DeepseekForCausalLM": ("vllm_tpu.models.gqa_moe",
                            "DeepseekForCausalLM"),
    "GraniteMoeSharedForCausalLM": ("vllm_tpu.models.mixtral",
                                    "GraniteMoeSharedForCausalLM"),
    "JAISLMHeadModel": ("vllm_tpu.models.gpt2", "JAISLMHeadModel"),
    "ExaoneForCausalLM": ("vllm_tpu.models.llama_variants",
                          "ExaoneForCausalLM"),
    "Grok1ModelForCausalLM": ("vllm_tpu.models.moe_variants",
                              "Grok1ModelForCausalLM"),
    "BailingMoeForCausalLM": ("vllm_tpu.models.gqa_moe",
                              "BailingMoeForCausalLM"),
}

# Draft-model architectures (reference registry's
# _SPECULATIVE_DECODING_MODELS): these resolve to spec_decode proposers
# selected via SpeculativeConfig auto-detection, not get_model().
_SPECULATIVE_DECODING_MODELS = {
    "EagleLlamaForCausalLM": ("vllm_tpu.spec_decode.eagle",
                              "EagleProposer"),
    "EagleLlama4ForCausalLM": ("vllm_tpu.spec_decode.eagle",
                               "EagleProposer"),
    "EagleMiniCPMForCausalLM": ("vllm_tpu.spec_decode.eagle",
                                "EagleProposer"),
    "Eagle3LlamaForCausalLM": ("vllm_tpu.spec_decode.eagle",
                               "Eagle3Proposer"),
    "LlamaForCausalLMEagle3": ("vllm_tpu.spec_decode.eagle",
                               "Eagle3Proposer"),
    "MedusaModel": ("vllm_tpu.spec_decode.medusa", "MedusaProposer"),
    "MLPSpeculatorPreTrainedModel": (
        "vllm_tpu.spec_decode.mlp_speculator", "MLPSpeculatorProposer"),
}

_EXTRA_MODELS: dict[str, Callable] = {}


def register_model(arch: str, cls: Callable) -> None:
    _EXTRA_MODELS[arch] = cls


def resolve_model_cls(arch: str) -> Callable:
    if arch in _EXTRA_MODELS:
        return _EXTRA_MODELS[arch]
    entry = _TEXT_GENERATION_MODELS.get(arch)
    if entry is None:
        # out-of-tree archs registered via entry points (reference:
        # vllm/plugins OOT model registration)
        from vllm_tpu.plugins import load_model_plugins

        entry = load_model_plugins().get(arch)
    if entry is None:
        raise ValueError(
            f"Model architecture {arch!r} is not supported. Supported: "
            f"{sorted(_TEXT_GENERATION_MODELS)}")
    module, cls_name = entry
    return getattr(importlib.import_module(module), cls_name)


def get_model(model_config: "ModelConfig"):
    arch = model_config.architecture
    return resolve_model_cls(arch)(model_config)


def get_supported_archs() -> list[str]:
    return sorted(set(_TEXT_GENERATION_MODELS) | set(_EXTRA_MODELS) |
                  set(_SPECULATIVE_DECODING_MODELS))


# HF model_type -> architecture, for composite models whose text_config
# was constructed programmatically (architectures=None); reference:
# transformers CONFIG_MAPPING names.
_MODEL_TYPE_ARCH = {
    "llama": "LlamaForCausalLM",
    "mistral": "MistralForCausalLM",
    "qwen2": "Qwen2ForCausalLM",
    "qwen3": "Qwen3ForCausalLM",
    "gemma": "GemmaForCausalLM",
    "gemma2": "Gemma2ForCausalLM",
    "gemma3_text": "Gemma3ForCausalLM",
    "gemma3n": "Gemma3nForConditionalGeneration",
    "gemma3n_text": "Gemma3nForCausalLM",
    "cohere": "CohereForCausalLM",
    "cohere2": "Cohere2ForCausalLM",
    "phi3": "Phi3ForCausalLM",
    "mixtral": "MixtralForCausalLM",
}


def arch_for_text_config(text_config, default: str) -> str:
    """Architecture name for a composite model's text_config: explicit
    architectures win; otherwise model_type maps through
    _MODEL_TYPE_ARCH; otherwise ``default``."""
    archs = getattr(text_config, "architectures", None)
    if archs:
        return archs[0]
    mt = getattr(text_config, "model_type", "")
    return _MODEL_TYPE_ARCH.get(mt, default)
