"""Golden-logit tests for every supported architecture vs HF transformers
(reference analog: tests/models/ greedy/logprob agreement)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tests.test_model_vs_hf import build_metadata

TOKENS = [[1, 5, 9, 3, 7, 11, 2], [4, 8, 100, 42]]


def make_hf_model(arch):
    import torch

    torch.manual_seed(0)
    common = dict(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        max_position_embeddings=256,
    )
    if arch == "qwen2":
        from transformers import Qwen2Config, Qwen2ForCausalLM

        return Qwen2ForCausalLM(
            Qwen2Config(num_key_value_heads=2, **common))
    if arch == "qwen3":
        from transformers import Qwen3Config, Qwen3ForCausalLM

        return Qwen3ForCausalLM(
            Qwen3Config(num_key_value_heads=2, head_dim=16, **common))
    if arch == "mistral_sw":
        from transformers import MistralConfig, MistralForCausalLM

        return MistralForCausalLM(
            MistralConfig(num_key_value_heads=2, sliding_window=5,
                          **common))
    if arch == "gemma":
        from transformers import GemmaConfig, GemmaForCausalLM

        return GemmaForCausalLM(
            GemmaConfig(num_key_value_heads=2, head_dim=16, **common))
    if arch == "gemma2":
        from transformers import Gemma2Config, Gemma2ForCausalLM

        return Gemma2ForCausalLM(
            Gemma2Config(num_key_value_heads=2, head_dim=16,
                         sliding_window=5, query_pre_attn_scalar=16,
                         attn_logit_softcapping=50.0,
                         final_logit_softcapping=30.0, **common))
    if arch == "gpt2":
        from transformers import GPT2Config, GPT2LMHeadModel

        return GPT2LMHeadModel(
            GPT2Config(vocab_size=128, n_embd=64, n_layer=2, n_head=4,
                       n_positions=256))
    if arch == "opt":
        from transformers import OPTConfig, OPTForCausalLM

        return OPTForCausalLM(
            OPTConfig(vocab_size=128, hidden_size=64, ffn_dim=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      max_position_embeddings=256,
                      word_embed_proj_dim=64))
    if arch == "mixtral":
        from transformers import MixtralConfig, MixtralForCausalLM

        return MixtralForCausalLM(
            MixtralConfig(num_key_value_heads=2, num_local_experts=4,
                          num_experts_per_tok=2, pad_token_id=0, **common))
    if arch == "phi3":
        from transformers import Phi3Config, Phi3ForCausalLM

        return Phi3ForCausalLM(
            Phi3Config(num_key_value_heads=2, pad_token_id=0, **common))
    if arch == "gpt_neox":
        from transformers import GPTNeoXConfig, GPTNeoXForCausalLM

        return GPTNeoXForCausalLM(
            GPTNeoXConfig(rotary_pct=0.25, use_parallel_residual=True,
                          **common))
    if arch == "gpt_neox_seq":
        from transformers import GPTNeoXConfig, GPTNeoXForCausalLM

        return GPTNeoXForCausalLM(
            GPTNeoXConfig(rotary_pct=1.0, use_parallel_residual=False,
                          **common))
    if arch == "phi":
        from transformers import PhiConfig, PhiForCausalLM

        return PhiForCausalLM(
            PhiConfig(partial_rotary_factor=0.5, **common))
    if arch == "stablelm":
        from transformers import StableLmConfig, StableLmForCausalLM

        return StableLmForCausalLM(
            StableLmConfig(num_key_value_heads=2,
                           partial_rotary_factor=0.25, **common))
    if arch == "starcoder2":
        from transformers import Starcoder2Config, Starcoder2ForCausalLM

        return Starcoder2ForCausalLM(
            Starcoder2Config(num_key_value_heads=2, **common))
    if arch == "cohere":
        from transformers import CohereConfig, CohereForCausalLM

        return CohereForCausalLM(
            CohereConfig(num_key_value_heads=2, logit_scale=0.5,
                         pad_token_id=0, **common))
    if arch == "olmo2":
        from transformers import Olmo2Config, Olmo2ForCausalLM

        return Olmo2ForCausalLM(
            Olmo2Config(num_key_value_heads=2, **common))
    if arch == "granite":
        from transformers import GraniteConfig, GraniteForCausalLM

        return GraniteForCausalLM(
            GraniteConfig(num_key_value_heads=2,
                          embedding_multiplier=6.0,
                          residual_multiplier=0.5,
                          attention_multiplier=0.1,
                          logits_scaling=4.0, **common))
    if arch == "glm4":
        from transformers import Glm4Config, Glm4ForCausalLM

        return Glm4ForCausalLM(
            Glm4Config(num_key_value_heads=2, head_dim=16,
                       partial_rotary_factor=0.5, attention_bias=True,
                       pad_token_id=0, **common))
    if arch == "nemotron":
        from transformers import NemotronConfig, NemotronForCausalLM

        return NemotronForCausalLM(
            NemotronConfig(num_key_value_heads=2, head_dim=16,
                           partial_rotary_factor=0.5, **common))
    if arch == "falcon":
        from transformers import FalconConfig, FalconForCausalLM

        return FalconForCausalLM(
            FalconConfig(vocab_size=128, hidden_size=64,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_kv_heads=2, new_decoder_architecture=True,
                         bias=False, parallel_attn=True, alibi=False))
    if arch == "falcon7b":
        from transformers import FalconConfig, FalconForCausalLM

        return FalconForCausalLM(
            FalconConfig(vocab_size=128, hidden_size=64,
                         num_hidden_layers=2, num_attention_heads=4,
                         multi_query=True, new_decoder_architecture=False,
                         bias=False, parallel_attn=True, alibi=False))
    if arch == "gptj":
        from transformers import GPTJConfig, GPTJForCausalLM

        return GPTJForCausalLM(
            GPTJConfig(vocab_size=128, n_embd=64, n_layer=2, n_head=4,
                       n_positions=256, rotary_dim=8))
    if arch == "persimmon":
        from transformers import PersimmonConfig, PersimmonForCausalLM

        return PersimmonForCausalLM(
            PersimmonConfig(qk_layernorm=True, hidden_act="relu2",
                            partial_rotary_factor=0.5, **common))
    if arch == "bloom":
        from transformers import BloomConfig, BloomForCausalLM

        return BloomForCausalLM(
            BloomConfig(vocab_size=128, hidden_size=64, n_layer=2,
                        n_head=4))
    if arch == "mpt":
        from transformers import MptConfig, MptForCausalLM

        return MptForCausalLM(
            MptConfig(vocab_size=128, d_model=64, n_layers=2, n_heads=4,
                      max_seq_len=256))
    if arch == "olmoe":
        from transformers import OlmoeConfig, OlmoeForCausalLM

        return OlmoeForCausalLM(
            OlmoeConfig(num_key_value_heads=2, num_experts=8,
                        num_experts_per_tok=2, norm_topk_prob=False,
                        **common))
    if arch == "granitemoe":
        from transformers import (GraniteMoeConfig,
                                  GraniteMoeForCausalLM)

        return GraniteMoeForCausalLM(
            GraniteMoeConfig(num_key_value_heads=2, num_local_experts=4,
                             num_experts_per_tok=2,
                             embedding_multiplier=6.0,
                             residual_multiplier=0.5,
                             attention_multiplier=0.1,
                             logits_scaling=3.0, **common))
    if arch == "deepseek_v2":
        from transformers import DeepseekV2Config, DeepseekV2ForCausalLM

        return DeepseekV2ForCausalLM(
            DeepseekV2Config(moe_intermediate_size=32,
                             n_routed_experts=8, n_shared_experts=1,
                             num_experts_per_tok=2,
                             first_k_dense_replace=1,
                             norm_topk_prob=False,
                             routed_scaling_factor=1.0,
                             qk_nope_head_dim=16, qk_rope_head_dim=8,
                             v_head_dim=16, kv_lora_rank=32,
                             q_lora_rank=None, num_key_value_heads=4,
                             pad_token_id=0, **common))
    if arch == "deepseek_v3":
        from transformers import DeepseekV3Config, DeepseekV3ForCausalLM

        return DeepseekV3ForCausalLM(
            DeepseekV3Config(moe_intermediate_size=32,
                             n_routed_experts=8, n_shared_experts=1,
                             num_experts_per_tok=2,
                             first_k_dense_replace=1,
                             norm_topk_prob=True,
                             routed_scaling_factor=2.5,
                             n_group=4, topk_group=2,
                             qk_nope_head_dim=16, qk_rope_head_dim=8,
                             v_head_dim=16, kv_lora_rank=32,
                             q_lora_rank=24, num_key_value_heads=4,
                             pad_token_id=0, **common))
    if arch == "ernie45":
        from transformers import Ernie4_5Config, Ernie4_5ForCausalLM

        return Ernie4_5ForCausalLM(
            Ernie4_5Config(num_key_value_heads=2, head_dim=16,
                           use_bias=True, pad_token_id=0, **common))
    if arch == "smollm3":
        from transformers import SmolLM3Config, SmolLM3ForCausalLM

        return SmolLM3ForCausalLM(
            SmolLM3Config(num_key_value_heads=2,
                          no_rope_layer_interval=2, pad_token_id=0,
                          **common))
    if arch == "seed_oss":
        from transformers import SeedOssConfig, SeedOssForCausalLM

        return SeedOssForCausalLM(
            SeedOssConfig(num_key_value_heads=2, head_dim=16,
                          attention_bias=True, attention_out_bias=True,
                          mlp_bias=True, pad_token_id=0, **common))
    if arch == "dbrx":
        from transformers import DbrxConfig, DbrxForCausalLM

        return DbrxForCausalLM(
            DbrxConfig(vocab_size=128, d_model=64, n_heads=4,
                       n_layers=2, max_seq_len=256,
                       attn_config={"kv_n_heads": 2, "clip_qkv": 8.0,
                                    "rope_theta": 10000.0},
                       ffn_config={"ffn_hidden_size": 96,
                                   "moe_num_experts": 4, "moe_top_k": 2,
                                   "moe_normalize_expert_weights": 1},
                       pad_token_id=0))
    if arch == "phimoe":
        from transformers import PhimoeConfig, PhimoeForCausalLM

        return PhimoeForCausalLM(
            PhimoeConfig(num_key_value_heads=2, num_local_experts=4,
                         num_experts_per_tok=2, attention_bias=True,
                         lm_head_bias=True, router_jitter_noise=0.01,
                         input_jitter_noise=0.0, pad_token_id=0,
                         **common))
    if arch == "dots1":
        from transformers import Dots1Config, Dots1ForCausalLM

        return Dots1ForCausalLM(
            Dots1Config(num_key_value_heads=2, moe_intermediate_size=32,
                        n_routed_experts=8, n_shared_experts=1,
                        num_experts_per_tok=2, first_k_dense_replace=1,
                        n_group=4, topk_group=2, norm_topk_prob=True,
                        routed_scaling_factor=2.0, sliding_window=None,
                        pad_token_id=0, **common))
    if arch == "glm4_moe":
        from transformers import Glm4MoeConfig, Glm4MoeForCausalLM

        return Glm4MoeForCausalLM(
            Glm4MoeConfig(num_key_value_heads=2, head_dim=16,
                          partial_rotary_factor=0.5, use_qk_norm=True,
                          attention_bias=True, moe_intermediate_size=32,
                          n_routed_experts=8, n_shared_experts=1,
                          num_experts_per_tok=2, first_k_dense_replace=1,
                          n_group=2, topk_group=1, norm_topk_prob=True,
                          routed_scaling_factor=1.5, pad_token_id=0,
                          **common))
    if arch == "ernie45_moe":
        from transformers import (Ernie4_5_MoeConfig,
                                  Ernie4_5_MoeForCausalLM)

        return Ernie4_5_MoeForCausalLM(
            Ernie4_5_MoeConfig(num_key_value_heads=2,
                               moe_intermediate_size=32,
                               moe_num_experts=8, moe_k=2,
                               moe_num_shared_experts=1,
                               moe_layer_start_index=1,
                               moe_layer_end_index=2,
                               num_hidden_layers=4, vocab_size=128,
                               hidden_size=64, intermediate_size=128,
                               num_attention_heads=4,
                               max_position_embeddings=256,
                               pad_token_id=0))
    if arch == "hunyuan_moe":
        from transformers import (HunYuanMoEV1Config,
                                  HunYuanMoEV1ForCausalLM)

        return HunYuanMoEV1ForCausalLM(
            HunYuanMoEV1Config(num_key_value_heads=2, head_dim=16,
                               num_experts=4, moe_topk=2,
                               pad_token_id=0, **common))
    if arch == "qwen2_moe":
        from transformers import Qwen2MoeConfig, Qwen2MoeForCausalLM

        return Qwen2MoeForCausalLM(
            Qwen2MoeConfig(num_key_value_heads=2, num_experts=4,
                           num_experts_per_tok=2,
                           moe_intermediate_size=32,
                           shared_expert_intermediate_size=48,
                           norm_topk_prob=False, decoder_sparse_step=1,
                           pad_token_id=0, **common))
    if arch == "granitemoe_shared":
        from transformers import (GraniteMoeSharedConfig,
                                  GraniteMoeSharedForCausalLM)

        return GraniteMoeSharedForCausalLM(
            GraniteMoeSharedConfig(num_key_value_heads=2,
                                   num_local_experts=4,
                                   num_experts_per_tok=2,
                                   shared_intermediate_size=48,
                                   embedding_multiplier=2.0,
                                   attention_multiplier=0.3,
                                   residual_multiplier=0.8,
                                   logits_scaling=1.5,
                                   pad_token_id=0, **common))
    if arch == "arcee":
        from transformers import ArceeConfig, ArceeForCausalLM

        return ArceeForCausalLM(
            ArceeConfig(num_key_value_heads=2, mlp_bias=True,
                        pad_token_id=0, **common))
    if arch == "apertus":
        from transformers import ApertusConfig, ApertusForCausalLM

        return ApertusForCausalLM(
            ApertusConfig(num_key_value_heads=2, pad_token_id=0,
                          **common))
    if arch == "hunyuan_dense":
        from transformers import (HunYuanDenseV1Config,
                                  HunYuanDenseV1ForCausalLM)

        return HunYuanDenseV1ForCausalLM(
            HunYuanDenseV1Config(num_key_value_heads=2, head_dim=16,
                                 pad_token_id=0, **common))
    raise ValueError(arch)


@pytest.mark.parametrize("arch", [
    "qwen2", "qwen3", "mistral_sw", "gemma", "gemma2", "gpt2", "opt",
    "mixtral", "phi3", "deepseek_v2", "deepseek_v3", "gpt_neox",
    "gpt_neox_seq", "phi", "stablelm", "starcoder2", "cohere", "olmo2",
    "granite", "glm4", "nemotron", "falcon", "falcon7b", "gptj",
    "persimmon", "bloom", "mpt", "olmoe", "granitemoe", "ernie45",
    "smollm3", "seed_oss", "hunyuan_dense", "dbrx", "phimoe", "arcee",
    "apertus", "dots1", "glm4_moe", "ernie45_moe", "hunyuan_moe",
    "granitemoe_shared", "qwen2_moe"
])
def test_arch_logits_match_hf(arch, tmp_path):
    import torch

    hf_model = make_hf_model(arch)
    hf_model.eval()
    d = tmp_path / arch
    hf_model.save_pretrained(d, safe_serialization=True)

    expected = []
    with torch.no_grad():
        for toks in TOKENS:
            out = hf_model(torch.tensor([toks])).logits[0]
            expected.append(out.numpy())

    from vllm_tpu.config import ModelConfig
    from vllm_tpu.models.registry import get_model
    from vllm_tpu.models.weight_utils import weights_iterator

    mc = ModelConfig(model=str(d), dtype="float32")
    model = get_model(mc)
    params = model.load_weights(weights_iterator(str(d)))

    block_size = 4
    metadata, input_ids, _ = build_metadata(TOKENS, block_size,
                                            max_blocks=8, total_pad=16,
                                            req_pad=4)
    a = model.args
    from vllm_tpu.core.kv_cache_interface import MLASpec

    spec = next(iter(model.get_kv_cache_specs(block_size,
                                              "float32").values()))
    if isinstance(spec, MLASpec):
        # single-copy latent cache [L, N, ps, D]
        kv = jnp.zeros((a.num_layers, 32, block_size, spec.head_size),
                       jnp.float32)
    else:
        kv = jnp.zeros((a.num_layers, 32, 2 * spec.num_kv_heads,
                        block_size, spec.head_size), jnp.float32)
    hidden, _ = model.forward(params, input_ids, [kv], metadata)
    logits = np.asarray(model.compute_logits(params, hidden))

    # MoE routing amplifies tiny fp differences; loosen slightly.
    tol = 2e-3 if arch in ("mixtral", "deepseek_v2", "deepseek_v3",
                           "dbrx", "phimoe", "dots1", "glm4_moe",
                           "ernie45_moe", "hunyuan_moe",
                           "granitemoe_shared", "qwen2_moe") else 5e-4
    offset = 0
    for r, toks in enumerate(TOKENS):
        ours = logits[offset:offset + len(toks)]
        np.testing.assert_allclose(ours, expected[r], rtol=tol, atol=tol)
        offset += len(toks)


def test_fused_moe_matches_dense_reference():
    from vllm_tpu.ops.moe import fused_moe, fused_moe_ref, topk_routing

    rng = np.random.default_rng(0)
    T, H, I, E, K = 24, 32, 64, 4, 2
    x = jnp.asarray(rng.standard_normal((T, H)), jnp.float32)
    w_gu = jnp.asarray(rng.standard_normal((E, H, 2 * I)) * 0.1,
                       jnp.float32)
    w_d = jnp.asarray(rng.standard_normal((E, I, H)) * 0.1, jnp.float32)
    router = jnp.asarray(rng.standard_normal((T, E)), jnp.float32)
    weights, ids = topk_routing(router, K)
    out = fused_moe(x, w_gu, w_d, weights, ids, capacity_factor=4.0)
    ref = fused_moe_ref(x, w_gu, w_d, weights, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
