"""FalconH1 parallel-hybrid golden tests vs HF (reference analog:
tests for models/falcon_h1.py) — non-trivial muP multipliers exercise
the load-time folding."""

import numpy as np
import pytest

import jax.numpy as jnp

from tests.test_model_vs_hf import build_metadata

TOKENS = [[1, 5, 9, 3, 7, 11, 2], [4, 8, 100, 42]]


@pytest.fixture(scope="module")
def falcon_h1_dir(tmp_path_factory):
    import torch
    from transformers import FalconH1Config, FalconH1ForCausalLM

    torch.manual_seed(0)
    cfg = FalconH1Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, mamba_d_ssm=128, mamba_n_heads=16,
        mamba_d_head=8, mamba_n_groups=1, mamba_d_state=16,
        mamba_d_conv=4, mamba_expand=2, mamba_chunk_size=8,
        max_position_embeddings=128, pad_token_id=0,
        # non-trivial muP multipliers: the fold must reproduce them
        embedding_multiplier=1.5, lm_head_multiplier=0.75,
        attention_in_multiplier=1.25, attention_out_multiplier=0.8,
        key_multiplier=0.5, ssm_in_multiplier=1.1,
        ssm_out_multiplier=0.9,
        ssm_multipliers=[1.2, 0.8, 1.1, 0.9, 1.3],
        mlp_multipliers=[1.4, 0.6])
    m = FalconH1ForCausalLM(cfg)
    m.eval()
    d = tmp_path_factory.mktemp("falcon_h1")
    m.save_pretrained(d, safe_serialization=True)
    return str(d)


def _load(model_dir):
    from vllm_tpu.config import ModelConfig
    from vllm_tpu.models.registry import get_model
    from vllm_tpu.models.weight_utils import weights_iterator

    mc = ModelConfig(model=model_dir, dtype="float32")
    model = get_model(mc)
    params = model.load_weights(weights_iterator(model_dir))
    return model, params


def test_falcon_h1_logits_match_hf(falcon_h1_dir):
    import torch
    from transformers import FalconH1ForCausalLM

    hf = FalconH1ForCausalLM.from_pretrained(falcon_h1_dir)
    hf.eval()
    expected = []
    with torch.no_grad():
        for toks in TOKENS:
            expected.append(hf(torch.tensor([toks])).logits[0].numpy())

    model, params = _load(falcon_h1_dir)
    a = model.args
    attn_kv = jnp.zeros((model.num_attn_layers, 32, 2 * a.num_kv_heads,
                         4, a.head_dim), jnp.float32)
    # spec order: layers.0.attn precedes layers.0.mamba alphabetically,
    # but groups arrive in first-seen spec order — attn group first
    caches = [attn_kv, model.init_states(4)]
    metadata, input_ids, _ = build_metadata(TOKENS, 4, max_blocks=8,
                                            total_pad=16, req_pad=4)
    hidden, _ = model.forward(params, input_ids, caches, metadata)
    logits = np.asarray(model.compute_logits(params, hidden))
    offset = 0
    for r, toks in enumerate(TOKENS):
        np.testing.assert_allclose(logits[offset:offset + len(toks)],
                                   expected[r], rtol=2e-3, atol=2e-3)
        offset += len(toks)


def test_falcon_h1_engine_greedy_matches_hf(falcon_h1_dir):
    import torch
    from transformers import FalconH1ForCausalLM

    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import SamplingParams

    hf = FalconH1ForCausalLM.from_pretrained(falcon_h1_dir)
    hf.eval()
    prompts = [[3, 17, 42, 9, 88], [7, 21, 4]]
    hf_out = []
    with torch.no_grad():
        for p in prompts:
            seq = list(p)
            for _ in range(10):
                logits = hf(torch.tensor([seq])).logits[0, -1]
                seq.append(int(logits.argmax()))
            hf_out.append(seq[len(p):])

    llm = LLM(model=falcon_h1_dir, dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_gpu_blocks_override=32, enforce_eager=True,
              skip_tokenizer_init=True)
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    outs = llm.generate([{"prompt_token_ids": p} for p in prompts], sp)
    for r in range(2):
        assert list(outs[r].outputs[0].token_ids) == hf_out[r], \
            (r, list(outs[r].outputs[0].token_ids), hf_out[r])
