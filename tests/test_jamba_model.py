"""Jamba hybrid Mamba-1 + attention + MoE golden tests vs HF
(reference analog: tests for vllm/model_executor/models/jamba.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tests.test_model_vs_hf import build_metadata

TOKENS = [[1, 5, 9, 3, 7, 11, 2], [4, 8, 100, 42]]


@pytest.fixture(scope="module")
def jamba_dir(tmp_path_factory):
    import torch
    from transformers import JambaConfig, JambaForCausalLM

    torch.manual_seed(0)
    cfg = JambaConfig(vocab_size=128, hidden_size=64,
                      intermediate_size=128, num_hidden_layers=4,
                      num_attention_heads=4, num_key_value_heads=2,
                      attn_layer_period=2, attn_layer_offset=1,
                      expert_layer_period=2, expert_layer_offset=0,
                      num_experts=4, num_experts_per_tok=2,
                      mamba_d_state=8, mamba_d_conv=4, mamba_expand=2,
                      mamba_dt_rank=8, use_mamba_kernels=False,
                      pad_token_id=0, max_position_embeddings=256)
    m = JambaForCausalLM(cfg)
    m.eval()
    d = tmp_path_factory.mktemp("jamba")
    m.save_pretrained(d, safe_serialization=True)
    return str(d)


def _load(jamba_dir):
    from vllm_tpu.config import ModelConfig
    from vllm_tpu.models.registry import get_model
    from vllm_tpu.models.weight_utils import weights_iterator

    mc = ModelConfig(model=jamba_dir, dtype="float32")
    model = get_model(mc)
    params = model.load_weights(weights_iterator(jamba_dir))
    return model, params


def _make_caches(model, block_size=4, num_blocks=32, num_slots=4):
    a = model.args
    n_attn = model.layer_types.count("attn")
    attn_kv = jnp.zeros((n_attn, num_blocks, 2 * a.num_kv_heads,
                         block_size, a.head_dim), jnp.float32)
    # spec order: layer 0 is mamba -> group 0 = states, group 1 = attn
    return [model.init_states(num_slots), attn_kv]


def test_jamba_logits_match_hf(jamba_dir):
    import torch
    from transformers import JambaForCausalLM

    hf = JambaForCausalLM.from_pretrained(jamba_dir)
    hf.eval()
    expected = []
    with torch.no_grad():
        for toks in TOKENS:
            expected.append(hf(torch.tensor([toks])).logits[0].numpy())

    model, params = _load(jamba_dir)
    metadata, input_ids, _ = build_metadata(TOKENS, 4, max_blocks=8,
                                            total_pad=16, req_pad=4)
    hidden, _ = model.forward(params, input_ids, _make_caches(model),
                              metadata)
    logits = np.asarray(model.compute_logits(params, hidden))
    offset = 0
    for r, toks in enumerate(TOKENS):
        np.testing.assert_allclose(logits[offset:offset + len(toks)],
                                   expected[r], rtol=2e-3, atol=2e-3)
        offset += len(toks)


def test_jamba_engine_greedy_matches_hf(jamba_dir):
    """Full engine decode over both cache groups matches no-cache HF
    greedy (stateful mamba-1 decode + paged attention)."""
    import torch
    from transformers import JambaForCausalLM

    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import SamplingParams

    hf = JambaForCausalLM.from_pretrained(jamba_dir)
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

    llm = LLM(model=jamba_dir, dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_gpu_blocks_override=32, enforce_eager=True,
              skip_tokenizer_init=True)
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    outs = llm.generate([{"prompt_token_ids": p} for p in prompts], sp)
    for r in range(2):
        assert list(outs[r].outputs[0].token_ids) == hf_out[r], \
            (r, list(outs[r].outputs[0].token_ids), hf_out[r])


def test_jamba_sequence_classification_matches_hf(tmp_path):
    """JambaForSequenceClassification (reference: jamba.py:564): score
    head over the last token via the pooling path."""
    import torch
    from transformers import JambaConfig, JambaForSequenceClassification

    torch.manual_seed(0)
    cfg = JambaConfig(vocab_size=128, hidden_size=64,
                      intermediate_size=128, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      attn_layer_offset=1, attn_layer_period=2,
                      expert_layer_offset=0, expert_layer_period=2,
                      num_experts=4, num_experts_per_tok=2,
                      mamba_d_state=16, mamba_d_conv=4, mamba_expand=2,
                      use_mamba_kernels=False, num_labels=3,
                      pad_token_id=0, max_position_embeddings=128)
    hf_model = JambaForSequenceClassification(cfg)
    hf_model.eval()
    hf_model.save_pretrained(str(tmp_path), safe_serialization=True)

    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import PoolingParams

    toks = [3, 17, 9, 44, 5, 12]
    llm = LLM(model=str(tmp_path), dtype="float32", max_model_len=64,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_gpu_blocks_override=32, enforce_eager=True,
              skip_tokenizer_init=True)
    out = llm.encode({"prompt_token_ids": toks},
                     PoolingParams(task="classify", softmax=False))[0]
    got = np.asarray(out.outputs.data, np.float32)

    with torch.no_grad():
        logits = hf_model(torch.tensor([toks])).logits[0].numpy()
    np.testing.assert_allclose(got, logits, rtol=3e-4, atol=3e-4)
