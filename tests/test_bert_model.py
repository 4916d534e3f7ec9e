"""BERT encoder goldens vs HF: packed bidirectional forward, pooler,
cross-encoder classification (reference analog: tests for
models/bert.py embedding + cross-encoder paths)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tests.test_model_vs_hf import build_metadata

TOKENS = [[101, 5, 9, 3, 7, 102], [101, 8, 100, 102]]


@pytest.fixture(scope="module")
def bert_dir(tmp_path_factory):
    import torch
    from transformers import BertConfig, BertForSequenceClassification

    torch.manual_seed(0)
    cfg = BertConfig(vocab_size=128, hidden_size=64,
                     intermediate_size=128, num_hidden_layers=2,
                     num_attention_heads=4, max_position_embeddings=64,
                     num_labels=1)
    m = BertForSequenceClassification(cfg)
    m.eval()
    d = tmp_path_factory.mktemp("bert")
    m.save_pretrained(d, safe_serialization=True)
    return str(d)


def _load(bert_dir, arch="BertForSequenceClassification"):
    from vllm_tpu.config import ModelConfig
    from vllm_tpu.models.registry import get_model
    from vllm_tpu.models.weight_utils import weights_iterator

    mc = ModelConfig(model=bert_dir, dtype="float32")
    mc.resolve_hf_config().architectures = [arch]
    model = get_model(mc)
    params = model.load_weights(weights_iterator(bert_dir))
    return model, params


def _forward_packed(model, params):
    metadata, input_ids, _ = build_metadata(TOKENS, 4, max_blocks=8,
                                            total_pad=16, req_pad=4)
    a = model.args
    kv = jnp.zeros((a.num_layers, 32, 2 * a.num_heads, 4, a.head_dim),
                   jnp.float32)
    hidden, _ = model.forward(params, input_ids, [kv], metadata)
    return np.asarray(hidden), metadata


def test_bert_hidden_match_hf(bert_dir):
    import torch
    from transformers import BertForSequenceClassification

    hf = BertForSequenceClassification.from_pretrained(bert_dir)
    hf.eval()
    expected = []
    with torch.no_grad():
        for toks in TOKENS:
            out = hf.bert(torch.tensor([toks])).last_hidden_state[0]
            expected.append(out.numpy())

    model, params = _load(bert_dir)
    hidden, _ = _forward_packed(model, params)
    offset = 0
    for r, toks in enumerate(TOKENS):
        np.testing.assert_allclose(hidden[offset:offset + len(toks)],
                                   expected[r], rtol=2e-4, atol=2e-4)
        offset += len(toks)


def test_bert_cross_encoder_scores_match_hf(bert_dir):
    import torch
    from transformers import BertForSequenceClassification

    hf = BertForSequenceClassification.from_pretrained(bert_dir)
    hf.eval()
    with torch.no_grad():
        expected = [hf(torch.tensor([toks])).logits[0].numpy()
                    for toks in TOKENS]

    model, params = _load(bert_dir)
    hidden, metadata = _forward_packed(model, params)
    scores = np.asarray(model.classify(params, jnp.asarray(hidden),
                                       metadata))
    for r in range(len(TOKENS)):
        np.testing.assert_allclose(scores[r], expected[r], rtol=2e-4,
                                   atol=2e-4)


def test_bert_bidirectional_not_causal(bert_dir):
    """A token's hidden state must depend on LATER tokens (sanity that
    causal masking is off)."""
    model, params = _load(bert_dir)
    md, ids, _ = build_metadata([[101, 5, 9, 102]], 4, max_blocks=8,
                                total_pad=8, req_pad=2)
    md2, ids2, _ = build_metadata([[101, 5, 77, 102]], 4, max_blocks=8,
                                  total_pad=8, req_pad=2)
    a = model.args
    kv = jnp.zeros((a.num_layers, 32, 2 * a.num_heads, 4, a.head_dim),
                   jnp.float32)
    h1, _ = model.forward(params, ids, [kv], md)
    h2, _ = model.forward(params, ids2, [kv], md2)
    # position 1 (token 5) differs because position 2 changed
    assert np.abs(np.asarray(h1)[1] - np.asarray(h2)[1]).max() > 1e-4


def test_bert_cross_encoder_engine_score(bert_dir):
    """Cross-encoder scores served end-to-end through LLM.encode match
    the HF classification head."""
    import torch
    from transformers import BertForSequenceClassification

    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import PoolingParams

    hf = BertForSequenceClassification.from_pretrained(bert_dir)
    hf.eval()
    with torch.no_grad():
        expected = [hf(torch.tensor([toks])).logits[0].numpy()
                    for toks in TOKENS]

    llm = LLM(model=bert_dir, dtype="float32", max_model_len=64,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_gpu_blocks_override=32, enforce_eager=True,
              skip_tokenizer_init=True)
    outs = llm.encode([{"prompt_token_ids": t} for t in TOKENS],
                      PoolingParams(task="score", normalize=False))
    for r in range(len(TOKENS)):
        got = np.asarray(outs[r].outputs.data)
        np.testing.assert_allclose(got, expected[r], rtol=2e-4,
                                   atol=2e-4)


# ------------------------------------------------------------ XLM-RoBERTa

@pytest.fixture(scope="module")
def roberta_dir(tmp_path_factory):
    import torch
    from transformers import (XLMRobertaConfig,
                              XLMRobertaForSequenceClassification)

    torch.manual_seed(0)
    cfg = XLMRobertaConfig(vocab_size=128, hidden_size=64,
                           intermediate_size=128, num_hidden_layers=2,
                           num_attention_heads=4,
                           max_position_embeddings=66, num_labels=1,
                           type_vocab_size=1, pad_token_id=1)
    m = XLMRobertaForSequenceClassification(cfg)
    m.eval()
    d = tmp_path_factory.mktemp("xlmr")
    m.save_pretrained(d, safe_serialization=True)
    return str(d)


def test_xlm_roberta_hidden_match_hf(roberta_dir):
    import torch
    from transformers import XLMRobertaForSequenceClassification

    hf = XLMRobertaForSequenceClassification.from_pretrained(roberta_dir)
    hf.eval()
    expected = []
    with torch.no_grad():
        for toks in TOKENS:
            out = hf.roberta(torch.tensor([toks])).last_hidden_state[0]
            expected.append(out.numpy())

    model, params = _load(roberta_dir,
                          arch="XLMRobertaForSequenceClassification")
    hidden, _ = _forward_packed(model, params)
    offset = 0
    for r, toks in enumerate(TOKENS):
        np.testing.assert_allclose(hidden[offset:offset + len(toks)],
                                   expected[r], rtol=3e-4, atol=3e-4)
        offset += len(toks)


def test_xlm_roberta_reranker_scores_match_hf(roberta_dir):
    import torch
    from transformers import XLMRobertaForSequenceClassification

    hf = XLMRobertaForSequenceClassification.from_pretrained(roberta_dir)
    hf.eval()
    with torch.no_grad():
        expected = [hf(torch.tensor([toks])).logits[0].numpy()
                    for toks in TOKENS]

    model, params = _load(roberta_dir,
                          arch="XLMRobertaForSequenceClassification")
    hidden, metadata = _forward_packed(model, params)
    scores = np.asarray(model.classify(params, jnp.asarray(hidden),
                                       metadata))
    for r in range(len(TOKENS)):
        np.testing.assert_allclose(scores[r], expected[r], rtol=3e-4,
                                   atol=3e-4)
