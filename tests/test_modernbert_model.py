"""ModernBERT encoder goldens vs HF: alternating local/global rotary
attention, GeGLU, classification head (reference analog:
vllm/model_executor/models/modernbert.py tests)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tests.test_model_vs_hf import build_metadata

# long enough that the layer-1 local window (6 tokens wide here) actually
# masks something, so the test catches a wrong window
TOKENS = [[2, 5, 9, 3, 7, 11, 4, 8, 6, 10], [1, 8, 100, 3]]


@pytest.fixture(scope="module")
def modernbert_dir(tmp_path_factory):
    import torch
    from transformers import (ModernBertConfig,
                              ModernBertForSequenceClassification)

    torch.manual_seed(0)
    cfg = ModernBertConfig(vocab_size=128, hidden_size=64,
                           intermediate_size=96, num_hidden_layers=4,
                           num_attention_heads=4,
                           max_position_embeddings=64,
                           global_attn_every_n_layers=2,
                           local_attention=6, num_labels=2,
                           classifier_pooling="mean",
                           pad_token_id=0, bos_token_id=1,
                           eos_token_id=2, cls_token_id=3,
                           sep_token_id=4, reference_compile=False)
    m = ModernBertForSequenceClassification(cfg)
    m.eval()
    d = tmp_path_factory.mktemp("modernbert")
    m.save_pretrained(d, safe_serialization=True)
    return str(d)


def _load(modernbert_dir, arch):
    from vllm_tpu.config import ModelConfig
    from vllm_tpu.models.registry import get_model
    from vllm_tpu.models.weight_utils import weights_iterator

    mc = ModelConfig(model=modernbert_dir, dtype="float32")
    mc.resolve_hf_config().architectures = [arch]
    model = get_model(mc)
    params = model.load_weights(weights_iterator(modernbert_dir))
    return model, params


def _forward_packed(model, params):
    metadata, input_ids, _ = build_metadata(TOKENS, 4, max_blocks=8,
                                            total_pad=16, req_pad=4)
    a = model.args
    kv = jnp.zeros((a.num_layers, 32, 2 * a.num_heads, 4, a.head_dim),
                   jnp.float32)
    hidden, _ = model.forward(params, input_ids, [kv], metadata)
    return np.asarray(hidden), metadata


def test_modernbert_hidden_match_hf(modernbert_dir):
    import torch
    from transformers import ModernBertForSequenceClassification

    hf = ModernBertForSequenceClassification.from_pretrained(
        modernbert_dir, reference_compile=False)
    hf.eval()
    expected = []
    with torch.no_grad():
        for toks in TOKENS:
            out = hf.model(torch.tensor([toks])).last_hidden_state[0]
            expected.append(out.numpy())

    model, params = _load(modernbert_dir,
                          "ModernBertForSequenceClassification")
    hidden, _ = _forward_packed(model, params)
    offset = 0
    for r, toks in enumerate(TOKENS):
        np.testing.assert_allclose(hidden[offset:offset + len(toks)],
                                   expected[r], rtol=5e-4, atol=5e-4)
        offset += len(toks)


def test_modernbert_classify_match_hf(modernbert_dir):
    import torch
    from transformers import ModernBertForSequenceClassification

    hf = ModernBertForSequenceClassification.from_pretrained(
        modernbert_dir, reference_compile=False)
    hf.eval()
    with torch.no_grad():
        expected = [hf(torch.tensor([toks])).logits[0].numpy()
                    for toks in TOKENS]

    model, params = _load(modernbert_dir,
                          "ModernBertForSequenceClassification")
    hidden, metadata = _forward_packed(model, params)
    scores = np.asarray(model.classify(params, jnp.asarray(hidden),
                                       metadata))
    for r in range(len(TOKENS)):
        np.testing.assert_allclose(scores[r], expected[r], rtol=5e-4,
                                   atol=5e-4)


def test_modernbert_local_window_masks(modernbert_dir):
    """Changing a token OUTSIDE every local window but INSIDE the global
    context still reaches position 0 through the global layers — and a
    model with the window forced huge must differ (proves the local
    mask is active)."""
    model, params = _load(modernbert_dir, "ModernBertModel")
    md, ids, _ = build_metadata([TOKENS[0]], 4, max_blocks=8,
                                total_pad=16, req_pad=4)
    a = model.args
    kv = jnp.zeros((a.num_layers, 32, 2 * a.num_heads, 4, a.head_dim),
                   jnp.float32)
    h_local, _ = model.forward(params, ids, [kv], md)
    # disable the window: every layer behaves globally
    object.__setattr__(model.args, "local_window", None) \
        if False else None
    import vllm_tpu.models.modernbert as mb
    wide = mb.ModernBertArgs(**{**model.args.__dict__,
                                "local_window": 1 << 20})
    from vllm_tpu.config import ModelConfig
    mc = ModelConfig(model=modernbert_dir, dtype="float32")
    model_wide = mb.ModernBertModel(mc, wide)
    h_wide, _ = model_wide.forward(params, ids, [kv], md)
    assert np.abs(np.asarray(h_local) - np.asarray(h_wide)).max() > 1e-5
