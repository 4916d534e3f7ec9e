"""Whisper encoder-decoder golden tests vs HF (reference analog:
tests for vllm/model_executor/models/whisper.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tests.test_model_vs_hf import build_metadata


@pytest.fixture(scope="module")
def whisper_dir(tmp_path_factory):
    import torch
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    torch.manual_seed(0)
    cfg = WhisperConfig(vocab_size=200, d_model=64, encoder_layers=2,
                        decoder_layers=2, encoder_attention_heads=2,
                        decoder_attention_heads=2, encoder_ffn_dim=128,
                        decoder_ffn_dim=128, num_mel_bins=16,
                        max_source_positions=50,
                        max_target_positions=128,
                        decoder_start_token_id=3, pad_token_id=0,
                        bos_token_id=1, eos_token_id=2)
    m = WhisperForConditionalGeneration(cfg)
    m.eval()
    d = tmp_path_factory.mktemp("whisper")
    m.save_pretrained(d, safe_serialization=True)
    return str(d)


def _feats(seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((16, 100)).astype(np.float32)


def test_whisper_logits_match_hf(whisper_dir):
    import torch
    from transformers import WhisperForConditionalGeneration

    hf = WhisperForConditionalGeneration.from_pretrained(whisper_dir)
    hf.eval()
    feats = _feats()
    dec = [3, 7, 11, 5]
    with torch.no_grad():
        expected = hf(
            input_features=torch.tensor(feats)[None],
            decoder_input_ids=torch.tensor([dec])).logits[0].numpy()

    from vllm_tpu.config import ModelConfig
    from vllm_tpu.models.registry import get_model
    from vllm_tpu.models.weight_utils import weights_iterator

    mc = ModelConfig(model=whisper_dir, dtype="float32")
    model = get_model(mc)
    params = model.load_weights(weights_iterator(whisper_dir))

    enc = model.encode_audio(params, jnp.asarray(feats))
    assert enc.shape == (50, 64)
    # HF encoder parity
    with torch.no_grad():
        hf_enc = hf.model.encoder(
            torch.tensor(feats)[None]).last_hidden_state[0].numpy()
    np.testing.assert_allclose(np.asarray(enc), hf_enc, rtol=2e-3,
                               atol=2e-3)

    metadata, input_ids, _ = build_metadata([dec], 4, max_blocks=8,
                                            total_pad=8, req_pad=2)
    a = model.args
    self_kv = jnp.zeros((a.decoder_layers, 16, 2 * a.decoder_heads, 4,
                         a.head_dim), jnp.float32)
    caches = [model.init_states(2), self_kv]
    hidden, _ = model.forward(
        params, input_ids, caches, metadata,
        cross_embed=(jnp.asarray([0]), enc[None]))
    logits = np.asarray(model.compute_logits(params, hidden))
    np.testing.assert_allclose(logits[:4], expected, rtol=2e-3,
                               atol=2e-3)


def test_whisper_engine_greedy_matches_hf(whisper_dir):
    """Full engine transcription decode (audio through the mm path,
    cross-KV in state slots, paged self-attn) matches HF greedy."""
    import torch
    from transformers import WhisperForConditionalGeneration

    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import SamplingParams

    hf = WhisperForConditionalGeneration.from_pretrained(whisper_dir)
    hf.eval()
    cases = [(_feats(1), [3]), (_feats(2), [3, 9])]
    hf_out = []
    with torch.no_grad():
        for feats, dec in cases:
            seq = list(dec)
            for _ in range(8):
                logits = hf(
                    input_features=torch.tensor(feats)[None],
                    decoder_input_ids=torch.tensor([seq])).logits[0, -1]
                seq.append(int(logits.argmax()))
            hf_out.append(seq[len(dec):])

    llm = LLM(model=whisper_dir, dtype="float32", max_model_len=64,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_gpu_blocks_override=32, enforce_eager=True,
              skip_tokenizer_init=True)
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    outs = llm.generate([{
        "prompt_token_ids": dec,
        "multi_modal_data": {"input_features": feats},
    } for feats, dec in cases], sp)
    for r in range(len(cases)):
        assert list(outs[r].outputs[0].token_ids) == hf_out[r], \
            (r, list(outs[r].outputs[0].token_ids), hf_out[r])
