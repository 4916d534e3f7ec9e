"""Golden-logit comparison vs HuggingFace transformers (reference analog:
tests/models/ greedy/logprob agreement via HfRunner)."""

import numpy as np
import pytest

import jax.numpy as jnp


@pytest.fixture(scope="module")
def tiny_llama_dir(tmp_path_factory):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    cfg = LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
        rms_norm_eps=1e-6,
        tie_word_embeddings=False,
    )
    model = LlamaForCausalLM(cfg)
    model.eval()
    d = tmp_path_factory.mktemp("tiny_llama")
    model.save_pretrained(d, safe_serialization=True)
    return str(d)


def hf_logits(model_dir, token_lists):
    import torch
    from transformers import LlamaForCausalLM

    model = LlamaForCausalLM.from_pretrained(model_dir,
                                             torch_dtype=torch.float32)
    model.eval()
    outs = []
    with torch.no_grad():
        for toks in token_lists:
            ids = torch.tensor([toks])
            logits = model(ids).logits[0]
            outs.append(logits.numpy())
    return outs


def build_metadata(token_lists, block_size, max_blocks, total_pad, req_pad,
                   positions_offset=None):
    """Host-side input building (mirrors what InputBatch does)."""
    from vllm_tpu.ops.attention import AttentionMetadata

    R = req_pad
    T = total_pad
    input_ids = np.zeros(T, np.int32)
    positions = np.zeros(T, np.int32)
    slot_mapping = np.zeros(T, np.int32)
    qsl = np.zeros(R + 1, np.int32)
    seq_lens = np.zeros(R, np.int32)
    block_tables = np.zeros((R, max_blocks), np.int32)

    offset = 0
    next_block = 1  # block 0 = null block
    for r, toks in enumerate(token_lists):
        n = len(toks)
        input_ids[offset:offset + n] = toks
        p0 = positions_offset[r] if positions_offset else 0
        positions[offset:offset + n] = p0 + np.arange(n)
        nblocks = -(-n // block_size)
        blocks = list(range(next_block, next_block + nblocks))
        next_block += nblocks
        block_tables[r, :nblocks] = blocks
        for i in range(n):
            slot_mapping[offset + i] = (blocks[i // block_size] * block_size
                                        + i % block_size)
        qsl[r + 1] = offset + n
        seq_lens[r] = p0 + n
        offset += n
    qsl[len(token_lists) + 1:] = offset

    return AttentionMetadata(
        slot_mapping=jnp.asarray(slot_mapping),
        block_tables=jnp.asarray(block_tables),
        query_start_loc=jnp.asarray(qsl),
        seq_lens=jnp.asarray(seq_lens),
        positions=jnp.asarray(positions),
    ), jnp.asarray(input_ids), next_block


def test_llama_logits_match_hf(tiny_llama_dir):
    from vllm_tpu.config import ModelConfig
    from vllm_tpu.models.registry import get_model
    from vllm_tpu.models.weight_utils import weights_iterator

    token_lists = [
        [1, 5, 9, 3, 7, 11, 2],
        [4, 8, 100, 42],
    ]
    expected = hf_logits(tiny_llama_dir, token_lists)

    mc = ModelConfig(model=tiny_llama_dir, dtype="float32")
    model = get_model(mc)
    params = model.load_weights(weights_iterator(tiny_llama_dir))

    block_size = 4
    metadata, input_ids, _ = build_metadata(token_lists, block_size,
                                            max_blocks=8, total_pad=16,
                                            req_pad=4)
    a = model.args
    kv = jnp.zeros((a.num_layers, 32, 2 * a.num_kv_heads, block_size,
                    a.head_dim), jnp.float32)
    hidden, _ = model.forward(params, input_ids, [kv], metadata)
    logits = np.asarray(model.compute_logits(params, hidden))

    offset = 0
    for r, toks in enumerate(token_lists):
        ours = logits[offset:offset + len(toks)]
        np.testing.assert_allclose(ours, expected[r], rtol=2e-4, atol=2e-4)
        offset += len(toks)


def test_decode_step_matches_prefill(tiny_llama_dir):
    """Incremental decode (1 token vs cached KV) must equal full prefill."""
    from vllm_tpu.config import ModelConfig
    from vllm_tpu.models.registry import get_model
    from vllm_tpu.models.weight_utils import weights_iterator
    from vllm_tpu.ops.attention import AttentionMetadata

    toks = [1, 5, 9, 3, 7, 11, 2, 6]
    mc = ModelConfig(model=tiny_llama_dir, dtype="float32")
    model = get_model(mc)
    params = model.load_weights(weights_iterator(tiny_llama_dir))
    a = model.args
    block_size = 4

    # Full prefill of all 8 tokens.
    metadata, input_ids, _ = build_metadata([toks], block_size, 8, 8, 1)
    kv = jnp.zeros((a.num_layers, 16, 2 * a.num_kv_heads, block_size,
                    a.head_dim), jnp.float32)
    hidden_full, _ = model.forward(params, input_ids, [kv], metadata)
    logits_full = np.asarray(
        model.compute_logits(params, hidden_full))[len(toks) - 1]

    # Prefill 7 tokens, then decode token 8.
    metadata7, input7, _ = build_metadata([toks[:7]], block_size, 8, 8, 1)
    kv = jnp.zeros((a.num_layers, 16, 2 * a.num_kv_heads, block_size,
                    a.head_dim), jnp.float32)
    _, kvs = model.forward(params, input7, [kv], metadata7)
    dec_meta = AttentionMetadata(
        slot_mapping=jnp.asarray([2 * block_size + 3], jnp.int32),
        block_tables=metadata7.block_tables,
        query_start_loc=jnp.asarray([0, 1], jnp.int32),
        seq_lens=jnp.asarray([8], jnp.int32),
        positions=jnp.asarray([7], jnp.int32),
    )
    hidden_dec, _ = model.forward(params, jnp.asarray([toks[7]], jnp.int32),
                                  kvs, dec_meta)
    logits_dec = np.asarray(model.compute_logits(params, hidden_dec))[0]
    np.testing.assert_allclose(logits_dec, logits_full, rtol=2e-4,
                               atol=2e-4)
