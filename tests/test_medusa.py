"""Medusa speculative heads end-to-end (reference analog:
tests/v1/e2e/test_spec_decode.py medusa cases).

Rejection sampling emits exact target samples, so greedy WITH medusa
drafts — even random heads — must equal plain greedy."""

import json

import numpy as np
import pytest

from tests.test_llm_engine import tiny_model_dir  # noqa: F401 fixture


@pytest.fixture(scope="module")
def medusa_dir(tmp_path_factory, tiny_model_dir):  # noqa: F811
    """Synthetic medusa-head checkpoint (original repo layout)."""
    from safetensors.numpy import save_file

    d = tmp_path_factory.mktemp("medusa")
    with open(f"{tiny_model_dir}/config.json") as f:
        target_cfg = json.load(f)
    H = target_cfg["hidden_size"]
    V = target_cfg["vocab_size"]
    K, L = 3, 1
    with open(d / "config.json", "w") as f:
        json.dump({"medusa_num_heads": K, "medusa_num_layers": L,
                   "hidden_size": H, "vocab_size": V}, f)
    rng = np.random.default_rng(7)
    tensors = {}
    for i in range(K):
        for j in range(L):
            tensors[f"medusa_head.{i}.{j}.linear.weight"] = \
                (rng.standard_normal((H, H)) * 0.1).astype(np.float32)
            tensors[f"medusa_head.{i}.{j}.linear.bias"] = \
                np.zeros(H, np.float32)
        tensors[f"medusa_head.{i}.{L}.weight"] = \
            (rng.standard_normal((V, H)) * 0.1).astype(np.float32)
    save_file(tensors, str(d / "model.safetensors"))
    return str(d)


def _make_llm(model_dir, medusa=None, k=3):
    from vllm_tpu.entrypoints.llm import LLM

    kwargs = {}
    if medusa is not None:
        kwargs.update(speculative_method="medusa",
                      num_speculative_tokens=k,
                      speculative_model=medusa)
    return LLM(model=model_dir, dtype="float32", max_model_len=128,
               max_num_seqs=8, max_num_batched_tokens=256, block_size=16,
               num_gpu_blocks_override=64, enforce_eager=True, **kwargs)


def test_medusa_greedy_equals_plain_greedy(tiny_model_dir,  # noqa: F811
                                           medusa_dir):
    from vllm_tpu.sampling_params import SamplingParams

    prompts = ["the quick brown fox", "one two three four five"]
    params = SamplingParams(temperature=0.0, max_tokens=24,
                            ignore_eos=True)
    plain = _make_llm(tiny_model_dir)
    base = [o.outputs[0].token_ids
            for o in plain.generate(prompts, params)]
    del plain
    spec = _make_llm(tiny_model_dir, medusa_dir)
    got = [o.outputs[0].token_ids for o in spec.generate(prompts, params)]
    for g, b in zip(got, base):
        assert list(g) == list(b), \
            f"medusa changed greedy output\n{g}\n{b}"


def test_medusa_heads_match_numpy(medusa_dir, tiny_model_dir):  # noqa: F811
    """load_weights + propose == hand-rolled numpy heads."""
    import jax.numpy as jnp

    from vllm_tpu.config import (CacheConfig, ModelConfig,
                                 SpeculativeConfig)
    from vllm_tpu.models.llama import LlamaForCausalLM
    from vllm_tpu.ops.attention import AttentionMetadata
    from vllm_tpu.spec_decode.medusa import MedusaProposer

    target = LlamaForCausalLM(ModelConfig(model=tiny_model_dir,
                                          dtype="float32"))
    spec_cfg = SpeculativeConfig(method="medusa",
                                 num_speculative_tokens=3,
                                 model=medusa_dir)
    prop = MedusaProposer(target, spec_cfg, CacheConfig(block_size=16))
    dp = prop.load_weights(jnp.float32)

    H = target.args.hidden_size
    rng = np.random.default_rng(0)
    hidden = rng.standard_normal((6, H)).astype(np.float32)
    md = AttentionMetadata(
        slot_mapping=jnp.zeros(6, jnp.int32),
        block_tables=jnp.zeros((2, 4), jnp.int32),
        query_start_loc=jnp.asarray([0, 3, 6], jnp.int32),
        seq_lens=jnp.asarray([3, 3], jnp.int32),
        positions=jnp.zeros(6, jnp.int32))
    num_drafts = jnp.asarray([0, 0], jnp.int32)
    num_emitted = jnp.asarray([1, 1], jnp.int32)
    drafts, _ = prop.propose(dp, {}, None, jnp.zeros(6, jnp.int32),
                             jnp.asarray(hidden), md,
                             jnp.zeros((2, 4), jnp.int32), num_emitted,
                             num_drafts, 128)
    # numpy oracle: h at rows [2, 5]
    res_w = np.asarray(dp["res_w"]); res_b = np.asarray(dp["res_b"])
    lm = np.asarray(dp["lm_head"])
    for r, t in enumerate([2, 5]):
        for k in range(3):
            x = hidden[t]
            for j in range(res_w.shape[1]):
                y = x @ res_w[k, j] + res_b[k, j]
                x = x + y / (1 + np.exp(-y))
            ref = int(np.argmax(x @ lm[k]))
            assert int(drafts[r, k]) == ref
