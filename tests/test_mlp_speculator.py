"""MLPSpeculator drafting end-to-end (reference analog:
vllm/model_executor/models/mlp_speculator.py + spec-decode wiring).

Rejection sampling emits exact target samples, so greedy WITH chained
MLP drafts — even random stages — must equal plain greedy."""

import json

import numpy as np
import pytest

from tests.test_llm_engine import tiny_model_dir  # noqa: F401 fixture


@pytest.fixture(scope="module")
def mlp_spec_dir(tmp_path_factory, tiny_model_dir):  # noqa: F811
    """Synthetic IBM-layout MLPSpeculator checkpoint."""
    from safetensors.numpy import save_file

    d = tmp_path_factory.mktemp("mlp_spec")
    with open(f"{tiny_model_dir}/config.json") as f:
        target_cfg = json.load(f)
    H = target_cfg["hidden_size"]
    V = target_cfg["vocab_size"]
    K, N = 3, 48  # inner_dim != emb_dim exercises the proj0 split
    with open(d / "config.json", "w") as f:
        json.dump({"architectures": ["MLPSpeculatorPreTrainedModel"],
                   "model_type": "mlp_speculator",
                   "n_predict": K, "emb_dim": H, "inner_dim": N,
                   "vocab_size": V, "tie_weights": False,
                   "scale_input": True,
                   "num_lookahead_tokens": K}, f)
    rng = np.random.default_rng(9)
    tensors = {}
    for i in range(K):
        tensors[f"emb.{i}.weight"] = \
            (rng.standard_normal((V, N)) * 0.1).astype(np.float32)
        tensors[f"proj.{i}.weight"] = \
            (rng.standard_normal((N, H if i == 0 else N)) *
             0.1).astype(np.float32)
        tensors[f"head.{i}.weight"] = \
            (rng.standard_normal((V, N)) * 0.1).astype(np.float32)
        tensors[f"ln.{i}.weight"] = np.ones(N, np.float32)
        tensors[f"ln.{i}.bias"] = np.zeros(N, np.float32)
    save_file(tensors, str(d / "model.safetensors"))
    return str(d)


def _make_llm(model_dir, draft=None, k=3, method=None):
    from vllm_tpu.entrypoints.llm import LLM

    kwargs = {}
    if draft is not None:
        kwargs.update(num_speculative_tokens=k, speculative_model=draft)
        if method:
            kwargs.update(speculative_method=method)
    return LLM(model=model_dir, dtype="float32", max_model_len=128,
               max_num_seqs=8, max_num_batched_tokens=256, block_size=16,
               num_gpu_blocks_override=64, enforce_eager=True, **kwargs)


def test_mlp_speculator_greedy_equals_plain_greedy(
        tiny_model_dir, mlp_spec_dir):  # noqa: F811
    """Method auto-detected from the draft checkpoint architectures."""
    from vllm_tpu.sampling_params import SamplingParams

    prompts = ["the quick brown fox", "one two three four five"]
    params = SamplingParams(temperature=0.0, max_tokens=24,
                            ignore_eos=True)
    plain = _make_llm(tiny_model_dir)
    base = [o.outputs[0].token_ids
            for o in plain.generate(prompts, params)]
    del plain
    spec = _make_llm(tiny_model_dir, mlp_spec_dir)  # no explicit method
    got = [o.outputs[0].token_ids for o in spec.generate(prompts, params)]
    for g, b in zip(got, base):
        assert list(g) == list(b), \
            f"mlp_speculator changed greedy output\n{g}\n{b}"


def test_mlp_speculator_stages_match_numpy(mlp_spec_dir,
                                           tiny_model_dir):  # noqa: F811
    """load_weights + propose == hand-rolled numpy stages."""
    import jax.numpy as jnp
    from safetensors.numpy import load_file

    from vllm_tpu.config import CacheConfig, ModelConfig, SpeculativeConfig
    from vllm_tpu.models.llama import LlamaForCausalLM
    from vllm_tpu.ops.attention import AttentionMetadata
    from vllm_tpu.spec_decode.mlp_speculator import MLPSpeculatorProposer

    target = LlamaForCausalLM(ModelConfig(model=tiny_model_dir,
                                          dtype="float32"))
    spec_cfg = SpeculativeConfig(num_speculative_tokens=3,
                                 model=mlp_spec_dir)
    assert spec_cfg.method == "mlp_speculator"  # auto-detected
    prop = MLPSpeculatorProposer(target, spec_cfg, CacheConfig())
    params = prop.load_weights(jnp.float32)
    t = load_file(f"{mlp_spec_dir}/model.safetensors")

    rng = np.random.default_rng(3)
    R, H = 2, target.args.hidden_size
    hidden = rng.standard_normal((5, H)).astype(np.float32)
    qsl = np.asarray([0, 2, 5], np.int32)
    emitted = np.asarray([[7, 0, 0, 0], [11, 0, 0, 0]], np.int32)
    md = AttentionMetadata(
        slot_mapping=jnp.zeros(5, jnp.int32),
        block_tables=jnp.zeros((R, 4), jnp.int32),
        query_start_loc=jnp.asarray(qsl),
        seq_lens=jnp.asarray([3, 4], jnp.int32),
        positions=jnp.zeros(5, jnp.int32),
    )
    drafts, _ = prop.propose(
        params, {}, None, jnp.zeros(5, jnp.int32), jnp.asarray(hidden),
        md, jnp.asarray(emitted), jnp.ones(R, jnp.int32),
        jnp.zeros(R, jnp.int32), 128)

    # numpy reference
    sw = 0.5 ** (0.5 / 3)
    ew = np.sqrt((1 - sw ** 2) * (48 / 2))
    state = hidden[[1, 4]]
    state = state / np.sqrt((state ** 2).mean(-1, keepdims=True) + 1e-6)
    state = state / np.sqrt(2.0)
    tok = np.asarray([7, 11])
    from scipy.special import erf

    for i in range(3):
        z = t[f"emb.{i}.weight"][tok]
        s = state @ t[f"proj.{i}.weight"].T + (ew / sw) * z
        s = s / np.sqrt((s ** 2).mean(-1, keepdims=True) + 1e-6)
        s = s * t[f"ln.{i}.weight"] + t[f"ln.{i}.bias"]
        state = 0.5 * s * (1 + erf(s / np.sqrt(2.0)))
        logits = state @ t[f"head.{i}.weight"].T
        tok = np.argmax(logits, -1)
        np.testing.assert_array_equal(np.asarray(drafts[:, i]), tok)
