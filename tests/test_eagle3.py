"""EAGLE-3 speculative decoding end-to-end (reference analog:
vllm/model_executor/models/llama_eagle3.py + v1/spec_decode eagle3).

Rejection sampling emits exact target samples, so greedy WITH eagle3
drafts — even random draft weights — must equal plain greedy. Also
checks the aux-tap plumbing (target forward returns 3 layer inputs)
and the d2t draft-vocab mapping."""

import json

import numpy as np
import pytest

from tests.test_llm_engine import tiny_model_dir  # noqa: F401 fixture


@pytest.fixture(scope="module")
def eagle3_draft_dir(tmp_path_factory, tiny_model_dir):  # noqa: F811
    """Synthetic EAGLE-3 draft checkpoint: midlayer naming, 2H qkv,
    hidden_norm, own final norm, reduced draft vocab + d2t offsets."""
    from safetensors.numpy import save_file

    d = tmp_path_factory.mktemp("eagle3_draft")
    with open(f"{tiny_model_dir}/config.json") as f:
        target_cfg = json.load(f)
    H = target_cfg["hidden_size"]
    I = target_cfg["intermediate_size"]
    V = target_cfg["vocab_size"]
    nq = target_cfg["num_attention_heads"]
    nk = target_cfg.get("num_key_value_heads", nq)
    hd = H // nq
    Vd = V // 2  # reduced draft vocab exercises d2t
    cfg = dict(target_cfg)
    cfg.update(num_hidden_layers=1,
               architectures=["Eagle3LlamaForCausalLM"],
               draft_vocab_size=Vd, target_hidden_size=H)
    with open(d / "config.json", "w") as f:
        json.dump(cfg, f)

    rng = np.random.default_rng(17)

    def w(*shape, scale=0.2):
        return (rng.standard_normal(shape).astype(np.float32) *
                scale / np.sqrt(shape[-1]))

    # d2t offsets: draft id i -> target id 2*i (offset i)
    d2t = np.arange(Vd, dtype=np.int64)
    tensors = {
        "fc.weight": w(H, 3 * H),
        "midlayer.input_layernorm.weight": np.ones(H, np.float32),
        "midlayer.hidden_norm.weight": np.ones(H, np.float32),
        "midlayer.self_attn.q_proj.weight": w(nq * hd, 2 * H),
        "midlayer.self_attn.k_proj.weight": w(nk * hd, 2 * H),
        "midlayer.self_attn.v_proj.weight": w(nk * hd, 2 * H),
        "midlayer.self_attn.o_proj.weight": w(H, nq * hd),
        "midlayer.post_attention_layernorm.weight":
            np.ones(H, np.float32),
        "midlayer.mlp.gate_proj.weight": w(I, H),
        "midlayer.mlp.up_proj.weight": w(I, H),
        "midlayer.mlp.down_proj.weight": w(H, I),
        "norm.weight": np.ones(H, np.float32),
        "lm_head.weight": w(Vd, H),
        "d2t": d2t,
    }
    save_file(tensors, str(d / "model.safetensors"))
    return str(d)


def _make_llm(model_dir, draft=None, k=3):
    from vllm_tpu.entrypoints.llm import LLM

    kwargs = {}
    if draft is not None:
        kwargs.update(num_speculative_tokens=k, speculative_model=draft)
    return LLM(model=model_dir, dtype="float32", max_model_len=128,
               max_num_seqs=8, max_num_batched_tokens=256, block_size=16,
               num_gpu_blocks_override=64, enforce_eager=True, **kwargs)


def test_eagle3_greedy_equals_plain_greedy(tiny_model_dir,  # noqa: F811
                                           eagle3_draft_dir):
    """Method auto-detected as eagle3 from the draft architectures."""
    from vllm_tpu.sampling_params import SamplingParams

    prompts = ["the quick brown fox", "one two three four five"]
    params = SamplingParams(temperature=0.0, max_tokens=24,
                            ignore_eos=True)
    plain = _make_llm(tiny_model_dir)
    base = [o.outputs[0].token_ids
            for o in plain.generate(prompts, params)]
    del plain
    spec = _make_llm(tiny_model_dir, eagle3_draft_dir)
    got = [o.outputs[0].token_ids for o in spec.generate(prompts, params)]
    for g, b in zip(got, base):
        assert list(g) == list(b), \
            f"eagle3 changed greedy output\n{g}\n{b}"


def test_eagle3_proposer_internals(tiny_model_dir,  # noqa: F811
                                   eagle3_draft_dir):
    """d2t mapping + draft-vocab head + fc combine shapes."""
    import jax.numpy as jnp

    from vllm_tpu.config import CacheConfig, ModelConfig, SpeculativeConfig
    from vllm_tpu.models.llama import LlamaForCausalLM
    from vllm_tpu.spec_decode.eagle import Eagle3Proposer

    target = LlamaForCausalLM(ModelConfig(model=tiny_model_dir,
                                          dtype="float32"))
    spec_cfg = SpeculativeConfig(num_speculative_tokens=2,
                                 model=eagle3_draft_dir)
    assert spec_cfg.method == "eagle3"
    prop = Eagle3Proposer(target, spec_cfg, CacheConfig(block_size=16))
    params = prop.load_weights(jnp.float32)
    assert params["d2t"].dtype == jnp.int32
    Vd = prop.draft_vocab
    assert params["lm_head"]["w"].shape[-1] == Vd
    # d2t offsets map draft id i -> 2*i
    normed = jnp.eye(4, target.args.hidden_size, dtype=jnp.float32)
    toks = np.asarray(prop._draft_argmax(params, normed))
    draft_ids = np.asarray(
        jnp.argmax(normed @ params["lm_head"]["w"], axis=-1))
    np.testing.assert_array_equal(toks, 2 * draft_ids)


def test_target_aux_taps(tiny_model_dir):  # noqa: F811
    """forward() returns each tapped layer's INPUT when configured."""
    import jax.numpy as jnp

    from tests.test_model_vs_hf import build_metadata
    from vllm_tpu.config import ModelConfig
    from vllm_tpu.models.llama import LlamaForCausalLM
    from vllm_tpu.models.weight_utils import weights_iterator

    model = LlamaForCausalLM(ModelConfig(model=tiny_model_dir,
                                         dtype="float32"))
    params = model.load_weights(weights_iterator(tiny_model_dir))
    a = model.args
    metadata, input_ids, _ = build_metadata([[1, 5, 9, 3]], 16, 8, 8, 1)
    kv = jnp.zeros((a.num_layers, 8, 2 * a.num_kv_heads, 16, a.head_dim),
                   jnp.float32)
    model.aux_hidden_state_layers = (0, 1)
    _, _, aux = model.forward(params, input_ids, [kv], metadata)
    assert aux.shape == (2, input_ids.shape[0], a.hidden_size)
    # tap 0 is the embedding output (layer 0's input)
    embed = model.embed(params, input_ids)
    np.testing.assert_allclose(np.asarray(aux[0]), np.asarray(embed),
                               rtol=1e-6, atol=1e-6)
    model.aux_hidden_state_layers = ()
