"""MTP speculative decoding e2e (reference analog: mimo_mtp.py /
deepseek_mtp.py draft layers): exact rejection sampling means greedy
WITH an MTP draft — even a random one — must equal plain greedy."""

import json

import numpy as np
import pytest

from tests.test_llm_engine import tiny_model_dir  # noqa: F401 fixture


@pytest.fixture(scope="module")
def mtp_draft_dir(tmp_path_factory, tiny_model_dir):  # noqa: F811
    """Synthetic MiMo-style MTP checkpoint matching the tiny target."""
    from safetensors.numpy import save_file

    d = tmp_path_factory.mktemp("mtp_draft")
    with open(f"{tiny_model_dir}/config.json") as f:
        target_cfg = json.load(f)
    H = target_cfg["hidden_size"]
    I = target_cfg["intermediate_size"]
    nq = target_cfg["num_attention_heads"]
    nk = target_cfg.get("num_key_value_heads", nq)
    hd = H // nq
    L = target_cfg["num_hidden_layers"]
    cfg = dict(target_cfg)
    cfg["architectures"] = ["MiMoMTPModel"]
    cfg["num_nextn_predict_layers"] = 1
    with open(d / "config.json", "w") as f:
        json.dump(cfg, f)

    rng = np.random.default_rng(11)

    def w(*shape, scale=0.2):
        return (rng.standard_normal(shape).astype(np.float32) *
                scale / np.sqrt(shape[-1]))

    pre = f"model.mtp_layers.{L}."
    tensors = {
        pre + "token_layernorm.weight": np.ones(H, np.float32),
        pre + "hidden_layernorm.weight": np.ones(H, np.float32),
        pre + "input_proj.weight": w(H, 2 * H),
        pre + "final_layernorm.weight": np.ones(H, np.float32),
        pre + "mtp_block.input_layernorm.weight": np.ones(H, np.float32),
        pre + "mtp_block.post_attention_layernorm.weight":
            np.ones(H, np.float32),
        pre + "mtp_block.self_attn.q_proj.weight": w(nq * hd, H),
        pre + "mtp_block.self_attn.k_proj.weight": w(nk * hd, H),
        pre + "mtp_block.self_attn.v_proj.weight": w(nk * hd, H),
        pre + "mtp_block.self_attn.o_proj.weight": w(H, nq * hd),
        pre + "mtp_block.mlp.gate_proj.weight": w(I, H),
        pre + "mtp_block.mlp.up_proj.weight": w(I, H),
        pre + "mtp_block.mlp.down_proj.weight": w(H, I),
    }
    save_file(tensors, str(d / "model.safetensors"))
    return str(d)


def _run(model_dir, draft_dir=None, k=3):
    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import SamplingParams

    kwargs = {}
    if draft_dir is not None:
        kwargs.update(speculative_model=draft_dir,
                      num_speculative_tokens=k)
    llm = LLM(model=model_dir, dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_gpu_blocks_override=48, enforce_eager=True, **kwargs)
    outs = llm.generate(
        ["the quick brown fox", "one two three four"],
        SamplingParams(temperature=0.0, max_tokens=16, ignore_eos=True))
    toks = [list(o.outputs[0].token_ids) for o in outs]
    runner = llm.llm_engine.engine_core.executor.worker.runner
    proposer = type(runner.eagle).__name__ if runner.eagle else None
    llm.llm_engine.shutdown()
    return toks, proposer


def test_mtp_greedy_matches_plain(tiny_model_dir, mtp_draft_dir):  # noqa: F811
    base, _ = _run(tiny_model_dir)
    spec, proposer = _run(tiny_model_dir, mtp_draft_dir)
    assert proposer == "MTPProposer"
    assert spec == base
