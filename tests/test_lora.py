"""Multi-LoRA tests: op correctness, PEFT ingestion/repack, slot manager
LRU, and end-to-end engine serving with adapters (reference test strategy:
tests/lora/ in the reference repo; SURVEY.md §2.9 LoRA row)."""

import json

import numpy as np
import pytest

from vllm_tpu.lora.peft import (default_target_specs, load_peft_adapter,
                                save_peft_adapter)
from vllm_tpu.lora.request import LoRARequest


class _Args:
    num_heads = 4
    num_kv_heads = 2
    head_dim = 16
    hidden_size = 64
    intermediate_size = 128
    num_layers = 2


# --------------------------------------------------------------- op unit


def test_lora_delta_matches_dense():
    import jax.numpy as jnp

    from vllm_tpu.lora.ops import lora_delta

    rng = np.random.default_rng(0)
    T, IN, OUT, S, R = 10, 32, 48, 3, 8
    x = rng.normal(size=(T, IN)).astype(np.float32)
    a = rng.normal(size=(S, IN, R)).astype(np.float32) * 0.1
    b = rng.normal(size=(S, R, OUT)).astype(np.float32) * 0.1
    token_lora = np.array([0, 1, 2, 3, 0, 1, 3, 3, 2, 0], np.int32)

    out = np.asarray(
        lora_delta(jnp.asarray(x), {"a": jnp.asarray(a),
                                    "b": jnp.asarray(b)},
                   jnp.asarray(token_lora)))
    for t in range(T):
        s = token_lora[t]
        expect = (x[t] @ a[s] @ b[s]) if s < S else np.zeros(OUT)
        np.testing.assert_allclose(out[t], expect, rtol=1e-4, atol=1e-5)


# ------------------------------------------------------------ peft repack


def test_peft_roundtrip_placement(tmp_path):
    args = _Args()
    rng = np.random.default_rng(1)
    r, alpha = 4, 8.0
    nq, nk, d = args.num_heads, args.num_kv_heads, args.head_dim
    H, I = args.hidden_size, args.intermediate_size
    weights = {
        "q_proj": (rng.normal(size=(r, H)), rng.normal(size=(nq * d, r))),
        "v_proj": (rng.normal(size=(r, H)), rng.normal(size=(nk * d, r))),
        "down_proj": (rng.normal(size=(r, I)), rng.normal(size=(H, r))),
    }
    save_peft_adapter(str(tmp_path), args.num_layers, r, alpha, weights)

    specs = default_target_specs(args)
    max_rank = 8
    adapter = load_peft_adapter(str(tmp_path), args.num_layers, specs,
                                max_rank)
    assert adapter.rank == r
    scaling = alpha / r

    qkv = adapter.tensors["qkv"]
    x = rng.normal(size=(5, H)).astype(np.float32)
    # fused delta == per-module deltas placed at the right output slices
    delta = x @ qkv["a"][0] @ qkv["b"][0]
    aq, bq = weights["q_proj"]
    av, bv = weights["v_proj"]
    expect = np.zeros((5, (nq + 2 * nk) * d), np.float32)
    expect[:, :nq * d] = x @ aq.T @ bq.T * scaling
    expect[:, (nq + nk) * d:] = x @ av.T @ bv.T * scaling
    np.testing.assert_allclose(delta, expect, rtol=1e-4, atol=1e-4)

    # k_proj untargeted: its output slice must be zero
    assert np.all(delta[:, nq * d:(nq + nk) * d] == 0)
    # o / gate_up untargeted entirely
    assert "o" not in adapter.tensors
    assert "gate_up" not in adapter.tensors
    # down targeted
    assert "down" in adapter.tensors

    # rank too large is rejected
    with pytest.raises(ValueError):
        load_peft_adapter(str(tmp_path), args.num_layers, specs, 2)


# ------------------------------------------------------------ manager LRU


def _make_adapter_dir(tmp_path, name, num_layers, H, I, nq, nk, d, seed):
    rng = np.random.default_rng(seed)
    r = 4
    p = tmp_path / name
    save_peft_adapter(
        str(p), num_layers, r, float(r),
        {"q_proj": (rng.normal(size=(r, H)) * 0.1,
                    rng.normal(size=(nq * d, r)) * 0.1)})
    return str(p)


def test_manager_slots_and_lru(tmp_path):
    import jax.numpy as jnp

    from vllm_tpu.config import LoRAConfig
    from vllm_tpu.lora.manager import LoRAManager

    args = _Args()
    cfg = LoRAConfig(max_lora_rank=8, max_loras=2)
    mgr = LoRAManager(args, cfg, jnp.float32)

    reqs = [
        LoRARequest(f"a{i}", i + 1,
                    _make_adapter_dir(tmp_path, f"a{i}", args.num_layers,
                                      args.hidden_size,
                                      args.intermediate_size,
                                      args.num_heads, args.num_kv_heads,
                                      args.head_dim, seed=i))
        for i in range(3)
    ]

    slots = mgr.activate([reqs[0], reqs[1]])
    assert set(slots.values()) == {0, 1}
    # third adapter evicts the LRU one
    mgr.last_used[reqs[0].lora_int_id] = 0.0
    slots = mgr.activate([reqs[2]])
    assert reqs[2].lora_int_id in slots
    assert reqs[0].lora_int_id not in mgr.id_to_slot
    # slot content actually written: the a-stack has nonzero slot rows
    a_stack = np.asarray(mgr.stacks["qkv"]["a"])
    assert np.any(a_stack[:, slots[reqs[2].lora_int_id]] != 0)
    # over-subscription within one batch is rejected
    with pytest.raises(RuntimeError):
        mgr.activate(reqs)
    # remove
    assert mgr.remove_lora(reqs[2].lora_int_id)
    assert reqs[2].lora_int_id not in mgr.list_loras()


# ----------------------------------------------------------------- e2e


@pytest.fixture(scope="module")
def tiny_lora_setup(tmp_path_factory):
    """Tiny HF llama + a PEFT adapter that meaningfully changes logits."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    d = tmp_path_factory.mktemp("tiny_lora_model")
    torch.manual_seed(0)
    cfg = LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=128,
                      bos_token_id=1, eos_token_id=2)
    LlamaForCausalLM(cfg).save_pretrained(str(d), safe_serialization=True)
    # engine reads tokenizer only when skip_tokenizer_init is False;
    # these tests feed token ids directly
    adapter_dir = tmp_path_factory.mktemp("tiny_adapter")
    rng = np.random.default_rng(7)
    r = 4
    H, I = 64, 128
    nq = nk = 4
    nk = 2
    dh = 16
    save_peft_adapter(
        str(adapter_dir), 2, r, 2.0 * r,
        {
            "q_proj": (rng.normal(size=(r, H)), rng.normal(size=(64, r))),
            "o_proj": (rng.normal(size=(r, 64)), rng.normal(size=(H, r))),
            "gate_proj": (rng.normal(size=(r, H)),
                          rng.normal(size=(I, r))),
        })
    return str(d), str(adapter_dir)


def test_engine_lora_end_to_end(tiny_lora_setup):
    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import SamplingParams

    model_dir, adapter_dir = tiny_lora_setup
    llm = LLM(model=model_dir, dtype="float32", max_model_len=64,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_gpu_blocks_override=32, enforce_eager=True,
              skip_tokenizer_init=True, enable_lora=True, max_loras=2,
              max_lora_rank=8)
    prompt = {"prompt_token_ids": [1, 5, 9, 13, 17]}
    sp = SamplingParams(temperature=0.0, max_tokens=8,
                        ignore_eos=True)

    base = llm.generate(prompt, sp)[0].outputs[0].token_ids
    lr = LoRARequest("adp", 1, adapter_dir)
    with_lora = llm.generate(prompt, sp, lora_request=lr)[0] \
        .outputs[0].token_ids
    base2 = llm.generate(prompt, sp)[0].outputs[0].token_ids

    # adapter changes generation; no-adapter path is unchanged after
    assert list(base) == list(base2)
    assert list(base) != list(with_lora)

    # mixed batch: one request with, one without, in the same step
    outs = []
    llm.llm_engine.add_request("r-base", prompt, sp)
    llm.llm_engine.add_request("r-lora", prompt, sp, lora_request=lr)
    done = {}
    while llm.llm_engine.has_unfinished_requests():
        for out in llm.llm_engine.step():
            if out.finished:
                done[out.request_id] = out.outputs[0].token_ids
    assert list(done["r-base"]) == list(base)
    assert list(done["r-lora"]) == list(with_lora)

    assert llm.list_loras() == {1}
    assert llm.remove_lora(1)
