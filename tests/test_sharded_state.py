"""Sharded-state save/restore: processed param tree round-trips and the
restored engine produces identical greedy output (reference analog:
tests/test_sharded_state_loader.py)."""

import numpy as np

from tests.test_llm_engine import tiny_model_dir  # noqa: F401 fixture


def test_sharded_state_roundtrip(tiny_model_dir, tmp_path):  # noqa: F811
    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import SamplingParams

    kw = dict(dtype="float32", max_model_len=128, max_num_seqs=4,
              max_num_batched_tokens=128, block_size=16,
              num_gpu_blocks_override=32, enforce_eager=True,
              skip_tokenizer_init=True)
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    prompt = {"prompt_token_ids": [3, 17, 42, 9]}

    llm = LLM(model=tiny_model_dir, **kw)
    base = list(llm.generate(prompt, sp)[0].outputs[0].token_ids)
    state_dir = tmp_path / "state"
    llm.llm_engine.save_sharded_state(str(state_dir))

    # the manifest + shards exist
    assert (state_dir / "vllm_tpu_sharded_state.json").exists()
    del llm

    # restore: model dir still provides config/tokenizer; weights come
    # from the sharded state
    import shutil
    for f in state_dir.iterdir():
        shutil.copy(f, tiny_model_dir)
    llm2 = LLM(model=tiny_model_dir, load_format="sharded_state", **kw)
    out = list(llm2.generate(prompt, sp)[0].outputs[0].token_ids)
    assert out == base


def test_sharded_state_list_tree_roundtrip(tmp_path):
    """Trees containing LISTS (hybrid models' per-layer dicts) survive
    the manifest round trip."""
    import jax.numpy as jnp

    from vllm_tpu.models.loader import (load_sharded_state,
                                        save_sharded_state)

    params = {
        "embed": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
        "layers": [
            {"a": np.ones(2, np.float32)},
            {"a": np.zeros(2, np.float32), "b": {"w": np.eye(2)}},
        ],
        "scale": jnp.asarray([1.5], jnp.bfloat16),
    }
    save_sharded_state(params, str(tmp_path / "s"))
    out = load_sharded_state(str(tmp_path / "s"))
    assert isinstance(out["layers"], list) and len(out["layers"]) == 2
    np.testing.assert_array_equal(out["embed"]["w"],
                                  params["embed"]["w"])
    np.testing.assert_array_equal(out["layers"][1]["b"]["w"], np.eye(2))
    assert out["scale"].dtype == jnp.bfloat16
