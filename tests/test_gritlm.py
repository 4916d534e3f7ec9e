"""GritLM tests: instruction-masked mean pooling + generative path
(reference analog: tests/models/embedding/language/test_gritlm.py)."""

import numpy as np
import pytest

from tests.utils import build_tiny_llama


@pytest.fixture(scope="module")
def tiny_gritlm_dir(tmp_path_factory):
    import json
    import os

    d = tmp_path_factory.mktemp("tiny_gritlm")
    build_tiny_llama(str(d))
    cfg_path = os.path.join(str(d), "config.json")
    with open(cfg_path) as f:
        cfg = json.load(f)
    cfg["architectures"] = ["GritLM"]
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    return str(d)


def test_gritlm_instruction_masked_mean_pool(tiny_gritlm_dir):
    """The pooled embedding must equal the mean of hidden states AFTER
    the <|embed|> marker only (reference: gritlm.py GritLMMeanPool)."""
    import torch
    from transformers import LlamaForCausalLM

    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import PoolingParams

    llm = LLM(model=tiny_gritlm_dir, dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_gpu_blocks_override=32, enforce_eager=True,
              skip_tokenizer_init=True)
    runner = llm.llm_engine.engine_core.executor.worker.runner
    model = runner.model
    assert type(model).__name__ == "GritLM"

    # inject synthetic marker patterns (the tiny tokenizer lacks the
    # GritLM specials; the matching logic is what's under test)
    BOS, A, B = 1, 7, 9
    model._pool_tokens = {
        "bos": BOS,
        "user": np.array([100, 101]),
        "embed_newline": np.array([102, 103, 104]),
        "embed": np.array([103, 104]),
    }
    runner.input_batch.pool_start_fn = model.pool_start_index

    instr = [BOS, 55, 56, 103, 104]          # instruction + embed marker
    sample = [5, 9, 3, 71, 8, 12]
    prompt = instr + sample
    out = llm.encode({"prompt_token_ids": prompt},
                     PoolingParams(task="embed", pooling_type="mean"))[0]
    got = np.asarray(out.outputs.data, np.float32)

    hf = LlamaForCausalLM.from_pretrained(tiny_gritlm_dir)
    hf.eval()
    with torch.no_grad():
        h = hf.model(torch.tensor([prompt])).last_hidden_state[0].numpy()
    expect = h[len(instr):].mean(axis=0)
    expect = expect / np.linalg.norm(expect)
    np.testing.assert_allclose(got, expect, rtol=3e-4, atol=3e-4)

    # no-BOS prompt: pools over everything (reference fallback)
    out2 = llm.encode({"prompt_token_ids": sample},
                      PoolingParams(task="embed"))[0]
    got2 = np.asarray(out2.outputs.data, np.float32)
    with torch.no_grad():
        h2 = hf.model(torch.tensor([sample])).last_hidden_state[0].numpy()
    expect2 = h2.mean(axis=0)
    expect2 = expect2 / np.linalg.norm(expect2)
    np.testing.assert_allclose(got2, expect2, rtol=3e-4, atol=3e-4)
    llm.llm_engine.shutdown()


def test_gritlm_generative_path(tiny_gritlm_dir):
    """GritLM still generates (dual-mode model)."""
    import torch
    from transformers import LlamaForCausalLM

    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import SamplingParams

    llm = LLM(model=tiny_gritlm_dir, dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=128, block_size=16,
              num_gpu_blocks_override=32, enforce_eager=True,
              skip_tokenizer_init=True)
    prompt = [1, 5, 9, 3]
    out = llm.generate({"prompt_token_ids": prompt},
                       SamplingParams(temperature=0.0, max_tokens=8,
                                      ignore_eos=True))
    got = list(out[0].outputs[0].token_ids)
    hf = LlamaForCausalLM.from_pretrained(tiny_gritlm_dir)
    hf.eval()
    seq = list(prompt)
    with torch.no_grad():
        for _ in range(8):
            seq.append(int(hf(torch.tensor([seq])).logits[0, -1].argmax()))
    assert got == seq[len(prompt):]
    llm.llm_engine.shutdown()
