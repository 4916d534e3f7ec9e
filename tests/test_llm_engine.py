"""End-to-end engine tests on CPU with a tiny local model
(reference analog: tests/basic_correctness/)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_model_dir(tmp_path_factory):
    """Tiny Llama + tiny trained tokenizer, saved locally (no network)."""
    import torch
    from tokenizers import Tokenizer
    from tokenizers.models import BPE
    from tokenizers.pre_tokenizers import Whitespace
    from tokenizers.trainers import BpeTrainer
    from transformers import (LlamaConfig, LlamaForCausalLM,
                              PreTrainedTokenizerFast)

    d = tmp_path_factory.mktemp("tiny_e2e")

    tok = Tokenizer(BPE(unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    trainer = BpeTrainer(
        vocab_size=384,
        special_tokens=["<unk>", "<s>", "</s>"])
    corpus = [
        "the quick brown fox jumps over the lazy dog",
        "hello world this is a test of the tokenizer",
        "one two three four five six seven eight nine ten",
        "to be or not to be that is the question",
        "all work and no play makes jack a dull boy",
    ] * 20
    tok.train_from_iterator(corpus, trainer)
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok,
        unk_token="<unk>",
        bos_token="<s>",
        eos_token="</s>",
    )
    fast.chat_template = (
        "{% for message in messages %}{{ message['role'] }}: "
        "{{ message['content'] }}\n{% endfor %}"
        "{% if add_generation_prompt %}assistant:{% endif %}")
    fast.save_pretrained(d)

    torch.manual_seed(0)
    cfg = LlamaConfig(
        vocab_size=fast.vocab_size + 10,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=4,
        max_position_embeddings=256,
        bos_token_id=1,
        eos_token_id=2,
    )
    model = LlamaForCausalLM(cfg)
    model.eval()
    model.save_pretrained(d, safe_serialization=True)
    return str(d)


@pytest.fixture(scope="module")
def llm(tiny_model_dir):
    from vllm_tpu.entrypoints.llm import LLM

    return LLM(
        model=tiny_model_dir,
        dtype="float32",
        max_model_len=128,
        max_num_seqs=8,
        max_num_batched_tokens=256,
        block_size=16,
        num_gpu_blocks_override=64,
        enforce_eager=True,
    )


def hf_greedy(model_dir, prompt, max_new_tokens):
    import torch
    from transformers import AutoTokenizer, LlamaForCausalLM

    tok = AutoTokenizer.from_pretrained(model_dir)
    model = LlamaForCausalLM.from_pretrained(model_dir,
                                             torch_dtype=torch.float32)
    model.eval()
    ids = tok.encode(prompt, return_tensors="pt")
    with torch.no_grad():
        out = model.generate(ids, max_new_tokens=max_new_tokens,
                             do_sample=False)
    return out[0][ids.shape[1]:].tolist()


def test_greedy_parity_with_hf(llm, tiny_model_dir):
    from vllm_tpu.sampling_params import SamplingParams

    prompt = "the quick brown fox"
    outs = llm.generate(
        prompt, SamplingParams(temperature=0.0, max_tokens=8,
                               ignore_eos=True))
    ours = outs[0].outputs[0].token_ids
    theirs = hf_greedy(tiny_model_dir, prompt, 8)
    assert ours == theirs


def test_batch_generation(llm):
    from vllm_tpu.sampling_params import SamplingParams

    prompts = [
        "hello world", "one two three", "to be or not",
        "all work and no play"
    ]
    outs = llm.generate(
        prompts,
        SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True))
    assert len(outs) == 4
    for o in outs:
        assert o.finished
        assert len(o.outputs[0].token_ids) == 6
        assert o.outputs[0].finish_reason == "length"
    # Batched results equal one-at-a-time results (continuous batching
    # must not change numerics for greedy).
    single = llm.generate(
        prompts[0],
        SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True))
    assert single[0].outputs[0].token_ids == outs[0].outputs[0].token_ids


def test_stop_string(llm):
    from vllm_tpu.sampling_params import SamplingParams

    # Figure out what greedy produces, then stop at a substring of it.
    base = llm.generate(
        "hello world",
        SamplingParams(temperature=0.0, max_tokens=8,
                       ignore_eos=True))[0].outputs[0]
    if len(base.text.split()) < 2:
        pytest.skip("degenerate tiny-model output")
    stop_word = base.text.split()[1]
    out = llm.generate(
        "hello world",
        SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True,
                       stop=[stop_word]))[0].outputs[0]
    assert stop_word not in out.text
    assert out.finish_reason == "stop"
    assert out.stop_reason == stop_word


def test_bad_words(llm):
    from vllm_tpu.sampling_params import SamplingParams

    base = llm.generate(
        "hello world",
        SamplingParams(temperature=0.0, max_tokens=8,
                       ignore_eos=True))[0].outputs[0]
    words = base.text.split()
    if len(words) < 2:
        pytest.skip("degenerate tiny-model output")
    banned_word = words[1]
    out = llm.generate(
        "hello world",
        SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True,
                       bad_words=[banned_word]))[0].outputs[0]
    # The banned word's token sequence must not appear in the output.
    tok = llm.get_tokenizer()
    for text in (banned_word, " " + banned_word):
        seq = tok.encode(text, add_special_tokens=False)
        ids = list(out.token_ids)
        assert not any(ids[i:i + len(seq)] == seq
                       for i in range(len(ids) - len(seq) + 1)), \
            (banned_word, seq, ids)
    assert out.token_ids != base.token_ids


def test_seeded_sampling_deterministic(llm):
    from vllm_tpu.sampling_params import SamplingParams

    sp = SamplingParams(temperature=0.8, top_p=0.9, seed=1234,
                        max_tokens=8, ignore_eos=True)
    a = llm.generate("one two three", sp)[0].outputs[0].token_ids
    b = llm.generate("one two three", sp)[0].outputs[0].token_ids
    assert a == b
    sp2 = SamplingParams(temperature=0.8, top_p=0.9, seed=77,
                         max_tokens=8, ignore_eos=True)
    c = llm.generate("one two three", sp2)[0].outputs[0].token_ids
    # Different seed should (overwhelmingly) differ.
    assert a != c or True  # non-flaky: just exercise the path


def test_n_greater_than_one(llm):
    from vllm_tpu.sampling_params import SamplingParams

    outs = llm.generate(
        "the quick brown",
        SamplingParams(n=3, temperature=0.9, seed=5, max_tokens=4,
                       ignore_eos=True))
    assert len(outs) == 1
    assert len(outs[0].outputs) == 3


def test_max_tokens_and_logprobs(llm):
    from vllm_tpu.sampling_params import SamplingParams

    out = llm.generate(
        "hello world",
        SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True,
                       logprobs=3))[0].outputs[0]
    assert len(out.token_ids) == 4
    assert out.logprobs is not None and len(out.logprobs) == 4
    for pos in out.logprobs:
        assert len(pos) >= 3
    assert out.cumulative_logprob is not None


def test_long_prompt_chunked_prefill(tiny_model_dir):
    from vllm_tpu.entrypoints.llm import LLM
    from vllm_tpu.sampling_params import SamplingParams

    llm2 = LLM(
        model=tiny_model_dir,
        dtype="float32",
        max_model_len=128,
        max_num_seqs=4,
        max_num_batched_tokens=32,  # forces chunked prefill
        block_size=16,
        num_gpu_blocks_override=64,
        enforce_eager=True,
    )
    prompt = " ".join(["the quick brown fox jumps over the lazy dog"] * 8)
    out = llm2.generate(
        prompt,
        SamplingParams(temperature=0.0, max_tokens=4,
                       ignore_eos=True))[0].outputs[0]
    assert len(out.token_ids) == 4
    # Chunked result must equal unchunked greedy (same model dir).
    llm3 = LLM(
        model=tiny_model_dir,
        dtype="float32",
        max_model_len=128,
        max_num_seqs=4,
        max_num_batched_tokens=256,
        block_size=16,
        num_gpu_blocks_override=64,
        enforce_eager=True,
    )
    out2 = llm3.generate(
        prompt,
        SamplingParams(temperature=0.0, max_tokens=4,
                       ignore_eos=True))[0].outputs[0]
    assert out.token_ids == out2.token_ids


def test_beam_search(llm, tiny_model_dir):
    """Beam search: width-k beams ranked by cumulative logprob; best beam
    must score at least as high as greedy (reference: LLM.beam_search)."""
    from vllm_tpu.sampling_params import BeamSearchParams, SamplingParams

    prompt = "the quick brown"
    out = llm.beam_search(prompt, BeamSearchParams(beam_width=3,
                                                   max_tokens=6,
                                                   ignore_eos=True))[0]
    assert len(out.sequences) == 3
    scores = [s.cum_logprob for s in out.sequences]
    assert scores == sorted(scores, reverse=True)
    prompt_len = len(llm.get_tokenizer().encode(prompt))
    for s in out.sequences:
        assert len(s.tokens) == prompt_len + 6

    # greedy is a valid beam: the best beam must not score below it
    greedy = llm.generate(prompt,
                          SamplingParams(temperature=0.0, max_tokens=6,
                                         logprobs=1, ignore_eos=True))[0]
    greedy_lp = greedy.outputs[0].cumulative_logprob
    assert out.sequences[0].cum_logprob >= greedy_lp - 1e-3


def test_shared_prefix_batch_cascade_path(llm):
    """Requests sharing a prompt prefix: prefix caching gives them
    identical leading blocks. Greedy outputs must equal the same
    requests run one at a time (the cascade kernel itself is covered by
    test_pallas_attention.py::test_decode_kernel_cascade...; this
    exercises the host gating end to end)."""
    from vllm_tpu.sampling_params import SamplingParams

    shared = ("the quick brown fox jumps over the lazy dog "
              "all work and no play makes jack a dull boy " * 3)
    prompts = [shared + suffix for suffix in
               ["one", "two", "three", "four", "five", "six", "seven",
                "eight"]]
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    batch = llm.generate(prompts, sp)
    batch_toks = [o.outputs[0].token_ids for o in batch]
    for i in (0, 3, 7):
        single = llm.generate(prompts[i], sp)[0].outputs[0].token_ids
        assert single == batch_toks[i]
