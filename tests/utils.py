"""Shared test helpers (reference analog: tests/v1/core/utils.py)."""

from __future__ import annotations

from typing import Optional

from vllm_tpu.config import CacheConfig, SchedulerConfig, SpeculativeConfig
from vllm_tpu.core.kv_cache_interface import (FullAttentionSpec,
                                              KVCacheConfig, KVCacheGroupSpec)
from vllm_tpu.core.sched.scheduler import Scheduler
from vllm_tpu.request import Request
from vllm_tpu.sampling_params import SamplingParams

EOS_TOKEN_ID = 50256


def build_tiny_llama(dirpath: str, num_kv_heads: int = 4,
                     num_layers: int = 2) -> str:
    """Tiny Llama + tiny trained tokenizer, saved locally (no network).
    Shared by engine e2e tests and multi-host subprocess tests."""
    import torch
    from tokenizers import Tokenizer
    from tokenizers.models import BPE
    from tokenizers.pre_tokenizers import Whitespace
    from tokenizers.trainers import BpeTrainer
    from transformers import (LlamaConfig, LlamaForCausalLM,
                              PreTrainedTokenizerFast)

    tok = Tokenizer(BPE(unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    trainer = BpeTrainer(vocab_size=384,
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
    fast.save_pretrained(dirpath)

    torch.manual_seed(0)
    cfg = LlamaConfig(
        vocab_size=fast.vocab_size + 10,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=num_layers,
        num_attention_heads=4,
        num_key_value_heads=num_kv_heads,
        max_position_embeddings=256,
        bos_token_id=1,
        eos_token_id=2,
    )
    model = LlamaForCausalLM(cfg)
    model.eval()
    model.save_pretrained(dirpath, safe_serialization=True)
    return str(dirpath)


def make_kv_cache_config(num_blocks: int = 128,
                         block_size: int = 16) -> KVCacheConfig:
    spec = FullAttentionSpec(block_size=block_size,
                             num_kv_heads=2,
                             head_size=64,
                             dtype="bfloat16")
    return KVCacheConfig(
        num_blocks=num_blocks,
        kv_cache_groups=[KVCacheGroupSpec(["layer.0"], spec)],
    )


def create_scheduler(
    max_num_seqs: int = 16,
    max_num_batched_tokens: int = 8192,
    num_blocks: int = 128,
    block_size: int = 16,
    max_model_len: int = 1024,
    enable_prefix_caching: bool = True,
    policy: str = "fcfs",
    long_prefill_token_threshold: int = 0,
    num_speculative_tokens: int = 0,
) -> Scheduler:
    sched_cfg = SchedulerConfig(
        max_num_batched_tokens=max_num_batched_tokens,
        max_num_seqs=max_num_seqs,
        max_model_len=max_model_len,
        policy=policy,
        long_prefill_token_threshold=long_prefill_token_threshold,
    )
    cache_cfg = CacheConfig(block_size=block_size,
                            enable_prefix_caching=enable_prefix_caching)
    spec_cfg = None
    if num_speculative_tokens:
        spec_cfg = SpeculativeConfig(
            method="ngram", num_speculative_tokens=num_speculative_tokens)
    return Scheduler(
        scheduler_config=sched_cfg,
        cache_config=cache_cfg,
        kv_cache_config=make_kv_cache_config(num_blocks, block_size),
        speculative_config=spec_cfg,
    )


def create_requests(
    num_requests: int,
    num_tokens: int = 10,
    max_tokens: int = 16,
    stop_token_ids: Optional[list[int]] = None,
    priority: int = 0,
    same_prompt: bool = False,
) -> list[Request]:
    out = []
    for i in range(num_requests):
        sampling_params = SamplingParams(
            ignore_eos=False,
            max_tokens=max_tokens,
            stop_token_ids=stop_token_ids,
        )
        prompt = ([1] * num_tokens if same_prompt else
                  [i * 1000 + j for j in range(num_tokens)])
        out.append(
            Request(
                request_id=f"req-{i}",
                prompt_token_ids=prompt,
                sampling_params=sampling_params,
                eos_token_id=EOS_TOKEN_ID,
                priority=priority,
                arrival_time=float(i),
            ))
    return out
