import time, sys
t00 = time.perf_counter()
def mark(msg):
    print(f"[{time.perf_counter()-t00:7.1f}s] {msg}", flush=True)

import jax
mark(f"jax imported, backend={jax.default_backend()}")
from transformers import LlamaConfig
from vllm_tpu.config import ModelConfig
from vllm_tpu.engine.args import EngineArgs
from vllm_tpu.engine.llm_engine import LLMEngine
from vllm_tpu.sampling_params import SamplingParams
mark("imports done")

hf_config = LlamaConfig(vocab_size=128256, max_position_embeddings=1024,
    hidden_size=4096, intermediate_size=14336, num_hidden_layers=32,
    num_attention_heads=32, num_key_value_heads=8, head_dim=128)
engine_args = EngineArgs(model="llama3-8b-dummy", dtype="bfloat16",
    quantization="int8", load_format="dummy", skip_tokenizer_init=True,
    max_model_len=1024, max_num_seqs=256, max_num_batched_tokens=4096,
    block_size=32, gpu_memory_utilization=0.92, hf_config=hf_config,
    enforce_eager=True)
engine = LLMEngine(engine_args.create_engine_config())
mark("engine built (weights + kv + profile)")

import numpy as np
rng = np.random.default_rng(0)
params = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
for i in range(16):
    toks = rng.integers(10, 128000, 128).tolist()
    engine.add_request(str(i), {"prompt_token_ids": toks}, params)
steps = 0
while engine.has_unfinished_requests():
    engine.step()
    steps += 1
    if steps <= 12:
        mark(f"step {steps}")
mark(f"16-prompt smoke done, {steps} steps")
