import time, numpy as np
from transformers import LlamaConfig
from vllm_tpu.engine.args import EngineArgs
from vllm_tpu.engine.llm_engine import LLMEngine
from vllm_tpu.sampling_params import SamplingParams

hf = LlamaConfig(vocab_size=128256, max_position_embeddings=1024,
    hidden_size=4096, intermediate_size=14336, num_hidden_layers=32,
    num_attention_heads=32, num_key_value_heads=8, head_dim=128)
args = EngineArgs(model="d", dtype="bfloat16", quantization="int8",
    kv_cache_dtype="int8", load_format="dummy", skip_tokenizer_init=True,
    max_model_len=1024, max_num_seqs=256, max_num_batched_tokens=4096,
    block_size=32, gpu_memory_utilization=0.92, hf_config=hf, enforce_eager=True)
config = args.create_engine_config()
config.compilation_config.min_token_bucket = 256
config.compilation_config.token_bucket_linear_step = 4096
config.compilation_config.min_req_bucket = 256
engine = LLMEngine(config)
rng = np.random.default_rng(0)
params = SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True)
for i in range(256):
    engine.add_request(str(i), {"prompt_token_ids": rng.integers(10, 128000, 128).tolist()}, params)

# instrument runner phases
runner = engine.engine_core.executor.worker.runner
orig_exec = runner.execute_model
import vllm_tpu.worker.model_runner as mr
times = {"sched": [], "exec": [], "steps": 0}
core = engine.engine_core
t_all = time.perf_counter()
while core.scheduler.has_unfinished_requests():
    t0 = time.perf_counter()
    so = core.scheduler.schedule()
    t1 = time.perf_counter()
    ro = core.executor.execute_model(so)
    t2 = time.perf_counter()
    core.scheduler.update_from_output(so, ro)
    t3 = time.perf_counter()
    ntok = so.total_num_scheduled_tokens
    times["steps"] += 1
    if ntok <= 300:  # decode step
        times.setdefault("dec", []).append((t1-t0, t2-t1, t3-t2))
    else:
        times.setdefault("pre", []).append((t1-t0, t2-t1, t3-t2))
print("steps:", times["steps"], "total", time.perf_counter()-t_all)
for k in ("pre", "dec"):
    arr = np.array(times.get(k, [(0,0,0)]))
    print(k, "n=", len(arr), "sched %.1fms exec %.1fms update %.1fms" % tuple(1e3*arr.mean(0)))
