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
core = engine.engine_core
runner = core.executor.worker.runner

# instrument: wrap prepare_inputs and _compiled_step
import vllm_tpu.worker.model_runner as mr
batch_prepare = None
marks = {}
orig_prepare = None
def wrap():
    global orig_prepare
    b = runner.input_batch
    orig_prepare = b.prepare_inputs
    def timed_prepare(*a, **k):
        t0 = time.perf_counter()
        out = orig_prepare(*a, **k)
        marks.setdefault("prepare", []).append(time.perf_counter()-t0)
        return out
    b.prepare_inputs = timed_prepare
    orig_step = runner._compiled_step
    def timed_step(*a, **k):
        t0 = time.perf_counter()
        out = orig_step(*a, **k)
        marks.setdefault("dispatch", []).append(time.perf_counter()-t0)
        return out
    runner._compiled_step = timed_step

rng = np.random.default_rng(0)
params = SamplingParams(temperature=0.0, max_tokens=64, ignore_eos=True)
for i in range(256):
    engine.add_request(str(i), {"prompt_token_ids": rng.integers(10, 128000, 128).tolist()}, params)
wrap()
dec_times = []
while core.scheduler.has_unfinished_requests():
    t0 = time.perf_counter()
    so = core.scheduler.schedule()
    ro = core.executor.execute_model(so)
    core.scheduler.update_from_output(so, ro)
    dt = time.perf_counter() - t0
    if so.total_num_scheduled_tokens <= 300:
        dec_times.append(dt)
n = len(dec_times)
warm = np.array(dec_times[n//2:])
print(f"decode steps {n}, warm median {np.median(warm)*1e3:.1f}ms p90 {np.percentile(warm,90)*1e3:.1f}ms")
prep = np.array(marks["prepare"][-30:]); disp = np.array(marks["dispatch"][-30:])
print(f"prepare median {np.median(prep)*1e3:.1f}ms; dispatch+fetch-side median {np.median(disp)*1e3:.1f}ms")
