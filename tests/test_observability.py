"""Tracing spans, KV-cache events, and the shared-storage KV connector
(reference analog: tests for vllm/tracing.py, kv_events, and
tests/v1/kv_connector; SURVEY.md §5.1/§2.6)."""

import json
import os
import time

import numpy as np
import pytest

from tests.test_llm_engine import tiny_model_dir  # noqa: F401 fixture
from vllm_tpu.sampling_params import SamplingParams


def _mk_llm(model_dir, **kw):
    from vllm_tpu.entrypoints.llm import LLM

    return LLM(model=model_dir, dtype="float32", max_model_len=128,
               max_num_seqs=8, max_num_batched_tokens=256, block_size=16,
               num_gpu_blocks_override=64, enforce_eager=True, **kw)


def test_request_tracing_spans(tiny_model_dir, tmp_path):  # noqa: F811
    trace_file = str(tmp_path / "spans.jsonl")
    llm = _mk_llm(tiny_model_dir, otlp_traces_endpoint=trace_file)
    sp = SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True)
    llm.generate(["the quick brown fox", "hello world"], sp)
    llm.llm_engine.tracer.flush()

    with open(trace_file) as f:
        spans = [json.loads(line) for line in f]
    assert len(spans) == 2
    for s in spans:
        a = s["attributes"]
        assert s["name"] == "llm_request"
        assert a["gen_ai.usage.completion_tokens"] == 5
        assert a["gen_ai.usage.prompt_tokens"] > 0
        assert a["gen_ai.latency.e2e"] > 0
        assert a["gen_ai.latency.time_to_first_token"] > 0
        assert a["gen_ai.request.max_tokens"] == 5


def test_kv_events_published(tiny_model_dir):  # noqa: F811
    import zmq

    port = 15799
    llm = _mk_llm(
        tiny_model_dir,
        kv_events_config=json.dumps({
            "enable_kv_cache_events": True,
            "endpoint": f"tcp://127.0.0.1:{port}",
        }))
    ctx = zmq.Context.instance()
    sub = ctx.socket(zmq.SUB)
    sub.connect(f"tcp://127.0.0.1:{port}")
    sub.setsockopt(zmq.SUBSCRIBE, b"")
    time.sleep(0.3)  # let SUB join

    sp = SamplingParams(temperature=0.0, max_tokens=40, ignore_eos=True)
    llm.generate("the quick brown fox jumps over the lazy dog " * 3, sp)

    poller = zmq.Poller()
    poller.register(sub, zmq.POLLIN)
    events = []
    deadline = time.time() + 10
    while time.time() < deadline and not events:
        if dict(poller.poll(timeout=500)):
            topic, seq, payload = sub.recv_multipart()
            batch = json.loads(payload)
            events.extend(batch["events"])
    sub.close()
    assert any(e["type"] == "block_stored" for e in events), events


def test_shared_storage_kv_connector_roundtrip(tiny_model_dir,  # noqa: F811
                                               tmp_path):
    """Prefill tier saves KV; a fresh engine pulls it instead of
    recomputing, with identical greedy output."""
    kv_dir = str(tmp_path / "kvstore")
    cfg = json.dumps({
        "kv_connector": "SharedStorageConnector",
        "kv_connector_extra_config": {"shared_storage_path": kv_dir},
    })
    prompt = "the quick brown fox jumps over the lazy dog " * 2
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)

    plain = _mk_llm(tiny_model_dir)
    base = plain.generate(prompt, sp)[0].outputs[0].token_ids
    del plain

    producer = _mk_llm(tiny_model_dir, kv_transfer_config=cfg,
                       enable_prefix_caching=False)
    out_a = producer.generate(prompt, sp)[0].outputs[0].token_ids
    assert list(out_a) == list(base)
    producer.llm_engine.shutdown()  # drains async save writes
    del producer
    saved = os.listdir(kv_dir)
    assert saved, "producer saved no KV blocks"

    consumer = _mk_llm(tiny_model_dir, kv_transfer_config=cfg,
                       enable_prefix_caching=False)
    sched = consumer.llm_engine.engine_core.scheduler
    out_b = consumer.generate(prompt, sp)[0].outputs[0].token_ids
    assert list(out_b) == list(base), "external KV changed output"

    # the consumer must have pulled blocks instead of recomputing: the
    # request's cached-token count reflects the external hit
    # (observable via scheduler stats: fewer prompt tokens scheduled)
    # -> verify via a fresh request object bookkeeping
    req_out = consumer.generate(prompt, sp)[0]
    assert req_out.num_cached_tokens and req_out.num_cached_tokens > 0


def test_multi_connector_roundtrip(tiny_model_dir, tmp_path):  # noqa: F811
    """MultiConnector: saves fan out to every tier; lookups take the
    first tier that matches (here the second, since tier A is fresh)."""
    dir_a, dir_b = str(tmp_path / "tier_a"), str(tmp_path / "tier_b")

    def cfg(first, second):
        return json.dumps({
            "kv_connector": "MultiConnector",
            "kv_connector_extra_config": {"connectors": [
                {"kv_connector": "SharedStorageConnector",
                 "kv_connector_extra_config": {
                     "shared_storage_path": first}},
                {"kv_connector": "SharedStorageConnector",
                 "kv_connector_extra_config": {
                     "shared_storage_path": second}},
            ]},
        })

    prompt = "the quick brown fox jumps over the lazy dog " * 2
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)

    producer = _mk_llm(tiny_model_dir,
                       kv_transfer_config=cfg(dir_a, dir_b),
                       enable_prefix_caching=False)
    base = producer.generate(prompt, sp)[0].outputs[0].token_ids
    # async save writes drain at shutdown (durability barrier)
    producer.llm_engine.shutdown()
    del producer
    # finished-request saves fan out to both tiers
    assert os.listdir(dir_a) and os.listdir(dir_b)

    fresh_a = str(tmp_path / "fresh_a")
    consumer = _mk_llm(tiny_model_dir,
                       kv_transfer_config=cfg(fresh_a, dir_b),
                       enable_prefix_caching=False)
    out = consumer.generate(prompt, sp)[0]
    assert list(out.outputs[0].token_ids) == list(base)
    assert out.num_cached_tokens and out.num_cached_tokens > 0


def test_p2p_zmq_kv_connector_disagg_prefill(tiny_model_dir):  # noqa: F811
    """Disaggregated P/D over a direct engine-to-engine ZMQ block
    server (reference analog: kv_connector/v1/p2p/p2p_nccl_connector.py
    without the NCCL fabric): the prefill engine serves its finished
    requests' KV; the decode engine pulls it over TCP instead of
    recomputing, with identical greedy output — no shared filesystem."""
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    addr = f"tcp://127.0.0.1:{port}"
    prompt = "the quick brown fox jumps over the lazy dog " * 2
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)

    plain = _mk_llm(tiny_model_dir)
    base = plain.generate(prompt, sp)[0].outputs[0].token_ids
    plain.llm_engine.shutdown()
    del plain

    producer = _mk_llm(
        tiny_model_dir, enable_prefix_caching=False,
        kv_transfer_config=json.dumps({
            "kv_connector": "P2pZmqConnector",
            "kv_role": "kv_producer",
            "kv_connector_extra_config": {"p2p_address": addr},
        }))
    out_a = producer.generate(prompt, sp)[0].outputs[0].token_ids
    assert list(out_a) == list(base)
    producer.llm_engine.collective_rpc("flush_kv_saves")

    consumer = _mk_llm(
        tiny_model_dir, enable_prefix_caching=False,
        kv_transfer_config=json.dumps({
            "kv_connector": "P2pZmqConnector",
            "kv_role": "kv_consumer",
            "kv_connector_extra_config": {"p2p_address": addr},
        }))
    out_b = consumer.generate(prompt, sp)[0].outputs[0].token_ids
    assert list(out_b) == list(base), "p2p KV changed output"
    req_out = consumer.generate(prompt, sp)[0]
    assert req_out.num_cached_tokens and req_out.num_cached_tokens > 0

    consumer.llm_engine.shutdown()
    producer.llm_engine.shutdown()
