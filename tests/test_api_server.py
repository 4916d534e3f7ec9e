"""API-server integration: real subprocess server hit over HTTP
(reference analog: tests/entrypoints/openai/ RemoteOpenAIServer)."""

import json
import os
import signal
import subprocess
import sys
import time
import urllib.request

import pytest

from tests.test_llm_engine import tiny_model_dir  # fixture reuse  # noqa

SERVER_BOOT = """
import jax
jax.config.update("jax_platforms", "cpu")
import logging
logging.basicConfig(level=logging.WARNING)
from vllm_tpu.entrypoints.openai.api_server import make_arg_parser, run_server
run_server(make_arg_parser().parse_args())
"""


def _get(base, path):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return r.status, r.read().decode()


def _post(base, path, payload, timeout=60):
    req = urllib.request.Request(
        base + path,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, r.read().decode()


@pytest.fixture(scope="module")
def server(tiny_model_dir, tmp_path_factory):
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    boot = tmp_path_factory.mktemp("srv") / "boot.py"
    boot.write_text(SERVER_BOOT)
    proc = subprocess.Popen(
        [
            sys.executable, str(boot),
            "--host", "127.0.0.1", "--port", str(port),
            "--model", tiny_model_dir,
            "--dtype", "float32",
            "--max-model-len", "128",
            "--max-num-seqs", "8",
            "--block-size", "16",
            "--num-gpu-blocks-override", "64",
            "--enforce-eager",
        ],
        env={**os.environ, "PYTHONPATH": "/root/repo"},
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
    )
    base = f"http://127.0.0.1:{port}"
    deadline = time.time() + 120
    while time.time() < deadline:
        if proc.poll() is not None:
            out = proc.stdout.read().decode()
            raise RuntimeError(f"server died:\n{out[-3000:]}")
        try:
            status, _ = _get(base, "/health")
            if status == 200:
                break
        except Exception:
            time.sleep(0.5)
    else:
        proc.kill()
        raise TimeoutError("server did not come up")
    yield base
    proc.send_signal(signal.SIGINT)
    try:
        proc.wait(timeout=10)
    except subprocess.TimeoutExpired:
        proc.kill()


def test_health_version_models(server):
    assert _get(server, "/health")[0] == 200
    status, body = _get(server, "/version")
    assert status == 200 and "version" in body
    status, body = _get(server, "/v1/models")
    data = json.loads(body)
    assert data["object"] == "list"
    assert len(data["data"]) == 1


def test_completions(server):
    status, body = _post(
        server, "/v1/completions", {
            "prompt": "hello world",
            "max_tokens": 8,
            "temperature": 0.0,
            "ignore_eos": True,
        })
    assert status == 200
    data = json.loads(body)
    assert data["object"] == "text_completion"
    assert data["choices"][0]["finish_reason"] == "length"
    assert data["usage"]["completion_tokens"] == 8
    assert isinstance(data["choices"][0]["text"], str)


def test_completions_n2(server):
    status, body = _post(
        server, "/v1/completions", {
            "prompt": "one two three",
            "max_tokens": 4,
            "temperature": 0.7,
            "seed": 42,
            "n": 2,
            "ignore_eos": True,
        })
    data = json.loads(body)
    assert len(data["choices"]) == 2
    assert {c["index"] for c in data["choices"]} == {0, 1}


def test_completions_stream(server):
    import http.client

    req = urllib.request.Request(
        server + "/v1/completions",
        data=json.dumps({
            "prompt": "the quick brown",
            "max_tokens": 6,
            "temperature": 0.0,
            "ignore_eos": True,
            "stream": True,
        }).encode(),
        headers={"Content-Type": "application/json"})
    chunks = []
    with urllib.request.urlopen(req, timeout=60) as r:
        assert r.headers["Content-Type"].startswith("text/event-stream")
        for line in r:
            line = line.decode().strip()
            if line.startswith("data:"):
                chunks.append(line[5:].strip())
    assert chunks[-1] == "[DONE]"
    assert len(chunks) >= 2


def test_chat_completions(server):
    status, body = _post(
        server, "/v1/chat/completions", {
            "messages": [{"role": "user", "content": "hello world"}],
            "max_tokens": 6,
            "temperature": 0.0,
            "ignore_eos": True,
        })
    assert status == 200
    data = json.loads(body)
    assert data["object"] == "chat.completion"
    assert data["choices"][0]["message"]["role"] == "assistant"
    assert data["choices"][0]["finish_reason"] == "length"


def test_chat_completions_stream(server):
    req = urllib.request.Request(
        server + "/v1/chat/completions",
        data=json.dumps({
            "messages": [{"role": "user", "content": "one two"}],
            "max_tokens": 5,
            "temperature": 0.0,
            "ignore_eos": True,
            "stream": True,
        }).encode(),
        headers={"Content-Type": "application/json"})
    chunks = []
    with urllib.request.urlopen(req, timeout=60) as r:
        for line in r:
            line = line.decode().strip()
            if line.startswith("data:"):
                chunks.append(line[5:].strip())
    assert chunks[-1] == "[DONE]"
    first = json.loads(chunks[0])
    assert first["choices"][0]["delta"]["role"] == "assistant"


def test_tokenize_detokenize(server):
    status, body = _post(server, "/tokenize",
                         {"prompt": "hello world test"})
    assert status == 200
    data = json.loads(body)
    assert data["count"] == len(data["tokens"]) > 0
    status, body = _post(server, "/detokenize", {"tokens": data["tokens"]})
    assert status == 200
    assert "hello" in json.loads(body)["prompt"]


def test_metrics_endpoint(server):
    status, body = _get(server, "/metrics")
    assert status == 200
    assert "vllm:num_requests_running" in body
    assert "vllm:generation_tokens" in body
    # completions above must have counted
    for line in body.splitlines():
        if line.startswith("vllm:request_success_total"):
            assert float(line.rsplit(" ", 1)[1]) >= 1
            break
    else:
        pytest.fail("vllm:request_success_total missing")


def test_admin_routes(server):
    status, body = _post(server, "/reset_prefix_cache", {})
    assert status == 200
    status, body = _get(server, "/is_sleeping")
    assert json.loads(body)["is_sleeping"] is False


def test_bad_request_400(server):
    try:
        _post(server, "/v1/completions", {
            "prompt": "x",
            "max_tokens": 8,
            "temperature": -5,
        })
        raise AssertionError("expected HTTPError")
    except urllib.error.HTTPError as e:
        assert e.code == 400
        err = json.loads(e.read().decode())
        assert "error" in err


def test_guided_choice(server):
    # NB: the test tokenizer (Whitespace pretokenizer) cannot emit spaces,
    # so choices are single words.
    status, body = _post(
        server, "/v1/completions", {
            "prompt": "hello",
            "max_tokens": 10,
            "temperature": 0.0,
            "guided_choice": ["onetwo", "threefourfive"],
        })
    assert status == 200
    text = json.loads(body)["choices"][0]["text"]
    assert text.replace(" ", "") in ("onetwo", "threefourfive"), text


def test_audio_route_wired_400_without_file(server):
    """/v1/audio/transcriptions exists and rejects a missing upload
    cleanly (full ASR e2e lives in test_whisper_model.py)."""
    import urllib.request

    body = (b"--b0\r\nContent-Disposition: form-data; "
            b"name=\"language\"\r\n\r\nen\r\n--b0--\r\n")
    req = urllib.request.Request(
        f"{server}/v1/audio/transcriptions", data=body,
        headers={"Content-Type": "multipart/form-data; boundary=b0"})
    try:
        urllib.request.urlopen(req, timeout=30)
        raise AssertionError("expected HTTPError")
    except urllib.error.HTTPError as e:
        assert e.code == 400
        err = json.loads(e.read().decode())
        assert "file" in err["error"]["message"]


def test_responses_api_e2e(server):
    """/v1/responses + retrieve (reference: api_server.py:564,599)."""
    status, body = _post(server, "/v1/responses", {
        "input": "hello",
        "max_output_tokens": 8,
        "temperature": 0.0,
    })
    assert status == 200
    data = json.loads(body)
    assert data["object"] == "response"
    assert data["status"] in ("completed", "incomplete")
    assert data["output"][0]["content"][0]["type"] == "output_text"
    rid = data["id"]
    status, body = _get(server, f"/v1/responses/{rid}")
    assert status == 200
    assert json.loads(body)["id"] == rid
    try:
        _get(server, "/v1/responses/resp_missing")
        raise AssertionError("expected 404")
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_pooling_route(server):
    status, body = _post(server, "/pooling",
                         {"input": "hello world", "task": "embed"})
    assert status == 200
    data = json.loads(body)
    assert data["object"] == "list"
    assert data["data"][0]["object"] == "pooling"
    vec = data["data"][0]["data"]
    assert len(vec) > 4
    # raw pooled states: NOT L2-normalized (that's /v1/embeddings)
    norm = sum(x * x for x in vec) ** 0.5
    assert abs(norm - 1.0) > 1e-3


@pytest.fixture(scope="module")
def classifier_server(tmp_path_factory):
    """GPT-2 sequence-classifier server (reference: /classify route over
    a ForSequenceClassification checkpoint)."""
    import socket

    import torch
    from transformers import GPT2Config, GPT2ForSequenceClassification

    d = tmp_path_factory.mktemp("clf")
    # reuse the tiny trained tokenizer from build_tiny_llama, then
    # overwrite the model with a GPT-2 classifier of matching vocab
    from tests.utils import build_tiny_llama
    build_tiny_llama(str(d))
    torch.manual_seed(0)
    cfg = GPT2Config(vocab_size=384, n_positions=128, n_embd=64,
                     n_layer=2, n_head=4, n_inner=96, num_labels=3,
                     pad_token_id=0,
                     id2label={0: "neg", 1: "neu", 2: "pos"},
                     label2id={"neg": 0, "neu": 1, "pos": 2})
    m = GPT2ForSequenceClassification(cfg)
    m.eval()
    m.save_pretrained(str(d), safe_serialization=True)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    boot = tmp_path_factory.mktemp("srv2") / "boot.py"
    boot.write_text(SERVER_BOOT)
    proc = subprocess.Popen(
        [
            sys.executable, str(boot),
            "--host", "127.0.0.1", "--port", str(port),
            "--model", str(d),
            "--dtype", "float32",
            "--max-model-len", "64",
            "--max-num-seqs", "4",
            "--block-size", "16",
            "--num-gpu-blocks-override", "32",
            "--enforce-eager",
        ],
        env={**os.environ, "PYTHONPATH": "/root/repo"},
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
    )
    base = f"http://127.0.0.1:{port}"
    deadline = time.time() + 120
    while time.time() < deadline:
        if proc.poll() is not None:
            out = proc.stdout.read().decode()
            raise RuntimeError(f"server died:\n{out[-3000:]}")
        try:
            if _get(base, "/health")[0] == 200:
                break
        except Exception:
            time.sleep(0.5)
    else:
        proc.kill()
        raise TimeoutError("server did not come up")
    yield base
    proc.send_signal(signal.SIGINT)
    try:
        proc.wait(timeout=10)
    except subprocess.TimeoutExpired:
        proc.kill()


def test_classify_route(classifier_server):
    status, body = _post(classifier_server, "/classify",
                         {"input": ["hello world", "the quick brown fox"]})
    assert status == 200
    data = json.loads(body)
    assert len(data["data"]) == 2
    for item in data["data"]:
        assert item["num_classes"] == 3
        assert item["label"] in ("neg", "neu", "pos")
        assert abs(sum(item["probs"]) - 1.0) < 1e-4
