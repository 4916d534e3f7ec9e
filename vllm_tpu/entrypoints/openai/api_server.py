"""OpenAI-compatible API server on aiohttp
(reference: vllm/entrypoints/openai/api_server.py — route surface parity;
fastapi/uvicorn are not available in this environment, aiohttp is).

Routes: /v1/completions, /v1/chat/completions, /v1/models, /v1/embeddings
(501 until the pooling runner lands), /tokenize, /detokenize, /health,
/ping, /version, /metrics (Prometheus), admin: /reset_prefix_cache,
/sleep, /wake_up, /is_sleeping, /start_profile, /stop_profile, /invocations.
"""

from __future__ import annotations

import argparse
import asyncio
import inspect
import itertools
import json
import logging
from typing import Optional

from aiohttp import web

import vllm_tpu
from vllm_tpu.engine.args import EngineArgs
from vllm_tpu.engine.async_llm import AsyncLLM, EngineDeadError
from vllm_tpu.entrypoints.openai.protocol import (ChatCompletionRequest,
                                                  ClassificationRequest,
                                                  CompletionRequest,
                                                  DetokenizeRequest,
                                                  DetokenizeResponse,
                                                  EmbeddingRequest,
                                                  ErrorInfo, ErrorResponse,
                                                  ModelCard, ModelList,
                                                  PoolingRequest,
                                                  RerankRequest,
                                                  ScoreRequest,
                                                  TokenizeRequest,
                                                  TokenizeResponse,
                                                  random_uuid)
from vllm_tpu.entrypoints.openai.serving import (OpenAIServingChat,
                                                 OpenAIServingCompletion)

logger = logging.getLogger(__name__)

ENGINE_KEY = web.AppKey("engine", AsyncLLM)


def _json_error(message: str, status: int = 400,
                err_type: str = "BadRequestError") -> web.Response:
    body = ErrorResponse(error=ErrorInfo(message=message, type=err_type,
                                         code=status))
    return web.json_response(json.loads(body.model_dump_json()),
                             status=status)


async def _respond(result) -> web.Response:
    return web.json_response(json.loads(result.model_dump_json()))


async def _stream_response(request: web.Request,
                           gen) -> web.StreamResponse:
    resp = web.StreamResponse(
        headers={
            "Content-Type": "text/event-stream",
            "Cache-Control": "no-cache",
        })
    await resp.prepare(request)
    async for chunk in gen:
        await resp.write(chunk.encode())
    await resp.write_eof()
    return resp


def build_app(engine: AsyncLLM, served_model_name: str,
              max_model_len: int,
              tool_call_parser: Optional[str] = None,
              reasoning_parser: Optional[str] = None,
              model_path: Optional[str] = None) -> web.Application:
    app = web.Application(client_max_size=64 * 1024 * 1024)
    app[ENGINE_KEY] = engine
    lora_registry: dict = {}  # adapter name -> LoRARequest
    lora_counter = itertools.count(1)
    completion = OpenAIServingCompletion(engine, served_model_name,
                                         lora_registry)
    chat = OpenAIServingChat(engine, served_model_name, lora_registry,
                             tool_call_parser=tool_call_parser,
                             reasoning_parser=reasoning_parser)
    from vllm_tpu.entrypoints.openai.speech import OpenAIServingAudio
    audio = OpenAIServingAudio(engine, served_model_name,
                               model_path or served_model_name)
    from vllm_tpu.entrypoints.openai.responses import (
        OpenAIServingResponses, ResponsesRequest)
    responses_handler = OpenAIServingResponses(engine, served_model_name,
                                               lora_registry)

    async def health(request: web.Request) -> web.Response:
        try:
            await engine.check_health()
        except EngineDeadError as e:
            return _json_error(str(e), 500, "EngineDeadError")
        return web.Response(text="")

    async def version(request: web.Request) -> web.Response:
        return web.json_response({"version": vllm_tpu.__version__})

    async def models(request: web.Request) -> web.Response:
        cards = [ModelCard(id=served_model_name,
                           max_model_len=max_model_len)]
        cards += [
            ModelCard(id=name, root=lr.lora_path,
                      parent=served_model_name,
                      max_model_len=max_model_len)
            for name, lr in lora_registry.items()
        ]
        return await _respond(ModelList(data=cards))

    async def load_lora_adapter(request: web.Request) -> web.Response:
        """POST {lora_name, lora_path} (reference: api_server.py:1193)."""
        from vllm_tpu.lora.request import LoRARequest

        try:
            body = await request.json()
            name, path = body["lora_name"], body["lora_path"]
        except Exception as e:  # noqa: BLE001
            return _json_error(f"invalid request: {e}")
        if name in lora_registry:
            return _json_error(f"adapter '{name}' is already loaded")
        lr = LoRARequest(lora_name=name, lora_int_id=next(lora_counter),
                         lora_path=path)
        try:
            ok = await engine.add_lora(lr)
        except Exception as e:  # noqa: BLE001
            return _json_error(f"failed to load adapter: {e}", 400)
        if not ok:
            return _json_error("failed to load adapter", 400)
        lora_registry[name] = lr
        return web.Response(
            text=f"Success: LoRA adapter '{name}' added successfully.")

    async def unload_lora_adapter(request: web.Request) -> web.Response:
        try:
            body = await request.json()
            name = body["lora_name"]
        except Exception as e:  # noqa: BLE001
            return _json_error(f"invalid request: {e}")
        lr = lora_registry.pop(name, None)
        if lr is None:
            return _json_error(f"adapter '{name}' is not loaded", 404)
        await engine.remove_lora(lr.lora_int_id)
        return web.Response(
            text=f"Success: LoRA adapter '{name}' removed successfully.")

    async def completions(request: web.Request) -> web.StreamResponse:
        try:
            req = CompletionRequest(**await request.json())
        except Exception as e:  # noqa: BLE001
            return _json_error(f"invalid request: {e}")
        try:
            result = await completion.create_completion(req)
        except ValueError as e:
            return _json_error(str(e))
        except EngineDeadError as e:
            return _json_error(str(e), 500, "EngineDeadError")
        if inspect.isasyncgen(result):
            return await _stream_response(request, result)
        return await _respond(result)

    async def chat_completions(request: web.Request) -> web.StreamResponse:
        try:
            req = ChatCompletionRequest(**await request.json())
        except Exception as e:  # noqa: BLE001
            return _json_error(f"invalid request: {e}")
        try:
            result = await chat.create_chat_completion(req)
        except ValueError as e:
            return _json_error(str(e))
        except EngineDeadError as e:
            return _json_error(str(e), 500, "EngineDeadError")
        if inspect.isasyncgen(result):
            return await _stream_response(request, result)
        return await _respond(result)

    async def tokenize(request: web.Request) -> web.Response:
        req = TokenizeRequest(**await request.json())
        tokenizer = engine.tokenizer
        if req.messages is not None:
            text = tokenizer.apply_chat_template(req.messages,
                                                 tokenize=False,
                                                 add_generation_prompt=True)
        else:
            text = req.prompt or ""
        tokens = tokenizer.encode(text,
                                  add_special_tokens=req.add_special_tokens)
        return await _respond(
            TokenizeResponse(count=len(tokens), max_model_len=max_model_len,
                             tokens=tokens))

    async def detokenize(request: web.Request) -> web.Response:
        req = DetokenizeRequest(**await request.json())
        text = engine.tokenizer.decode(req.tokens)
        return await _respond(DetokenizeResponse(prompt=text))

    async def metrics(request: web.Request) -> web.Response:
        import prometheus_client

        data = prometheus_client.generate_latest()
        return web.Response(body=data,
                            content_type="text/plain",
                            charset="utf-8")

    async def embeddings(request: web.Request) -> web.Response:
        """OpenAI-compatible /v1/embeddings
        (reference: api_server.py:712)."""
        import base64 as b64mod

        from vllm_tpu.sampling_params import PoolingParams

        try:
            req = EmbeddingRequest(**await request.json())
        except Exception as e:  # noqa: BLE001
            return _json_error(f"invalid request: {e}")
        inputs = req.input
        if isinstance(inputs, str):
            inputs = [inputs]
        elif inputs and isinstance(inputs[0], int):
            inputs = [inputs]
        pp = PoolingParams(task="embed", dimensions=req.dimensions)
        rid = f"embd-{random_uuid()}"
        data = []
        total_tokens = 0
        try:
            for i, item in enumerate(inputs):
                prompt = item if isinstance(item, str) else {
                    "prompt_token_ids": item
                }
                final = None
                async for out in engine.encode(
                        prompt, pp.clone(), f"{rid}-{i}",
                        lora_request=completion._lora_for(req.model)):
                    final = out
                vec = [float(x) for x in final.outputs.data]
                total_tokens += len(final.prompt_token_ids or [])
                if req.encoding_format == "base64":
                    import numpy as _np

                    emb = b64mod.b64encode(
                        _np.asarray(vec, _np.float32).tobytes()).decode()
                else:
                    emb = vec
                data.append({"object": "embedding", "index": i,
                             "embedding": emb})
        except ValueError as e:
            return _json_error(str(e))
        return web.json_response({
            "id": rid,
            "object": "list",
            "created": int(asyncio.get_event_loop().time()),
            "model": req.model or served_model_name,
            "data": data,
            "usage": {"prompt_tokens": total_tokens,
                      "total_tokens": total_tokens},
        })


    async def pooling_route(request: web.Request) -> web.Response:
        """Raw pooled hidden states (reference: api_server.py:741
        /pooling): embeddings-shaped request, un-normalized vectors."""
        from vllm_tpu.sampling_params import PoolingParams

        try:
            req = PoolingRequest(**await request.json())
        except Exception as e:  # noqa: BLE001
            return _json_error(f"invalid request: {e}")
        inputs = req.input
        if isinstance(inputs, str):
            inputs = [inputs]
        elif inputs and isinstance(inputs[0], int):
            inputs = [inputs]
        pp = PoolingParams(task=req.task, normalize=False,
                           dimensions=req.dimensions)
        rid = f"pool-{random_uuid()}"
        data = []
        total_tokens = 0
        try:
            for i, item in enumerate(inputs):
                prompt = item if isinstance(item, str) else {
                    "prompt_token_ids": item
                }
                final = None
                async for out in engine.encode(
                        prompt, pp.clone(), f"{rid}-{i}",
                        lora_request=completion._lora_for(req.model)):
                    final = out
                total_tokens += len(final.prompt_token_ids or [])
                data.append({
                    "object": "pooling", "index": i,
                    "data": [float(x) for x in final.outputs.data],
                })
        except ValueError as e:
            return _json_error(str(e))
        return web.json_response({
            "id": rid, "object": "list",
            "created": int(asyncio.get_event_loop().time()),
            "model": req.model or served_model_name,
            "data": data,
            "usage": {"prompt_tokens": total_tokens,
                      "total_tokens": total_tokens},
        })

    async def classify_route(request: web.Request) -> web.Response:
        """Sequence classification (reference: api_server.py:769
        /classify): per-input label + softmax probabilities from the
        model's classifier head."""
        from vllm_tpu.sampling_params import PoolingParams

        try:
            req = ClassificationRequest(**await request.json())
        except Exception as e:  # noqa: BLE001
            return _json_error(f"invalid request: {e}")
        inputs = [req.input] if isinstance(req.input, str) else req.input
        hf = getattr(engine.config.model_config, "hf_config", None)
        id2label = dict(getattr(hf, "id2label", None) or {})
        pp = PoolingParams(task="classify", normalize=False, softmax=True)
        rid = f"classify-{random_uuid()}"
        data = []
        total_tokens = 0
        try:
            for i, text in enumerate(inputs):
                final = None
                async for out in engine.encode(text, pp.clone(),
                                               f"{rid}-{i}"):
                    final = out
                total_tokens += len(final.prompt_token_ids or [])
                probs = [float(x) for x in final.outputs.data]
                top = int(max(range(len(probs)), key=probs.__getitem__))
                data.append({
                    "index": i,
                    "label": id2label.get(top, id2label.get(str(top),
                                                            str(top))),
                    "probs": probs,
                    "num_classes": len(probs),
                })
        except ValueError as e:
            return _json_error(str(e))
        return web.json_response({
            "id": rid, "object": "list",
            "created": int(asyncio.get_event_loop().time()),
            "model": req.model or served_model_name,
            "data": data,
            "usage": {"prompt_tokens": total_tokens,
                      "total_tokens": total_tokens},
        })

    async def _score_pairs(pairs, model_name):
        """Run cross-encoder scoring over (text_1, text_2) pairs."""
        from vllm_tpu.sampling_params import PoolingParams

        tokenizer = engine.tokenizer
        pp = PoolingParams(task="score", normalize=False)
        rid = f"score-{random_uuid()}"
        scores = []
        total_tokens = 0
        for i, (a, b) in enumerate(pairs):
            ids = tokenizer(a, text_pair=b).input_ids
            final = None
            async for out in engine.encode({"prompt_token_ids": ids},
                                           pp.clone(), f"{rid}-{i}"):
                final = out
            total_tokens += len(final.prompt_token_ids or [])
            data = [float(x) for x in final.outputs.data]
            scores.append(data[0] if len(data) == 1 else data)
        return rid, scores, total_tokens

    async def score(request: web.Request) -> web.Response:
        """Cross-encoder /score (reference: api_server.py score route)."""
        try:
            req = ScoreRequest(**await request.json())
        except Exception as e:  # noqa: BLE001
            return _json_error(f"invalid request: {e}")
        t1 = [req.text_1] if isinstance(req.text_1, str) else req.text_1
        t2 = [req.text_2] if isinstance(req.text_2, str) else req.text_2
        if len(t1) == 1 and len(t2) > 1:
            t1 = t1 * len(t2)
        if len(t1) != len(t2):
            return _json_error("text_1 and text_2 length mismatch")
        try:
            rid, scores, total = await _score_pairs(list(zip(t1, t2)),
                                                    req.model)
        except ValueError as e:
            return _json_error(str(e))
        return web.json_response({
            "id": rid, "object": "list",
            "model": req.model or served_model_name,
            "data": [{"object": "score", "index": i, "score": s}
                     for i, s in enumerate(scores)],
            "usage": {"prompt_tokens": total, "total_tokens": total},
        })

    async def rerank(request: web.Request) -> web.Response:
        """Jina/Cohere-style /rerank (reference: api_server.py
        do_rerank)."""
        try:
            req = RerankRequest(**await request.json())
        except Exception as e:  # noqa: BLE001
            return _json_error(f"invalid request: {e}")
        pairs = [(req.query, d) for d in req.documents]
        try:
            rid, scores, total = await _score_pairs(pairs, req.model)
        except ValueError as e:
            return _json_error(str(e))
        ranked = sorted(enumerate(scores), key=lambda t: -t[1])
        if req.top_n:
            ranked = ranked[:req.top_n]
        return web.json_response({
            "id": rid, "model": req.model or served_model_name,
            "results": [{
                "index": i,
                "document": {"text": req.documents[i]},
                "relevance_score": s,
            } for i, s in ranked],
            "usage": {"total_tokens": total},
        })

    async def reset_prefix_cache(request: web.Request) -> web.Response:
        ok = await engine.reset_prefix_cache()
        return web.json_response({"success": bool(ok)})

    async def sleep(request: web.Request) -> web.Response:
        level = int(request.query.get("level", "1"))
        await engine.sleep(level)
        return web.Response(text="")

    async def wake_up(request: web.Request) -> web.Response:
        await engine.wake_up(None)
        return web.Response(text="")

    async def is_sleeping(request: web.Request) -> web.Response:
        return web.json_response({"is_sleeping": await engine.is_sleeping()})

    async def scale_elastic_ep(request: web.Request) -> web.Response:
        """POST {"new_data_parallel_size": N} — elastic scale of the DP
        replica pool (reference: api_server.py:1033 /scale_elastic_ep).
        400 when the engine is not DP-replicated."""
        try:
            body = await request.json()
            new_size = int(body["new_data_parallel_size"])
            drain = float(body.get("drain_timeout", 120.0))
        except Exception as e:  # noqa: BLE001
            return _json_error(f"invalid request: {e}")
        scaler = getattr(engine, "scale_elastic_ep", None)
        if scaler is None:
            return _json_error(
                "engine is not data-parallel replicated; start with "
                "--data-parallel-size > 1 to enable elastic EP")
        try:
            size = await scaler(new_size, drain_timeout_s=drain)
        except (ValueError, TimeoutError) as e:
            return _json_error(str(e))
        return web.json_response({"data_parallel_size": size})

    async def start_profile(request: web.Request) -> web.Response:
        await engine.start_profile()
        return web.Response(text="")

    async def stop_profile(request: web.Request) -> web.Response:
        await engine.stop_profile()
        return web.Response(text="")

    async def _audio_endpoint(request: web.Request,
                              task: str) -> web.Response:
        """multipart/form-data: file=<wav>, model, language, temperature,
        response_format (reference: api_server.py:838,879)."""
        try:
            form = await request.post()
        except Exception as e:  # noqa: BLE001
            return _json_error(f"invalid multipart body: {e}")
        upload = form.get("file")
        if upload is None or not hasattr(upload, "file"):
            return _json_error("missing 'file' form field")
        audio_bytes = upload.file.read()
        language = form.get("language") or None
        response_format = form.get("response_format", "json")
        try:
            temperature = float(form.get("temperature", 0) or 0)
        except ValueError:
            return _json_error("temperature must be a number")
        try:
            result = await audio.create(
                audio_bytes, task=task, language=language,
                temperature=temperature,
                response_format=response_format)
        except ValueError as e:
            return _json_error(str(e))
        except NotImplementedError as e:
            return _json_error(str(e), 501, "NotImplementedError")
        if "_text" in result:
            return web.Response(text=result["_text"])
        return web.json_response(result)

    async def create_responses(request: web.Request) -> web.StreamResponse:
        """/v1/responses (reference: api_server.py:564)."""
        try:
            req = ResponsesRequest(**await request.json())
        except Exception as e:  # noqa: BLE001
            return _json_error(f"invalid request: {e}")
        try:
            result = await responses_handler.create_responses(req)
        except ValueError as e:
            return _json_error(str(e))
        except EngineDeadError as e:
            return _json_error(str(e), 500, "EngineDeadError")
        if inspect.isasyncgen(result):
            return await _stream_response(request, result)
        if isinstance(result, ErrorResponse):
            return web.json_response(
                json.loads(result.model_dump_json()),
                status=result.error.code or 400)
        return await _respond(result)

    async def retrieve_responses(request: web.Request) -> web.Response:
        result = await responses_handler.retrieve_responses(
            request.match_info["response_id"])
        if isinstance(result, ErrorResponse):
            return web.json_response(json.loads(result.model_dump_json()),
                                     status=result.error.code or 400)
        return await _respond(result)

    async def cancel_responses(request: web.Request) -> web.Response:
        result = await responses_handler.cancel_responses(
            request.match_info["response_id"])
        if isinstance(result, ErrorResponse):
            return web.json_response(json.loads(result.model_dump_json()),
                                     status=result.error.code or 400)
        return await _respond(result)

    async def transcriptions(request: web.Request) -> web.Response:
        return await _audio_endpoint(request, "transcribe")

    async def translations(request: web.Request) -> web.Response:
        return await _audio_endpoint(request, "translate")

    app.router.add_get("/health", health)
    app.router.add_get("/ping", health)
    app.router.add_post("/ping", health)
    app.router.add_get("/version", version)
    app.router.add_get("/v1/models", models)
    app.router.add_post("/v1/completions", completions)
    app.router.add_post("/v1/chat/completions", chat_completions)
    app.router.add_post("/v1/embeddings", embeddings)
    app.router.add_post("/pooling", pooling_route)
    app.router.add_post("/classify", classify_route)
    app.router.add_post("/score", score)
    app.router.add_post("/v1/score", score)
    app.router.add_post("/rerank", rerank)
    app.router.add_post("/v1/rerank", rerank)
    app.router.add_post("/v2/rerank", rerank)
    app.router.add_post("/tokenize", tokenize)
    app.router.add_post("/detokenize", detokenize)
    app.router.add_get("/metrics", metrics)
    app.router.add_post("/reset_prefix_cache", reset_prefix_cache)
    app.router.add_post("/sleep", sleep)
    app.router.add_post("/wake_up", wake_up)
    app.router.add_get("/is_sleeping", is_sleeping)
    app.router.add_post("/scale_elastic_ep", scale_elastic_ep)
    app.router.add_post("/start_profile", start_profile)
    app.router.add_post("/stop_profile", stop_profile)
    app.router.add_post("/v1/load_lora_adapter", load_lora_adapter)
    app.router.add_post("/v1/unload_lora_adapter", unload_lora_adapter)
    app.router.add_post("/v1/audio/transcriptions", transcriptions)
    app.router.add_post("/v1/audio/translations", translations)
    app.router.add_post("/v1/responses", create_responses)
    app.router.add_get("/v1/responses/{response_id}", retrieve_responses)
    app.router.add_post("/v1/responses/{response_id}/cancel",
                        cancel_responses)
    app.router.add_post("/invocations", completions)
    return app


def run_server(args: argparse.Namespace) -> None:
    engine_args = EngineArgs.from_cli_args(args)
    config = engine_args.create_engine_config()
    engine = AsyncLLM(config)
    app = build_app(engine, config.model_config.served_model_name,
                    config.scheduler_config.max_model_len,
                    tool_call_parser=getattr(args, "tool_call_parser",
                                             None),
                    reasoning_parser=getattr(args, "reasoning_parser",
                                             None),
                    model_path=config.model_config.model)
    logger.info("vllm-tpu API server on %s:%d", args.host, args.port)
    try:
        web.run_app(app, host=args.host, port=args.port,
                    access_log=None, shutdown_timeout=5)
    finally:
        engine.shutdown()


def make_arg_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="vllm-tpu OpenAI server")
    parser.add_argument("--host", type=str, default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--tool-call-parser", type=str, default=None,
                        help="hermes | llama3_json | mistral | pythonic")
    parser.add_argument("--enable-auto-tool-choice", action="store_true")
    parser.add_argument("--reasoning-parser", type=str, default=None,
                        help="deepseek_r1 | qwen3 | glm45")
    EngineArgs.add_cli_args(parser)
    return parser


def main() -> None:
    logging.basicConfig(level=logging.INFO)
    run_server(make_arg_parser().parse_args())


if __name__ == "__main__":
    main()
