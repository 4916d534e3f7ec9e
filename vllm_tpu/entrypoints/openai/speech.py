"""Audio (ASR) serving: /v1/audio/transcriptions + /v1/audio/translations
(reference: vllm/entrypoints/openai/serving_transcription.py +
api_server.py:838,879 — Whisper-family encoder-decoder through the
OpenAI audio surface).

Audio decode uses stdlib `wave` (PCM WAV; mono/stereo, 8/16/32-bit) —
there is no ffmpeg/librosa in the serving image; non-WAV uploads get a
clear 400. Mel features come from the model directory's own
WhisperFeatureExtractor (preprocessor_config.json)."""

from __future__ import annotations

import io
import logging
import wave
from typing import Any, Optional

import numpy as np

from vllm_tpu.sampling_params import SamplingParams

logger = logging.getLogger(__name__)


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (mono float32 PCM in [-1, 1], sample_rate)."""
    with wave.open(io.BytesIO(data)) as w:
        rate = w.getframerate()
        n = w.getnframes()
        width = w.getsampwidth()
        channels = w.getnchannels()
        raw = w.readframes(n)
    if width == 2:
        pcm = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        pcm = np.frombuffer(raw, np.int32).astype(np.float32) / 2**31
    elif width == 1:
        pcm = (np.frombuffer(raw, np.uint8).astype(np.float32) -
               128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if channels > 1:
        pcm = pcm.reshape(-1, channels).mean(axis=1)
    return pcm, rate


def _resample(pcm: np.ndarray, rate: int, target: int) -> np.ndarray:
    if rate == target:
        return pcm
    # linear resample — adequate for speech features
    n_out = int(round(len(pcm) * target / rate))
    x_old = np.linspace(0.0, 1.0, num=len(pcm), endpoint=False)
    x_new = np.linspace(0.0, 1.0, num=n_out, endpoint=False)
    return np.interp(x_new, x_old, pcm).astype(np.float32)


class OpenAIServingAudio:
    """Transcription/translation over a Whisper-family engine."""

    def __init__(self, engine, served_model_name: str,
                 model_path: str) -> None:
        self.engine = engine
        self.model_name = served_model_name
        self.model_path = model_path
        self._fe = None
        self._tok = None

    def _feature_extractor(self):
        if self._fe is None:
            from transformers import WhisperFeatureExtractor

            self._fe = WhisperFeatureExtractor.from_pretrained(
                self.model_path)
        return self._fe

    def _prompt_tokens(self, language: Optional[str],
                       task: str) -> list[int]:
        """<|startoftranscript|>[<|lang|>]<|task|><|notimestamps|>
        (skipping any special token the tokenizer lacks)."""
        tok = self.engine.tokenizer
        hf = getattr(self.engine, "hf_config", None)
        start_id = getattr(hf, "decoder_start_token_id", None)
        tokens: list[int] = []
        if start_id is not None:
            tokens.append(int(start_id))

        def maybe(name: str) -> None:
            if tok is None:
                return
            tid = tok.convert_tokens_to_ids(name)
            unk = getattr(tok, "unk_token_id", None)
            if tid is not None and tid != unk:
                tokens.append(int(tid))

        if language:
            maybe(f"<|{language}|>")
        maybe(f"<|{task}|>")
        maybe("<|notimestamps|>")
        if not tokens:
            tokens = [getattr(hf, "bos_token_id", 1) or 1]
        return tokens

    async def create(self, audio_bytes: bytes, task: str = "transcribe",
                     language: Optional[str] = None,
                     temperature: float = 0.0,
                     response_format: str = "json",
                     max_tokens: Optional[int] = None) -> dict[str, Any]:
        fe = self._feature_extractor()
        pcm, rate = decode_wav(audio_bytes)
        pcm = _resample(pcm, rate, fe.sampling_rate)
        feats = fe(pcm, sampling_rate=fe.sampling_rate,
                   return_tensors="np").input_features[0]

        prompt_ids = self._prompt_tokens(language, task)
        params = SamplingParams(temperature=temperature,
                                max_tokens=max_tokens or 400)
        from vllm_tpu.entrypoints.openai.protocol import random_uuid

        request_id = f"trsc-{random_uuid()}"
        final = None
        async for out in self.engine.generate(
                {
                    "prompt_token_ids": prompt_ids,
                    "multi_modal_data": {"input_features": feats},
                }, params, request_id):
            final = out
        text = final.outputs[0].text if final and final.outputs else ""
        if response_format == "text":
            return {"_text": text}
        return {"text": text}
