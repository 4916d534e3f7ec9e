"""Audio serving unit tests (reference analog: tests for
vllm/entrypoints/openai/serving_transcription.py)."""

import io
import wave

import numpy as np
import pytest

from vllm_tpu.entrypoints.openai.speech import _resample, decode_wav


def _wav_bytes(pcm: np.ndarray, rate: int = 16000, width: int = 2,
               channels: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(width)
        w.setframerate(rate)
        if width == 2:
            data = (pcm * 32767).astype(np.int16)
        elif width == 4:
            data = (pcm * (2**31 - 1)).astype(np.int32)
        else:
            data = ((pcm * 127) + 128).clip(0, 255).astype(np.uint8)
        if channels > 1:
            data = np.repeat(data[:, None], channels, axis=1)
        w.writeframes(data.tobytes())
    return buf.getvalue()


def test_decode_wav_roundtrip_16bit():
    t = np.linspace(0, 1, 16000, endpoint=False)
    sig = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    pcm, rate = decode_wav(_wav_bytes(sig))
    assert rate == 16000
    np.testing.assert_allclose(pcm, sig, atol=1e-3)


@pytest.mark.parametrize("width", [1, 4])
def test_decode_wav_widths(width):
    sig = np.linspace(-0.9, 0.9, 800).astype(np.float32)
    pcm, rate = decode_wav(_wav_bytes(sig, width=width))
    assert rate == 16000
    atol = 2e-2 if width == 1 else 1e-6
    np.testing.assert_allclose(pcm, sig, atol=atol)


def test_decode_wav_stereo_downmix():
    sig = np.linspace(-0.5, 0.5, 400).astype(np.float32)
    pcm, _ = decode_wav(_wav_bytes(sig, channels=2))
    np.testing.assert_allclose(pcm, sig, atol=1e-3)
    assert pcm.ndim == 1


def test_decode_non_wav_raises():
    with pytest.raises(Exception):
        decode_wav(b"\x00\x01not a wav file")


def test_resample_halves_length():
    sig = np.sin(np.linspace(0, 20 * np.pi, 32000)).astype(np.float32)
    out = _resample(sig, 32000, 16000)
    assert out.shape == (16000,)
    # downsampled signal tracks the original envelope
    np.testing.assert_allclose(out[100:200], sig[200:400:2], atol=5e-2)


def test_resample_noop():
    sig = np.ones(100, np.float32)
    assert _resample(sig, 16000, 16000) is sig
