"""Engine wire codec: round trips, zero-copy numpy frames, and the
deserialization allowlist (reference analog: tests/v1/test_serial_utils.py)."""

import numpy as np
import pickle
import pytest

from vllm_tpu.engine import serial


def test_roundtrip_engine_request():
    from vllm_tpu.engine import EngineCoreRequest
    from vllm_tpu.sampling_params import SamplingParams

    req = EngineCoreRequest(
        request_id="r1", prompt_token_ids=[1, 2, 3],
        sampling_params=SamplingParams(temperature=0.5, max_tokens=4),
        mm_inputs={"pixel_values": np.ones((2, 3), np.float32)})
    frames = serial.encode(("add", req))
    verb, got = serial.decode(frames)
    assert verb == "add"
    assert got.prompt_token_ids == [1, 2, 3]
    assert got.sampling_params.temperature == 0.5
    np.testing.assert_array_equal(got.mm_inputs["pixel_values"],
                                  np.ones((2, 3), np.float32))


def test_numpy_rides_out_of_band():
    big = np.arange(1 << 16, dtype=np.int32)
    frames = serial.encode(("outputs", big))
    # the array body must NOT be inside the pickle header frame
    assert len(frames) >= 2
    assert len(frames[0]) < big.nbytes // 2
    _, got = serial.decode(frames)
    np.testing.assert_array_equal(got, big)


def test_rce_gadget_blocked():
    class Evil:
        def __reduce__(self):
            import os
            return (os.system, ("echo pwned",))

    frames = [pickle.dumps(Evil(), protocol=5)]
    with pytest.raises(pickle.UnpicklingError, match="blocked"):
        serial.decode(frames)


def test_eval_gadget_blocked():
    frames = [pickle.dumps(eval, protocol=5)]
    with pytest.raises(pickle.UnpicklingError, match="blocked"):
        serial.decode(frames)
