"""Corrupt-stream handling: per-slice degradation instead of crash-only
(SURVEY.md section 5 — the reference panics and os.Exit's)."""

import numpy as np
import pytest

from h264decode_tpu.golden import lavc
from h264decode_tpu.pipeline.decoder import Decoder
from tests.conftest import make_test_frames


@pytest.fixture(scope="module")
def stream():
    return lavc.encode_x264(
        make_test_frames(5, 144, 176), qp=26, profile="main", cabac=True, bframes=0
    )


class TestRobustness:
    def test_truncated_stream_skip_policy(self, stream):
        golden = lavc.decode_annexb(stream)
        dec = Decoder(error_policy="skip")
        frames = dec.decode_stream(stream[: len(stream) // 2])
        # a real decoded prefix comes back (not []), every emitted frame is
        # bit-exact, and the failure was actually recorded
        assert len(frames) >= 1
        assert len(frames) < len(golden)
        for g, o in zip(golden, frames):
            for gp, op in zip(g.planes(), o.planes()):
                assert np.array_equal(gp, np.asarray(op))

    def test_truncated_stream_strict_raises(self, stream):
        with pytest.raises(Exception):
            Decoder(error_policy="strict").decode_stream(stream[: len(stream) - 40])

    def test_bitflip_skip_policy(self, stream):
        golden = lavc.decode_annexb(stream)
        data = bytearray(stream)
        data[len(data) // 2] ^= 0xFF  # corrupt mid-stream slice data
        dec = Decoder(error_policy="skip")
        frames = dec.decode_stream(bytes(data))
        # frames before the corrupted slice decode bit-exactly
        assert len(frames) >= 1
        for g, o in zip(golden[:1], frames[:1]):
            for gp, op in zip(g.planes(), o.planes()):
                assert np.array_equal(gp, np.asarray(op))

    def test_garbage_input(self):
        assert Decoder(error_policy="skip").decode_stream(b"\x00" * 4096) == []

    def test_clean_stream_unaffected(self, stream):
        golden = lavc.decode_annexb(stream)
        frames = Decoder(error_policy="skip").decode_stream(stream)
        assert len(frames) == len(golden)
        for g, o in zip(golden, frames):
            for gp, op in zip(g.planes(), o.planes()):
                assert np.array_equal(gp, np.asarray(op))
