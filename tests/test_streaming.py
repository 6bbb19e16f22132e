"""Streaming output (spec C.4.5.3 DPB bumping), chunked ingest, and
seek/resume via access points (IDR + recovery-point SEI).

The reference buffers its entire input forever and emits nothing
(/root/reference/h264/bit_reader.go:27-39); these tests pin the opposite
contract: frames leave the decoder incrementally in output order with a
bounded reorder buffer, from input that is never held whole in memory.
"""

import numpy as np
import pytest

from h264decode_tpu.bitstream.annexb import iter_nalus, iter_nalus_chunks
from h264decode_tpu.golden import lavc
from h264decode_tpu.pipeline.decoder import Decoder
from h264decode_tpu.pipeline.seek import decode_from, scan_access_points
from tests.conftest import make_test_frames


@pytest.fixture(scope="module")
def bstream():
    """B-pyramid stream: real output reordering, 3 IDR groups."""
    return lavc.encode_x264(
        make_test_frames(24, 96, 112, seed=3),
        qp=26,
        profile="main",
        cabac=True,
        bframes=3,
        gop=8,
        extra_x264="b-pyramid=normal:keyint=8:min-keyint=8:scenecut=0",
    )


def _chunked(data: bytes, size: int):
    for i in range(0, len(data), size):
        yield data[i : i + size]


class TestChunkedDemux:
    @pytest.mark.parametrize("size", [1, 3, 7, 64, 4096])
    def test_matches_whole_buffer_scan(self, bstream, size):
        whole = list(iter_nalus(bstream))
        chunked = list(iter_nalus_chunks(_chunked(bstream, size)))
        assert len(whole) == len(chunked)
        for a, b in zip(whole, chunked):
            assert a == b

    def test_leading_garbage_and_4byte_codes(self):
        nals = [b"\x65\x11\x22", b"\x41\x33"]
        data = b"\xde\xad" + b"\x00\x00\x00\x01" + nals[0] + b"\x00\x00\x01" + nals[1]
        assert list(iter_nalus_chunks(_chunked(data, 2))) == nals


class TestBumpingOutput:
    def test_output_order_matches_golden(self, bstream):
        golden = lavc.decode_annexb(bstream)
        mine = list(Decoder().decode_iter(bstream))
        assert len(mine) == len(golden)
        for g, o in zip(golden, mine):
            for gp, op in zip(g.planes(), o.planes()):
                assert np.array_equal(gp, np.asarray(op))

    def test_reorder_buffer_is_bounded(self, bstream):
        dec = Decoder()
        frames = list(dec.decode_iter(bstream))
        assert frames
        bound = frames[0]._sps.max_num_reorder
        # the buffer never exceeds the stream's signalled reorder depth + 1
        # (the +1 is the frame being pushed before the bump loop drains)
        assert dec.max_pending <= bound + 1

    def test_frames_emitted_before_eof(self, bstream):
        """Incrementality: with 3 IDR groups, the first group's frames must
        be yielded before the last input chunk is consumed."""
        consumed = [0]

        def chunks():
            for c in _chunked(bstream, 512):
                consumed[0] += len(c)
                yield c

        dec = Decoder()
        it = dec.decode_iter(chunks())
        first = next(it)
        assert first.y is not None
        assert consumed[0] < len(bstream), "no frame emitted until EOF"
        rest = list(it)
        golden = lavc.decode_annexb(bstream)
        assert len(golden) == 1 + len(rest)

    def test_chunked_equals_bytes(self, bstream):
        a = list(Decoder().decode_iter(bstream))
        b = list(Decoder().decode_iter(_chunked(bstream, 777)))
        assert len(a) == len(b)
        for fa, fb in zip(a, b):
            assert np.array_equal(np.asarray(fa.y), np.asarray(fb.y))


class TestSeek:
    def test_scan_finds_idr_points(self, bstream):
        pts = scan_access_points(bstream)
        idrs = [p for p in pts if p.kind == "idr"]
        assert len(idrs) == 3  # keyint=8 over 24 frames
        assert idrs[0].picture_index == 0
        assert all(p.sps_nals and p.pps_nals for p in idrs)

    def test_decode_from_second_idr_bit_exact(self, bstream):
        full = lavc.decode_annexb(bstream)
        pts = [p for p in scan_access_points(bstream) if p.kind == "idr"]
        tail = list(decode_from(bstream, pts[1]))
        assert len(tail) == len(full) - 8
        for g, o in zip(full[8:], tail):
            for gp, op in zip(g.planes(), o.planes()):
                assert np.array_equal(gp, np.asarray(op))

    def test_recovery_point_stream(self):
        """x264 periodic-intra-refresh emits recovery-point SEI: the scanner
        must surface them and the decoder must attach them to frames."""
        stream = lavc.encode_x264(
            make_test_frames(12, 96, 112, seed=5),
            qp=26,
            profile="main",
            cabac=True,
            bframes=0,
            gop=250,
            extra_x264="intra-refresh=1:keyint=10:scenecut=0",
        )
        pts = scan_access_points(stream)
        recov = [p for p in pts if p.kind == "recovery"]
        assert recov, "intra-refresh stream carries no recovery points"
        frames = list(Decoder().decode_iter(stream))
        assert any(f.recovery_point is not None for f in frames)
        # resuming at a recovery point decodes without error and converges
        # to the full decode after recovery_frame_cnt frames
        p = recov[-1]
        tail = list(decode_from(stream, p))
        full = lavc.decode_annexb(stream)
        assert len(tail) == len(full) - p.picture_index
        k = p.recovery_frame_cnt
        for g, o in zip(full[p.picture_index + k :], tail[k:]):
            assert np.array_equal(g.planes()[0], np.asarray(o.y))
