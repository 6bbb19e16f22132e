"""Syntax-layer tests: parse NAL/SPS/PPS/slice headers of real x264 streams
and cross-check derived values against the libavcodec golden decoder."""

import numpy as np
import pytest

from h264decode_tpu.bitstream.annexb import split_nalus
from h264decode_tpu.golden import lavc
from h264decode_tpu.syntax import nal as nal_mod
from h264decode_tpu.syntax.nal import parse_nal_unit
from h264decode_tpu.syntax.pps import parse_pps
from h264decode_tpu.syntax.slice_header import parse_slice_header
from h264decode_tpu.syntax.sps import parse_sps


def parse_stream_headers(bitstream: bytes):
    """Walk a stream, parsing every SPS/PPS/slice header."""
    sps_map, pps_map, slices = {}, {}, []
    for raw in split_nalus(bitstream):
        nal = parse_nal_unit(raw)
        if nal.type == nal_mod.NAL_SPS:
            s = parse_sps(nal.rbsp)
            sps_map[s.seq_parameter_set_id] = s
        elif nal.type == nal_mod.NAL_PPS:
            p = parse_pps(nal.rbsp, sps_map)
            pps_map[p.pic_parameter_set_id] = p
        elif nal.is_vcl:
            h, sps, pps, _ = parse_slice_header(nal.rbsp, nal, sps_map, pps_map)
            slices.append((h, sps, pps))
    return sps_map, pps_map, slices


@pytest.fixture(scope="module", params=["baseline", "main", "high"])
def stream(request, test_frames_qcif=None):
    from tests.conftest import make_test_frames

    frames = make_test_frames(5, 144, 176)
    profile = request.param
    kwargs = dict(qp=28, profile=profile, preset="medium", gop=5)
    if profile == "baseline":
        kwargs["bframes"] = 0
    bs = lavc.encode_x264(frames, **kwargs)
    return profile, frames, bs


class TestRealStreams:
    def test_sps_dimensions(self, stream):
        profile, frames, bs = stream
        sps_map, pps_map, slices = parse_stream_headers(bs)
        assert len(sps_map) == 1
        sps = next(iter(sps_map.values()))
        assert sps.width == 176
        assert sps.height == 144
        assert sps.chroma_format_idc == 1
        assert sps.bit_depth_luma == 8
        expected_profile = {"baseline": 66, "main": 77, "high": 100}[profile]
        assert sps.profile_idc == expected_profile

    def test_pps_entropy_mode(self, stream):
        profile, frames, bs = stream
        _, pps_map, _ = parse_stream_headers(bs)
        pps = next(iter(pps_map.values()))
        # x264: baseline => CAVLC, main/high => CABAC
        assert pps.entropy_coding_mode_flag == (profile != "baseline")

    def test_slice_headers_parse(self, stream):
        profile, frames, bs = stream
        _, _, slices = parse_stream_headers(bs)
        assert len(slices) >= len(frames)
        first = slices[0][0]
        assert first.is_i
        assert first.idr_pic_flag
        assert first.first_mb_in_slice == 0
        # frame_num must be parsed (reference skips it, h264/slice.go:865)
        types = {h.type_name for h, _, _ in slices}
        assert "I" in types

    def test_slice_qp_in_range(self, stream):
        profile, frames, bs = stream
        _, _, slices = parse_stream_headers(bs)
        for h, sps, pps in slices:
            qp = h.slice_qp(pps)
            assert 0 <= qp <= 51

    def test_frame_count_matches_golden(self, stream):
        profile, frames, bs = stream
        golden = lavc.decode_annexb(bs)
        assert len(golden) == len(frames)
        _, _, slices = parse_stream_headers(bs)
        n_first_mb0 = sum(1 for h, _, _ in slices if h.first_mb_in_slice == 0)
        assert n_first_mb0 == len(frames)


class TestNalHeader:
    def test_parse_simple(self):
        nal = parse_nal_unit(b"\x67\x42\x00\x0a")
        assert nal.type == 7
        assert nal.ref_idc == 3
        assert nal.rbsp == b"\x42\x00\x0a"
        assert nal.name == "Sequence parameter set"

    def test_forbidden_bit(self):
        with pytest.raises(ValueError):
            parse_nal_unit(b"\x80\x00")

    def test_vcl_detection(self):
        assert parse_nal_unit(b"\x65\x00").is_vcl
        assert parse_nal_unit(b"\x65\x00").is_idr
        assert parse_nal_unit(b"\x41\x00").is_vcl
        assert not parse_nal_unit(b"\x67\x00").is_vcl

    def test_mvc_extension_header(self):
        # nal_unit_type 20, svc_extension_flag=0 -> MVC header (3 ext bytes)
        # header: 0|10|10100 = 0x54, then ext: flag0 + non_idr=1 priority=5
        # view_id=3 temporal=2 anchor=0 inter_view=1 reserved=1
        bits = "0" + "000101" + "0000000011" + "010" + "0" + "1" + "1"
        ext = int(bits, 2).to_bytes(3, "big")
        nal = parse_nal_unit(b"\x54" + ext + b"\xaa")
        assert nal.type == 20
        assert nal.mvc is not None
        assert nal.mvc.priority_id == 5
        assert nal.mvc.view_id == 3
        assert nal.mvc.temporal_id == 2
        assert nal.mvc.inter_view_flag
        assert nal.rbsp == b"\xaa"


class TestHighProfileSPS:
    def test_scaling_matrix_stream(self):
        """High profile with explicit scaling matrices (x264 intra preset)."""
        from tests.conftest import make_test_frames

        frames = make_test_frames(2, 64, 64)
        bs = lavc.encode_x264(
            frames, qp=30, profile="high", preset="slow",
            extra_x264="8x8dct=1",
        )
        sps_map, pps_map, slices = parse_stream_headers(bs)
        sps = next(iter(sps_map.values()))
        assert sps.profile_idc == 100
        pps = next(iter(pps_map.values()))
        assert pps.transform_8x8_mode_flag in (True, False)
        assert len(sps.scaling_lists_4x4) == 6
        assert all(len(sl) == 16 for sl in sps.scaling_lists_4x4)


class TestSequenceSwitch:
    def test_concatenated_streams_resolution_switch(self):
        """Two concatenated sequences with different geometry: parameter-set
        replacement + DPB/POC reset at the IDR of the second sequence."""
        from tests.conftest import make_test_frames
        from h264decode_tpu.pipeline.decoder import decode_annexb

        bs1 = lavc.encode_x264(
            make_test_frames(2, 64, 64), qp=28, profile="baseline", bframes=0
        )
        bs2 = lavc.encode_x264(
            make_test_frames(2, 144, 176, seed=5), qp=26, profile="baseline", bframes=0
        )
        data = bs1 + bs2
        golden = lavc.decode_annexb(data)
        ours = decode_annexb(data)
        assert len(golden) == len(ours) == 4
        for g, o in zip(golden, ours):
            assert g.y.shape == o.y.shape
            for gp, op in zip(g.planes(), o.planes()):
                assert np.array_equal(gp, np.asarray(op))


class TestHostileBitDepths:
    """Spec 7.4.2.1.1 bounds bit_depth_*_minus8 to 0..6; hostile values must
    be rejected at parse so native PCM reads never see an unbounded width
    (heap-overflow class found by the round-4 advisor)."""

    def test_out_of_range_luma_depth_rejected(self):
        from tests.synth import write_sps

        bs = write_sps(4, 4, chroma_format_idc=2, bit_depth_luma=22)
        rbsp = parse_nal_unit(split_nalus(bs)[0]).rbsp
        with pytest.raises(ValueError):
            parse_sps(rbsp)

    def test_out_of_range_chroma_depth_rejected(self):
        from tests.synth import write_sps

        bs = write_sps(4, 4, chroma_format_idc=2, bit_depth_luma=8,
                       bit_depth_chroma=76)
        rbsp = parse_nal_unit(split_nalus(bs)[0]).rbsp
        with pytest.raises(ValueError):
            parse_sps(rbsp)

    def test_unequal_depths_parse_but_skip_native(self):
        from tests.synth import write_sps

        from h264decode_tpu.entropy import native as native_mod

        bs = write_sps(4, 4, chroma_format_idc=2, bit_depth_luma=8,
                       bit_depth_chroma=10)
        sps = parse_sps(parse_nal_unit(split_nalus(bs)[0]).rbsp)
        assert sps.bit_depth_luma == 8 and sps.bit_depth_chroma == 10

        class _Hdr:
            mbaff_frame_flag = False
            is_si = False
            is_b = False
            direct_spatial_mv_pred_flag = True
            dp_readers = None

        class _Pps:
            num_slice_groups = 1
            entropy_coding_mode_flag = True

        assert not native_mod.supported(sps, _Pps(), _Hdr())
