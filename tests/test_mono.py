"""Monochrome (chroma_format_idc 0) decode: bit-exact vs libavcodec.

ChromaArrayType 0 streams code luma only: no intra_chroma_pred_mode, the
ChromaArrayType-0/3 column of the mapped-Exp-Golomb cbp table (Table 9-4),
no chroma residual categories, luma-only deblocking. The reference parses
chroma_format_idc (/root/reference/h264/sps.go) but has no decode path.
x264 encodes true mono streams from gray input (profile High, CSP i400).
"""

import numpy as np
import pytest

from h264decode_tpu.golden import lavc
from h264decode_tpu.pipeline.decoder import decode_annexb


def make_gray_frames(n, h, w, seed=11):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    out = []
    for i in range(n):
        y = np.clip(
            128
            + 60 * np.sin(xx / 7.0 + i * 0.8) * np.cos(yy / 9.0)
            + rng.normal(0, 6, (h, w))
            + (xx + yy + 4 * i) % 32,
            0,
            255,
        ).astype(np.uint8)
        out.append((y,))
    return out


def assert_bit_exact_mono(bs: bytes):
    golden = lavc.decode_annexb(bs)
    ours = decode_annexb(bs)
    assert len(golden) == len(ours)
    for i, (g, o) in enumerate(zip(golden, ours)):
        assert np.array_equal(g.y, np.asarray(o.y)), f"frame {i} luma differs"
        # libavcodec surfaces mono as 4:2:0 with a constant mid-gray fill;
        # our decoder emits the same convention
        if g.cb.size:
            assert np.array_equal(g.cb, np.asarray(o.cb)), f"frame {i} cb"
            assert np.array_equal(g.cr, np.asarray(o.cr)), f"frame {i} cr"


@pytest.fixture(scope="module")
def gray_frames():
    return make_gray_frames(5, 64, 96)


class TestMonochrome:
    def test_sps_mono(self, gray_frames):
        from h264decode_tpu.bitstream.annexb import iter_nalus
        from h264decode_tpu.syntax.nal import parse_nal_unit
        from h264decode_tpu.syntax.sps import parse_sps

        bs = lavc.encode_x264(gray_frames, qp=27, profile="high", csp="gray")
        spses = [
            parse_sps(n.rbsp)
            for n in map(parse_nal_unit, iter_nalus(bs))
            if n.type == 7
        ]
        assert spses and all(s.chroma_format_idc == 0 for s in spses)
        assert all(s.chroma_array_type == 0 for s in spses)

    @pytest.mark.parametrize("cabac", [False, True])
    @pytest.mark.parametrize("qp", [20, 32])
    def test_intra_mono(self, gray_frames, cabac, qp):
        bs = lavc.encode_x264(
            gray_frames[:1], qp=qp, profile="high", csp="gray", cabac=cabac
        )
        assert_bit_exact_mono(bs)

    @pytest.mark.parametrize("cabac", [False, True])
    def test_ipb_mono(self, gray_frames, cabac):
        bs = lavc.encode_x264(
            gray_frames,
            qp=27,
            profile="high",
            csp="gray",
            gop=5,
            bframes=2,
            cabac=cabac,
        )
        assert_bit_exact_mono(bs)

    def test_mono_8x8_multislice(self, gray_frames):
        bs = lavc.encode_x264(
            gray_frames,
            qp=24,
            profile="high",
            csp="gray",
            cabac=True,
            extra_x264="8x8dct=1:slices=3",
        )
        assert_bit_exact_mono(bs)
