"""High 4:4:4 Predictive decode: bit-exactness vs the libavcodec oracle.

ChromaArrayType 3 codes Cb/Cr with the LUMA processes (spec 7.3.5.3.1
residual_luma per component, 8.3 luma intra prediction modes on chroma,
8.4.2.2.2 luma quarter-pel interpolation for chroma MC, 8.7 luma-style
chroma deblocking with chromaStyleFilteringFlag = 0) gated by the LUMA cbp
bits via the ChromaArrayType-0/3 column of Table 9-4.  CABAC adds
ctxBlockCat 6-13 with the Table 9-40 offsets (verified against the system
libavcodec rodata) and coded_block_flag on 8x8 blocks, whose neighbor
trans block exists only when the neighbor MB is itself 8x8-coded
(9.3.3.1.1.9).  The reference parses chroma_format_idc and nothing
downstream (/root/reference/h264/sps.go).
"""

import numpy as np
import pytest

from h264decode_tpu.golden import lavc
from h264decode_tpu.pipeline.decoder import decode_annexb
from tests.test_intra_decode import assert_bit_exact


def make_frames_444(n, h, w, seed=3):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for i in range(n):
        y = np.clip(
            128
            + 60 * np.sin(xx / 7.0 + i * 0.8) * np.cos(yy / 9.0)
            + rng.normal(0, 6, (h, w))
            + (xx + yy + 4 * i) % 32,
            0,
            255,
        ).astype(np.uint8)
        cb = np.clip(
            110 + 40 * np.sin(xx / 5.0 - i * 0.5) + 20 * np.cos(yy / 11.0)
            + rng.normal(0, 4, (h, w)),
            0,
            255,
        ).astype(np.uint8)
        cr = np.clip(
            140 + 40 * np.cos(yy / 6.0 + i * 0.3) + 20 * np.sin(xx / 8.0)
            + rng.normal(0, 4, (h, w)),
            0,
            255,
        ).astype(np.uint8)
        frames.append((y, cb, cr))
    return frames


def enc(frames, **kw):
    kw.setdefault("profile", "high444")
    kw.setdefault("csp", "yuv444p")
    return lavc.encode_x264(frames, **kw)


@pytest.fixture(scope="module")
def frames_444():
    return make_frames_444(5, 64, 96)


class TestIntra444:
    def test_sps(self, frames_444):
        from h264decode_tpu.bitstream.annexb import iter_nalus
        from h264decode_tpu.syntax.nal import parse_nal_unit
        from h264decode_tpu.syntax.sps import parse_sps

        bs = enc(frames_444[:1], qp=26)
        sps = [
            parse_sps(n.rbsp)
            for n in map(parse_nal_unit, iter_nalus(bs))
            if n.type == 7
        ][0]
        assert sps.chroma_format_idc == 3
        assert sps.chroma_array_type == 3
        assert not sps.separate_colour_plane_flag

    @pytest.mark.parametrize("qp", [12, 26, 40])
    def test_cavlc_qp_sweep(self, frames_444, qp):
        # 4x4-only first: nC tracking on the per-component grids
        assert_bit_exact(
            enc(frames_444[:1], qp=qp, cabac=False,
                extra_x264="8x8dct=0:no-deblock=1"),
            apply_deblock=False,
        )

    def test_cavlc_8x8_deblock(self, frames_444):
        assert_bit_exact(enc(frames_444[:1], qp=26, cabac=False))

    @pytest.mark.parametrize("qp", [12, 26, 45])
    def test_cabac_qp_sweep(self, frames_444, qp):
        assert_bit_exact(enc(frames_444[:1], qp=qp, cabac=True))

    def test_cabac_i16_only(self, frames_444):
        assert_bit_exact(
            enc(frames_444[:1], qp=26, cabac=True,
                extra_x264="8x8dct=0:analyse=none")
        )


class TestInter444:
    @pytest.mark.parametrize("cabac", [False, True])
    def test_ipb(self, frames_444, cabac):
        assert_bit_exact(
            enc(frames_444, qp=27, cabac=cabac, gop=5, bframes=2)
        )

    def test_weighted_bipred(self, frames_444):
        assert_bit_exact(
            enc(frames_444, qp=35, cabac=True, gop=5, bframes=3,
                extra_x264="weightp=2:weightb=1:b-pyramid=normal")
        )

    def test_multislice_multiref(self, frames_444):
        assert_bit_exact(
            enc(frames_444, qp=24, cabac=False, gop=5, bframes=2,
                extra_x264="slices=3:ref=3")
        )

    def test_cqm_scaling_matrices(self, frames_444):
        # 12-list scaling matrix parse (6 8x8 lists when chroma_format_idc 3)
        assert_bit_exact(
            enc(frames_444, qp=30, cabac=True, gop=5, extra_x264="cqm=jvt")
        )


class TestLossless444:
    def test_transform_bypass(self, frames_444):
        # qp 0 + high444 -> qpprime_y_zero_transform_bypass (spec 8.5.15)
        bs = enc(frames_444[:2], qp=0, cabac=True)
        golden = lavc.decode_annexb(bs)
        for g, f in zip(golden, frames_444):
            assert np.array_equal(g.y, f[0])  # sanity: truly lossless
        assert_bit_exact(bs)


class TestMbaff444:
    """Interlaced (MBAFF) 4:4:4: per-component luma-geometry neighbor
    mapping (6.4.10 with chroma planes at luma dimensions), component-
    interleaved MBAFF intra, 8x8 cbf neighbors through the pair mapper, and
    a per-plane luma-style MBAFF deblock pass driven by QPc."""

    @pytest.mark.parametrize("cabac", [False, True])
    def test_intra_nodeblock(self, frames_444, cabac):
        assert_bit_exact(
            enc(frames_444[:1], qp=27, cabac=cabac,
                extra_x264="tff=1:no-deblock=1"),
            apply_deblock=False,
        )

    def test_intra_deblock(self, frames_444):
        assert_bit_exact(enc(frames_444[:1], qp=27, cabac=False,
                             extra_x264="tff=1"))

    @pytest.mark.parametrize("cabac", [False, True])
    def test_ipb(self, frames_444, cabac):
        assert_bit_exact(
            enc(frames_444, qp=27, cabac=cabac, gop=5, bframes=2,
                extra_x264="tff=1")
        )
