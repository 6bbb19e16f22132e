"""High 4:2:2 profile decode: bit-exactness vs the libavcodec golden oracle.

Covers ChromaArrayType 2 end to end: the nC == -2 CAVLC chroma DC VLCs and
the CABAC 8-coefficient chroma DC blocks (9.3.3.1.3 NumC8x8 = 2), the spec
8.5.4 4x2 DC inverse scan + 8.5.11 2x4 DC transform at qP.DC = QPc + 3,
8x16 intra chroma prediction (8.3.4 with yCF = 4), full-vertical-resolution
chroma MC (8.4.1.4.1: mvCLX[1] = 2 * mvLX[1]), and 4:2:2 chroma deblocking
(transform boundaries every 4 chroma rows). The reference repo parses
chroma_format_idc and nothing downstream (/root/reference/h264/sps.go).
"""

import numpy as np
import pytest

from h264decode_tpu.golden import lavc
from tests.test_intra_decode import assert_bit_exact


def make_frames_422(n, h, w, seed=3):
    """Synthetic YUV 4:2:2 frames (chroma half-width, full-height)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    cyy, cxx = np.mgrid[0:h, 0 : w // 2]
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
            110 + 40 * np.sin(cxx / 5.0 - i * 0.5) + 20 * np.cos(cyy / 11.0)
            + rng.normal(0, 4, (h, w // 2)),
            0,
            255,
        ).astype(np.uint8)
        cr = np.clip(
            140 + 40 * np.cos(cyy / 6.0 + i * 0.3) + 20 * np.sin(cxx / 8.0)
            + rng.normal(0, 4, (h, w // 2)),
            0,
            255,
        ).astype(np.uint8)
        frames.append((y, cb, cr))
    return frames


@pytest.fixture(scope="module")
def frames_422_64():
    return make_frames_422(5, 64, 64)


@pytest.fixture(scope="module")
def frames_422_qcif():
    return make_frames_422(5, 144, 176)


class TestIntra422:
    @pytest.mark.parametrize("qp", [16, 26, 40])
    def test_i_cavlc_nodeblock(self, qp, frames_422_64):
        bs = lavc.encode_x264(
            frames_422_64[:1], qp=qp, profile="high422", csp="yuv422p",
            cabac=False, extra_x264="no-deblock=1:no-8x8dct=1",
        )
        assert_bit_exact(bs, apply_deblock=False)

    def test_i_cavlc_deblock(self, frames_422_64):
        bs = lavc.encode_x264(
            frames_422_64[:1], qp=26, profile="high422", csp="yuv422p",
            cabac=False, extra_x264="no-8x8dct=1",
        )
        assert_bit_exact(bs)

    def test_i_cabac_8x8(self, frames_422_64):
        bs = lavc.encode_x264(
            frames_422_64[:1], qp=24, profile="high422", csp="yuv422p",
            cabac=True,
        )
        assert_bit_exact(bs)


class TestInter422:
    def test_ipp_cavlc(self, frames_422_64):
        bs = lavc.encode_x264(
            frames_422_64[:4], qp=28, profile="high422", csp="yuv422p",
            cabac=False, bframes=0, extra_x264="no-8x8dct=1",
        )
        assert_bit_exact(bs)

    def test_ipb_cabac_qcif(self, frames_422_qcif):
        bs = lavc.encode_x264(
            frames_422_qcif, qp=26, profile="high422", csp="yuv422p",
            cabac=True, bframes=2, extra_x264="ref=2",
        )
        assert_bit_exact(bs)

    def test_ipb_cavlc_partitions(self, frames_422_qcif):
        bs = lavc.encode_x264(
            frames_422_qcif, qp=30, profile="high422", csp="yuv422p",
            cabac=False, bframes=1, extra_x264="partitions=all:no-8x8dct=1",
        )
        assert_bit_exact(bs)

    def test_weighted_b_cabac(self, frames_422_qcif):
        bs = lavc.encode_x264(
            frames_422_qcif, qp=26, profile="high422", csp="yuv422p",
            cabac=True, bframes=2, extra_x264="weightp=2:weightb=1",
        )
        assert_bit_exact(bs)


# --------------------------------------------------------------------------
# Synthetic single-coefficient probes: these calibrated the spec 8.5.4
# 4:2:2 chroma DC inverse scan and the 8.5.11 qP.DC = QPc + 3 scaling
# against libavcodec (the spec's 2x4 DC section is easy to mis-transcribe;
# the reference repo's corrupted CABAC tables are the cautionary tale).

def _sps422(mb_w, mb_h):
    from tests.synth import BitWriter, nal

    w = BitWriter()
    w.u(8, 122)  # profile_idc High 4:2:2
    w.u(8, 0)
    w.u(8, 30)
    w.ue(0)
    w.ue(2)  # chroma_format_idc = 2
    w.ue(0)
    w.ue(0)
    w.flag(False)
    w.flag(False)
    w.ue(0)  # log2_max_frame_num = 4
    w.ue(0)  # poc type 0
    w.ue(2)  # log2_max_poc_lsb = 6
    w.ue(1)
    w.flag(False)
    w.ue(mb_w - 1)
    w.ue(mb_h - 1)
    w.flag(True)
    w.flag(True)
    w.flag(False)
    w.flag(False)
    w.trailing_bits()
    return nal(7, 3, w.rbsp())


def _dc_probe_stream(k: int, level: int, qp_delta: int = 0) -> bytes:
    """One-MB I_16x16 4:2:2 stream whose only residual is a single Cb
    chroma DC coefficient at scan position k."""
    from h264decode_tpu.entropy.cavlc_tables import (
        CHROMA422_DC_COEFF_TOKEN,
        CHROMA422_DC_TOTAL_ZEROS,
        COEFF_TOKEN,
    )
    from tests.synth import BitWriter, nal, write_pps, _slice_header

    def enc_dc(w, kk, lv):
        if kk is None:
            ln, bits = CHROMA422_DC_COEFF_TOKEN[0]
            w.u(ln, bits)
            return
        t1 = 1 if abs(lv) == 1 else 0
        ln, bits = CHROMA422_DC_COEFF_TOKEN[4 + t1]
        w.u(ln, bits)
        if t1:
            w.u(1, 1 if lv < 0 else 0)
        else:
            lc = (2 * lv - 2 if lv > 0 else -2 * lv - 1) - 2
            if lc < 14:
                w.u(lc + 1, 1)
            elif lc < 30:
                w.u(15, 1)
                w.u(4, lc - 14)
            else:
                w.u(16, 1)
                w.u(12, lc - 30)
        ln, bits = CHROMA422_DC_TOTAL_ZEROS[0][kk]
        w.u(ln, bits)

    w = BitWriter()
    _slice_header(w, first_mb=0, slice_type=7, frame_num=0, idr=True, ref_idc=3)
    w.ue(7)  # I_16x16: DC pred, cbp_chroma 1, cbp_luma 0
    w.ue(0)  # intra_chroma_pred_mode DC
    w.se(qp_delta)
    ln, bits = COEFF_TOKEN[0][0]  # Intra16x16DCLevel: TotalCoeff 0
    w.u(ln, bits)
    enc_dc(w, k, level)  # Cb DC
    enc_dc(w, None, 0)  # Cr DC
    w.trailing_bits()
    return _sps422(1, 1) + write_pps() + nal(5, 3, w.rbsp())


class TestDCProbes422:
    @pytest.mark.parametrize("k", range(8))
    def test_dc_scan_probe(self, k):
        bs = _dc_probe_stream(k, 8)
        assert_bit_exact(bs, apply_deblock=False)

    @pytest.mark.parametrize("qp,level", [(0, 9), (0, -9), (2, 9), (20, 5), (45, 8)])
    def test_dc_dequant_probe(self, qp, level):
        bs = _dc_probe_stream(0, level, qp_delta=qp - 26)
        assert_bit_exact(bs, apply_deblock=False)


class TestMbaff422:
    """Interlaced (MBAFF) 4:2:2: full-height chroma threads through the
    6.4.10 neighbor mapper (MbHeightC 16), the pair-strip interleaving, the
    per-component nC/cbf grids (4 chroma block rows per MB) and the MBAFF
    deblocker (chroma boundaries every 4 rows, full-height vertical bS)."""

    @pytest.mark.parametrize("cabac", [False, True])
    def test_intra_nodeblock(self, frames_422_64, cabac):
        bs = lavc.encode_x264(
            frames_422_64[:1], qp=27, profile="high422", csp="yuv422p",
            cabac=cabac, extra_x264="tff=1:no-deblock=1",
        )
        assert_bit_exact(bs, apply_deblock=False)

    def test_intra_deblock(self, frames_422_64):
        bs = lavc.encode_x264(
            frames_422_64[:1], qp=27, profile="high422", csp="yuv422p",
            cabac=False, extra_x264="tff=1",
        )
        assert_bit_exact(bs)

    @pytest.mark.parametrize("cabac", [False, True])
    def test_ipb(self, frames_422_64, cabac):
        bs = lavc.encode_x264(
            frames_422_64, qp=27, profile="high422", csp="yuv422p",
            cabac=cabac, gop=5, bframes=2, extra_x264="tff=1",
        )
        assert_bit_exact(bs)

    def test_ipb_qcif_weighted(self, frames_422_qcif):
        bs = lavc.encode_x264(
            frames_422_qcif, qp=30, profile="high422", csp="yuv422p",
            cabac=True, gop=5, bframes=2,
            extra_x264="tff=1:weightp=2:weightb=1",
        )
        assert_bit_exact(bs)
