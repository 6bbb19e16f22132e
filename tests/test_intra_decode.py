"""End-to-end I-frame decode: bit-exactness vs the libavcodec golden oracle.

This is BASELINE.json milestone config 2 (CAVLC I-frame decode, bit-exact)
plus High-profile 8x8 and deblocking coverage.
"""

import numpy as np
import pytest

from h264decode_tpu.golden import lavc
from h264decode_tpu.pipeline.decoder import decode_annexb
from tests.conftest import make_test_frames


def assert_bit_exact(bs: bytes, apply_deblock: bool = True):
    golden = lavc.decode_annexb(bs)
    ours = decode_annexb(bs, apply_deblock=apply_deblock)
    assert len(golden) == len(ours)
    for i, (g, o) in enumerate(zip(golden, ours)):
        for name, gp, op in zip("y cb cr".split(), g.planes(), o.planes()):
            assert np.array_equal(gp, op), (
                f"frame {i} plane {name}: "
                f"{np.count_nonzero(gp.astype(int) - op.astype(int))} differing samples"
            )


class TestIntraCAVLC:
    @pytest.mark.parametrize("qp", [12, 20, 28, 40, 48])
    def test_64x64_qp_sweep_nodeblock(self, qp, test_frames_64):
        bs = lavc.encode_x264(
            test_frames_64[:1], qp=qp, profile="baseline", extra_x264="no-deblock=1"
        )
        assert_bit_exact(bs, apply_deblock=False)

    def test_qcif_nodeblock(self, test_frames_qcif):
        bs = lavc.encode_x264(
            test_frames_qcif[:1], qp=26, profile="baseline", extra_x264="no-deblock=1"
        )
        assert_bit_exact(bs, apply_deblock=False)

    def test_qcif_deblock(self, test_frames_qcif):
        bs = lavc.encode_x264(test_frames_qcif[:1], qp=26, profile="baseline")
        assert_bit_exact(bs)

    def test_deblock_offsets(self, test_frames_qcif):
        bs = lavc.encode_x264(
            test_frames_qcif[:1], qp=32, profile="baseline", extra_x264="deblock=2,-1"
        )
        assert_bit_exact(bs)

    @pytest.mark.parametrize("qp", [18, 30, 44])
    def test_qcif_deblock_qp_sweep(self, qp, test_frames_qcif):
        bs = lavc.encode_x264(test_frames_qcif[:1], qp=qp, profile="baseline")
        assert_bit_exact(bs)

    def test_multi_slice(self, test_frames_qcif):
        bs = lavc.encode_x264(
            test_frames_qcif[:1], qp=26, profile="baseline", extra_x264="slices=2"
        )
        assert_bit_exact(bs)

    def test_non_mb_aligned_crop(self):
        # 100x60: exercises frame cropping (width/height not MB multiples)
        frames = make_test_frames(1, 60, 100)
        bs = lavc.encode_x264(frames, qp=26, profile="baseline")
        assert_bit_exact(bs)


class TestIntraHighProfile:
    def test_8x8_transform(self, test_frames_qcif):
        bs = lavc.encode_x264(
            test_frames_qcif[:1],
            qp=26,
            profile="high",
            preset="slow",
            cabac=False,
            extra_x264="no-deblock=1:8x8dct=1",
        )
        assert_bit_exact(bs, apply_deblock=False)

    def test_8x8_transform_deblock(self, test_frames_qcif):
        bs = lavc.encode_x264(
            test_frames_qcif[:1],
            qp=30,
            profile="high",
            preset="slow",
            cabac=False,
            extra_x264="8x8dct=1",
        )
        assert_bit_exact(bs)

    def test_scaling_matrices(self, test_frames_qcif):
        # CQM: non-flat scaling lists exercise LevelScale with weightScale
        bs = lavc.encode_x264(
            test_frames_qcif[:1],
            qp=26,
            profile="high",
            cabac=False,
            extra_x264="cqm=jvt",
        )
        assert_bit_exact(bs)


class TestLossless:
    """High 4:4:4 Predictive transform bypass (spec 8.5.15): x264 qp=0
    silently switches to lossless coding with H/V DPCM intra residuals."""

    def test_lossless_i_cavlc(self, test_frames_64):
        bs = lavc.encode_x264(test_frames_64[:1], qp=0, profile="main", cabac=False)
        assert_bit_exact(bs)

    def test_lossless_i_cabac(self, test_frames_64):
        bs = lavc.encode_x264(test_frames_64[:1], qp=0, profile="main", cabac=True)
        assert_bit_exact(bs)

    def test_lossless_ip(self, test_frames_64):
        bs = lavc.encode_x264(
            test_frames_64[:3], qp=0, profile="main", cabac=True, bframes=0
        )
        assert_bit_exact(bs)
