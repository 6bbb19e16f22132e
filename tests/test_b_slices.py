"""B-slice decode: bit-exactness vs the libavcodec golden oracle.

Covers spatial/temporal direct modes, B_Skip, bi-prediction with default /
implicit / explicit weighting, b-pyramid (B pictures as references), and
POC-based output reordering.
"""

import numpy as np

from h264decode_tpu.golden import lavc
from tests.conftest import make_test_frames
from tests.test_intra_decode import assert_bit_exact


class TestBSlices:
    def test_b1(self, test_frames_qcif):
        bs = lavc.encode_x264(
            test_frames_qcif, qp=26, profile="main", cabac=False, bframes=1
        )
        assert_bit_exact(bs)

    def test_b3(self, test_frames_qcif):
        bs = lavc.encode_x264(
            test_frames_qcif, qp=26, profile="main", cabac=False, bframes=3
        )
        assert_bit_exact(bs)

    def test_b_pyramid(self, test_frames_qcif):
        bs = lavc.encode_x264(
            test_frames_qcif, qp=26, profile="main", cabac=False, bframes=3,
            extra_x264="b-pyramid=normal",
        )
        assert_bit_exact(bs)

    def test_temporal_direct(self, test_frames_qcif):
        bs = lavc.encode_x264(
            test_frames_qcif, qp=26, profile="main", cabac=False, bframes=2,
            extra_x264="direct=temporal",
        )
        assert_bit_exact(bs)

    def test_no_implicit_weight(self, test_frames_qcif):
        bs = lavc.encode_x264(
            test_frames_qcif, qp=26, profile="main", cabac=False, bframes=2,
            extra_x264="weightb=0",
        )
        assert_bit_exact(bs)

    def test_all_partitions_multiref(self, test_frames_qcif):
        bs = lavc.encode_x264(
            test_frames_qcif, qp=30, profile="main", cabac=False, bframes=2,
            extra_x264="partitions=all:ref=3",
        )
        assert_bit_exact(bs)

    def test_high_8x8(self, test_frames_qcif):
        bs = lavc.encode_x264(
            test_frames_qcif, qp=26, profile="high", cabac=False, bframes=2,
            extra_x264="8x8dct=1",
        )
        assert_bit_exact(bs)

    def test_panning_motion(self):
        base = make_test_frames(1, 144, 176, seed=4)[0]
        frames = [
            (np.roll(np.roll(base[0], i * 3, axis=1), i, axis=0), base[1], base[2])
            for i in range(8)
        ]
        bs = lavc.encode_x264(
            frames, qp=26, profile="main", cabac=False, bframes=2, preset="slow"
        )
        assert_bit_exact(bs)
