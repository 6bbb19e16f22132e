"""P-slice (inter) decode: bit-exactness vs the libavcodec golden oracle.

Covers MC quarter-pel interpolation, MV prediction, skip runs, multi-ref
DPB with list modification, weighted prediction (incl. x264 weightp=2
duplicate-reference lists) and inter 8x8 transforms.
"""

import numpy as np
import pytest

from h264decode_tpu.golden import lavc
from tests.conftest import make_test_frames
from tests.test_intra_decode import assert_bit_exact


class TestPSlices:
    def test_ipp_64(self, test_frames_64):
        bs = lavc.encode_x264(test_frames_64[:4], qp=28, profile="baseline", bframes=0)
        assert_bit_exact(bs)

    def test_ipp_qcif_multiref(self, test_frames_qcif):
        bs = lavc.encode_x264(
            test_frames_qcif, qp=26, profile="baseline", bframes=0, extra_x264="ref=3"
        )
        assert_bit_exact(bs)

    def test_sub_partitions(self, test_frames_qcif):
        bs = lavc.encode_x264(
            test_frames_qcif,
            qp=30,
            profile="baseline",
            bframes=0,
            extra_x264="partitions=all",
        )
        assert_bit_exact(bs)

    def test_multiple_gops(self, test_frames_qcif):
        bs = lavc.encode_x264(
            test_frames_qcif, qp=26, profile="baseline", bframes=0, gop=3
        )
        assert_bit_exact(bs)

    def test_variable_qp(self, test_frames_qcif):
        bs = lavc.encode_x264(
            test_frames_qcif,
            qp=None,
            profile="baseline",
            bframes=0,
            extra_x264="crf=30:aq-mode=1",
        )
        assert_bit_exact(bs)

    def test_intra_refresh(self, test_frames_qcif):
        bs = lavc.encode_x264(
            test_frames_qcif,
            qp=26,
            profile="baseline",
            bframes=0,
            extra_x264="intra-refresh=1",
        )
        assert_bit_exact(bs)


class TestWeightedPrediction:
    def test_weightp_explicit(self, test_frames_qcif):
        bs = lavc.encode_x264(
            test_frames_qcif,
            qp=26,
            profile="main",
            bframes=0,
            cabac=False,
            extra_x264="weightp=1",
        )
        assert_bit_exact(bs)

    def test_weightp_duplicate_refs(self):
        # weightp=2 inserts the same reference twice via list modification
        # with different per-index weights; fading content forces real use
        frames = [
            tuple(
                np.clip(p.astype(int) + i * 12, 0, 255).astype(np.uint8)
                for p in f
            )
            for i, f in enumerate(make_test_frames(6, 144, 176))
        ]
        bs = lavc.encode_x264(
            frames, qp=26, profile="main", bframes=0, cabac=False,
            extra_x264="weightp=2",
        )
        assert_bit_exact(bs)


class TestInterHighProfile:
    def test_inter_8x8_transform(self, test_frames_qcif):
        bs = lavc.encode_x264(
            test_frames_qcif,
            qp=26,
            profile="high",
            bframes=0,
            cabac=False,
            extra_x264="8x8dct=1",
        )
        assert_bit_exact(bs)
