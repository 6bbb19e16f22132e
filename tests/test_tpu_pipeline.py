"""End-to-end tests of the jitted device pipeline (TpuDecoder).

The full wavefront+MC+deblock XLA program takes minutes to compile on the
CPU backend (seconds on a real TPU), so these run only when opted in:

    H264_TPU_TESTS=1 python -m pytest tests/test_tpu_pipeline.py

On TPU hardware run without JAX_PLATFORMS=cpu for fast compiles.
"""

import os

import numpy as np
import pytest

from h264decode_tpu.golden import lavc
from tests.conftest import make_test_frames

pytestmark = pytest.mark.skipif(
    not os.environ.get("H264_TPU_TESTS"),
    reason="slow XLA compile; set H264_TPU_TESTS=1 to run",
)


def assert_tpu_bit_exact(bs: bytes):
    from h264decode_tpu.pipeline.tpu_pipeline import TpuDecoder

    golden = lavc.decode_annexb(bs)
    ours = TpuDecoder().decode_stream(bs)
    assert len(golden) == len(ours)
    for i, (g, o) in enumerate(zip(golden, ours)):
        for name, gp, op in zip("y cb cr".split(), g.planes(), o.planes()):
            assert np.array_equal(gp, op), f"frame {i} plane {name}"


class TestTpuPipeline:
    def test_intra_cavlc(self):
        bs = lavc.encode_x264(
            make_test_frames(1, 64, 64), qp=28, profile="baseline"
        )
        assert_tpu_bit_exact(bs)

    def test_cabac_high_everything(self):
        bs = lavc.encode_x264(
            make_test_frames(6, 144, 176), qp=26, profile="high", cabac=True,
            bframes=2, extra_x264="8x8dct=1:partitions=all:ref=3:weightp=2",
        )
        assert_tpu_bit_exact(bs)


def test_monochrome_device_pipeline():
    """Monochrome streams run the 4:2:0 device pipeline (no chroma coded;
    the chroma planes converge to the mid-gray convention)."""
    from tests.test_mono import make_gray_frames

    bs = lavc.encode_x264(
        make_gray_frames(5, 64, 96), qp=26, profile="high", cabac=True,
        bframes=1, preset="fast", gop=4, csp="gray",
    )
    assert_tpu_bit_exact(bs)


def test_high444_device_pipeline():
    """High 4:4:4 Predictive through the DEVICE pipeline: per-component
    luma-process residuals/MC/intra/deblock (chromaStyleFilteringFlag=0),
    full-size chroma half-pel ring stacks — bit-exact vs libavcodec."""
    rng = np.random.default_rng(3)
    H, W = 64, 96
    frames = [
        (rng.integers(0, 255, (H, W), np.uint8),
         rng.integers(0, 255, (H, W), np.uint8),
         rng.integers(0, 255, (H, W), np.uint8))
        for _ in range(5)
    ]
    bs = lavc.encode_x264(
        frames, qp=24, profile="high444", csp="yuv444p", cabac=True,
        bframes=2, preset="fast", gop=5,
        extra_x264="8x8dct=1:partitions=all:ref=3:weightp=2",
    )
    assert_tpu_bit_exact(bs)


def test_high422_device_pipeline():
    """High 4:2:2 through the DEVICE pipeline: full-height chroma with the
    2x4 DC transform (qP.DC = QPc + 3), 4:2:2 fractional chroma MC
    (yIntC = mv>>2, yFracC = (mv&3)<<1), 8x16 chroma intra (8.3.4 with
    yCF=4 plane mode) and the every-4-rows chroma deblock edges — bit-exact
    vs libavcodec (IPB, CABAC, weighted P, 8x8 transform)."""
    from tests.test_chroma422 import make_frames_422

    bs = lavc.encode_x264(
        make_frames_422(5, 64, 96), qp=25, profile="high422", csp="yuv422p",
        cabac=True, bframes=2, preset="fast", gop=4,
        extra_x264="8x8dct=1:partitions=all:ref=2:weightp=2",
    )
    assert_tpu_bit_exact(bs)


def test_high10_device_pipeline():
    """High 10 (10-bit) through the DEVICE pipeline: uint16 sample path —
    QP'Y = QP + 12 dequant, Clip1 at 1023, scaled deblock thresholds
    (8.7.2.2), scaled explicit weight offsets (8.4.2.3.2), pair-packed
    uint16 rings with per-component chroma — bit-exact vs libavcodec."""
    from tests.test_high10 import make_frames10

    bs = lavc.encode_x264(
        make_frames10(5, 64, 96), qp=26, profile="high10", csp="yuv420p10le",
        cabac=True, bframes=2, preset="fast", gop=4,
        extra_x264="8x8dct=1:weightp=2:ref=2",
    )
    assert_tpu_bit_exact(bs)
