"""High 10 profile (10-bit 4:2:0) decode: bit-exact vs libavcodec.

10-bit decoding widens the whole pixel contract: QP ranges gain
QpBdOffset 12 (spec 7-37 wrap, QP' = QP + 12 feeding every dequant),
Clip1 ceilings become 1023, intra DC defaults 512, PCM samples are
10-bit codewords, deblocking thresholds scale by 1 << (BitDepth - 8)
(8.7.2.2), and explicit weighted-prediction offsets scale likewise
(8.4.2.3.2). The reference only parses bit_depth_*_minus8
(/root/reference/h264/sps.go:241-247) and decodes nothing.
"""

import numpy as np
import pytest

from h264decode_tpu.golden import lavc
from h264decode_tpu.pipeline.decoder import Decoder


def make_frames10(n, h, w, seed=9):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    out = []
    base = np.clip(
        512 + 300 * np.sin(xx / 9.0) * np.cos(yy / 11.0)
        + rng.normal(0, 30, (h, w)),
        0, 1023,
    ).astype(np.uint16)
    for i in range(n):
        y = np.roll(base, 3 * i, axis=1)
        cb = np.clip(400 + 200 * np.sin(xx[: h // 2, : w // 2] / 13.0 + i), 0, 1023).astype(np.uint16)
        cr = np.full((h // 2, w // 2), 512, np.uint16)
        out.append((y, cb, cr))
    return out


def assert_bit_exact(bs: bytes):
    golden = lavc.decode_annexb(bs)
    ours = Decoder().decode_stream(bs)
    assert len(golden) == len(ours)
    for i, (g, o) in enumerate(zip(golden, ours)):
        for name, gp, op in zip("y cb cr".split(), g.planes(), o.planes()):
            op = np.asarray(op)
            assert op.dtype == np.uint16
            assert np.array_equal(gp, op), f"frame {i} plane {name}"


@pytest.fixture(scope="module")
def frames10():
    return make_frames10(5, 64, 96)


class TestHigh10Intra:
    @pytest.mark.parametrize("qp", [0, 12, 26, 40, 51])
    def test_i_cavlc(self, qp, frames10):
        bs = lavc.encode_x264(
            frames10[:1], qp=qp, profile="high10", csp="yuv420p10le",
            cabac=False, preset="fast",
        )
        assert_bit_exact(bs)

    @pytest.mark.parametrize("qp", [8, 26, 44])
    def test_i_cabac(self, qp, frames10):
        bs = lavc.encode_x264(
            frames10[:1], qp=qp, profile="high10", csp="yuv420p10le",
            cabac=True, preset="fast",
        )
        assert_bit_exact(bs)

    def test_i_8x8dct(self, frames10):
        bs = lavc.encode_x264(
            frames10[:1], qp=22, profile="high10", csp="yuv420p10le",
            cabac=True, preset="fast", extra_x264="8x8dct=1",
        )
        assert_bit_exact(bs)


class TestHigh10Inter:
    @pytest.mark.parametrize("cabac", [False, True], ids=["cavlc", "cabac"])
    def test_ipb(self, cabac, frames10):
        bs = lavc.encode_x264(
            frames10, qp=24, profile="high10", csp="yuv420p10le",
            cabac=cabac, bframes=2, preset="fast", gop=5,
        )
        assert_bit_exact(bs)

    def test_everything(self, frames10):
        bs = lavc.encode_x264(
            frames10, qp=23, profile="high10", csp="yuv420p10le",
            cabac=True, bframes=2, preset="medium", gop=5,
            extra_x264="8x8dct=1:partitions=all:ref=3:weightp=2:weightb=1",
        )
        assert_bit_exact(bs)

    def test_multislice_deblock(self, frames10):
        bs = lavc.encode_x264(
            frames10[:3], qp=20, profile="high10", csp="yuv420p10le",
            cabac=True, bframes=0, preset="fast", gop=3,
            extra_x264="slices=3",
        )
        assert_bit_exact(bs)
