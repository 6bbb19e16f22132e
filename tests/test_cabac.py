"""CABAC decode: engine roundtrip against a spec encoder + bit-exactness
vs libavcodec on Main/High profile streams (BASELINE.json config 3 class).
"""

import random

import numpy as np
import pytest

from h264decode_tpu.bitstream.bitreader import BitReader
from h264decode_tpu.entropy.cabac import CabacEngine, init_context_states
from h264decode_tpu.entropy.cabac_tables import (
    RANGE_TAB_LPS,
    TRANS_IDX_LPS,
    TRANS_IDX_MPS,
)
from h264decode_tpu.golden import lavc
from tests.conftest import make_test_frames
from tests.test_intra_decode import assert_bit_exact


class SpecCabacEncoder:
    """spec 9.3.4 arithmetic encoder (test oracle for the engine)."""

    def __init__(self, qp, intra, idc):
        self.low = 0
        self.range = 510
        self.bits = []
        self.first = True
        self.outstanding = 0
        self.states, self.mps = init_context_states(qp, intra, idc)

    def _put(self, b):
        if self.first:
            self.first = False
        else:
            self.bits.append(b)
        while self.outstanding:
            self.bits.append(1 - b)
            self.outstanding -= 1

    def _renorm(self):
        while self.range < 256:
            if self.low >= 512:
                self._put(1)
                self.low -= 512
            elif self.low < 256:
                self._put(0)
            else:
                self.outstanding += 1
                self.low -= 256
            self.low <<= 1
            self.range <<= 1

    def decision(self, ctx, b):
        st = self.states[ctx]
        lps = RANGE_TAB_LPS[st][(self.range >> 6) & 3]
        self.range -= lps
        if b != self.mps[ctx]:
            self.low += self.range
            self.range = lps
            if st == 0:
                self.mps[ctx] ^= 1
            self.states[ctx] = TRANS_IDX_LPS[st]
        else:
            self.states[ctx] = TRANS_IDX_MPS[st]
        self._renorm()

    def bypass(self, b):
        self.low <<= 1
        if b:
            self.low += self.range
        if self.low >= 1024:
            self._put(1)
            self.low -= 1024
        elif self.low < 512:
            self._put(0)
        else:
            self.outstanding += 1
            self.low -= 512

    def terminate(self, b):
        self.range -= 2
        if b:
            self.low += self.range
            self.range = 2
            self._renorm()
            self._put((self.low >> 9) & 1)
            self.bits.append((self.low >> 8) & 1)
            self.bits.append(1)
        else:
            self._renorm()

    def tobytes(self):
        bits = self.bits[:]
        while len(bits) % 8:
            bits.append(0)
        return bytes(
            int("".join(map(str, bits[i : i + 8])), 2) for i in range(0, len(bits), 8)
        )


class TestEngine:
    def test_roundtrip_random(self):
        random.seed(7)
        for _ in range(25):
            qp = random.randint(0, 51)
            intra = random.random() < 0.5
            idc = random.randint(0, 2)
            ops = []
            for _ in range(random.randint(5, 300)):
                k = random.random()
                if k < 0.7:
                    ops.append(("d", random.randint(0, 1023), random.randint(0, 1)))
                elif k < 0.95:
                    ops.append(("b", None, random.randint(0, 1)))
                else:
                    ops.append(("t", None, 0))
            ops.append(("t", None, 1))
            enc = SpecCabacEncoder(qp, intra, idc)
            for op, ctx, b in ops:
                getattr(enc, {"d": "decision", "b": "bypass", "t": "terminate"}[op])(
                    *([ctx, b] if op == "d" else [b])
                )
            r = BitReader(enc.tobytes())
            dec = CabacEngine.__new__(CabacEngine)
            dec.r = r
            dec.range = 510
            dec.offset = r.u(9)
            dec.states, dec.mps = init_context_states(qp, intra, idc)
            for op, ctx, want in ops:
                if op == "d":
                    got = dec.decision(ctx)
                elif op == "b":
                    got = dec.bypass()
                else:
                    got = dec.terminate()
                    if got:
                        dec.flush()
                assert got == want


class TestCabacStreams:
    def test_i_frames(self, test_frames_qcif):
        bs = lavc.encode_x264(test_frames_qcif[:1], qp=26, profile="main", cabac=True)
        assert_bit_exact(bs)

    @pytest.mark.parametrize("qp", [14, 26, 40])
    def test_i_qp_sweep(self, qp, test_frames_qcif):
        bs = lavc.encode_x264(test_frames_qcif[:1], qp=qp, profile="main", cabac=True)
        assert_bit_exact(bs)

    def test_ip(self, test_frames_qcif):
        bs = lavc.encode_x264(
            test_frames_qcif, qp=26, profile="main", cabac=True, bframes=0
        )
        assert_bit_exact(bs)

    def test_ip_partitions_multiref(self, test_frames_qcif):
        bs = lavc.encode_x264(
            test_frames_qcif, qp=28, profile="main", cabac=True, bframes=0,
            extra_x264="ref=3:partitions=all",
        )
        assert_bit_exact(bs)

    def test_ipb(self, test_frames_qcif):
        bs = lavc.encode_x264(
            test_frames_qcif, qp=26, profile="main", cabac=True, bframes=2
        )
        assert_bit_exact(bs)

    def test_high_everything(self, test_frames_qcif):
        bs = lavc.encode_x264(
            test_frames_qcif, qp=26, profile="high", cabac=True, bframes=3,
            preset="slow", extra_x264="8x8dct=1:partitions=all:ref=4:b-pyramid=normal",
        )
        assert_bit_exact(bs)

    def test_multi_slice(self, test_frames_qcif):
        bs = lavc.encode_x264(
            test_frames_qcif[:2], qp=26, profile="main", cabac=True, bframes=0,
            extra_x264="slices=3",
        )
        assert_bit_exact(bs)

    def test_weightp(self, test_frames_qcif):
        bs = lavc.encode_x264(
            test_frames_qcif, qp=26, profile="main", cabac=True, bframes=0,
            extra_x264="weightp=2",
        )
        assert_bit_exact(bs)
