"""Data partitioning (spec 7.3.2.8-7.3.2.10, 7.4.1 syntax categories).

Differential test: the same logical picture sequence is emitted twice —
once as ordinary slices (all categories interleaved in one NAL) and once
split into partitions A (category 2), B (category 3: intra residual + PCM)
and C (category 4: inter residual). Both must decode bit-exactly equal;
the ordinary-slice decode is itself golden-validated against libavcodec
elsewhere in the suite.

Covers: coded residuals read from partition B (I_16x16 DC+AC, I_NxN,
chroma DC/AC), I_PCM samples in partition B, inter residuals from
partition C, intra-in-P residuals from partition B, and the
missing-partition error path.

The reference parses none of this (no slice-data decode at all); NALU
types 2-4 appear only in its type table (/root/reference/h264/frame.go:28).
"""

import numpy as np
import pytest

from h264decode_tpu.entropy.cavlc import nc_from_neighbors
from h264decode_tpu.entropy.cavlc_tables import (
    CBP_ME_CHROMA12_INTER,
    CBP_ME_CHROMA12_INTRA,
)
from h264decode_tpu.pipeline.decoder import Decoder
from tests.synth import (
    BitWriter,
    _slice_header,
    encode_residual_cavlc,
    nal,
    pcm_frame_planes,
    write_pps,
    write_sps,
)

MB_W, MB_H = 4, 3
N_MBS = MB_W * MB_H

# decoder blk index -> (x, y) 4x4 cell within MB (spec 6.4.3)
LUMA_BLK_XY = (
    (0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (3, 0), (2, 1), (3, 1),
    (0, 2), (1, 2), (0, 3), (1, 3), (2, 2), (3, 2), (2, 3), (3, 3),
)
CHROMA_BLK_XY = ((0, 0), (1, 0), (0, 1), (1, 1))


class _Cats:
    """Routes syntax elements to one shared writer (ordinary slice) or to
    per-category writers (partitions A/B/C). Header and slice_id bits are
    written up-front so pcm_alignment_zero_bit positions are RBSP-relative
    in both encodings."""

    def __init__(self, split: bool, slice_id: int, hdr_kwargs: dict):
        self.split = split
        hw = BitWriter()
        _slice_header(hw, **hdr_kwargs)
        if split:
            self.w = {2: BitWriter(), 3: BitWriter(), 4: BitWriter()}
            self.w[2]._bits = list(hw._bits)
            self.w[2].ue(slice_id)  # 7.3.2.8: slice_id after the header
            self.w[3].ue(slice_id)  # 7.3.2.9
            self.w[4].ue(slice_id)  # 7.3.2.10
            self._empty = {c: len(self.w[c]._bits) for c in (3, 4)}
        else:
            shared = BitWriter()
            shared._bits = list(hw._bits)
            self.w = {2: shared, 3: shared, 4: shared}


class _NnzTracker:
    """Mirrors the decoder's TotalCoeff bookkeeping (9.2.1 nC derivation)."""

    def __init__(self):
        self.luma = np.full((MB_H * 4, MB_W * 4), -1, np.int32)  # -1 = undecoded
        self.chroma = np.full((2, MB_H * 2, MB_W * 2), -1, np.int32)

    def luma_nc(self, gx, gy):
        def at(x, y):
            if x < 0 or y < 0:
                return None
            v = self.luma[y, x]
            return None if v < 0 else int(v)

        return nc_from_neighbors(at(gx - 1, gy), at(gx, gy - 1))

    def chroma_nc(self, comp, gx, gy):
        def at(x, y):
            if x < 0 or y < 0:
                return None
            v = self.chroma[comp, y, x]
            return None if v < 0 else int(v)

        return nc_from_neighbors(at(gx - 1, gy), at(gx, gy - 1))


def _mk_coeffs(rng, start, nnz):
    """A 16-slot scan-order block with `nnz` nonzero coeffs at positions
    start..start+nnz-1, values in a CAVLC-friendly small range."""
    c = np.zeros(16, np.int64)
    for i in range(nnz):
        v = int(rng.integers(1, 5)) * (1 if rng.integers(2) else -1)
        c[start + i] = v
    return c


def _luma_residual(cw, trk, rng, mbx, mby, cbp_luma, cat, i16):
    w = cw.w[cat]
    start = 1 if i16 else 0
    for b8 in range(4):
        coded = cbp_luma & (1 << b8)
        for i4 in range(4):
            blk = b8 * 4 + i4
            bx, by = LUMA_BLK_XY[blk]
            gx, gy = mbx * 4 + bx, mby * 4 + by
            if not coded:
                trk.luma[gy, gx] = 0
                continue
            nnz = int(rng.integers(1, 4))
            coeffs = _mk_coeffs(rng, start, nnz)
            nc = trk.luma_nc(gx, gy)
            encode_residual_cavlc(w, coeffs, start, 15, 16, nc)
            trk.luma[gy, gx] = nnz


def _chroma_residual(cw, trk, rng, mbx, mby, cbp_chroma, cat):
    w = cw.w[cat]
    if cbp_chroma & 3:
        for _comp in range(2):
            c = np.zeros(16, np.int64)
            c[0] = int(rng.integers(1, 4))
            encode_residual_cavlc(w, c, 0, 3, 4, -1)
    for comp in range(2):
        for blk in range(4):
            bx, by = CHROMA_BLK_XY[blk]
            gx, gy = mbx * 2 + bx, mby * 2 + by
            if cbp_chroma & 2:
                nnz = int(rng.integers(1, 3))
                coeffs = _mk_coeffs(rng, 1, nnz)
                nc = trk.chroma_nc(comp, gx, gy)
                encode_residual_cavlc(w, coeffs, 1, 15, 16, nc)
                trk.chroma[comp, gy, gx] = nnz
            else:
                trk.chroma[comp, gy, gx] = 0


def _i16_mb(cw, trk, rng, mbx, mby, in_p):
    """I_16x16 (DC pred, cbp luma 15, chroma 2) with coded DC+AC blocks."""
    w2 = cw.w[2]
    k = 2 + 4 * 2 + 12  # mode DC, CodedBlockPatternChroma 2, luma 15
    w2.ue((5 if in_p else 0) + 1 + k)  # mb_type (Table 7-13 offset in P)
    w2.ue(0)  # intra_chroma_pred_mode: DC
    w2.se(0)  # mb_qp_delta
    # Intra16x16DCLevel (category 3), nC as luma blk 0
    nc = trk.luma_nc(mbx * 4, mby * 4)
    dc = _mk_coeffs(rng, 0, 3)
    encode_residual_cavlc(cw.w[3], dc, 0, 15, 16, nc)
    _luma_residual(cw, trk, rng, mbx, mby, 15, 3, i16=True)
    _chroma_residual(cw, trk, rng, mbx, mby, 2, 3)


def _inxn_mb(cw, trk, rng, mbx, mby):
    """I_NxN with partial cbp (luma 0b0011, chroma 1 = DC only)."""
    w2 = cw.w[2]
    w2.ue(0)  # mb_type I_NxN
    for _blk in range(16):
        w2.flag(True)  # prev_intra4x4_pred_mode_flag: use predicted
    w2.ue(0)  # intra_chroma_pred_mode: DC
    cbp = 3 | (1 << 4)
    w2.ue(CBP_ME_CHROMA12_INTRA.index(cbp))  # coded_block_pattern me(v)
    w2.se(1)  # mb_qp_delta
    _luma_residual(cw, trk, rng, mbx, mby, 3, 3, i16=False)
    _chroma_residual(cw, trk, rng, mbx, mby, 1, 3)


def _pcm_mb(cw, trk, planes, mbx, mby):
    """I_PCM: mb_type in category 2, samples in category 3 (partition B)."""
    y, cb, cr = planes
    cw.w[2].ue(25)
    w3 = cw.w[3]
    w3.align_zero()  # pcm_alignment_zero_bit (partition-B bit position)
    w3.bytes_raw(
        np.ascontiguousarray(
            y[mby * 16 : mby * 16 + 16, mbx * 16 : mbx * 16 + 16]
        ).tobytes()
    )
    w3.bytes_raw(
        np.ascontiguousarray(cb[mby * 8 : mby * 8 + 8, mbx * 8 : mbx * 8 + 8]).tobytes()
    )
    w3.bytes_raw(
        np.ascontiguousarray(cr[mby * 8 : mby * 8 + 8, mbx * 8 : mbx * 8 + 8]).tobytes()
    )
    trk.luma[mby * 4 : mby * 4 + 4, mbx * 4 : mbx * 4 + 4] = 16
    trk.chroma[:, mby * 2 : mby * 2 + 2, mbx * 2 : mbx * 2 + 2] = 16


def _p16_mb(cw, trk, rng, mbx, mby, skip_run=0):
    """P_L0_16x16 with coded residual (category 4 -> partition C)."""
    w2 = cw.w[2]
    w2.ue(skip_run)  # mb_skip_run
    w2.ue(0)  # mb_type P_L0_16x16
    w2.se(0)  # mvd_x
    w2.se(0)  # mvd_y
    cbp = 3 | (2 << 4)
    w2.ue(CBP_ME_CHROMA12_INTER.index(cbp))
    w2.se(-1)  # mb_qp_delta
    _luma_residual(cw, trk, rng, mbx, mby, 3, 4, i16=False)
    _chroma_residual(cw, trk, rng, mbx, mby, 2, 4)


def _emit_slice(cats, nal_ref_idc, ordinary_nal_type):
    """Finalize one slice's writers into NAL unit bytes."""
    if not cats.split:
        cats.w[2].trailing_bits()
        return nal(ordinary_nal_type, nal_ref_idc, cats.w[2].rbsp())
    cats.w[2].trailing_bits()
    out = nal(2, nal_ref_idc, cats.w[2].rbsp())
    for cat in (3, 4):
        if len(cats.w[cat]._bits) == cats._empty[cat]:
            continue  # legitimately absent partition
        cats.w[cat].trailing_bits()
        out += nal(cat, nal_ref_idc, cats.w[cat].rbsp())
    return out


def _build_stream(split: bool) -> bytes:
    """Non-IDR I picture (partitions A+B) + P picture (A+B+C)."""
    planes = pcm_frame_planes(MB_W, MB_H, seed=31)
    data = write_sps(MB_W, MB_H) + write_pps()

    # --- picture 1: I slice, every MB coded, one PCM MB
    rng = np.random.default_rng(7)
    cats = _Cats(
        split, 0,
        dict(first_mb=0, slice_type=7, frame_num=0, idr=False, ref_idc=3),
    )
    trk = _NnzTracker()
    for addr in range(N_MBS):
        mby, mbx = divmod(addr, MB_W)
        if addr == 5:
            _pcm_mb(cats, trk, planes, mbx, mby)
        elif addr % 3 == 1:
            _inxn_mb(cats, trk, rng, mbx, mby)
        else:
            _i16_mb(cats, trk, rng, mbx, mby, in_p=False)
    data += _emit_slice(cats, 3, 1)

    # --- picture 2: P slice with skips, coded P MBs, and one intra MB
    rng = np.random.default_rng(11)
    cats = _Cats(
        split, 1,
        dict(first_mb=0, slice_type=5, frame_num=1, idr=False, ref_idc=0,
             poc_lsb=2),
    )
    trk = _NnzTracker()
    skip_run = 0
    for addr in range(N_MBS):
        mby, mbx = divmod(addr, MB_W)
        if addr % 4 == 3:
            skip_run += 1
            trk.luma[mby * 4 : mby * 4 + 4, mbx * 4 : mbx * 4 + 4] = 0
            trk.chroma[:, mby * 2 : mby * 2 + 2, mbx * 2 : mbx * 2 + 2] = 0
            continue
        if addr == 6:
            cats.w[2].ue(skip_run)  # mb_skip_run before the coded MB
            _i16_mb(cats, trk, rng, mbx, mby, in_p=True)
        else:
            _p16_mb(cats, trk, rng, mbx, mby, skip_run)
        skip_run = 0
    if skip_run:
        cats.w[2].ue(skip_run)
    data += _emit_slice(cats, 0, 1)
    return data


class TestDataPartitioning:
    def test_dp_equals_ordinary(self):
        """Partitioned and ordinary encodings of the same syntax decode
        bit-exactly equal (I residuals from B, P residuals from C, PCM
        from B, intra-in-P from B)."""
        plain = Decoder().decode_stream(_build_stream(split=False))
        dp = Decoder().decode_stream(_build_stream(split=True))
        assert len(plain) == len(dp) == 2
        for i, (a, b) in enumerate(zip(plain, dp)):
            for name, pa, pb in zip("y cb cr".split(), a.planes(), b.planes()):
                assert np.array_equal(pa, pb), f"frame {i} plane {name}"

    def test_dp_missing_partition_raises(self):
        """Dropping partition B while MBs carry intra residuals must raise
        (strict policy), not silently mis-decode from partition A."""
        data = _build_stream(split=True)
        # strip every partition-B NAL (type 3)
        from h264decode_tpu.bitstream.annexb import iter_nalus

        kept = [raw for raw in iter_nalus(data) if (raw[0] & 0x1F) != 3]
        broken = b"".join(b"\x00\x00\x00\x01" + raw for raw in kept)
        with pytest.raises(ValueError, match="partition B/C missing"):
            Decoder().decode_stream(broken)

    def test_dp_missing_partition_skip_policy(self):
        """error_policy='skip' degrades per-picture instead of raising."""
        data = _build_stream(split=True)
        from h264decode_tpu.bitstream.annexb import iter_nalus

        kept = [raw for raw in iter_nalus(data) if (raw[0] & 0x1F) != 3]
        broken = b"".join(b"\x00\x00\x00\x01" + raw for raw in kept)
        d = Decoder(error_policy="skip")
        d.decode_stream(broken)
        assert d.error_count >= 1
