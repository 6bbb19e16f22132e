"""SP/SI switching-picture reconstruction (spec 8.6).

No conformance oracle exists in this environment: libavcodec decodes SP
slices as plain P (it does not implement the 8.6 transform-domain
requantization) and JM is unavailable, so — like the FMO tests — these
tests validate the decoder against an INDEPENDENT transcription of the
8.6.1/8.6.2 chains kept in this file (own tables, own transform code).
What the decoder exercises end-to-end: SP/SI slice-header fields
(sp_for_switch_flag, slice_qs_delta, 7.3.3), the Table 7-12 SI mb_type
mapping, P-machinery inside SP slices (MVP, skip, ref lists), and the
transform-domain reconstruction path.

The reference parses the SP/SI header fields and stops
(/root/reference/h264/slice.go:1021-1028).
"""

import numpy as np
import pytest

from h264decode_tpu.pipeline.decoder import Decoder
from tests.synth import (
    cabac_si_slice,
    pcm_frame_planes,
    pcm_slice,
    si_slice,
    sp_slice,
    write_pps,
    write_sps,
)

MB_W, MB_H = 4, 3
N_MBS = MB_W * MB_H

# --------------------------------------------------------------------------
# independent 8.6 transcription (test-local)
# --------------------------------------------------------------------------

MF = [[13107, 5243, 8066], [11916, 4660, 7490], [10082, 4194, 6554],
      [9362, 3647, 5825], [8192, 3355, 5243], [7282, 2893, 4559]]
V = [[10, 16, 13], [11, 18, 14], [13, 20, 16], [14, 23, 18], [16, 25, 20],
     [18, 29, 23]]
CLS = [[0, 2, 0, 2], [2, 1, 2, 1], [0, 2, 0, 2], [2, 1, 2, 1]]
QPC_TAB = [29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36, 36, 37, 37, 37, 38,
           38, 38, 39, 39, 39, 39]


def _chroma_qp(q):
    return q if q < 30 else QPC_TAB[min(q, 51) - 30]


def _fwd(x):
    C = np.array([[1, 1, 1, 1], [2, 1, -1, -2], [1, -1, -1, 1], [1, -2, 2, -1]],
                 np.int64)
    return C @ x.astype(np.int64) @ C.T


def _inv(d):
    d = d.astype(np.int64)
    e0, e1 = d[:, 0] + d[:, 2], d[:, 0] - d[:, 2]
    e2, e3 = (d[:, 1] >> 1) - d[:, 3], d[:, 1] + (d[:, 3] >> 1)
    f = np.stack([e0 + e3, e1 + e2, e1 - e2, e0 - e3], axis=1)
    g0, g1 = f[0] + f[2], f[0] - f[2]
    g2, g3 = (f[1] >> 1) - f[3], f[1] + (f[3] >> 1)
    h = np.stack([g0 + g3, g1 + g2, g1 - g2, g0 - g3], axis=0)
    return (h + 32) >> 6


def _q(t, qp):
    mf = np.array(MF[qp % 6], np.int64)[np.array(CLS)]
    b = 15 + qp // 6
    return np.sign(t) * ((np.abs(t) * mf + (1 << (b - 1))) >> b)


def _dq(L, qp):
    v = np.array(V[qp % 6], np.int64)[np.array(CLS)]
    return (L.astype(np.int64) * v) << (qp // 6)


def _rq(w, qs):
    rw = np.round(2.0**15 / np.array(V[qs % 6]))[np.array(CLS)].astype(np.int64)
    b = 15 + qs // 6
    return np.sign(w) * ((np.abs(w) * rw + (1 << (b - 1))) >> b)


def _sp_block(pred, qp, qs, switching, mx=255):
    """qp/qs are EFFECTIVE (incl. any 6*(bd-8) QpBdOffset)."""
    t = _fwd(pred)
    ls = _q(t, qs) if switching else _rq(_dq(_q(t, qp), qp), qs)
    return np.clip(_inv(_dq(ls, qs)), 0, mx)


def _sp_chroma8(pred, qpc, qsc, switching, mx=255):
    h2 = np.array([[1, 1], [1, -1]], np.int64)
    t = [_fwd(pred[(k // 2) * 4:(k // 2) * 4 + 4, (k % 2) * 4:(k % 2) * 4 + 4])
         for k in range(4)]
    dc = h2 @ np.array([[t[0][0, 0], t[1][0, 0]], [t[2][0, 0], t[3][0, 0]]]) @ h2

    def qdc(d, q):
        b = 15 + q // 6
        return np.sign(d) * ((np.abs(d) * MF[q % 6][0] + (1 << b)) >> (b + 1))

    def dqdc(L, q):
        return (L * V[q % 6][0]) << (q // 6 + 1)

    def rqdc(d, q):
        # round-half-up at the (b+1)-bit shift: addend is half the divisor
        rw = int(round(2.0**15 / V[q % 6][0]))
        b = 15 + q // 6
        return np.sign(d) * ((np.abs(d) * rw + (1 << b)) >> (b + 1))

    if switching:
        ldc = qdc(dc, qsc)
    else:
        ldc = rqdc(dqdc(qdc(dc, qpc), qpc), qsc)
    fin = h2 @ ldc @ h2
    dcs = ((fin * 16 * V[qsc % 6][0]) << (qsc // 6)) >> 5
    out = np.empty((8, 8), np.int64)
    for k in range(4):
        ls = _q(t[k], qsc) if switching else _rq(_dq(_q(t[k], qpc), qpc), qsc)
        w = _dq(ls, qsc)
        w[0, 0] = dcs[k // 2, k % 2]
        out[(k // 2) * 4:(k // 2) * 4 + 4, (k % 2) * 4:(k % 2) * 4 + 4] = _inv(w)
    return np.clip(out, 0, mx)


def _shift_pred(plane, px):
    """Prediction for a uniform full-pel MV of +px right/down (edge clamp)."""
    pad = np.pad(plane, ((0, px), (0, px)), mode="edge")
    return pad[px:px + plane.shape[0], px:px + plane.shape[1]]


def _expected_sp(ref_planes, qp, qs, switching, bd=8):
    y, cb, cr = ref_planes
    off = 6 * (bd - 8)
    mxv = (1 << bd) - 1
    py, pcb, pcr = _shift_pred(y, 2), _shift_pred(cb, 1), _shift_pred(cr, 1)
    qpc, qsc = _chroma_qp(qp) + off, _chroma_qp(qs) + off
    qp, qs = qp + off, qs + off
    ey = np.empty_like(y)
    for by in range(y.shape[0] // 4):
        for bx in range(y.shape[1] // 4):
            ey[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] = _sp_block(
                py[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4].astype(np.int64),
                qp, qs, switching, mxv)
    ecb = np.empty_like(cb)
    ecr = np.empty_like(cr)
    for my in range(cb.shape[0] // 8):
        for mx in range(cb.shape[1] // 8):
            s = (slice(my * 8, my * 8 + 8), slice(mx * 8, mx * 8 + 8))
            ecb[s] = _sp_chroma8(pcb[s].astype(np.int64), qpc, qsc, switching, mxv)
            ecr[s] = _sp_chroma8(pcr[s].astype(np.int64), qpc, qsc, switching, mxv)
    return ey, ecb, ecr


# --------------------------------------------------------------------------
# streams
# --------------------------------------------------------------------------


def _sp_stream(switching, qs_delta, bd=8):
    """IDR PCM reference + SP frame: every MB P_L0_16x16 with mv (8,8)
    (2 full px), the last two MBs skipped (skip MVP = (8,8) from coded
    neighbors); mvd (8,8) on the first MB, 0 elsewhere (8.4.1.3 MVP)."""
    planes = pcm_frame_planes(MB_W, MB_H, seed=11, bit_depth=bd)
    actions = [("p16", 8, 8)] + [("p16", 0, 0)] * (N_MBS - 3) + [
        ("skip",), ("skip",),
    ]
    data = (
        write_sps(MB_W, MB_H, bit_depth_luma=bd)
        + write_pps()
        + pcm_slice(planes, list(range(N_MBS)), MB_W, frame_num=0, idr=True,
                    bit_depth=bd)
        + sp_slice(N_MBS, actions, frame_num=1, poc_lsb=2,
                   sp_switch=switching, qs_delta=qs_delta)
    )
    return data, planes


@pytest.mark.parametrize(
    "switching,qs_delta",
    [(False, 0), (False, 4), (False, -6), (True, 0), (True, 4)],
    ids=["nonswitch-qs26", "nonswitch-qs30", "nonswitch-qs20",
         "switch-qs26", "switch-qs30"],
)
def test_sp_slice(switching, qs_delta):
    data, ref = _sp_stream(switching, qs_delta)
    frames = Decoder().decode_stream(data)
    assert len(frames) == 2
    exp = _expected_sp(ref, qp=26, qs=26 + qs_delta, switching=switching)
    for name, got, want in zip("y cb cr".split(), frames[1].planes(), exp):
        assert np.array_equal(np.asarray(got), want), f"plane {name}"
    # the SP chain must differ from plain-P copy (quantization is lossy)
    assert not np.array_equal(np.asarray(frames[1].y), _shift_pred(ref[0], 2))


def test_sp_slice_bs_intra_strength():
    """Spec 8.7.2.1: ALL macroblocks of SP/SI slices take intra-strength
    boundary strengths (4 at MB edges, 3 internal), even inter-coded ones."""
    from h264decode_tpu.pipeline.deblock import _boundary_strengths
    from h264decode_tpu.tensors.frame_tensors import MB_P, FrameTensors

    ft = FrameTensors(mb_w=2, mb_h=1)
    ft.mb_class[:] = MB_P  # inter MBs, identical motion, no coefficients
    ft.slice_id[:] = 0
    ft.ref_pic[:, 0, :] = 0
    ft.sp_slice_mb[:] = True
    assert (_boundary_strengths(ft, 1, 0, True, 0) == 4).all()
    assert (_boundary_strengths(ft, 1, 0, True, 1) == 3).all()
    # same geometry in a plain P slice: identical mv/ref, no coeffs -> bS 0
    ft.sp_slice_mb[:] = False
    assert (_boundary_strengths(ft, 1, 0, True, 0) == 0).all()
    assert (_boundary_strengths(ft, 1, 0, True, 1) == 0).all()


def test_sp_deblock_enabled_filters():
    """An all-skip SP picture with deblocking on: under plain-P strengths
    every bS would be 0 (same mv, same ref, no residual) and the output
    would equal the deblock-off decode; the SP rule (bS 4/3) must filter."""
    # smooth reference content: deblock thresholds (|p0-q0| < alpha,
    # side gradients < beta) must pass so the filter can act on the SP
    # requantization's block-edge steps
    yy, xx = np.mgrid[0 : MB_H * 16, 0 : MB_W * 16]
    y = (100 + (xx + yy) // 2 % 48).astype(np.uint8)
    cyy, cxx = np.mgrid[0 : MB_H * 8, 0 : MB_W * 8]
    cb = (110 + (cxx + cyy) % 24).astype(np.uint8)
    cr = (90 + (cxx * 2 + cyy) % 20).astype(np.uint8)
    planes = (y, cb, cr)
    actions = [("skip",)] * N_MBS

    def stream(deblock):
        return (
            write_sps(MB_W, MB_H)
            + write_pps()
            + pcm_slice(planes, list(range(N_MBS)), MB_W, frame_num=0, idr=True)
            + sp_slice(N_MBS, actions, frame_num=1, poc_lsb=2, deblock=deblock)
        )

    off = Decoder().decode_stream(stream(False))
    on = Decoder().decode_stream(stream(True))
    assert not np.array_equal(np.asarray(on[1].y), np.asarray(off[1].y))
    # the IDR reference frame itself is deblock-idc-1 in both streams
    assert np.array_equal(np.asarray(on[0].y), np.asarray(off[0].y))


def test_requant_roundtrip_identity():
    """requant∘dequant must be the identity on in-range levels (both the
    4x4 AC pair and the chroma-DC pair) — the drift-free property SP
    switching relies on (spec 8.6.1)."""
    from h264decode_tpu.pipeline import reference_recon as rr

    levels = np.arange(-128, 129, dtype=np.int64)
    for q in range(0, 52, 5):
        w = rr.sp_dequant_4x4(np.tile(levels[:, None], (1, 16)).reshape(-1, 4, 4), q)
        back = rr.sp_requant_4x4(w, q)
        assert np.array_equal(
            back, np.tile(levels[:, None], (1, 16)).reshape(-1, 4, 4)
        ), f"AC requant identity broken at qp {q}"
    # chroma DC helpers are nested inside sp_chroma_comp; check the identity
    # through the public function: zero prediction + pure DC levels at
    # qp == qs must reproduce the non-switching == switching equivalence
    for q in (20, 26, 31, 37):
        pred = np.zeros((8, 8), np.int64)
        dc_levels = np.array([3, -5, 7, -11], np.int64)
        ac = np.zeros((4, 4, 4), np.int64)
        ns = rr.sp_chroma_comp(pred, dc_levels, ac, q, q, switching=False)
        sw = rr.sp_chroma_comp(pred, dc_levels, ac, q, q, switching=True)
        assert np.array_equal(ns, sw), f"chroma-DC requant identity broken at qp {q}"


def _expected_si(qp, qs, bd=8):
    """Transcription: DC intra pred per 4x4 in decode order over the
    progressively reconstructed picture, then the 8.6.2 (switching) chain."""
    off = 6 * (bd - 8)
    mxv = (1 << bd) - 1
    mid = 1 << (bd - 1)
    qpe, qse = qp + off, qs + off
    qpc, qsc = _chroma_qp(qp) + off, _chroma_qp(qs) + off
    BLK_XY = [(0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (3, 0), (2, 1), (3, 1),
              (0, 2), (1, 2), (0, 3), (1, 3), (2, 2), (3, 2), (2, 3), (3, 3)]
    y = np.zeros((MB_H * 16, MB_W * 16), np.int64)
    done = np.zeros((MB_H * 4, MB_W * 4), bool)
    for my in range(MB_H):
        for mx in range(MB_W):
            for bx, by in BLK_XY:
                gx, gy = mx * 4 + bx, my * 4 + by
                x0, y0 = gx * 4, gy * 4
                have_l = gx > 0 and done[gy, gx - 1]
                have_t = gy > 0 and done[gy - 1, gx]
                refs = []
                if have_l:
                    refs.extend(y[y0:y0 + 4, x0 - 1])
                if have_t:
                    refs.extend(y[y0 - 1, x0:x0 + 4])
                dc = ((int(np.sum(refs)) + len(refs) // 2) // len(refs)
                      if refs else mid)
                pred = np.full((4, 4), dc, np.int64)
                y[y0:y0 + 4, x0:x0 + 4] = _sp_block(pred, qpe, qse, True, mxv)
                done[gy, gx] = True
    # chroma: DC mode over reconstructed neighbors
    cb = np.zeros((MB_H * 8, MB_W * 8), np.int64)
    cr = np.zeros((MB_H * 8, MB_W * 8), np.int64)
    for my in range(MB_H):
        for mx in range(MB_W):
            for plane in (cb, cr):
                x0, y0 = mx * 8, my * 8
                have_l, have_t = mx > 0, my > 0
                pred = np.empty((8, 8), np.int64)
                for qy in range(2):
                    for qx in range(2):
                        left = plane[y0 + qy * 4:y0 + qy * 4 + 4, x0 - 1] if have_l else None
                        top = plane[y0 - 1, x0 + qx * 4:x0 + qx * 4 + 4] if have_t else None
                        # 8.3.4 DC: corner quadrants prefer the parallel edge
                        if qx == qy == 0 or (qx == 1 and qy == 1):
                            vals = ([*left, *top] if (have_l and have_t)
                                    else list(left) if have_l
                                    else list(top) if have_t else None)
                        elif qx == 1:  # top-right: top edge first
                            vals = (list(top) if have_t
                                    else list(left) if have_l else None)
                        else:  # bottom-left: left edge first
                            vals = (list(left) if have_l
                                    else list(top) if have_t else None)
                        dc = ((int(np.sum(vals)) + len(vals) // 2) // len(vals)
                              if vals else mid)
                        pred[qy * 4:qy * 4 + 4, qx * 4:qx * 4 + 4] = dc
                plane[y0:y0 + 8, x0:x0 + 8] = _sp_chroma8(pred, qpc, qsc, True,
                                                          mxv)
    return y, cb, cr


def test_si_slice():
    """SI picture: every MB SI (Intra_4x4 DC prediction through 8.6.2)."""
    qs_delta = 2
    data = (
        write_sps(MB_W, MB_H)
        + write_pps()
        + si_slice(N_MBS, idr=True, qs_delta=qs_delta)
    )
    frames = Decoder().decode_stream(data)
    assert len(frames) == 1
    exp = _expected_si(26, 26 + qs_delta)
    for name, got, want in zip("y cb cr".split(), frames[0].planes(), exp):
        assert np.array_equal(np.asarray(got), want), f"plane {name}"


@pytest.mark.parametrize("switching,qs_delta",
                         [(False, 4), (True, 0)],
                         ids=["nonswitch", "switch"])
def test_sp_slice_10bit(switching, qs_delta):
    """SP at High 10: the 8.6 chain consumes QP'/QS' (+QpBdOffset=12),
    mirroring 8.5 — validated against the bd-generalized transcription
    (Extended profile is 8-bit, so no conformance oracle exists)."""
    data, ref = _sp_stream(switching, qs_delta, bd=10)
    frames = Decoder().decode_stream(data)
    assert len(frames) == 2
    exp = _expected_sp(ref, qp=26, qs=26 + qs_delta, switching=switching,
                       bd=10)
    for name, got, want in zip("y cb cr".split(), frames[1].planes(), exp):
        assert np.asarray(got).dtype == np.uint16
        assert np.array_equal(np.asarray(got), want), f"plane {name}"


def test_si_slice_10bit():
    """SI picture at High 10 (mid-gray DC seed = 512, clip at 1023)."""
    qs_delta = 2
    data = (
        write_sps(MB_W, MB_H, bit_depth_luma=10)
        + write_pps()
        + si_slice(N_MBS, idr=True, qs_delta=qs_delta)
    )
    frames = Decoder().decode_stream(data)
    assert len(frames) == 1
    exp = _expected_si(26, 26 + qs_delta, bd=10)
    for name, got, want in zip("y cb cr".split(), frames[0].planes(), exp):
        assert np.array_equal(np.asarray(got), want), f"plane {name}"


def test_si_slice_cabac():
    """CABAC-coded SI picture (Table 9-39 SI mb_type prefix): content-
    identical to the CAVLC SI stream, so the established CAVLC decode is
    the pixel oracle for the CABAC entropy path."""
    qs_delta = 2
    cavlc = (
        write_sps(MB_W, MB_H)
        + write_pps()
        + si_slice(N_MBS, idr=True, qs_delta=qs_delta)
    )
    cabac = (
        write_sps(MB_W, MB_H)
        + write_pps(cabac=True)
        + cabac_si_slice(MB_W, MB_H, idr=True, qs_delta=qs_delta)
    )
    ref = Decoder().decode_stream(cavlc)
    got = Decoder().decode_stream(cabac)
    assert len(ref) == len(got) == 1
    for rp, gp in zip(ref[0].planes(), got[0].planes()):
        assert np.array_equal(np.asarray(rp), np.asarray(gp))
