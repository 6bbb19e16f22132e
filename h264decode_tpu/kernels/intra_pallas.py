"""Intra prediction as a Pallas TPU kernel (spec 8.3), raster order.

Replaces the XLA anti-diagonal wavefront (kernels/intra.py) on TPU: that
design pays ~250 sequential HBM gather/scatter steps (~750 ms/frame for an
all-intra 1080p frame); here the planes stay VMEM-resident and macroblocks
run in raster order — exactly the spec serialization, so bit-exactness vs
the validated XLA/numpy paths is by construction. Each MB dispatches
through lax.switch on its kind, so P/B frames (mostly inter MBs) fall
through in a few cycles per MB.

Mosaic has no value-level gather/reshape, so the nine 4x4/8x8 prediction
modes (8.3.1.2/8.3.2.2) are re-derived as STATIC slices of small filtered
edge vectors — e.g. diagonal-down-right row y is F[3-y : 7-y] of the 7-tap
cross-edge filter F, vertical-right rows alternate slices of the half-pel
(g) and full-pel (o) filtered top vectors, horizontal-down/up rows are
windows of an interleaved [even, odd] scalar vector. Corner/left samples
ride as 32-bit scalar extracts; per-MB metadata ships as an
(n_blocks, 8, 128) int32 pack (kind, modes, availability).

Same canvas/layout rules as kernels/deblock_pallas.py: top pad 16 rows,
left pad 128 lanes (+128 right for top-right neighbour reads), one
128-lane block of MBs (8 luma / 16 chroma) per loop iteration, left-column
carry threaded between MBs.

Capability note: the reference repo never built intra prediction at all
(SURVEY.md section 2 — zero pixel decoding); this is new-capability code,
built spec-first.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..tensors.frame_tensors import LUMA_BLK_XY

# z-order index of each (bx, by); and is-top-right-decoded-before LUT
_ZIDX = {}
for _k, (_bx, _by) in enumerate(LUMA_BLK_XY):
    _ZIDX[(_bx, _by)] = _k
_TR_DECODED = np.zeros(16, bool)
for _k, (_bx, _by) in enumerate(LUMA_BLK_XY):
    if _bx < 3 and _by > 0:
        _TR_DECODED[_k] = _ZIDX[(_bx + 1, _by - 1)] < _k

K_NONE, K_I4, K_I8, K_I16 = 0, 1, 2, 3


def _f(v):
    """Scalar -> (1,1) int32 cell."""
    return jnp.full((1, 1), v, jnp.int32)


def _interpret() -> bool:
    """Pallas interpreter mode (H264_PALLAS_INTERPRET=1): runs the exact
    kernel logic on the CPU backend so the golden suite can exercise it
    without TPU hardware (SURVEY.md section 5, sanitizer row)."""
    import os

    return os.environ.get("H264_PALLAS_INTERPRET") == "1"


def _norm(x):
    """Zero-shift roll: forces a canonical (offset-0) vector layout so the
    result can participate in lane-dimension concatenates (Mosaic requires
    matching sublane offsets on non-concat dims)."""
    if _interpret():
        return x  # layout hint only; meaningless off-TPU
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.roll(pltpu.roll(x, 0, axis=1), 0, axis=0)



def _fc(v, n):
    """Scalar -> (n,1) int32 column."""
    return jnp.full((n, 1), v, jnp.int32)


def _row(v, n):
    """Scalar -> (1,n) int32 row."""
    return jnp.full((1, n), v, jnp.int32)


def _cat(parts):
    # normalize every operand: Mosaic concat requires matching offsets on
    # the non-concat dimension, and slices carry their source offsets
    return jnp.concatenate([_norm(p) for p in parts], axis=1)


def _catr(parts):
    return jnp.concatenate([_norm(p) for p in parts], axis=0)


def _sel_mode(preds, mode):
    out = preds[0]
    for k in range(1, len(preds)):
        out = jnp.where(mode == k, preds[k], out)
    return out


# ---------------------------------------------------------------------------
# 4x4 modes (spec 8.3.1.2): t8v (1,8) substituted top+topright, ls = 4 left
# scalars, m scalar, have_* traced bools. Returns the 9 preds, (4,4) each.
# ---------------------------------------------------------------------------


def _i4_modes(t8v, ls, m, have_l, have_t):
    l0, l1, l2, l3 = ls
    t = [t8v[0, k] for k in range(4)]
    lcol = _catr([_f(l0), _f(l1), _f(l2), _f(l3)])
    p_v = jnp.broadcast_to(t8v[:, 0:4], (4, 4))
    p_h = jnp.broadcast_to(lcol, (4, 4))
    sum_t = t[0] + t[1] + t[2] + t[3]
    sum_l = l0 + l1 + l2 + l3
    dc = jnp.where(
        have_l & have_t,
        (sum_t + sum_l + 4) >> 3,
        jnp.where(have_t, (sum_t + 2) >> 2, jnp.where(have_l, (sum_l + 2) >> 2, 128)),
    )
    p_dc = jnp.full((4, 4), dc, jnp.int32)
    # DDL: row y = (t9[y:y+4] + 2 t9[y+1:y+5] + t9[y+2:y+6] + 2) >> 2
    t9 = _cat([t8v, t8v[:, 7:8]])
    p_ddl = _catr(
        [(t9[:, y : y + 4] + 2 * t9[:, y + 1 : y + 5] + t9[:, y + 2 : y + 6] + 2) >> 2
         for y in range(4)]
    )
    # DDR: F holds f(d) for d = x - y in -3..3
    G = _cat([_f(l3), _f(l2), _f(l1), _f(l0), _f(m), t8v[:, 0:4]])  # (1,9)
    F = (G[:, 0:7] + 2 * G[:, 1:8] + G[:, 2:9] + 2) >> 2
    p_ddr = _catr([F[:, 3 - y : 7 - y] for y in range(4)])
    # VR: even rows slice g, odd rows slice o, with left-column scalars
    Tv = _cat([_f(m), t8v[:, 0:4]])  # (1,5)
    g = (Tv[:, 0:4] + Tv[:, 1:5] + 1) >> 1  # g(0..3)
    o = (Tv[:, 0:3] + 2 * Tv[:, 1:4] + Tv[:, 2:5] + 2) >> 2  # o(1..3)
    vrm1 = (l0 + 2 * m + t[0] + 2) >> 2
    low2 = (l1 + 2 * l0 + m + 2) >> 2
    low3 = (l2 + 2 * l1 + l0 + 2) >> 2
    ve = _cat([_f(low2), g])  # (1,5): rows 0/2 = ve[1:5]/ve[0:4]
    vo = _cat([_f(low3), _f(vrm1), o])  # (1,5): rows 1/3 = vo[1:5]/vo[0:4]
    p_vr = _catr([ve[:, 1:5], vo[:, 1:5], ve[:, 0:4], vo[:, 0:4]])
    # HD: row y = W[(3-y)*2 : (3-y)*2+4] of the interleaved vector
    he = [(m + l0 + 1) >> 1, (l0 + l1 + 1) >> 1, (l1 + l2 + 1) >> 1, (l2 + l3 + 1) >> 1]
    ol = [
        None,
        (m + 2 * l0 + l1 + 2) >> 2,
        (l0 + 2 * l1 + l2 + 2) >> 2,
        (l1 + 2 * l2 + l3 + 2) >> 2,
    ]
    hdm1 = (t[0] + 2 * m + l0 + 2) >> 2
    W = _cat(
        [_f(he[3]), _f(ol[3]), _f(he[2]), _f(ol[2]), _f(he[1]), _f(ol[1]),
         _f(he[0]), _f(hdm1), o[:, 0:2]]
    )  # (1,10)
    p_hd = _catr([W[:, 6 - 2 * y : 10 - 2 * y] for y in range(4)])
    # VL: alternating slices of half/full-pel filtered top
    vle = (t8v[:, 0:5] + t8v[:, 1:6] + 1) >> 1  # (1,5)
    vlo = (t8v[:, 0:5] + 2 * t8v[:, 1:6] + t8v[:, 2:7] + 2) >> 2
    p_vl = _catr([vle[:, 0:4], vlo[:, 0:4], vle[:, 1:5], vlo[:, 1:5]])
    # HU: row y = W_hu[2y : 2y+4]
    hue = [(l0 + l1 + 1) >> 1, (l1 + l2 + 1) >> 1, (l2 + l3 + 1) >> 1]
    huo = [(l0 + 2 * l1 + l2 + 2) >> 2, (l1 + 2 * l2 + l3 + 2) >> 2]
    hu5 = (l2 + 3 * l3 + 2) >> 2
    Wh = _cat(
        [_f(hue[0]), _f(huo[0]), _f(hue[1]), _f(huo[1]), _f(hue[2]), _f(hu5),
         _row(l3, 4)]
    )  # (1,10)
    p_hu = _catr([Wh[:, 2 * y : 2 * y + 4] for y in range(4)])
    return [p_v, p_h, p_dc, p_ddl, p_ddr, p_vr, p_hd, p_vl, p_hu]


# ---------------------------------------------------------------------------
# 8x8 modes (spec 8.3.2): t16v (1,16) raw substituted, lv (1,8) raw left,
# m scalar. Includes the 8.3.2.2.1 reference filtering. Returns 9 (8,8).
# ---------------------------------------------------------------------------


def _i8_modes(t16v, lv, m, have_l, have_t, have_c):
    tl = jnp.where(have_c, m, 0)
    t_m1 = _cat([_f(tl), t16v[:, 0:15]])
    t_p1 = _cat([t16v[:, 1:16], t16v[:, 15:16]])
    ftm = (t_m1 + 2 * t16v + t_p1 + 2) >> 2
    ft0 = jnp.where(have_c, ftm[0, 0], (3 * t16v[0, 0] + t16v[0, 1] + 2) >> 2)
    ft15 = (t16v[0, 14] + 3 * t16v[0, 15] + 2) >> 2
    ft = _cat([_f(ft0), ftm[:, 1:15], _f(ft15)])  # (1,16)
    l_m1 = _cat([_f(tl), lv[:, 0:7]])
    l_p1 = _cat([lv[:, 1:8], lv[:, 7:8]])
    flm = (l_m1 + 2 * lv + l_p1 + 2) >> 2
    fl0 = jnp.where(have_c, flm[0, 0], (3 * lv[0, 0] + lv[0, 1] + 2) >> 2)
    fl7 = (lv[0, 6] + 3 * lv[0, 7] + 2) >> 2
    fl = _cat([_f(fl0), flm[:, 1:7], _f(fl7)])  # (1,8)
    fm = jnp.where(
        have_l & have_t,
        (t16v[0, 0] + 2 * m + lv[0, 0] + 2) >> 2,
        jnp.where(
            have_t,
            (3 * m + t16v[0, 0] + 2) >> 2,
            jnp.where(have_l, (3 * m + lv[0, 0] + 2) >> 2, m),
        ),
    )
    tsc = [ft[0, k] for k in range(16)]
    lsc = [fl[0, k] for k in range(8)]
    lcol = _catr([_f(lsc[k]) for k in range(8)])
    p_v = jnp.broadcast_to(ft[:, 0:8], (8, 8))
    p_h = jnp.broadcast_to(lcol, (8, 8))
    sum_t = tsc[0] + tsc[1] + tsc[2] + tsc[3] + tsc[4] + tsc[5] + tsc[6] + tsc[7]
    sum_l = lsc[0] + lsc[1] + lsc[2] + lsc[3] + lsc[4] + lsc[5] + lsc[6] + lsc[7]
    dc = jnp.where(
        have_l & have_t,
        (sum_t + sum_l + 8) >> 4,
        jnp.where(have_t, (sum_t + 4) >> 3, jnp.where(have_l, (sum_l + 4) >> 3, 128)),
    )
    p_dc = jnp.full((8, 8), dc, jnp.int32)
    t17 = _cat([ft, ft[:, 15:16]])
    p_ddl = _catr(
        [(t17[:, y : y + 8] + 2 * t17[:, y + 1 : y + 9] + t17[:, y + 2 : y + 10] + 2)
         >> 2 for y in range(8)]
    )
    G = _cat([_f(lsc[7 - k]) for k in range(8)] + [_f(fm), ft[:, 0:8]])  # (1,17)
    F = (G[:, 0:15] + 2 * G[:, 1:16] + G[:, 2:17] + 2) >> 2  # f(-7..7)
    p_ddr = _catr([F[:, 7 - y : 15 - y] for y in range(8)])
    Tv = _cat([_f(fm), ft[:, 0:8]])  # (1,9)
    g8 = (Tv[:, 0:8] + Tv[:, 1:9] + 1) >> 1  # g(0..7)
    o8 = (Tv[:, 0:7] + 2 * Tv[:, 1:8] + Tv[:, 2:9] + 2) >> 2  # o(1..7)
    Lsc = [fm] + lsc  # L[0..8]

    def lowv(d):
        i1, i2, i3 = d, d - 1, max(d - 2, 0)
        return (Lsc[i1] + 2 * Lsc[i2] + Lsc[i3] + 2) >> 2

    vrm1 = (Lsc[1] + 2 * Tv[0, 0] + Tv[0, 1] + 2) >> 2  # (l0 + 2 fm? no:
    # spec: vrm1 = (L[1] + 2*T[0] + T[1] + 2) >> 2 with T[0]=fm, T[1]=ft0
    vrm1 = (Lsc[1] + 2 * fm + tsc[0] + 2) >> 2
    ve = _cat([_f(lowv(6)), _f(lowv(4)), _f(lowv(2)), g8])  # (1,11)
    vo = _cat([_f(lowv(7)), _f(lowv(5)), _f(lowv(3)), _f(vrm1), o8])  # (1,11)
    rows = []
    for y in range(8):
        j = y >> 1
        if y % 2 == 0:
            rows.append(ve[:, 3 - j : 11 - j])
        else:
            rows.append(vo[:, 3 - j : 11 - j])
    p_vr = _catr(rows)
    # HD: W = [he7, ol7, ..., he0, hdm1, oT(1..6)]; row y = W[(7-y)*2 : +8]
    L8v = _cat([_f(fm), fl])  # (1,9)
    he8 = (L8v[:, 0:8] + L8v[:, 1:9] + 1) >> 1
    ol8 = (L8v[:, 0:7] + 2 * L8v[:, 1:8] + L8v[:, 2:9] + 2) >> 2  # ol(1..7)
    hdm1 = (tsc[0] + 2 * fm + Lsc[1] + 2) >> 2
    Wparts = []
    for k in range(7, 0, -1):
        Wparts.append(he8[:, k : k + 1])
        Wparts.append(ol8[:, k - 1 : k])
    Wparts.append(he8[:, 0:1])
    Wparts.append(_f(hdm1))
    Wparts.append(o8[:, 0:6])  # oT(1..6)
    W = _cat(Wparts)  # (1,22)
    p_hd = _catr([W[:, (7 - y) * 2 : (7 - y) * 2 + 8] for y in range(8)])
    # VL
    vle = (ft[:, 0:11] + ft[:, 1:12] + 1) >> 1
    vlo = (ft[:, 0:11] + 2 * ft[:, 1:12] + ft[:, 2:13] + 2) >> 2
    p_vl = _catr(
        [(vle if y % 2 == 0 else vlo)[:, (y >> 1) : (y >> 1) + 8] for y in range(8)]
    )
    # HU: W = [hue0, huo0, ..., hue5, huo5, hue6, hu13, l7 x 8]
    hue = (fl[:, 0:7] + fl[:, 1:8] + 1) >> 1  # hue(0..6)
    huo = (fl[:, 0:6] + 2 * fl[:, 1:7] + fl[:, 2:8] + 2) >> 2  # huo(0..5)
    hu13 = (lsc[6] + 3 * lsc[7] + 2) >> 2
    Wh = []
    for k in range(6):
        Wh.append(hue[:, k : k + 1])
        Wh.append(huo[:, k : k + 1])
    Wh.append(hue[:, 6:7])
    Wh.append(_f(hu13))
    Wh.append(_row(lsc[7], 8))
    Whv = _cat(Wh)  # (1,22)
    p_hu = _catr([Whv[:, 2 * y : 2 * y + 8] for y in range(8)])
    return [p_v, p_h, p_dc, p_ddl, p_ddr, p_vr, p_hd, p_vl, p_hu]


# ---------------------------------------------------------------------------
# 16x16 (8.3.3) and chroma (8.3.4)
# ---------------------------------------------------------------------------

def _w_asc(shape, dim):
    """[1, 2, ..., n] along dim (built in-kernel: no captured constants)."""
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim) + 1


def _w_desc(shape, dim, n):
    """[n, n-1, ..., 1] along dim."""
    return n - jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _i16_pred(t16v, lcol, m, mode, have_l, have_t):
    """t16v (1,16), lcol (16,1), m scalar, mode scalar. Returns (16,16)."""
    p_v = jnp.broadcast_to(t16v, (16, 16))
    p_h = jnp.broadcast_to(lcol, (16, 16))
    sum_t = jnp.sum(t16v)
    sum_l = jnp.sum(lcol)
    dc = jnp.where(
        have_l & have_t,
        (sum_t + sum_l + 16) >> 5,
        jnp.where(have_t, (sum_t + 8) >> 4, jnp.where(have_l, (sum_l + 8) >> 4, 128)),
    )
    p_dc = jnp.full((16, 16), dc, jnp.int32)
    T = _cat([_f(m), t16v])  # (1,17)
    L = _catr([_f(m), lcol])  # (17,1)
    hsum = jnp.sum(_w_asc((1, 8), 1) * T[:, 9:17]) - jnp.sum(
        _w_desc((1, 8), 1, 8) * T[:, 0:8]
    )
    vsum = jnp.sum(_w_asc((8, 1), 0) * L[9:17, :]) - jnp.sum(
        _w_desc((8, 1), 0, 8) * L[0:8, :]
    )
    a = 16 * (lcol[15, 0] + t16v[0, 15])
    b = (5 * hsum + 32) >> 6
    c = (5 * vsum + 32) >> 6
    xx = jax.lax.broadcasted_iota(jnp.int32, (16, 16), 1)
    yy = jax.lax.broadcasted_iota(jnp.int32, (16, 16), 0)
    plane = jnp.clip((a + b * (xx - 7) + c * (yy - 7) + 16) >> 5, 0, 255)
    return _sel_mode([p_v, p_h, p_dc, plane], mode)


def _chroma_pred(t8v, lcol, m, mode, have_l, have_t):
    """t8v (1,8), lcol (8,1), m scalar, mode scalar. Returns (8,8)."""
    st = [jnp.sum(t8v[:, 0:4]), jnp.sum(t8v[:, 4:8])]
    sl = [jnp.sum(lcol[0:4, :]), jnp.sum(lcol[4:8, :])]

    def dc_q(tq, lq, prefer):
        both = (st[tq] + sl[lq] + 4) >> 3
        only_t = (st[tq] + 2) >> 2
        only_l = (sl[lq] + 2) >> 2
        if prefer == "both":
            return jnp.where(
                have_l & have_t, both,
                jnp.where(have_t, only_t, jnp.where(have_l, only_l, 128)),
            )
        if prefer == "t":
            return jnp.where(have_t, only_t, jnp.where(have_l, only_l, 128))
        return jnp.where(have_l, only_l, jnp.where(have_t, only_t, 128))

    q00 = dc_q(0, 0, "both")
    q10 = dc_q(1, 0, "t")
    q01 = dc_q(0, 1, "l")
    q11 = dc_q(1, 1, "both")
    top = _cat([jnp.full((4, 4), q00, jnp.int32), jnp.full((4, 4), q10, jnp.int32)])
    bot = _cat([jnp.full((4, 4), q01, jnp.int32), jnp.full((4, 4), q11, jnp.int32)])
    p_dc = _catr([top, bot])
    p_h = jnp.broadcast_to(lcol, (8, 8))
    p_v = jnp.broadcast_to(t8v, (8, 8))
    T = _cat([_f(m), t8v])
    L = _catr([_f(m), lcol])
    hsum = jnp.sum(_w_asc((1, 4), 1) * T[:, 5:9]) - jnp.sum(
        _w_desc((1, 4), 1, 4) * T[:, 0:4]
    )
    vsum = jnp.sum(_w_asc((4, 1), 0) * L[5:9, :]) - jnp.sum(
        _w_desc((4, 1), 0, 4) * L[0:4, :]
    )
    a = 16 * (lcol[7, 0] + t8v[0, 7])
    b = (34 * hsum + 32) >> 6
    c = (34 * vsum + 32) >> 6
    xx = jax.lax.broadcasted_iota(jnp.int32, (8, 8), 1)
    yy = jax.lax.broadcasted_iota(jnp.int32, (8, 8), 0)
    plane = jnp.clip((a + b * (xx - 3) + c * (yy - 3) + 16) >> 5, 0, 255)
    return _sel_mode([p_dc, p_h, p_v, plane], mode)


# ---------------------------------------------------------------------------
# packing
# ---------------------------------------------------------------------------

# luma param lanes
_PK, _PI16, _PAVL, _PAVT, _PAVTR, _PAVTL, _PM4 = 0, 1, 3, 4, 5, 6, 16
# chroma param lanes
_CIN, _CMODE, _CAVL, _CAVT = 0, 1, 2, 3


def pack_luma_params(kind, modes4, i16mode, avl, avt, avtr, avtl, mb_h, mb_w, nbx):
    pw = nbx * 8
    n = mb_h * mb_w

    def grid(a):
        g = a.reshape(mb_h, mb_w, -1)
        if pw > mb_w:
            g = jnp.pad(g, ((0, 0), (0, pw - mb_w), (0, 0)))
        return g

    parts = [
        grid(kind.astype(jnp.int32)),
        grid(i16mode.astype(jnp.int32)),
        jnp.zeros((mb_h, pw, 1), jnp.int32),
        grid(avl.astype(jnp.int32)),
        grid(avt.astype(jnp.int32)),
        grid(avtr.astype(jnp.int32)),
        grid(avtl.astype(jnp.int32)),
        jnp.zeros((mb_h, pw, 16 - 7), jnp.int32),
        grid(modes4.astype(jnp.int32).reshape(n, 16)),
    ]
    packed = jnp.concatenate(parts, axis=-1)  # (mb_h, pw, 32)
    packed = jnp.pad(packed, ((0, 0), (0, 0), (0, 128 - packed.shape[-1])))
    blk = packed.reshape(mb_h * nbx, 8, 128).astype(jnp.int32)
    # lane 127 of MB 0: any intra MB in this 8-MB block — the kernel skips
    # the whole block when clear (the canvas is aliased in/out, so inter
    # pixels are already in place; device trace showed the fixed per-block
    # cost made mostly-inter frames pay the all-intra price)
    anyf = (blk[:, :, _PK] > 0).any(axis=1)
    return blk.at[:, 0, 127].set(anyf.astype(jnp.int32))


def pack_chroma_params(kind, cmode, avl, avt, mb_h, mb_w, nbx_c):
    pw = nbx_c * 16

    def grid(a):
        g = a.reshape(mb_h, mb_w, 1)
        if pw > mb_w:
            g = jnp.pad(g, ((0, 0), (0, pw - mb_w), (0, 0)))
        return g

    parts = [
        grid((kind != 0).astype(jnp.int32)),
        grid(cmode.astype(jnp.int32)),
        grid(avl.astype(jnp.int32)),
        grid(avt.astype(jnp.int32)),
    ]
    packed = jnp.concatenate(parts, axis=-1)
    packed = jnp.pad(packed, ((0, 0), (0, 0), (0, 128 - packed.shape[-1])))
    blk = packed.reshape(mb_h * nbx_c, 16, 128).astype(jnp.int32)
    # lane 127 of MB 0: any intra MB in this 16-MB block (skip like luma)
    anyf = (blk[:, :, _CIN] != 0).any(axis=1)
    return blk.at[:, 0, 127].set(anyf.astype(jnp.int32))


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _make_luma_kernel(n_blk: int, nbx: int):
    import jax.experimental.pallas as pl

    def kernel(p_in, r_in, y_in, y_ref):
        def blk(i, _):
            @pl.when(p_in[i, 0, 127] != 0)
            def _do():
                _blk_body(i)
            return 0

        def _blk_body(i):
            mby = i // nbx
            bx = i % nbx
            win = y_ref[pl.ds(mby * 16, 32), pl.ds(bx * 128, 384)].astype(jnp.int32)
            res = r_in[pl.ds(mby * 16, 16), pl.ds(bx * 128, 128)].astype(jnp.int32)
            carry = _norm(win[16:32, 127:128])
            tiles_out = []
            for m in range(8):
                c0 = 128 + 16 * m
                kind = jnp.clip(p_in[i, m, _PK], 0, 3)
                avl = p_in[i, m, _PAVL] != 0
                avt = p_in[i, m, _PAVT] != 0
                avtr = p_in[i, m, _PAVTR] != 0
                avtl = p_in[i, m, _PAVTL] != 0
                res_mb = res[:, 16 * m : 16 * m + 16]
                cur = win[16:32, c0 : c0 + 16]

                def f_none(cur=cur):
                    return _norm(cur)

                def f_i16(m_=m, c0=c0, cur=cur, carry=carry, res_mb=res_mb,
                          avl=avl, avt=avt):
                    t16v = _norm(win[15:16, c0 : c0 + 16])
                    mm = win[15, c0 - 1]
                    mode = jnp.clip(p_in[i, m_, _PI16], 0, 3)
                    pred = _i16_pred(t16v, carry, mm, mode, avl, avt)
                    return jnp.clip(pred + res_mb, 0, 255)

                def f_i4(m_=m, c0=c0, carry=carry, res_mb=res_mb,
                         avl=avl, avt=avt, avtr=avtr, avtl=avtl):
                    tiles = {}
                    for k, (bx4, by4) in enumerate(LUMA_BLK_XY):
                        # top 4 + topright 4 (raw, pre-substitution)
                        if by4 == 0:
                            t03 = win[15:16, c0 + 4 * bx4 : c0 + 4 * bx4 + 4]
                            t47 = win[15:16, c0 + 4 * bx4 + 4 : c0 + 4 * bx4 + 8]
                        else:
                            t03 = tiles[(bx4, by4 - 1)][3:4, :]
                            if bx4 < 3 and _TR_DECODED[k]:
                                t47 = tiles[(bx4 + 1, by4 - 1)][3:4, :]
                            else:
                                t47 = t03  # substituted below anyway
                        # left scalars
                        if bx4 > 0:
                            lt = tiles[(bx4 - 1, by4)]
                            ls = [lt[r, 3] for r in range(4)]
                        else:
                            ls = [carry[4 * by4 + r, 0] for r in range(4)]
                        # corner
                        if bx4 > 0 and by4 > 0:
                            mm = tiles[(bx4 - 1, by4 - 1)][3, 3]
                        elif by4 == 0 and bx4 > 0:
                            mm = win[15, c0 + 4 * bx4 - 1]
                        elif bx4 == 0 and by4 > 0:
                            mm = carry[4 * by4 - 1, 0]
                        else:
                            mm = win[15, c0 - 1]
                        # availability (spec 8.3.1, mirrors kernels/intra.py)
                        have_l = jnp.bool_(True) if bx4 > 0 else avl
                        have_t = jnp.bool_(True) if by4 > 0 else avt
                        if by4 > 0:
                            have_tr = jnp.bool_(bool(_TR_DECODED[k]))
                        elif bx4 < 3:
                            have_tr = avt
                        else:
                            have_tr = avtr
                        t8v = _norm(_cat(
                            [t03, jnp.where(have_tr, t47,
                                            jnp.broadcast_to(t03[:, 3:4], (1, 4)))]
                        ))
                        preds = _i4_modes(t8v, ls, mm, have_l, have_t)
                        mode = jnp.clip(p_in[i, m_, _PM4 + k], 0, 8)
                        pred = _sel_mode(preds, mode)
                        rblk = res_mb[4 * by4 : 4 * by4 + 4, 4 * bx4 : 4 * bx4 + 4]
                        tiles[(bx4, by4)] = _norm(jnp.clip(pred + rblk, 0, 255))
                    rows = []
                    for by4 in range(4):
                        rows.append(_cat([tiles[(bx4, by4)] for bx4 in range(4)]))
                    return _catr(rows)

                def f_i8(m_=m, c0=c0, carry=carry, res_mb=res_mb,
                         avl=avl, avt=avt, avtr=avtr, avtl=avtl):
                    tiles = {}
                    for b8 in range(4):
                        bx8, by8 = b8 % 2, b8 // 2
                        if by8 == 0:
                            t07 = win[15:16, c0 + 8 * bx8 : c0 + 8 * bx8 + 8]
                            t8f = win[15:16, c0 + 8 * bx8 + 8 : c0 + 8 * bx8 + 16]
                        else:
                            t07 = tiles[(bx8, 0)][7:8, :]
                            t8f = tiles[(1, 0)][7:8, :] if bx8 == 0 else t07
                        if bx8 > 0:
                            lt = tiles[(bx8 - 1, by8)]
                            lv = _cat([_f(lt[r, 7]) for r in range(8)])
                        else:
                            lv = _cat(
                                [_f(carry[8 * by8 + r, 0]) for r in range(8)]
                            )
                        if b8 == 0:
                            mm = win[15, c0 - 1]
                        elif b8 == 1:
                            mm = win[15, c0 + 7]
                        elif b8 == 2:
                            mm = carry[7, 0]
                        else:
                            mm = tiles[(0, 0)][7, 7]
                        have_l = jnp.bool_(True) if bx8 > 0 else avl
                        have_t = jnp.bool_(True) if by8 > 0 else avt
                        if by8 == 0:
                            have_tr = avt if bx8 == 0 else avtr
                        else:
                            have_tr = jnp.bool_(bx8 == 0)
                        have_c = (avtl, avt, avl, jnp.bool_(True))[b8]
                        t16v = _norm(_cat(
                            [t07, jnp.where(have_tr, t8f,
                                            jnp.broadcast_to(t07[:, 7:8], (1, 8)))]
                        ))
                        preds = _i8_modes(t16v, lv, mm, have_l, have_t, have_c)
                        mode = jnp.clip(p_in[i, m_, _PM4 + b8], 0, 8)
                        pred = _sel_mode(preds, mode)
                        rblk = res_mb[8 * by8 : 8 * by8 + 8, 8 * bx8 : 8 * bx8 + 8]
                        tiles[(bx8, by8)] = _norm(jnp.clip(pred + rblk, 0, 255))
                    return _catr(
                        [_cat([tiles[(0, 0)], tiles[(1, 0)]]),
                         _cat([tiles[(0, 1)], tiles[(1, 1)]])]
                    )

                tile = jax.lax.switch(kind, [f_none, f_i4, f_i8, f_i16])
                tiles_out.append(tile)
                carry = _norm(tile[:, 15:16])
            band = _cat(tiles_out)  # (16, 128)
            y_ref[pl.ds(mby * 16 + 16, 16), pl.ds(bx * 128 + 128, 128)] = band.astype(
                jnp.uint8
            )

        jax.lax.fori_loop(0, n_blk, blk, 0)

    return kernel


def _make_chroma_kernel(n_blk: int, nbx_c: int):
    import jax.experimental.pallas as pl

    def kernel(p_in, rcb_in, rcr_in, cb_in, cr_in, cb_ref, cr_ref):
        def blk(i, _):
            @pl.when(p_in[i, 0, 127] != 0)
            def _do():
                _blk_body(i)
            return 0

        def _blk_body(i):
            mby = i // nbx_c
            bx = i % nbx_c
            for ref, r_in in ((cb_ref, rcb_in), (cr_ref, rcr_in)):
                win = ref[pl.ds(mby * 8, 16), pl.ds(bx * 128, 256)].astype(jnp.int32)
                res = r_in[pl.ds(mby * 8, 8), pl.ds(bx * 128, 128)].astype(jnp.int32)
                carry = _norm(win[8:16, 127:128])
                tiles_out = []
                for m in range(16):
                    c0 = 128 + 8 * m
                    is_intra = p_in[i, m, _CIN] != 0
                    cur = win[8:16, c0 : c0 + 8]

                    def f_skip(cur=cur):
                        return _norm(cur)

                    def f_intra(m_=m, c0=c0, carry=carry):
                        t8v = _norm(win[7:8, c0 : c0 + 8])
                        mm = win[7, c0 - 1]
                        mode = jnp.clip(p_in[i, m_, _CMODE], 0, 3)
                        avl = p_in[i, m_, _CAVL] != 0
                        avt = p_in[i, m_, _CAVT] != 0
                        pred = _chroma_pred(t8v, carry, mm, mode, avl, avt)
                        rblk = res[:, 8 * m_ : 8 * m_ + 8]
                        return _norm(jnp.clip(pred + rblk, 0, 255))

                    tile = jax.lax.cond(is_intra, f_intra, f_skip)
                    tiles_out.append(tile)
                    carry = _norm(tile[:, 7:8])
                band = _cat(tiles_out)  # (8, 128)
                ref[pl.ds(mby * 8 + 8, 8), pl.ds(bx * 128 + 128, 128)] = band.astype(
                    jnp.uint8
                )

        jax.lax.fori_loop(0, n_blk, blk, 0)

    return kernel


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnums=(14, 15))
def intra_frame_pallas(
    y, cb, cr,  # int32/uint8 [H,W]/[Hc,Wc] planes with inter+PCM placed
    resid_y, resid_cb, resid_cr,  # int32 residual planes
    kind, modes4, i16mode, cmode,
    avl, avt, avtr, avtl,
    mb_h: int, mb_w: int,
):
    """Drop-in for kernels.intra.intra_wavefront on TPU (same contract)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H, W = mb_h * 16, mb_w * 16
    Hc, Wc = mb_h * 8, mb_w * 8
    nbx = -(-mb_w // 8)
    nbx_c = -(-mb_w // 16)
    Wl = 128 + 128 * nbx + 128
    Wcc = 128 + 128 * nbx_c + 128
    yc = (
        jnp.zeros((16 + H + 16, Wl), jnp.uint8)
        .at[16 : 16 + H, 128 : 128 + W]
        .set(y.astype(jnp.uint8))
    )
    cbc = (
        jnp.zeros((8 + Hc + 8, Wcc), jnp.uint8)
        .at[8 : 8 + Hc, 128 : 128 + Wc]
        .set(cb.astype(jnp.uint8))
    )
    crc = (
        jnp.zeros((8 + Hc + 8, Wcc), jnp.uint8)
        .at[8 : 8 + Hc, 128 : 128 + Wc]
        .set(cr.astype(jnp.uint8))
    )
    ry = jnp.zeros((16 * mb_h, 128 * nbx), jnp.int16).at[:, :W].set(
        resid_y.astype(jnp.int16)
    )
    rcb = jnp.zeros((8 * mb_h, 128 * nbx_c), jnp.int16).at[:, :Wc].set(
        resid_cb.astype(jnp.int16)
    )
    rcr = jnp.zeros((8 * mb_h, 128 * nbx_c), jnp.int16).at[:, :Wc].set(
        resid_cr.astype(jnp.int16)
    )
    pl_pack = pack_luma_params(
        kind, modes4, i16mode, avl, avt, avtr, avtl, mb_h, mb_w, nbx
    )
    pc_pack = pack_chroma_params(kind, cmode, avl, avt, mb_h, mb_w, nbx_c)

    yo = pl.pallas_call(
        _make_luma_kernel(mb_h * nbx, nbx),
        interpret=_interpret(),
        out_shape=jax.ShapeDtypeStruct(yc.shape, jnp.uint8),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        input_output_aliases={2: 0},
    )(pl_pack, ry, yc)
    cbo, cro = pl.pallas_call(
        _make_chroma_kernel(mb_h * nbx_c, nbx_c),
        interpret=_interpret(),
        out_shape=(
            jax.ShapeDtypeStruct(cbc.shape, jnp.uint8),
            jax.ShapeDtypeStruct(crc.shape, jnp.uint8),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        input_output_aliases={3: 0, 4: 1},
    )(pc_pack, rcb, rcr, cbc, crc)
    return (
        yo[16 : 16 + H, 128 : 128 + W].astype(jnp.int32),
        cbo[8 : 8 + Hc, 128 : 128 + Wc].astype(jnp.int32),
        cro[8 : 8 + Hc, 128 : 128 + Wc].astype(jnp.int32),
    )
