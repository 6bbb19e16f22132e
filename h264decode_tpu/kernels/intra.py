"""Intra prediction on device: MB-anti-diagonal wavefront (spec 8.3).

Intra prediction is the one sequentially-dependent stage of the pixel
pipeline (each block predicts from reconstructed neighbors). The TPU design:

- macroblocks on the 2:1 anti-diagonal d = mbx + 2*mby are independent
  (left/top/top-right/top-left neighbors all lie on earlier diagonals);
- a lax.fori_loop walks the ~(mb_w + 2*mb_h) diagonals; inside one step the
  16 z-order sub-blocks are processed as 16 unrolled sub-steps, vectorized
  across every MB on the diagonal (gather neighbor strips -> compute all
  prediction modes via index-LUT math -> select -> add the precomputed
  residual -> scatter);
- Intra_16x16 + chroma (whole-MB dependencies only) run at sub-step 0,
  Intra_8x8 blocks at sub-steps 0/4/8/12, Intra_4x4 at every sub-step.

Inter-predicted and I_PCM macroblocks are pre-placed in the plane by the
caller; the wavefront only touches intra-NxN/16x16 cells. Bit-exact vs
pipeline/intra_frame.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..tensors.frame_tensors import LUMA_BLK_XY

PAD = 8  # plane padding (top/left) so neighbor gathers never go negative

_ZX = np.array([bx for bx, by in LUMA_BLK_XY])
_ZY = np.array([by for bx, by in LUMA_BLK_XY])
# z index of each (bx, by) cell position
_ZIDX = np.zeros((4, 4), np.int64)
for z, (bx, by) in enumerate(LUMA_BLK_XY):
    _ZIDX[by, bx] = z

_YY4, _XX4 = np.mgrid[0:4, 0:4]
_YY8, _XX8 = np.mgrid[0:8, 0:8]


def _bcast(v):
    return v[:, None, None]


def intra4x4_modes(t, l, m, have_l, have_t, have_c, mid=128):
    """All nine spec 8.3.1.2 predictions. t: [s, 8] (top+topright, already
    substituted), l: [s, 4], m: [s]. Returns [s, 9, 4, 4] int32."""
    s = t.shape[0]
    T = jnp.concatenate([m[:, None], t], axis=1)  # T[0]=m, T[i]=t[i-1]
    L = jnp.concatenate([m[:, None], l], axis=1)
    t9 = jnp.concatenate([t, t[:, 7:8]], axis=1)  # pad for DDL corner case
    y4, x4 = _YY4, _XX4

    p_v = jnp.broadcast_to(t[:, None, 0:4], (s, 4, 4))
    p_h = jnp.broadcast_to(l[:, :, None], (s, 4, 4))
    sum_t = jnp.sum(t[:, :4], axis=1)
    sum_l = jnp.sum(l, axis=1)
    dc = jnp.where(
        have_l & have_t,
        (sum_t + sum_l + 4) >> 3,
        jnp.where(
            have_t, (sum_t + 2) >> 2, jnp.where(have_l, (sum_l + 2) >> 2, mid)
        ),
    )
    p_dc = jnp.broadcast_to(dc[:, None, None], (s, 4, 4))
    # DDL: (t[x+y] + 2 t[x+y+1] + t[x+y+2] + 2) >> 2; the padded t9 makes the
    # (3,3) special case fall out exactly
    K = (x4 + y4).astype(np.int64)
    p_ddl = (t9[:, K] + 2 * t9[:, K + 1] + t9[:, np.minimum(K + 2, 8)] + 2) >> 2
    # DDR
    ku = np.clip(x4 - y4, 1, 3)
    kl = np.clip(y4 - x4, 1, 3)
    up = (T[:, ku - 1] + 2 * T[:, ku] + T[:, ku + 1] + 2) >> 2
    lo = (L[:, kl - 1] + 2 * L[:, kl] + L[:, kl + 1] + 2) >> 2
    diag = (T[:, 1] + 2 * T[:, 0] + L[:, 1] + 2) >> 2
    p_ddr = jnp.where(
        x4 > y4, up, jnp.where(x4 < y4, lo, diag[:, None, None])
    )
    # VR (8.3.1.2.6)
    zvr = 2 * x4 - y4
    kv = x4 - (y4 >> 1)  # 0..3 where zvr >= 0
    kvc = np.clip(kv, 0, 3)
    even = (T[:, kvc] + T[:, kvc + 1] + 1) >> 1
    odd = (T[:, np.clip(kvc - 1, 0, 3)] + 2 * T[:, kvc] + T[:, kvc + 1] + 2) >> 2
    vrm1 = (L[:, 1] + 2 * T[:, 0] + T[:, 1] + 2) >> 2
    klow = np.clip(y4 - 1, 0, 3)
    low = (
        L[:, klow + 1] + 2 * L[:, np.clip(klow, 0, 4)] + L[:, np.clip(klow - 1, 0, 4)] + 2
    ) >> 2
    p_vr = jnp.where(
        (zvr >= 0) & (zvr % 2 == 0),
        even,
        jnp.where(
            (zvr >= 0),
            odd,
            jnp.where(zvr == -1, vrm1[:, None, None], low),
        ),
    )
    # HD (8.3.1.2.7) — mirror of VR
    zhd = 2 * y4 - x4
    kh = y4 - (x4 >> 1)
    khc = np.clip(kh, 0, 3)
    h_even = (L[:, khc] + L[:, khc + 1] + 1) >> 1
    h_odd = (L[:, np.clip(khc - 1, 0, 3)] + 2 * L[:, khc] + L[:, khc + 1] + 2) >> 2
    hdm1 = (T[:, 1] + 2 * T[:, 0] + L[:, 1] + 2) >> 2
    kxl = np.clip(x4 - 1, 0, 3)
    h_low = (
        T[:, kxl + 1] + 2 * T[:, np.clip(kxl, 0, 4)] + T[:, np.clip(kxl - 1, 0, 4)] + 2
    ) >> 2
    p_hd = jnp.where(
        (zhd >= 0) & (zhd % 2 == 0),
        h_even,
        jnp.where(
            (zhd >= 0),
            h_odd,
            jnp.where(zhd == -1, hdm1[:, None, None], h_low),
        ),
    )
    # VL (8.3.1.2.8)
    kvl = (x4 + (y4 >> 1)).astype(np.int64)
    vl_even = (t[:, kvl] + t[:, kvl + 1] + 1) >> 1
    vl_odd = (t[:, kvl] + 2 * t[:, kvl + 1] + t[:, np.minimum(kvl + 2, 7)] + 2) >> 2
    p_vl = jnp.where(y4 % 2 == 0, vl_even, vl_odd)
    # HU (8.3.1.2.9)
    zhu = x4 + 2 * y4
    khu = np.clip(y4 + (x4 >> 1), 0, 3)
    hu_even = (l[:, khu] + l[:, np.minimum(khu + 1, 3)] + 1) >> 1
    hu_odd = (
        l[:, khu] + 2 * l[:, np.minimum(khu + 1, 3)] + l[:, np.minimum(khu + 2, 3)] + 2
    ) >> 2
    hu5 = (l[:, 2] + 3 * l[:, 3] + 2) >> 2
    p_hu = jnp.where(
        zhu > 5,
        l[:, 3][:, None, None],
        jnp.where(
            zhu == 5,
            hu5[:, None, None],
            jnp.where(zhu % 2 == 0, hu_even, hu_odd),
        ),
    )
    return jnp.stack([p_v, p_h, p_dc, p_ddl, p_ddr, p_vr, p_hd, p_vl, p_hu], axis=1)


def intra8x8_modes(t16, l8, m, have_l, have_t, have_c, mid=128):
    """Spec 8.3.2: reference filtering + the nine 8x8 modes. t16: [s, 16]
    raw (substituted) top row, l8: [s, 8], m: [s]. Returns [s, 9, 8, 8]."""
    s = t16.shape[0]
    # ---- 8.3.2.2.1 reference filtering
    tl = jnp.where(have_c, m, 0)
    t_m1 = jnp.concatenate([tl[:, None], t16[:, :-1]], axis=1)
    t_p1 = jnp.concatenate([t16[:, 1:], t16[:, 15:16]], axis=1)
    ft = (t_m1 + 2 * t16 + t_p1 + 2) >> 2
    ft0_noc = (3 * t16[:, 0] + t16[:, 1] + 2) >> 2
    ft = ft.at[:, 0].set(jnp.where(have_c, ft[:, 0], ft0_noc))
    ft = ft.at[:, 15].set((t16[:, 14] + 3 * t16[:, 15] + 2) >> 2)
    l_m1 = jnp.concatenate([tl[:, None], l8[:, :-1]], axis=1)
    l_p1 = jnp.concatenate([l8[:, 1:], l8[:, 7:8]], axis=1)
    fl = (l_m1 + 2 * l8 + l_p1 + 2) >> 2
    fl0_noc = (3 * l8[:, 0] + l8[:, 1] + 2) >> 2
    fl = fl.at[:, 0].set(jnp.where(have_c, fl[:, 0], fl0_noc))
    fl = fl.at[:, 7].set((l8[:, 6] + 3 * l8[:, 7] + 2) >> 2)
    fm = jnp.where(
        have_l & have_t,
        (t16[:, 0] + 2 * m + l8[:, 0] + 2) >> 2,
        jnp.where(
            have_t,
            (3 * m + t16[:, 0] + 2) >> 2,
            jnp.where(have_l, (3 * m + l8[:, 0] + 2) >> 2, m),
        ),
    )
    t, l, mm = ft, fl, fm
    T = jnp.concatenate([mm[:, None], t], axis=1)
    L = jnp.concatenate([mm[:, None], l], axis=1)
    t17 = jnp.concatenate([t, t[:, 15:16]], axis=1)
    y8, x8 = _YY8, _XX8

    p_v = jnp.broadcast_to(t[:, None, 0:8], (s, 8, 8))
    p_h = jnp.broadcast_to(l[:, :, None], (s, 8, 8))
    sum_t = jnp.sum(t[:, :8], axis=1)
    sum_l = jnp.sum(l, axis=1)
    dc = jnp.where(
        have_l & have_t,
        (sum_t + sum_l + 8) >> 4,
        jnp.where(
            have_t, (sum_t + 4) >> 3, jnp.where(have_l, (sum_l + 4) >> 3, mid)
        ),
    )
    p_dc = jnp.broadcast_to(dc[:, None, None], (s, 8, 8))
    K = (x8 + y8).astype(np.int64)
    p_ddl = (t17[:, K] + 2 * t17[:, K + 1] + t17[:, np.minimum(K + 2, 16)] + 2) >> 2
    ku = np.clip(x8 - y8, 1, 7)
    kl = np.clip(y8 - x8, 1, 7)
    up = (T[:, ku - 1] + 2 * T[:, ku] + T[:, ku + 1] + 2) >> 2
    lo = (L[:, kl - 1] + 2 * L[:, kl] + L[:, kl + 1] + 2) >> 2
    diag = (T[:, 1] + 2 * T[:, 0] + L[:, 1] + 2) >> 2
    p_ddr = jnp.where(x8 > y8, up, jnp.where(x8 < y8, lo, diag[:, None, None]))
    zvr = 2 * x8 - y8
    kv = np.clip(x8 - (y8 >> 1), 0, 7)
    even = (T[:, kv] + T[:, kv + 1] + 1) >> 1
    odd = (T[:, np.clip(kv - 1, 0, 7)] + 2 * T[:, kv] + T[:, kv + 1] + 2) >> 2
    vrm1 = (L[:, 1] + 2 * T[:, 0] + T[:, 1] + 2) >> 2
    # l[i] with m fallback at i = -1 maps to L[i + 1] (L[0] is the corner)
    i1 = np.clip(y8 - 2 * x8, 0, 8)
    i2 = np.clip(y8 - 2 * x8 - 1, 0, 8)
    i3 = np.clip(y8 - 2 * x8 - 2, 0, 8)
    low = (L[:, i1] + 2 * L[:, i2] + L[:, i3] + 2) >> 2
    p_vr = jnp.where(
        (zvr >= 0) & (zvr % 2 == 0),
        even,
        jnp.where(zvr >= 0, odd, jnp.where(zvr == -1, vrm1[:, None, None], low)),
    )
    zhd = 2 * y8 - x8
    kh = np.clip(y8 - (x8 >> 1), 0, 7)
    h_even = (L[:, kh] + L[:, kh + 1] + 1) >> 1
    h_odd = (L[:, np.clip(kh - 1, 0, 7)] + 2 * L[:, kh] + L[:, kh + 1] + 2) >> 2
    hdm1 = (T[:, 1] + 2 * T[:, 0] + L[:, 1] + 2) >> 2
    j1 = np.clip(x8 - 2 * y8, 0, 16)
    j2 = np.clip(x8 - 2 * y8 - 1, 0, 16)
    j3 = np.clip(x8 - 2 * y8 - 2, 0, 16)
    h_low = (T[:, j1] + 2 * T[:, j2] + T[:, j3] + 2) >> 2
    p_hd = jnp.where(
        (zhd >= 0) & (zhd % 2 == 0),
        h_even,
        jnp.where(zhd >= 0, h_odd, jnp.where(zhd == -1, hdm1[:, None, None], h_low)),
    )
    kvl = (x8 + (y8 >> 1)).astype(np.int64)
    vl_even = (t[:, kvl] + t[:, kvl + 1] + 1) >> 1
    vl_odd = (t[:, kvl] + 2 * t[:, kvl + 1] + t[:, np.minimum(kvl + 2, 15)] + 2) >> 2
    p_vl = jnp.where(y8 % 2 == 0, vl_even, vl_odd)
    zhu = x8 + 2 * y8
    khu = np.clip(y8 + (x8 >> 1), 0, 7)
    hu_even = (l[:, khu] + l[:, np.minimum(khu + 1, 7)] + 1) >> 1
    hu_odd = (
        l[:, khu] + 2 * l[:, np.minimum(khu + 1, 7)] + l[:, np.minimum(khu + 2, 7)] + 2
    ) >> 2
    hu13 = (l[:, 6] + 3 * l[:, 7] + 2) >> 2
    p_hu = jnp.where(
        zhu > 13,
        l[:, 7][:, None, None],
        jnp.where(
            zhu == 13,
            hu13[:, None, None],
            jnp.where(zhu % 2 == 0, hu_even, hu_odd),
        ),
    )
    return jnp.stack([p_v, p_h, p_dc, p_ddl, p_ddr, p_vr, p_hd, p_vl, p_hu], axis=1)


def intra16_modes(t16, l16, m, have_l, have_t, mid=128, mx=255):
    """Spec 8.3.3: V/H/DC/Plane. t16/l16: [s, 16], m: [s]. [s, 4, 16, 16]."""
    s = t16.shape[0]
    yy, xx = np.mgrid[0:16, 0:16]
    p_v = jnp.broadcast_to(t16[:, None, :], (s, 16, 16))
    p_h = jnp.broadcast_to(l16[:, :, None], (s, 16, 16))
    sum_t = jnp.sum(t16, axis=1)
    sum_l = jnp.sum(l16, axis=1)
    dc = jnp.where(
        have_l & have_t,
        (sum_t + sum_l + 16) >> 5,
        jnp.where(
            have_t, (sum_t + 8) >> 4, jnp.where(have_l, (sum_l + 8) >> 4, mid)
        ),
    )
    p_dc = jnp.broadcast_to(dc[:, None, None], (s, 16, 16))
    T = jnp.concatenate([m[:, None], t16], axis=1)  # T[0]=m, T[i]=t[i-1]
    L = jnp.concatenate([m[:, None], l16], axis=1)
    ks = np.arange(8)
    hsum = jnp.sum((ks + 1)[None, :] * (T[:, 9 + ks] - T[:, 7 - ks]), axis=1)
    vsum = jnp.sum((ks + 1)[None, :] * (L[:, 9 + ks] - L[:, 7 - ks]), axis=1)
    a = 16 * (l16[:, 15] + t16[:, 15])
    b = (5 * hsum + 32) >> 6
    c = (5 * vsum + 32) >> 6
    plane = jnp.clip(
        (a[:, None, None] + b[:, None, None] * (xx - 7) + c[:, None, None] * (yy - 7) + 16)
        >> 5,
        0,
        mx,
    )
    return jnp.stack([p_v, p_h, p_dc, plane], axis=1)


def chroma_modes(t8, l8, m, have_l, have_t, mid=128, mx=255):
    """Spec 8.3.4 (4:2:0): DC(quadrant rules)/H/V/Plane. [s, 4, 8, 8]."""
    s = t8.shape[0]
    yy, xx = np.mgrid[0:8, 0:8]
    sum_t = [jnp.sum(t8[:, i * 4 : i * 4 + 4], axis=1) for i in range(2)]
    sum_l = [jnp.sum(l8[:, i * 4 : i * 4 + 4], axis=1) for i in range(2)]

    def dc_q(tq, lq, prefer):
        both = (sum_t[tq] + sum_l[lq] + 4) >> 3
        only_t = (sum_t[tq] + 2) >> 2
        only_l = (sum_l[lq] + 2) >> 2
        if prefer == "both":
            return jnp.where(
                have_l & have_t, both,
                jnp.where(have_t, only_t, jnp.where(have_l, only_l, mid)),
            )
        if prefer == "t":
            return jnp.where(have_t, only_t, jnp.where(have_l, only_l, mid))
        return jnp.where(have_l, only_l, jnp.where(have_t, only_t, mid))

    q00 = dc_q(0, 0, "both")
    q10 = dc_q(1, 0, "t")  # top-right quadrant
    q01 = dc_q(0, 1, "l")  # bottom-left
    q11 = dc_q(1, 1, "both")
    top = jnp.where((np.asarray(xx < 4))[None], q00[:, None, None], q10[:, None, None])
    bot = jnp.where((np.asarray(xx < 4))[None], q01[:, None, None], q11[:, None, None])
    p_dc = jnp.where((np.asarray(yy < 4))[None], top, bot)
    p_h = jnp.broadcast_to(l8[:, :, None], (s, 8, 8))
    p_v = jnp.broadcast_to(t8[:, None, :], (s, 8, 8))
    T = jnp.concatenate([m[:, None], t8], axis=1)
    L = jnp.concatenate([m[:, None], l8], axis=1)
    ks = np.arange(4)
    hsum = jnp.sum((ks + 1)[None, :] * (T[:, 5 + ks] - T[:, 3 - ks]), axis=1)
    vsum = jnp.sum((ks + 1)[None, :] * (L[:, 5 + ks] - L[:, 3 - ks]), axis=1)
    a = 16 * (l8[:, 7] + t8[:, 7])
    b = (34 * hsum + 32) >> 6
    c = (34 * vsum + 32) >> 6
    plane = jnp.clip(
        (a[:, None, None] + b[:, None, None] * (xx - 3) + c[:, None, None] * (yy - 3) + 16)
        >> 5,
        0,
        mx,
    )
    return jnp.stack([p_dc, p_h, p_v, plane], axis=1)


def chroma_modes_422(t8, l16, m, have_l, have_t, mid=128, mx=255):
    """Spec 8.3.4 (4:2:2): DC per 4x4 sub-block (8 blocks of the 8x16
    component), H/V extension, and plane with yCF = 4. t8: [s, 8] top row,
    l16: [s, 16] left column. Returns [s, 4, 16, 8]."""
    s = t8.shape[0]
    yy, xx = np.mgrid[0:16, 0:8]
    sum_t = [jnp.sum(t8[:, i * 4 : i * 4 + 4], axis=1) for i in range(2)]
    sum_l = [jnp.sum(l16[:, i * 4 : i * 4 + 4], axis=1) for i in range(4)]

    def dc_blk(bx, by):
        both = (sum_t[bx] + sum_l[by] + 4) >> 3
        only_t = (sum_t[bx] + 2) >> 2
        only_l = (sum_l[by] + 2) >> 2
        if (bx == 0 and by == 0) or (bx > 0 and by > 0):
            return jnp.where(
                have_l & have_t, both,
                jnp.where(have_t, only_t, jnp.where(have_l, only_l, mid)),
            )
        if bx > 0:  # top-row right blocks: prefer top
            return jnp.where(have_t, only_t, jnp.where(have_l, only_l, mid))
        # left-column lower blocks: prefer left
        return jnp.where(have_l, only_l, jnp.where(have_t, only_t, mid))

    p_dc = jnp.zeros((s, 16, 8), jnp.int32)
    for by in range(4):
        for bx in range(2):
            sel = (np.asarray((yy // 4 == by) & (xx // 4 == bx)))[None]
            p_dc = jnp.where(sel, dc_blk(bx, by)[:, None, None], p_dc)
    p_h = jnp.broadcast_to(l16[:, :, None], (s, 16, 8))
    p_v = jnp.broadcast_to(t8[:, None, :], (s, 16, 8))
    T = jnp.concatenate([m[:, None], t8], axis=1)
    L = jnp.concatenate([m[:, None], l16], axis=1)
    ks = np.arange(4)
    ks8 = np.arange(8)
    hsum = jnp.sum((ks + 1)[None, :] * (T[:, 5 + ks] - T[:, 3 - ks]), axis=1)
    vsum = jnp.sum((ks8 + 1)[None, :] * (L[:, 9 + ks8] - L[:, 7 - ks8]), axis=1)
    a = 16 * (l16[:, 15] + t8[:, 7])
    b = (34 * hsum + 32) >> 6
    c = (5 * vsum + 32) >> 6  # (34 - 29) at yCF = 4 (8.3.4.4)
    plane = jnp.clip(
        (a[:, None, None] + b[:, None, None] * (xx - 3)
         + c[:, None, None] * (yy - 7) + 16) >> 5,
        0,
        mx,
    )
    return jnp.stack([p_dc, p_h, p_v, plane], axis=1)


# ---------------------------------------------------------------------------
# Wavefront driver
# ---------------------------------------------------------------------------

# MB kind codes for the wavefront
K_NONE, K_I4, K_I8, K_I16 = 0, 1, 2, 3

# decoded-before LUT: is z-block (bx+1, by-1) decoded before z-block (bx, by)?
_TR_DECODED = np.zeros(16, bool)
for _k, (_bx, _by) in enumerate(LUMA_BLK_XY):
    if _bx < 3 and _by > 0:
        _TR_DECODED[_k] = _ZIDX[_by - 1, _bx + 1] < _k


def intra_wavefront(
    y, cb, cr,  # [H, W]/[Hc, Wc] int32 planes with inter+PCM content placed
    resid_y, resid_cb, resid_cr,  # int32 residual planes (all MBs)
    kind,  # [nMB] int32: K_NONE/K_I4/K_I8/K_I16
    modes4,  # [nMB, 16] int32 z-order (also holds 8x8 modes in [:, :4])
    i16mode,  # [nMB] int32
    cmode,  # [nMB] int32
    avl, avt, avtr, avtl,  # [nMB] bool: MB-level intra availability
    mb_h: int,
    mb_w: int,
    top=None,  # optional (y_row [W], cb_row [Wc], cr_row [Wc]) halo: the
    #            pre-deblock bottom pixel row of the band above, seeded as
    #            the "above" neighbors of MB row 0 (row-band sharding)
    ch_h: int = 8,  # chroma MB height in samples: 8 (4:2:0) / 16 (4:2:2)
    mid: int = 128,  # DC fallback = 1 << (BitDepth - 1)
    mx: int = 255,  # Clip1 ceiling = (1 << BitDepth) - 1
):
    """Runs the anti-diagonal intra wavefront; returns updated (y, cb, cr)."""
    H, W = mb_h * 16, mb_w * 16
    Hc, Wc = mb_h * ch_h, mb_w * 8
    # pad: PAD top/left, right PAD, bottom PAD + 16-row scratch strip
    yp = jnp.pad(y, ((PAD, PAD + 16), (PAD, PAD)))
    cbp = jnp.pad(cb, ((PAD, PAD + ch_h), (PAD, PAD)))
    crp = jnp.pad(cr, ((PAD, PAD + ch_h), (PAD, PAD)))
    if top is not None:
        ty_, tcb_, tcr_ = top
        yp = yp.at[PAD - 1, PAD : PAD + W].set(ty_.astype(yp.dtype))
        cbp = cbp.at[PAD - 1, PAD : PAD + Wc].set(tcb_.astype(cbp.dtype))
        crp = crp.at[PAD - 1, PAD : PAD + Wc].set(tcr_.astype(crp.dtype))
    kind_g = kind.reshape(mb_h, mb_w)
    modes4_g = modes4.reshape(mb_h, mb_w, 16)
    i16_g = i16mode.reshape(mb_h, mb_w)
    cm_g = cmode.reshape(mb_h, mb_w)
    fl_g = jnp.stack(
        [a.reshape(mb_h, mb_w) for a in (avl, avt, avtr, avtl)]
    )  # [4, mb_h, mb_w]
    n_slots = mb_h
    mbys = jnp.arange(n_slots)
    n_diag = mb_w + 2 * mb_h - 1
    scr_y = PAD + H  # scratch row for inactive slots
    scr_c = PAD + Hc
    # hoist the residual padding out of the loop body
    resid_y_p = jnp.pad(resid_y, ((0, 16), (0, 0)))
    resid_cb_p = jnp.pad(resid_cb, ((0, ch_h), (0, 0)))
    resid_cr_p = jnp.pad(resid_cr, ((0, ch_h), (0, 0)))

    def gather_row(plane, r, c0, n):
        cols = c0[:, None] + jnp.arange(n)[None, :]
        return plane[r[:, None], cols].astype(jnp.int32)

    def gather_col(plane, r0, c, n):
        rows = r0[:, None] + jnp.arange(n)[None, :]
        return plane[rows, c[:, None]].astype(jnp.int32)

    def gather_patch(plane, r0, c0, h, w):
        rows = r0[:, None, None] + jnp.arange(h)[None, :, None]
        cols = c0[:, None, None] + jnp.arange(w)[None, None, :]
        return plane[rows, cols].astype(jnp.int32)

    def scatter_patch(plane, r0, c0, vals):
        h, w = vals.shape[1], vals.shape[2]
        rows = r0[:, None, None] + jnp.arange(h)[None, :, None]
        cols = c0[:, None, None] + jnp.arange(w)[None, None, :]
        return plane.at[rows, cols].set(vals)

    def step(d, state):
        yp, cbp, crp = state
        mbxs = d - 2 * mbys
        in_pic = (mbxs >= 0) & (mbxs < mb_w)
        mbx = jnp.clip(mbxs, 0, mb_w - 1)
        k_mb = jnp.where(in_pic, kind_g[mbys, mbx], K_NONE)
        m4 = modes4_g[mbys, mbx]  # [s, 16]
        mavl = fl_g[0, mbys, mbx] & in_pic
        mavt = fl_g[1, mbys, mbx] & in_pic
        mavtr = fl_g[2, mbys, mbx] & in_pic
        mavtl = fl_g[3, mbys, mbx] & in_pic
        sl = jnp.arange(n_slots)

        # ---------- I16 luma + chroma + (at k==0..15) 4x4/8x8 blocks
        # I16 (whole MB at sub-step 0)
        act16 = k_mb == K_I16
        ty = jnp.where(act16, mbys * 16 + PAD, scr_y)
        tx = jnp.where(act16, mbx * 16 + PAD, 0)
        t16 = gather_row(yp, ty - 1, tx, 16)
        l16 = gather_col(yp, ty, tx - 1, 16)
        m = yp[ty - 1, tx - 1].astype(jnp.int32)
        preds = intra16_modes(t16, l16, m, mavl, mavt, mid, mx)  # [s, 4, 16, 16]
        pred = preds[sl, jnp.clip(i16_g[mbys, mbx], 0, 3)]
        ry = jnp.where(act16, mbys * 16, 0)
        rx = jnp.where(act16, mbx * 16, 0)
        res = gather_patch(resid_y_p, ry, rx, 16, 16)
        out = jnp.clip(pred + res, 0, mx)
        cur = gather_patch(yp, ty, tx, 16, 16)
        out = jnp.where(act16[:, None, None], out, cur)
        yp = scatter_patch(yp, ty, tx, out)

        # chroma for every intra-NxN/16x16 MB (sub-step 0; MB-level deps only)
        actc = k_mb != K_NONE
        for comp, (plane, resid) in enumerate(((cbp, resid_cb_p), (crp, resid_cr_p))):
            cy = jnp.where(actc, mbys * ch_h + PAD, scr_c)
            cx = jnp.where(actc, mbx * 8 + PAD, 0)
            t8c = gather_row(plane, cy - 1, cx, 8)
            l8c = gather_col(plane, cy, cx - 1, ch_h)
            mc = plane[cy - 1, cx - 1].astype(jnp.int32)
            cm_fn = chroma_modes if ch_h == 8 else chroma_modes_422
            cpreds = cm_fn(t8c, l8c, mc, mavl, mavt, mid, mx)
            cpred = cpreds[sl, jnp.clip(cm_g[mbys, mbx], 0, 3)]
            cryi = jnp.where(actc, mbys * ch_h, 0)
            crxi = jnp.where(actc, mbx * 8, 0)
            cres = gather_patch(resid, cryi, crxi, ch_h, 8)
            cout = jnp.clip(cpred + cres, 0, mx)
            ccur = gather_patch(plane, cy, cx, ch_h, 8)
            cout = jnp.where(actc[:, None, None], cout, ccur)
            if comp == 0:
                cbp = scatter_patch(plane, cy, cx, cout)
            else:
                crp = scatter_patch(plane, cy, cx, cout)

        # ---------- 16 sequential sub-steps: 4x4 (every k) and 8x8 (k%4==0)
        for k in range(16):
            bx, by = int(_ZX[k]), int(_ZY[k])
            act4 = k_mb == K_I4
            gy = jnp.where(act4, mbys * 16 + by * 4 + PAD, scr_y)
            gx = jnp.where(act4, mbx * 16 + bx * 4 + PAD, 0)
            t8 = gather_row(yp, gy - 1, gx, 8)
            l4 = gather_col(yp, gy, gx - 1, 4)
            mm = yp[gy - 1, gx - 1].astype(jnp.int32)
            if bx > 0:
                have_l = jnp.full((n_slots,), True)
            else:
                have_l = mavl
            if by > 0:
                have_t = jnp.full((n_slots,), True)
            else:
                have_t = mavt
            if by > 0:
                have_tr = jnp.full((n_slots,), bool(_TR_DECODED[k]))
            elif bx < 3:
                have_tr = mavt
            else:
                have_tr = mavtr
            if bx > 0 and by > 0:
                have_c = jnp.full((n_slots,), True)
            elif by == 0 and bx > 0:
                have_c = mavt
            elif bx == 0 and by > 0:
                have_c = mavl
            else:
                have_c = mavtl
            t8 = jnp.concatenate(
                [
                    t8[:, :4],
                    jnp.where(have_tr[:, None], t8[:, 4:], t8[:, 3:4]),
                ],
                axis=1,
            )
            preds = intra4x4_modes(t8, l4, mm, have_l, have_t, have_c, mid)
            pred = preds[sl, jnp.clip(m4[:, k], 0, 8)]
            ry = jnp.where(act4, mbys * 16 + by * 4, 0)
            rx = jnp.where(act4, mbx * 16 + bx * 4, 0)
            res = gather_patch(resid_y_p, ry, rx, 4, 4)
            out = jnp.clip(pred + res, 0, mx)
            cur = gather_patch(yp, gy, gx, 4, 4)
            out = jnp.where(act4[:, None, None], out, cur)
            yp = scatter_patch(yp, gy, gx, out)

            if k % 4 == 0:
                b8 = k // 4
                bx8, by8 = b8 % 2, b8 // 2
                act8 = k_mb == K_I8
                gy = jnp.where(act8, mbys * 16 + by8 * 8 + PAD, scr_y)
                gx = jnp.where(act8, mbx * 16 + bx8 * 8 + PAD, 0)
                t16b = gather_row(yp, gy - 1, gx, 16)
                l8b = gather_col(yp, gy, gx - 1, 8)
                mm = yp[gy - 1, gx - 1].astype(jnp.int32)
                have_l = jnp.full((n_slots,), True) if bx8 > 0 else mavl
                have_t = jnp.full((n_slots,), True) if by8 > 0 else mavt
                if by8 == 0:
                    have_tr = mavt if bx8 == 0 else mavtr
                else:
                    have_tr = (
                        jnp.full((n_slots,), True)
                        if bx8 == 0
                        else jnp.full((n_slots,), False)
                    )
                if b8 == 0:
                    have_c = mavtl
                elif b8 == 1:
                    have_c = mavt
                elif b8 == 2:
                    have_c = mavl
                else:
                    have_c = jnp.full((n_slots,), True)
                t16b = jnp.concatenate(
                    [
                        t16b[:, :8],
                        jnp.where(have_tr[:, None], t16b[:, 8:], t16b[:, 7:8]),
                    ],
                    axis=1,
                )
                preds = intra8x8_modes(t16b, l8b, mm, have_l, have_t, have_c, mid)
                pred = preds[sl, jnp.clip(m4[:, b8], 0, 8)]
                ry = jnp.where(act8, mbys * 16 + by8 * 8, 0)
                rx = jnp.where(act8, mbx * 16 + bx8 * 8, 0)
                res = gather_patch(resid_y_p, ry, rx, 8, 8)
                out = jnp.clip(pred + res, 0, mx)
                cur = gather_patch(yp, gy, gx, 8, 8)
                out = jnp.where(act8[:, None, None], out, cur)
                yp = scatter_patch(yp, gy, gx, out)
        return yp, cbp, crp

    # only walk the diagonals that actually contain intra MBs — P/B frames
    # typically have few, so this collapses the wavefront to a handful of
    # steps (bounds are traced; fori_loop lowers to a while loop)
    d_grid = jnp.arange(mb_w)[None, :] + 2 * jnp.arange(mb_h)[:, None]
    has_intra = kind_g > 0
    lo = jnp.min(jnp.where(has_intra, d_grid, n_diag))
    hi = jnp.max(jnp.where(has_intra, d_grid, -1)) + 1
    lo = jnp.minimum(lo, hi)
    yp, cbp, crp = jax.lax.fori_loop(lo, hi, step, (yp, cbp, crp))
    return (
        yp[PAD : PAD + H, PAD : PAD + W],
        cbp[PAD : PAD + Hc, PAD : PAD + Wc],
        crp[PAD : PAD + Hc, PAD : PAD + Wc],
    )
