"""In-loop deblocking filter on device (spec 8.7), TPU-native design.

The spec's raster MB serialization carries dependencies only through the
3-px strips each MB writes into its left/top neighbors, so macroblocks on an
anti-diagonal d = mbx + 2*mby are mutually independent (disjoint read/write
footprints — the 2:1 slope guarantees the left, top, top-left and top-right
neighbors of every MB on diagonal d lie on earlier diagonals). The kernel is
a lax.fori_loop over the ~(mb_w + 2*mb_h) diagonals; each step gathers a
20x20 luma (12x12 chroma) patch per MB slot, applies the MB's 8 luma +
4 chroma edges in spec order inside the patch (vectorized across slots and
lines), and scatters the patches back.

Boundary strengths and threshold indices are precomputed per 4x4 cell edge
(host side, vectorized) — see pipeline/deblock_prep.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..entropy.deblock_tables import ALPHA, BETA, TC0

_ALPHA = np.asarray(ALPHA, np.int32)
_BETA = np.asarray(BETA, np.int32)
_TC0 = np.asarray(TC0, np.int32)

LPAD = 4  # patch margin


def _filter_luma(p, q, bs, index_a, index_b, bd_scale=1, mx=255):
    """Vectorized spec 8.7.2.3/8.7.2.4. p/q: [..., 4] int32 (p[...,k] = p_k);
    bs/index_a/index_b broadcastable to p[..., 0]."""
    alpha = jnp.asarray(_ALPHA)[index_a] * bd_scale
    beta = jnp.asarray(_BETA)[index_b] * bd_scale
    p0, p1, p2, p3 = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    q0, q1, q2, q3 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    filt = (
        (bs > 0)
        & (jnp.abs(p0 - q0) < alpha)
        & (jnp.abs(p1 - p0) < beta)
        & (jnp.abs(q1 - q0) < beta)
    )
    ap = jnp.abs(p2 - p0) < beta
    aq = jnp.abs(q2 - q0) < beta
    tc0 = jnp.asarray(_TC0)[index_a, jnp.clip(bs, 1, 3) - 1] * bd_scale
    tc = tc0 + ap.astype(jnp.int32) + aq.astype(jnp.int32)
    delta = jnp.clip((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc)
    p0_w = jnp.clip(p0 + delta, 0, mx)
    q0_w = jnp.clip(q0 - delta, 0, mx)
    p1_w = p1 + jnp.clip((p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1, -tc0, tc0)
    q1_w = q1 + jnp.clip((q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1, -tc0, tc0)
    strong = jnp.abs(p0 - q0) < ((alpha >> 2) + 2)
    sp = ap & strong
    p0_s = jnp.where(
        sp, (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3, (2 * p1 + p0 + q1 + 2) >> 2
    )
    p1_s = jnp.where(sp, (p2 + p1 + p0 + q0 + 2) >> 2, p1)
    p2_s = jnp.where(sp, (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3, p2)
    sq = aq & strong
    q0_s = jnp.where(
        sq, (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3, (2 * q1 + q0 + p1 + 2) >> 2
    )
    q1_s = jnp.where(sq, (q2 + q1 + q0 + p0 + 2) >> 2, q1)
    q2_s = jnp.where(sq, (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3, q2)
    is4 = bs == 4
    new_p0 = jnp.where(filt, jnp.where(is4, p0_s, p0_w), p0)
    new_q0 = jnp.where(filt, jnp.where(is4, q0_s, q0_w), q0)
    new_p1 = jnp.where(
        filt & ap, jnp.where(is4, p1_s, p1_w), jnp.where(filt & is4, p1_s, p1)
    )
    new_q1 = jnp.where(
        filt & aq, jnp.where(is4, q1_s, q1_w), jnp.where(filt & is4, q1_s, q1)
    )
    new_p2 = jnp.where(filt & is4, p2_s, p2)
    new_q2 = jnp.where(filt & is4, q2_s, q2)
    return (
        jnp.stack([new_p0, new_p1, new_p2, p3], axis=-1),
        jnp.stack([new_q0, new_q1, new_q2, q3], axis=-1),
    )


def _filter_chroma(p, q, bs, index_a, index_b, bd_scale=1, mx=255):
    """Chroma: p/q [..., 2]."""
    alpha = jnp.asarray(_ALPHA)[index_a] * bd_scale
    beta = jnp.asarray(_BETA)[index_b] * bd_scale
    p0, p1 = p[..., 0], p[..., 1]
    q0, q1 = q[..., 0], q[..., 1]
    filt = (
        (bs > 0)
        & (jnp.abs(p0 - q0) < alpha)
        & (jnp.abs(p1 - p0) < beta)
        & (jnp.abs(q1 - q0) < beta)
    )
    tc = jnp.asarray(_TC0)[index_a, jnp.clip(bs, 1, 3) - 1] * bd_scale + 1
    delta = jnp.clip((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc)
    p0_w = jnp.clip(p0 + delta, 0, mx)
    q0_w = jnp.clip(q0 - delta, 0, mx)
    p0_s = (2 * p1 + p0 + q1 + 2) >> 2
    q0_s = (2 * q1 + q0 + p1 + 2) >> 2
    is4 = bs == 4
    new_p0 = jnp.where(filt, jnp.where(is4, p0_s, p0_w), p0)
    new_q0 = jnp.where(filt, jnp.where(is4, q0_s, q0_w), q0)
    return (
        jnp.stack([new_p0, p1], axis=-1),
        jnp.stack([new_q0, q1], axis=-1),
    )


def deblock_frame_tpu(
    y: jnp.ndarray,  # [H, W] uint8
    cb: jnp.ndarray,  # [Hc, Wc] uint8
    cr: jnp.ndarray,
    prep: dict,  # host-precomputed per-edge params (pipeline/deblock_prep.py)
    mb_h: int,
    mb_w: int,
    halo=None,  # optional (hy [4, W], hcb [4, Wc], hcr [4, Wc]): the fully
    #             filtered bottom rows of the band above. When given, they
    #             seed the top padding so MB row 0's top edges filter across
    #             the band boundary, and the function ALSO returns the
    #             (possibly modified) halo rows for the caller to paste back
    #             into the band above (row-band sharding, dist/sharded.py).
    ch_h: int = 8,  # chroma MB height in samples: 8 (4:2:0) / 16 (4:2:2)
    bd_scale: int = 1,  # 1 << (BitDepth - 8): spec 8.7.2.2 threshold scaling
    mx: int = 255,  # Clip1 ceiling
):
    """Returns filtered (y, cb, cr); with halo, ((y, cb, cr), halo')."""
    H, W = mb_h * 16, mb_w * 16
    Hc, Wc = mb_h * ch_h, mb_w * 8
    cf2 = ch_h == 16
    # bottom scratch strip: inactive wavefront slots gather/scatter there so
    # their (identity) writes can never collide with live patches
    yp = jnp.pad(y.astype(jnp.int32), ((LPAD, 24), (LPAD, 0)))
    cbp = jnp.pad(cb.astype(jnp.int32), ((LPAD, ch_h + 8), (LPAD, 0)))
    crp = jnp.pad(cr.astype(jnp.int32), ((LPAD, ch_h + 8), (LPAD, 0)))
    if halo is not None:
        hy, hcb, hcr = halo
        yp = yp.at[0:LPAD, LPAD:].set(hy.astype(jnp.int32))
        cbp = cbp.at[0:LPAD, LPAD:].set(hcb.astype(jnp.int32))
        crp = crp.at[0:LPAD, LPAD:].set(hcr.astype(jnp.int32))

    bs_v = jnp.asarray(prep["bs_v"])  # [H4, W4]
    bs_h = jnp.asarray(prep["bs_h"])
    # 4:2:2 chroma horizontal edges ignore the luma 8x8-transform edge
    # suppression (separate grid from the prep)
    bs_hc = jnp.asarray(prep["bs_hc"]) if cf2 else bs_h
    ia_v = jnp.asarray(prep["ia_v"])
    ib_v = jnp.asarray(prep["ib_v"])
    ia_h = jnp.asarray(prep["ia_h"])
    ib_h = jnp.asarray(prep["ib_h"])
    # chroma thresholds per component, at luma-cell granularity of the edge
    ca_v = jnp.asarray(prep["ca_v"])  # [2, H4, W4]
    cb_v = jnp.asarray(prep["cb_v"])
    ca_h = jnp.asarray(prep["ca_h"])
    cb_h = jnp.asarray(prep["cb_h"])

    n_slots = mb_h
    n_diag = mb_w + 2 * mb_h - 1
    mbys = jnp.arange(n_slots)

    def step(d, state):
        yp, cbp, crp = state
        mbxs = d - 2 * mbys
        valid = (mbxs >= 0) & (mbxs < mb_w)
        mbx = jnp.clip(mbxs, 0, mb_w - 1)
        # ---- gather patches: luma [slots, 20, 20], chroma [slots, 2, 12, 12]
        # (inactive slots are routed into the bottom scratch strip)
        ly0 = jnp.where(valid, mbys * 16, LPAD + H)
        lx0 = jnp.where(valid, mbx * 16, 0)
        ry = ly0[:, None, None] + jnp.arange(20)[None, :, None]
        rx = lx0[:, None, None] + jnp.arange(20)[None, None, :]
        patch = yp[ry, rx]  # [slots, 20, 20]
        cy0 = jnp.where(valid, mbys * ch_h, LPAD + Hc)
        cx0 = jnp.where(valid, mbx * 8, 0)
        cry = cy0[:, None, None] + jnp.arange(LPAD + ch_h)[None, :, None]
        crx = cx0[:, None, None] + jnp.arange(12)[None, None, :]
        cpatch = jnp.stack(
            [cbp[cry, crx], crp[cry, crx]], axis=1
        )  # [s, 2, LPAD+ch_h, 12]

        # per-MB cell coordinates for parameter lookup
        c4y = mbys[:, None] * 4 + jnp.arange(4)[None, :]  # [s, 4]
        c4x = mbx[:, None] * 4 + jnp.arange(4)[None, :]

        # ---- vertical luma edges e = 0..3 at local X = 4 + 4e
        for e in range(4):
            X = LPAD + 4 * e
            bs_cells = bs_v[c4y, c4x[:, e : e + 1]]  # [s, 4]
            bs_lines = jnp.repeat(bs_cells, 4, axis=1)  # [s, 16]
            ia = jnp.repeat(ia_v[c4y, c4x[:, e : e + 1]], 4, axis=1)
            ib = jnp.repeat(ib_v[c4y, c4x[:, e : e + 1]], 4, axis=1)
            rows = patch[:, LPAD : LPAD + 16, :]  # [s, 16, 20]
            p = jnp.stack([rows[:, :, X - 1 - k] for k in range(4)], axis=-1)
            q = jnp.stack([rows[:, :, X + k] for k in range(4)], axis=-1)
            p, q = _filter_luma(p, q, bs_lines, ia, ib, bd_scale, mx)
            for k in range(4):
                patch = patch.at[:, LPAD : LPAD + 16, X - 1 - k].set(p[..., k])
                patch = patch.at[:, LPAD : LPAD + 16, X + k].set(q[..., k])
            # chroma vertical edges ride luma edges 0 and 2. 4:2:0 chroma
            # line j uses luma cell row j//2; 4:2:2 chroma rows map 1:1 to
            # the 16 luma sample lines
            if e in (0, 2):
                CX = LPAD + 2 * e
                rep = ch_h // 4  # lines per luma cell row (2 / 4)
                cbs_lines = jnp.repeat(bs_cells, rep, axis=1)  # [s, ch_h]
                for comp in range(2):
                    cia = jnp.repeat(ca_v[comp][c4y, c4x[:, e : e + 1]], rep, axis=1)
                    cib = jnp.repeat(cb_v[comp][c4y, c4x[:, e : e + 1]], rep, axis=1)
                    crows = cpatch[:, comp, LPAD : LPAD + ch_h, :]
                    p = jnp.stack([crows[:, :, CX - 1 - k] for k in range(2)], axis=-1)
                    q = jnp.stack([crows[:, :, CX + k] for k in range(2)], axis=-1)
                    p, q = _filter_chroma(p, q, cbs_lines, cia, cib, bd_scale, mx)
                    cpatch = cpatch.at[:, comp, LPAD : LPAD + ch_h, CX - 1].set(p[..., 0])
                    cpatch = cpatch.at[:, comp, LPAD : LPAD + ch_h, CX].set(q[..., 0])

        # ---- horizontal luma edges at local Y = 4 + 4e
        for e in range(4):
            Y = LPAD + 4 * e
            bs_cells = bs_h[c4y[:, e : e + 1], c4x]  # [s, 4]
            bs_lines = jnp.repeat(bs_cells, 4, axis=1)
            ia = jnp.repeat(ia_h[c4y[:, e : e + 1], c4x], 4, axis=1)
            ib = jnp.repeat(ib_h[c4y[:, e : e + 1], c4x], 4, axis=1)
            cols = patch[:, :, LPAD : LPAD + 16]  # [s, 20, 16]
            p = jnp.stack([cols[:, Y - 1 - k, :] for k in range(4)], axis=-1)
            q = jnp.stack([cols[:, Y + k, :] for k in range(4)], axis=-1)
            p, q = _filter_luma(p, q, bs_lines, ia, ib, bd_scale, mx)
            for k in range(4):
                patch = patch.at[:, Y - 1 - k, LPAD : LPAD + 16].set(p[..., k])
                patch = patch.at[:, Y + k, LPAD : LPAD + 16].set(q[..., k])
            # 4:2:2 chroma has a transform boundary every 4 chroma rows =
            # every 4 LUMA rows, so ALL four edge positions carry chroma
            # filtering (at chroma row e * ch_h/4); 4:2:0 only 0 and 2
            if cf2 or e in (0, 2):
                CY = LPAD + (ch_h // 4) * e
                cbs_cells = (
                    bs_hc[c4y[:, e : e + 1], c4x] if cf2 else bs_cells
                )
                cbs_lines = jnp.repeat(cbs_cells, 2, axis=1)  # 8 cols = [::2]
                for comp in range(2):
                    cia = jnp.repeat(ca_h[comp][c4y[:, e : e + 1], c4x], 2, axis=1)
                    cib = jnp.repeat(cb_h[comp][c4y[:, e : e + 1], c4x], 2, axis=1)
                    ccols = cpatch[:, comp, :, LPAD : LPAD + 8]
                    p = jnp.stack([ccols[:, CY - 1 - k, :] for k in range(2)], axis=-1)
                    q = jnp.stack([ccols[:, CY + k, :] for k in range(2)], axis=-1)
                    p, q = _filter_chroma(p, q, cbs_lines, cia, cib, bd_scale, mx)
                    cpatch = cpatch.at[:, comp, CY - 1, LPAD : LPAD + 8].set(p[..., 0])
                    cpatch = cpatch.at[:, comp, CY, LPAD : LPAD + 8].set(q[..., 0])

        # ---- scatter back (invalid slots write into an unused scratch area:
        # route them onto their own gather coords but masked to original vals)
        patch = jnp.where(valid[:, None, None], patch, yp[ry, rx])
        cpatch = jnp.where(
            valid[:, None, None, None],
            cpatch,
            jnp.stack([cbp[cry, crx], crp[cry, crx]], axis=1),
        )
        yp = yp.at[ry, rx].set(patch)
        cbp = cbp.at[cry, crx].set(cpatch[:, 0])
        crp = crp.at[cry, crx].set(cpatch[:, 1])
        return yp, cbp, crp

    # only walk diagonals whose MBs have any nonzero-strength edge (an MB
    # with all bs == 0 is an identity patch write — skipping it is exact);
    # the row-band sharded step relies on this to make the masked (inactive-
    # shard) invocations free: zeroed bs grids collapse the loop to nothing
    cell_any = (bs_v > 0) | (bs_h > 0) | (bs_hc > 0)
    mb_any = cell_any.reshape(mb_h, 4, mb_w, 4).any(axis=(1, 3))
    d_grid = jnp.arange(mb_w)[None, :] + 2 * jnp.arange(mb_h)[:, None]
    lo = jnp.min(jnp.where(mb_any, d_grid, n_diag))
    hi = jnp.max(jnp.where(mb_any, d_grid, -1)) + 1
    lo = jnp.minimum(lo, hi)
    yp, cbp, crp = jax.lax.fori_loop(lo, hi, step, (yp, cbp, crp))
    odt = jnp.uint8 if mx == 255 else jnp.uint16
    out = (
        yp[LPAD : LPAD + H, LPAD:].astype(odt),
        cbp[LPAD : LPAD + Hc, LPAD:].astype(odt),
        crp[LPAD : LPAD + Hc, LPAD:].astype(odt),
    )
    if halo is None:
        return out
    ret = (
        yp[0:LPAD, LPAD:].astype(odt),
        cbp[0:LPAD, LPAD:].astype(odt),
        crp[0:LPAD, LPAD:].astype(odt),
    )
    return out, ret
