"""B-slice direct motion derivation, spec 8.4.1.2 (spatial and temporal),
shared by B_Skip, B_Direct_16x16 and B_Direct_8x8.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .mv_pred import MotionContext


def _min_positive(a: int, b: int) -> int:
    """spec 8-206: min of the two when both >= 0, else the max."""
    if a >= 0 and b >= 0:
        return min(a, b)
    return max(a, b)


@dataclass
class DirectContext:
    """Per-slice inputs for direct derivation."""

    col_mv: np.ndarray | None  # colPic (RefPicList1[0]) colocated grids
    col_ref_idx: np.ndarray | None
    col_ref_uid: np.ndarray | None
    col_is_short_term: bool
    col_poc: int
    l0_uids: list  # uid per list0 index
    l0_pocs: list
    l0_long_term: list
    l1_pocs: list
    cur_poc: int
    spatial: bool
    direct_8x8_inference: bool
    # MBAFF (8.4.1.2.1 AFRM cases): current picture tensors, the colocated
    # picture's per-MB field flags, and its field order counts
    cur_ft: object = None
    col_mb_field: np.ndarray | None = None
    col_top_poc: int = 0
    col_bottom_poc: int = 0

    def ref_idx_l0_of_uid(self, uid: int) -> int:
        """Lowest list0 index referring to the given picture (8.4.1.2.3)."""
        for i, u in enumerate(self.l0_uids):
            if u == uid:
                return i
        return 0


# corner 4x4 cell of each 8x8 quadrant used under direct_8x8_inference
_INFER_CORNER = ((0, 0), (3, 0), (0, 3), (3, 3))


def derive_direct(
    motion: MotionContext,
    ctx: DirectContext,
    bx0: int,
    by0: int,
) -> list:
    """Derive direct MVs for the four 8x8 quadrants of the MB whose top-left
    4x4 cell is (bx0, by0). Returns a list of 4 quadrant dicts:
    {cells: [(cx, cy, mv0, ref0, mv1, ref1)]} with ref < 0 meaning the list
    is unused for that quadrant."""
    if ctx.spatial:
        return _spatial_direct(motion, ctx, bx0, by0)
    return _temporal_direct(motion, ctx, bx0, by0)


def _col_cell(ctx: DirectContext, cx: int, cy: int, q: int, bx0: int, by0: int):
    """Pick the colocated 4x4 cell (8.4.1.2.1): corner of the quadrant under
    direct_8x8_inference, else the same cell."""
    if ctx.direct_8x8_inference:
        dx, dy = _INFER_CORNER[q]
        return bx0 + dx, by0 + dy
    return cx, cy


def _col_motion(ctx: DirectContext, ccx: int, ccy: int):
    """(refIdxCol, mvCol) for the colocated cell of current spatial-local
    cell (ccx, ccy) — the 8.4.1.2.1 AFRM frame/field crossings: the col
    grids are in the col picture's own spatial-local layout and per-MB
    units; vertMvScale converts Frm<->Fld vertical units. Returns
    (None, None) when no colocated data exists."""
    if ctx.col_ref_idx is None:
        return None, None
    ft = ctx.cur_ft
    mb_w = ft.mb_w if ft is not None else 0
    if ft is None or not getattr(ft, "mbaff", False):
        return int(ctx.col_ref_idx[ccy, ccx]), ctx.col_mv[ccy, ccx]
    addr = (ccy // 4) * mb_w + (ccx // 4)
    row = addr // mb_w
    pr, par = row // 2, row & 1
    ly = ccy - row * 4
    cur_fld = bool(ft.mb_field[addr])
    cfa = ctx.col_mb_field
    pair_top = 2 * pr * mb_w + (addr % mb_w)

    def grid_at(col_addr, cell_row):
        gy = (col_addr // mb_w) * 4 + cell_row
        return int(ctx.col_ref_idx[gy, ccx]), ctx.col_mv[gy, ccx]

    col_pair_fld = bool(cfa[pair_top]) if cfa is not None else False
    if cur_fld == col_pair_fld:
        # same coding: colocated MB is the same spatial slot, same units
        return int(ctx.col_ref_idx[ccy, ccx]), ctx.col_mv[ccy, ccx]
    if cur_fld:
        # current FIELD, colocated FRAME pair (Frm_To_Fld): picture strip
        # row 8*ly + par selects the top/bottom frame MB; vertical halves
        s = 8 * ly + par
        col_addr = pair_top + (mb_w if s >= 16 else 0)
        cref, cmv = grid_at(col_addr, (s % 16) >> 2)
        vy = int(cmv[1])
        return cref, (int(cmv[0]), vy // 2 if vy >= 0 else -((-vy) // 2))
    # current FRAME, colocated FIELD pair (Fld_To_Frm): the field whose POC
    # is closer to the current picture; field row = strip row / 2; vertical
    # doubles
    par_sel = (
        1
        if abs(ctx.col_bottom_poc - ctx.cur_poc)
        < abs(ctx.col_top_poc - ctx.cur_poc)
        else 0
    )
    s = 16 * par + 4 * ly
    col_addr = pair_top + (mb_w if par_sel else 0)
    cref, cmv = grid_at(col_addr, (s >> 1) >> 2)
    return cref, (int(cmv[0]), int(cmv[1]) * 2)


def _spatial_direct(motion: MotionContext, ctx: DirectContext, bx0, by0):
    """8.4.1.2.2: spatial direct."""
    # MinPositive over the 16x16 partition neighbors, per list
    refs = []
    mvps = []
    for lst in range(2):
        (a_mv, a_ref), (b_mv, b_ref), (c_mv, c_ref) = motion.neighbors(
            lst, bx0, by0, 4
        )
        r = _min_positive(a_ref, _min_positive(b_ref, c_ref))
        r = max(r, -1)  # UNAVAILABLE counts as no-reference
        refs.append(r)
        mvps.append(
            motion.predict(lst, r, bx0, by0, 4, 4) if r >= 0 else (0, 0)
        )
    direct_zero = refs[0] < 0 and refs[1] < 0
    if direct_zero:
        refs = [0, 0]
        mvps = [(0, 0), (0, 0)]
    out = []
    for q in range(4):
        qx, qy = bx0 + (q % 2) * 2, by0 + (q // 2) * 2
        cells = []
        for sy in range(2):
            for sx in range(2):
                cx, cy = qx + sx, qy + sy
                ccx, ccy = _col_cell(ctx, cx, cy, q, bx0, by0)
                col_zero = False
                if (
                    not direct_zero
                    and ctx.col_ref_idx is not None
                    and ctx.col_is_short_term
                ):
                    cref, cmv = _col_motion(ctx, ccx, ccy)
                    col_zero = (
                        cref == 0 and abs(int(cmv[0])) <= 1 and abs(int(cmv[1])) <= 1
                    )
                cell = [cx, cy, (0, 0), -1, (0, 0), -1]
                for lst in range(2):
                    if refs[lst] >= 0:
                        mv = (0, 0) if (col_zero and refs[lst] == 0 and not direct_zero) else mvps[lst]
                        if direct_zero:
                            mv = (0, 0)
                        cell[2 + 2 * lst] = mv
                        cell[3 + 2 * lst] = refs[lst]
                cells.append(tuple(cell))
        out.append(cells)
    return out


def _temporal_direct(motion: MotionContext, ctx: DirectContext, bx0, by0):
    """8.4.1.2.3: temporal direct (POC-distance scaled colocated vectors)."""
    ft = ctx.cur_ft
    if ft is not None and getattr(ft, "mbaff", False) and ft.mb_field.any():
        # field POC pairing + Fld/Frm vector scaling for temporal direct is
        # not wired; encoders use spatial direct for interlaced content
        # (x264 forces it) — gate rather than mis-decode
        raise NotImplementedError("temporal direct in MBAFF field pictures")
    out = []
    for q in range(4):
        qx, qy = bx0 + (q % 2) * 2, by0 + (q // 2) * 2
        cells = []
        for sy in range(2):
            for sx in range(2):
                cx, cy = qx + sx, qy + sy
                ccx, ccy = _col_cell(ctx, cx, cy, q, bx0, by0)
                if ctx.col_ref_idx is None or int(ctx.col_ref_idx[ccy, ccx]) < 0:
                    # colocated intra: refIdxL0 = 0, mvCol = 0
                    ref0 = 0
                    mv_col = (0, 0)
                    ref_uid = ctx.l0_uids[0] if ctx.l0_uids else -1
                else:
                    mv_col = (
                        int(ctx.col_mv[ccy, ccx, 0]),
                        int(ctx.col_mv[ccy, ccx, 1]),
                    )
                    ref_uid = int(ctx.col_ref_uid[ccy, ccx])
                    ref0 = ctx.ref_idx_l0_of_uid(ref_uid)
                poc0 = ctx.l0_pocs[ref0]
                lt0 = ctx.l0_long_term[ref0]
                poc1 = ctx.col_poc
                if lt0 or poc1 == poc0:
                    mv0 = mv_col
                    mv1 = (0, 0)
                else:
                    tb = _clip3(-128, 127, ctx.cur_poc - poc0)
                    td = _clip3(-128, 127, poc1 - poc0)
                    tx = (16384 + abs(td) // 2) // td if td > 0 else -(
                        (16384 + abs(td) // 2) // -td
                    )
                    dsf = _clip3(-1024, 1023, (tb * tx + 32) >> 6)
                    mv0 = (
                        (dsf * mv_col[0] + 128) >> 8,
                        (dsf * mv_col[1] + 128) >> 8,
                    )
                    mv1 = (mv0[0] - mv_col[0], mv0[1] - mv_col[1])
                cells.append((cx, cy, mv0, ref0, mv1, 0))
        out.append(cells)
    return out


def _clip3(lo, hi, v):
    return lo if v < lo else hi if v > hi else v
