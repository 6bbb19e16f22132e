"""Device-side derivation of deblock edge parameters (jnp twin of
pipeline/deblock_prep.py) — fused into the frame pipeline so the host
doesn't spend per-frame numpy time on it.

Inputs are the small per-MB tensors already on device plus the per-cell
MV grid; outputs feed kernels/deblock.deblock_frame_tpu directly.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .transform import CHROMA_QP_TAB


def _mb_to_cells(a, mb_h, mb_w):
    return jnp.broadcast_to(
        a.reshape(mb_h, 1, mb_w, 1), (mb_h, 4, mb_w, 4)
    ).reshape(mb_h * 4, mb_w * 4)


def _part_to_cells(a, mb_h, mb_w):
    g = a.reshape(mb_h, mb_w, 2, 2).transpose(0, 2, 1, 3)
    return jnp.broadcast_to(
        g.reshape(mb_h, 2, 1, mb_w, 2, 1), (mb_h, 2, 2, mb_w, 2, 2)
    ).reshape(mb_h * 4, mb_w * 4)


def _shift(a, dy, dx):
    out = a
    if dx == -1:
        out = jnp.concatenate([out[:, :1], out[:, :-1]], axis=1)
    if dy == -1:
        out = jnp.concatenate([out[:1], out[:-1]], axis=0)
    return out


def _cqp(qp, offset):
    qpi = jnp.clip(qp + offset, 0, 51)
    return jnp.asarray(CHROMA_QP_TAB)[qpi]


def deblock_prep_device(
    mb_cls,       # [nMB] int32
    qp_mb,        # [nMB] int32
    t8_mb,        # [nMB] bool
    slice_mb,     # [nMB] int32
    disable_mb,   # [nMB] int32
    aoff_mb,      # [nMB] int32
    boff_mb,      # [nMB] int32
    nnz,          # [H4, W4] int32 (>0 = coded 4x4 cell)
    ref_pic,      # [nMB, 2, 4] int32
    mv,           # [2, H4, W4, 2] int32 (per-cell final MVs)
    qp_offsets,   # (cb_off, cr_off)
    mb_h: int,
    mb_w: int,
    slot_cells=None,  # optional precomputed [2, H4, W4] ref slots: skips the
                      # device-side _part_to_cells transpose (measured ~18 ms
                      # per [mb_h, mb_w, 4, 4] relayout at 1080p)
    chroma_all_h_edges: bool = False,  # 4:2:2: also emit "bs_hc", the
                      # horizontal bS WITHOUT the 8x8-transform suppression
                      # (chroma has a transform boundary every 4 luma rows)
) -> dict:
    H4, W4 = mb_h * 4, mb_w * 4
    cls = _mb_to_cells(mb_cls, mb_h, mb_w)
    intra = cls < 3
    qp = _mb_to_cells(qp_mb, mb_h, mb_w)
    # chroma-QP table lookups at MB resolution (nMB indices) and broadcast:
    # the same lookups at cell resolution were ~1 ms gathers EACH at 1080p
    # (8 per frame, device trace); the table map is per-MB anyway
    cqp_cells = [
        _mb_to_cells(_cqp(qp_mb, off), mb_h, mb_w) for off in qp_offsets
    ]
    t8 = _mb_to_cells(t8_mb, mb_h, mb_w)
    slc = _mb_to_cells(slice_mb, mb_h, mb_w)
    disable = _mb_to_cells(disable_mb, mb_h, mb_w)
    a_off = _mb_to_cells(aoff_mb, mb_h, mb_w)
    b_off = _mb_to_cells(boff_mb, mb_h, mb_w)
    nz = nnz > 0
    blk8 = nz.reshape(mb_h * 2, 2, mb_w * 2, 2).any(axis=(1, 3))
    nnz8 = jnp.repeat(jnp.repeat(blk8, 2, 0), 2, 1)
    coded = jnp.where(t8, nnz8, nz)

    if slot_cells is not None:
        r = [slot_cells[0], slot_cells[1]]
    else:
        r = [_part_to_cells(ref_pic[:, lst, :], mb_h, mb_w) for lst in range(2)]
    u = [r[0] >= 0, r[1] >= 0]
    mx = [mv[0, ..., 0], mv[1, ..., 0]]
    my = [mv[0, ..., 1], mv[1, ..., 1]]

    prep = {}
    for direction in ("v", "h"):
        if direction == "v":
            dy, dx = 0, -1
            pos = jnp.broadcast_to(jnp.arange(W4) % 4, (H4, W4))
            at_edge = jnp.broadcast_to(jnp.arange(W4) == 0, (H4, W4))
        else:
            dy, dx = -1, 0
            pos = jnp.broadcast_to((jnp.arange(H4) % 4)[:, None], (H4, W4))
            at_edge = jnp.broadcast_to((jnp.arange(H4) == 0)[:, None], (H4, W4))

        u0p, u1p = _shift(u[0], dy, dx), _shift(u[1], dy, dx)
        np_ = u0p.astype(jnp.int32) + u1p
        nq = u[0].astype(jnp.int32) + u[1]
        r0p, r1p = _shift(r[0], dy, dx), _shift(r[1], dy, dx)
        mx0p, my0p = _shift(mx[0], dy, dx), _shift(my[0], dy, dx)
        mx1p, my1p = _shift(mx[1], dy, dx), _shift(my[1], dy, dx)

        def far(ax, ay, bx, by):
            return (jnp.abs(ax - bx) >= 4) | (jnp.abs(ay - by) >= 4)

        bs = (np_ != nq).astype(jnp.int32)
        single = (np_ == 1) & (nq == 1)
        sp_r = jnp.where(u0p, r0p, r1p)
        sq_r = jnp.where(u[0], r[0], r[1])
        sp_mx = jnp.where(u0p, mx0p, mx1p)
        sp_my = jnp.where(u0p, my0p, my1p)
        sq_mx = jnp.where(u[0], mx[0], mx[1])
        sq_my = jnp.where(u[0], my[0], my[1])
        bs = jnp.where(
            single & ((sp_r != sq_r) | far(sp_mx, sp_my, sq_mx, sq_my)), 1, bs
        )
        bi = (np_ == 2) & (nq == 2)
        sets_eq = ((r0p == r[0]) & (r1p == r[1])) | ((r0p == r[1]) & (r1p == r[0]))
        bs = jnp.where(bi & ~sets_eq, 1, bs)
        same_ref = r0p == r1p
        straight = ~far(mx0p, my0p, mx[0], my[0]) & ~far(mx1p, my1p, mx[1], my[1])
        crossed = ~far(mx0p, my0p, mx[1], my[1]) & ~far(mx1p, my1p, mx[0], my[0])
        bs = jnp.where(bi & sets_eq & same_ref & ~(straight | crossed), 1, bs)
        d_ok = jnp.where(r0p == r[0], straight, crossed)
        bs = jnp.where(bi & sets_eq & ~same_ref & ~d_ok, 1, bs)

        p_intra = _shift(intra, dy, dx)
        p_coded = _shift(coded, dy, dx)
        p_slice = _shift(slc, dy, dx)
        p_qp = _shift(qp, dy, dx)
        mb_boundary = pos == 0
        bs = jnp.where(coded | p_coded, 2, bs)
        bs = jnp.where(intra | p_intra, jnp.where(mb_boundary, 4, 3), bs)
        common = (disable != 1) & ~(
            (disable == 2) & mb_boundary & (p_slice != slc)
        )
        exists = jnp.where(mb_boundary, ~at_edge, jnp.where(t8, pos == 2, True))
        if direction == "h" and chroma_all_h_edges:
            exists_c = jnp.where(mb_boundary, ~at_edge, True) & common
            prep["bs_hc"] = jnp.where(exists_c, bs, 0)
        bs = jnp.where(exists & common, bs, 0)

        qp_av = (p_qp + qp + 1) >> 1
        prep[f"bs_{direction}"] = bs
        prep[f"ia_{direction}"] = jnp.clip(qp_av + a_off, 0, 51)
        prep[f"ib_{direction}"] = jnp.clip(qp_av + b_off, 0, 51)
        ca, cbt = [], []
        for cq in cqp_cells:
            qpc_av = (_shift(cq, dy, dx) + cq + 1) >> 1
            ca.append(jnp.clip(qpc_av + a_off, 0, 51))
            cbt.append(jnp.clip(qpc_av + b_off, 0, 51))
        prep[f"ca_{direction}"] = jnp.stack(ca)
        prep[f"cb_{direction}"] = jnp.stack(cbt)
    return prep


def _blk_to_cells(a, mb_h, mb_w):
    """[nMB, 16] (raster 4x4 within MB) -> [4*mb_h, 4*mb_w] (jnp twin of
    pipeline/deblock_prep._blk_to_cells)."""
    return (
        a.reshape(mb_h, mb_w, 4, 4).transpose(0, 2, 1, 3).reshape(mb_h * 4, mb_w * 4)
    )


def expand_slot_mv(slot_parts, mv_parts, is_intra, mb_h, mb_w):
    """Expand compact per-MB motion arrays to per-cell grids on device:
    slot_parts [n,2,4] int8 -> slot [2,H4,W4] i32 (intra cells forced -1),
    mv_parts [n,2,16,2] int16 -> mv [2,H4,W4,2] i32. The compact form is
    what crosses the (slow) host->device link."""
    intra_cell = _mb_to_cells(is_intra, mb_h, mb_w)
    sp = slot_parts.astype(jnp.int32)
    mp = mv_parts.astype(jnp.int32)
    slot = jnp.stack(
        [
            jnp.where(intra_cell, -1, _part_to_cells(sp[:, lst], mb_h, mb_w))
            for lst in range(2)
        ]
    )
    mv = jnp.stack(
        [
            jnp.stack(
                [_blk_to_cells(mp[:, lst, :, c], mb_h, mb_w) for c in range(2)],
                axis=-1,
            )
            for lst in range(2)
        ]
    )
    return slot, mv
