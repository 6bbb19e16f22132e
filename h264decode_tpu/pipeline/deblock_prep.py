"""Vectorized (numpy) derivation of per-edge deblocking parameters from
FrameTensors: boundary strengths (spec 8.7.2.1) and threshold indices
(8.7.2.2) for every 4x4 cell edge at once. Output feeds the device kernel
kernels/deblock.py; bit-exact against the per-line oracle pipeline/deblock.py.
"""

from __future__ import annotations

import numpy as np

from ..syntax.pps import PPS
from ..syntax.sps import SPS
from ..tensors.frame_tensors import MB_P, FrameTensors
from .reference_recon import CHROMA_QP_TABLE


def _chroma_qp_vec(qp, offset):
    qpi = np.clip(qp.astype(np.int32) + offset, 0, 51)
    return np.where(qpi < 30, qpi, CHROMA_QP_TABLE[np.clip(qpi - 30, 0, 21)])


def _per_cell(ft: FrameTensors):
    """Expand per-MB/part data to per-4x4-cell grids [H4, W4]."""
    mb_h, mb_w = ft.mb_h, ft.mb_w
    H4, W4 = mb_h * 4, mb_w * 4
    cell_mb = (np.arange(H4)[:, None] // 4) * mb_w + (np.arange(W4)[None, :] // 4)
    # part index within MB per cell
    py = (np.arange(H4) % 4) // 2
    px = (np.arange(W4) % 4) // 2
    part = py[:, None] * 2 + px[None, :]
    blk = (np.arange(H4) % 4)[:, None] * 4 + (np.arange(W4) % 4)[None, :]
    out = {
        "mb": cell_mb,
        "cls": ft.mb_class[cell_mb],
        "qp": ft.qp[cell_mb].astype(np.int32),
        "t8": ft.transform_8x8[cell_mb],
        "slice": ft.slice_id[cell_mb],
        "disable": ft.disable_deblock[cell_mb],
        "a_off": ft.alpha_off[cell_mb].astype(np.int32),
        "b_off": ft.beta_off[cell_mb].astype(np.int32),
    }
    for lst in range(2):
        out[f"refpic{lst}"] = ft.ref_pic[cell_mb, lst, part]
        out[f"mvx{lst}"] = ft.mv[cell_mb, lst, blk, 0].astype(np.int32)
        out[f"mvy{lst}"] = ft.mv[cell_mb, lst, blk, 1].astype(np.int32)
    # effective coded status (8x8 transform: OR over the covering 8x8 block)
    nnz = ft.luma_nnz > 0
    blk8 = nnz.reshape(mb_h * 2, 2, mb_w * 2, 2).any(axis=(1, 3))
    nnz8 = np.repeat(np.repeat(blk8, 2, 0), 2, 1)
    out["coded"] = np.where(out["t8"], nnz8, nnz)
    return out


def _mv_bs(c, off_y, off_x):
    """bS in {0,1} from motion data between each cell and its neighbor at
    (y+off_y, x+off_x) (edges where residual/intra rules didn't fire)."""
    H4, W4 = c["mb"].shape

    def roll(a):
        return np.roll(np.roll(a, -off_y, axis=0), -off_x, axis=1)

    # P = neighbor (off side), Q = current cell at the rolled position:
    # compare cell (y,x) [P] with cell (y+off, x+off) [Q] -> store at Q.
    u0p, u0q = c["refpic0"] >= 0, roll(c["refpic0"]) >= 0
    u1p, u1q = c["refpic1"] >= 0, roll(c["refpic1"]) >= 0
    np_, nq = u0p.astype(np.int32) + u1p, u0q.astype(np.int32) + u1q
    r0p, r1p = c["refpic0"], c["refpic1"]
    r0q, r1q = roll(c["refpic0"]), roll(c["refpic1"])
    mv = {
        (l, 0): (c[f"mvx{l}"], c[f"mvy{l}"]) for l in range(2)
    }
    mx0p, my0p = c["mvx0"], c["mvy0"]
    mx1p, my1p = c["mvx1"], c["mvy1"]
    mx0q, my0q = roll(c["mvx0"]), roll(c["mvy0"])
    mx1q, my1q = roll(c["mvx1"]), roll(c["mvy1"])

    def far(ax, ay, bx, by):
        return (np.abs(ax - bx) >= 4) | (np.abs(ay - by) >= 4)

    bs = np.zeros((H4, W4), np.int32)
    # different vector counts
    bs = np.where(np_ != nq, 1, bs)
    # single-vector case
    single = (np_ == 1) & (nq == 1)
    sp_r = np.where(u0p, r0p, r1p)
    sq_r = np.where(u0q, r0q, r1q)
    sp_mx = np.where(u0p, mx0p, mx1p)
    sp_my = np.where(u0p, my0p, my1p)
    sq_mx = np.where(u0q, mx0q, mx1q)
    sq_my = np.where(u0q, my0q, my1q)
    bs = np.where(
        single & ((sp_r != sq_r) | far(sp_mx, sp_my, sq_mx, sq_my)), 1, bs
    )
    # bi case
    bi = (np_ == 2) & (nq == 2)
    sets_eq = ((r0p == r0q) & (r1p == r1q)) | ((r0p == r1q) & (r1p == r0q))
    bs = np.where(bi & ~sets_eq, 1, bs)
    same_ref = r0p == r1p
    straight = ~far(mx0p, my0p, mx0q, my0q) & ~far(mx1p, my1p, mx1q, my1q)
    crossed = ~far(mx0p, my0p, mx1q, my1q) & ~far(mx1p, my1p, mx0q, my0q)
    bs = np.where(bi & sets_eq & same_ref & ~(straight | crossed), 1, bs)
    # distinct refs: pair by reference picture
    pair_straight = r0p == r0q
    d_ok = np.where(pair_straight, straight, crossed)
    bs = np.where(bi & sets_eq & ~same_ref & ~d_ok, 1, bs)
    return bs


def prepare_deblock(ft: FrameTensors, sps: SPS, pps: PPS) -> dict:
    """All per-edge parameters for the device deblock kernel."""
    c = _per_cell(ft)
    H4, W4 = c["mb"].shape
    intra = c["cls"] < 3

    prep = {}
    for direction in ("v", "h"):
        if direction == "v":
            off_y, off_x = 0, -1  # P is the cell to the left
            pos = np.tile(np.arange(W4) % 4, (H4, 1))
            at_pic_edge = np.tile(np.arange(W4) == 0, (H4, 1))
        else:
            off_y, off_x = -1, 0
            pos = np.tile((np.arange(H4) % 4)[:, None], (1, W4))
            at_pic_edge = np.tile((np.arange(H4) == 0)[:, None], (1, W4))

        def nb(a):  # neighbor (P-side) value aligned at Q
            return np.roll(a, (-off_y, -off_x), axis=(0, 1))

        mb_boundary = pos == 0
        p_intra = nb(intra)
        p_coded = nb(c["coded"])
        p_slice = nb(c["slice"])
        p_qp = nb(c["qp"])

        bs = np.zeros((H4, W4), np.int32)
        bs_mv = _mv_bs(c, off_y, off_x)
        bs = bs_mv
        bs = np.where(c["coded"] | p_coded, 2, bs)
        bs = np.where(
            (intra | p_intra), np.where(mb_boundary, 4, 3), bs
        )
        # internal-edge existence: t8 MBs only have the mid edge
        exists = np.where(
            mb_boundary,
            ~at_pic_edge,
            np.where(c["t8"], pos == 2, True),
        )
        # slice-level gates (evaluated on the Q MB)
        exists &= c["disable"] != 1
        cross_slice = mb_boundary & (p_slice != c["slice"])
        exists &= ~((c["disable"] == 2) & cross_slice)
        bs = np.where(exists, bs, 0)

        qp_av = (p_qp + c["qp"] + 1) >> 1
        ia = np.clip(qp_av + c["a_off"], 0, 51).astype(np.int32)
        ib = np.clip(qp_av + c["b_off"], 0, 51).astype(np.int32)
        prep[f"bs_{direction}"] = bs
        prep[f"ia_{direction}"] = ia
        prep[f"ib_{direction}"] = ib
        # chroma thresholds (per component)
        ca, cbt = [], []
        for comp, off in enumerate(
            (pps.chroma_qp_index_offset, pps.second_chroma_qp_index_offset)
        ):
            qpc_p = _chroma_qp_vec(p_qp, off)
            qpc_q = _chroma_qp_vec(c["qp"], off)
            qpc_av = (qpc_p + qpc_q + 1) >> 1
            ca.append(np.clip(qpc_av + c["a_off"], 0, 51).astype(np.int32))
            cbt.append(np.clip(qpc_av + c["b_off"], 0, 51).astype(np.int32))
        prep[f"ca_{direction}"] = np.stack(ca)
        prep[f"cb_{direction}"] = np.stack(cbt)
    return prep
