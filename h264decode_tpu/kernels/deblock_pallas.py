"""In-loop deblocking as Pallas TPU kernels (spec 8.7).

The XLA wavefront in kernels/deblock.py spends ~400 ms/frame at 1080p on
254 sequential fori_loop steps, each doing full-plane gathers/scatters in
HBM. These kernels keep the whole frame resident in VMEM and walk
macroblocks in raster order — the spec's own serialization — so every edge
filter is a handful of VPU ops on registers.

TPU/Mosaic constraints shape the design:
  - vector loads/stores need sublane offsets % 8 and lane offsets % 128, so
    planes live in padded canvases (top pad 16/8 rows, left pad 128 lanes)
    and the kernel processes one 128-lane block of MBs per iteration
    (8 luma MBs / 16 chroma MBs) with static in-block offsets;
  - value-level reshapes are unsupported, and scalar extracts must be
    32-bit, so edge parameters ship as (n_blocks, mbs, 128) int32 packs
    read with scalar extracts. QP (hence alpha/beta/tC0 rows of tables
    8-16..8-18) is constant per (MB, edge) — only bS varies per 4x4 cell —
    so each luma edge needs a 4-scalar bS vector plus 5 scalars
    (alpha, beta, tC0[bS=1..3]); tC0 is selected per cell in-kernel.

Exact-order correctness: MBs are processed in raster order; within an MB,
vertical edges left->right then horizontal edges top->bottom, with writes
into the left/top neighbour strips — precisely the spec 8.7 ordering, so
bit-exactness vs the validated XLA/numpy paths follows by construction.
Chroma filtering is data-independent of luma and runs as its own kernel.

Capability note: the reference repo has no loop filter at all (SURVEY.md
section 2); this is new-capability code, built spec-first.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..entropy.deblock_tables import ALPHA, BETA, TC0
from .intra_pallas import _interpret

_ALPHA = np.asarray(ALPHA, np.int32)
_BETA = np.asarray(BETA, np.int32)
_TC0 = np.asarray(TC0, np.int32)


# ---------------------------------------------------------------------------
# edge filter bodies (elementwise over tap vectors; params scalar or vector)
# ---------------------------------------------------------------------------


def _filter_luma_taps(p, q, bs, alpha, beta, tc0):
    """Spec 8.7.2.3/8.7.2.4 on tap lists p[k], q[k] (k=0..3)."""
    p0, p1, p2, p3 = p
    q0, q1, q2, q3 = q
    filt = (
        (bs > 0)
        & (jnp.abs(p0 - q0) < alpha)
        & (jnp.abs(p1 - p0) < beta)
        & (jnp.abs(q1 - q0) < beta)
    )
    ap = jnp.abs(p2 - p0) < beta
    aq = jnp.abs(q2 - q0) < beta
    tc = tc0 + ap.astype(jnp.int32) + aq.astype(jnp.int32)
    delta = jnp.clip((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc)
    p0_w = jnp.clip(p0 + delta, 0, 255)
    q0_w = jnp.clip(q0 - delta, 0, 255)
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
    return (new_p0, new_p1, new_p2), (new_q0, new_q1, new_q2)


def _filter_chroma_taps(p, q, bs, alpha, beta, tc):
    p0, p1 = p
    q0, q1 = q
    filt = (
        (bs > 0)
        & (jnp.abs(p0 - q0) < alpha)
        & (jnp.abs(p1 - p0) < beta)
        & (jnp.abs(q1 - q0) < beta)
    )
    delta = jnp.clip((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc)
    p0_w = jnp.clip(p0 + delta, 0, 255)
    q0_w = jnp.clip(q0 - delta, 0, 255)
    p0_s = (2 * p1 + p0 + q1 + 2) >> 2
    q0_s = (2 * q1 + q0 + p1 + 2) >> 2
    is4 = bs == 4
    new_p0 = jnp.where(filt, jnp.where(is4, p0_s, p0_w), p0)
    new_q0 = jnp.where(filt, jnp.where(is4, q0_s, q0_w), q0)
    return new_p0, new_q0


# ---------------------------------------------------------------------------
# XLA-side parameter packing
# ---------------------------------------------------------------------------


def _mb_blocks(grid, mb_h, mb_w, pad_w):
    """[H4, W4] cell grid -> (mb_h, pad_w, 4, 4) per-MB blocks (zero pad)."""
    g = grid.reshape(mb_h, 4, mb_w, 4).transpose(0, 2, 1, 3)
    if pad_w > mb_w:
        g = jnp.pad(g, ((0, 0), (0, pad_w - mb_w), (0, 0), (0, 0)))
    return g


def _lut(table, idx):
    return jnp.asarray(table)[idx]


def pack_luma_params(prep, mb_h, mb_w, nbx):
    """(nblk, 8, 128) int32 per-MB pack:
    lanes 0..15  bs_v  (cell*4 + edge)
          16..31 bs_h  (edge*4 + cell)
          32..47 packed thresholds: _LV/_LH + param*4 + e with
                 param 0 = alpha|tc0_1<<8|tc0_2<<16|tc0_3<<24, param 1 = beta."""
    pw = nbx * 8
    bsv = _mb_blocks(prep["bs_v"], mb_h, mb_w, pw)  # (mb_h, pw, cell, edge)
    bsh = _mb_blocks(prep["bs_h"], mb_h, mb_w, pw)  # (mb_h, pw, edge, cell)
    parts = [bsv.reshape(mb_h, pw, 16), bsh.reshape(mb_h, pw, 16)]
    for d, blk in (("v", None), ("h", None)):
        ia = _mb_blocks(prep[f"ia_{d}"], mb_h, mb_w, pw)
        ib = _mb_blocks(prep[f"ib_{d}"], mb_h, mb_w, pw)
        # per-(MB, edge) scalars: QP is per-MB so any cell row works; take 0.
        # alpha + the three tC0 rows ride ONE packed-byte lookup (separate
        # 52-entry lookups were ~1 ms gathers each at 1080p, device trace)
        iae = ia[..., 0, :] if d == "v" else ia[..., :, 0]  # (mb_h, pw, 4)
        ibe = ib[..., 0, :] if d == "v" else ib[..., :, 0]
        parts.append(_lut(_A_PACK, iae))
        parts.append(_lut(_BETA, ibe))
    packed = jnp.concatenate(parts, axis=-1)  # (mb_h, pw, 48)
    packed = jnp.pad(packed, ((0, 0), (0, 0), (0, 128 - packed.shape[-1])))
    blk = packed.reshape(mb_h * nbx, 8, 128).astype(jnp.int32)
    # lane 127 of MB 0: any nonzero bS in this 8-MB block — the kernel
    # skips the whole block when clear (identity filters; large skip areas
    # of P/B frames make most blocks free)
    anyf = (blk[:, :, :32] > 0).any(axis=(1, 2))
    return blk.at[:, 0, 127].set(anyf.astype(jnp.int32))


# packed threshold byte layout: alpha | tc0_1<<8 | tc0_2<<16 | tc0_3<<24,
# indexed by index_a (chroma variant stores tC = tC0 + 1)
_A_PACK = _ALPHA | (_TC0[:, 0] << 8) | (_TC0[:, 1] << 16) | (_TC0[:, 2] << 24)
_AC_PACK = _ALPHA | ((_TC0[:, 0] + 1) << 8) | ((_TC0[:, 1] + 1) << 16) | (
    (_TC0[:, 2] + 1) << 24
)

# luma lane bases: [packA, beta] per edge
_LV = 32  # v scalars: lane = _LV + param*4 + e
_LH = 40  # h scalars: lane = _LH + param*4 + e


def pack_chroma_params(prep, mb_h, mb_w, nbx_c):
    """(nblk_c, 16, 128) int32 per-MB pack:
    lanes 0..7   bs_v at luma edges {0,2}: cell*2 + ei
          8..15  bs_h at luma edges {0,2}: ei*4 + cell
          16+    packed scalars: base = 16 + dir*8 + comp*4; lane base+ei =
                 alpha|tc1<<8|tc2<<16|tc3<<24 (tc = tC0+1), base+2+ei = beta."""
    pw = nbx_c * 16
    bsv = _mb_blocks(prep["bs_v"], mb_h, mb_w, pw)[..., :, (0, 2)]
    bsh = _mb_blocks(prep["bs_h"], mb_h, mb_w, pw)[..., (0, 2), :]
    parts = [bsv.reshape(mb_h, pw, 8), bsh.reshape(mb_h, pw, 8)]
    for di, d in enumerate(("v", "h")):
        for comp in range(2):
            ca = _mb_blocks(prep[f"ca_{d}"][comp], mb_h, mb_w, pw)
            cb = _mb_blocks(prep[f"cb_{d}"][comp], mb_h, mb_w, pw)
            cae = ca[..., 0, (0, 2)] if d == "v" else ca[..., (0, 2), 0]
            cbe = cb[..., 0, (0, 2)] if d == "v" else cb[..., (0, 2), 0]
            # alpha + the three tC rows ride one packed-byte lookup
            parts.append(_lut(_AC_PACK, cae))
            parts.append(_lut(_BETA, cbe))
    packed = jnp.concatenate(parts, axis=-1)  # (mb_h, pw, 32)
    packed = jnp.pad(packed, ((0, 0), (0, 0), (0, 128 - packed.shape[-1])))
    blk = packed.reshape(mb_h * nbx_c, 16, 128).astype(jnp.int32)
    anyf = (blk[:, :, :16] > 0).any(axis=(1, 2))
    return blk.at[:, 0, 127].set(anyf.astype(jnp.int32))


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _tc0_vec(bs, t1, t2, t3):
    return jnp.where(bs == 1, t1, jnp.where(bs == 2, t2, t3))


def _make_luma_kernel(n_blk: int, nbx: int):
    import jax.experimental.pallas as pl

    def kernel(p_in, y_in, y_ref):
        # columns/rows are carried full-height (32) at layout offset 0; the
        # 16 rows above the MB are masked off via bs=0 (filter is identity)
        z16 = jnp.zeros((16, 1), jnp.int32)

        def blk(i, _):
            @pl.when(p_in[i, 0, 127] != 0)
            def _do_block():
                _blk_body(i)

            return 0

        def _blk_body(i):
            mby = i // nbx
            bx = i % nbx
            win = y_ref[pl.ds(mby * 16, 32), pl.ds(bx * 128, 256)].astype(jnp.int32)
            carry = [win[:, 124 + k : 125 + k] for k in range(4)]
            segs = [win[:, 0:124]]
            for m in range(8):
                base = 128 + 16 * m
                C = carry + [win[:, base + k : base + k + 1] for k in range(16)]
                for e in range(4):
                    x = 4 + 4 * e
                    bs = jnp.concatenate(
                        [z16]
                        + [
                            jnp.full((4, 1), p_in[i, m, c * 4 + e], jnp.int32)
                            for c in range(4)
                        ],
                        axis=0,
                    )
                    pa = p_in[i, m, _LV + e]
                    al = pa & 255
                    be = p_in[i, m, _LV + 4 + e]
                    t0 = _tc0_vec(
                        bs, (pa >> 8) & 255, (pa >> 16) & 255, (pa >> 24) & 255
                    )
                    p = [C[x - 1 - k] for k in range(4)]
                    q = [C[x + k] for k in range(4)]
                    (np0, np1, np2), (nq0, nq1, nq2) = _filter_luma_taps(
                        p, q, bs, al, be, t0
                    )
                    C[x - 1], C[x - 2], C[x - 3] = np0, np1, np2
                    C[x], C[x + 1], C[x + 2] = nq0, nq1, nq2
                M = jnp.concatenate(C[4:], axis=1)  # (32, 16)
                R = [M[r : r + 1, :] for r in range(32)]
                for e in range(4):
                    y = 16 + 4 * e
                    bs = jnp.concatenate(
                        [
                            jnp.full((1, 4), p_in[i, m, 16 + e * 4 + c], jnp.int32)
                            for c in range(4)
                        ],
                        axis=1,
                    )
                    pa = p_in[i, m, _LH + e]
                    al = pa & 255
                    be = p_in[i, m, _LH + 4 + e]
                    t0 = _tc0_vec(
                        bs, (pa >> 8) & 255, (pa >> 16) & 255, (pa >> 24) & 255
                    )
                    p = [R[y - 1 - k] for k in range(4)]
                    q = [R[y + k] for k in range(4)]
                    (np0, np1, np2), (nq0, nq1, nq2) = _filter_luma_taps(
                        p, q, bs, al, be, t0
                    )
                    R[y - 1], R[y - 2], R[y - 3] = np0, np1, np2
                    R[y], R[y + 1], R[y + 2] = nq0, nq1, nq2
                Mh = jnp.concatenate(R, axis=0)  # (32, 16)
                segs.append(jnp.concatenate(C[0:4], axis=1))
                segs.append(Mh[:, 0:12])
                carry = [Mh[:, 12 + k : 13 + k] for k in range(4)]
            segs.append(jnp.concatenate(carry, axis=1))
            out = jnp.concatenate(segs, axis=1)  # (32, 256)
            y_ref[pl.ds(mby * 16, 32), pl.ds(bx * 128, 256)] = out.astype(jnp.uint8)

        jax.lax.fori_loop(0, n_blk, blk, 0)

    return kernel


def _make_chroma_kernel(n_blk: int, nbx_c: int):
    import jax.experimental.pallas as pl

    def kernel(p_in, cb_in, cr_in, cb_ref, cr_ref):
        z8 = jnp.zeros((8, 1), jnp.int32)

        def blk(i, _):
            @pl.when(p_in[i, 0, 127] != 0)
            def _do_block():
                _blk_body(i)

            return 0

        def _blk_body(i):
            mby = i // nbx_c
            bx = i % nbx_c
            for comp, ref in ((0, cb_ref), (1, cr_ref)):
                win = ref[pl.ds(mby * 8, 16), pl.ds(bx * 128, 256)].astype(jnp.int32)
                carry = [win[:, 126 + k : 127 + k] for k in range(2)]
                segs = [win[:, 0:126]]
                for m in range(16):
                    base = 128 + 8 * m
                    C = carry + [win[:, base + k : base + k + 1] for k in range(8)]
                    for ei in range(2):
                        x = 2 + 4 * ei
                        sb = 16 + 0 * 8 + comp * 4
                        bs = jnp.concatenate(
                            [z8]
                            + [
                                jnp.full((2, 1), p_in[i, m, c * 2 + ei], jnp.int32)
                                for c in range(4)
                            ],
                            axis=0,
                        )
                        pa = p_in[i, m, sb + ei]
                        al = pa & 255
                        be = p_in[i, m, sb + 2 + ei]
                        tc = _tc0_vec(
                            bs, (pa >> 8) & 255, (pa >> 16) & 255,
                            (pa >> 24) & 255
                        )
                        p = [C[x - 1 - k] for k in range(2)]
                        q = [C[x + k] for k in range(2)]
                        np0, nq0 = _filter_chroma_taps(p, q, bs, al, be, tc)
                        C[x - 1] = np0
                        C[x] = nq0
                    M = jnp.concatenate(C[2:], axis=1)  # (16, 8)
                    R = [M[r : r + 1, :] for r in range(16)]
                    for ei in range(2):
                        y = 8 + 4 * ei
                        sb = 16 + 1 * 8 + comp * 4
                        bs = jnp.concatenate(
                            [
                                jnp.full((1, 2), p_in[i, m, 8 + ei * 4 + c], jnp.int32)
                                for c in range(4)
                            ],
                            axis=1,
                        )
                        pa = p_in[i, m, sb + ei]
                        al = pa & 255
                        be = p_in[i, m, sb + 2 + ei]
                        tc = _tc0_vec(
                            bs, (pa >> 8) & 255, (pa >> 16) & 255,
                            (pa >> 24) & 255
                        )
                        p = [R[y - 1 - k] for k in range(2)]
                        q = [R[y + k] for k in range(2)]
                        np0, nq0 = _filter_chroma_taps(p, q, bs, al, be, tc)
                        R[y - 1] = np0
                        R[y] = nq0
                    Mh = jnp.concatenate(R, axis=0)  # (16, 8)
                    segs.append(jnp.concatenate(C[0:2], axis=1))
                    segs.append(Mh[:, 0:6])
                    carry = [Mh[:, 6 + k : 7 + k] for k in range(2)]
                segs.append(jnp.concatenate(carry, axis=1))
                out = jnp.concatenate(segs, axis=1)  # (16, 256)
                ref[pl.ds(mby * 8, 16), pl.ds(bx * 128, 256)] = out.astype(jnp.uint8)

        jax.lax.fori_loop(0, n_blk, blk, 0)

    return kernel


@partial(jax.jit, static_argnums=(4, 5))
def deblock_frame_pallas(y, cb, cr, prep, mb_h: int, mb_w: int):
    """Drop-in for kernels.deblock.deblock_frame_tpu, Pallas raster kernels."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H, W = mb_h * 16, mb_w * 16
    Hc, Wc = mb_h * 8, mb_w * 8
    nbx = -(-mb_w // 8)
    nbx_c = -(-mb_w // 16)
    Wl = 128 + 128 * nbx
    Wcc = 128 + 128 * nbx_c
    yc = jnp.zeros((16 + H + 16, Wl), jnp.uint8).at[16 : 16 + H, 128 : 128 + W].set(y)
    cbc = jnp.zeros((8 + Hc + 8, Wcc), jnp.uint8).at[8 : 8 + Hc, 128 : 128 + Wc].set(cb)
    crc = jnp.zeros((8 + Hc + 8, Wcc), jnp.uint8).at[8 : 8 + Hc, 128 : 128 + Wc].set(cr)
    pl_pack = pack_luma_params(prep, mb_h, mb_w, nbx)
    pc_pack = pack_chroma_params(prep, mb_h, mb_w, nbx_c)

    yo = pl.pallas_call(
        _make_luma_kernel(mb_h * nbx, nbx),
        interpret=_interpret(),
        out_shape=jax.ShapeDtypeStruct(yc.shape, jnp.uint8),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        input_output_aliases={1: 0},
    )(pl_pack, yc)
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
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        input_output_aliases={1: 0, 2: 1},
    )(pc_pack, cbc, crc)
    return (
        yo[16 : 16 + H, 128 : 128 + W],
        cbo[8 : 8 + Hc, 128 : 128 + Wc],
        cro[8 : 8 + Hc, 128 : 128 + Wc],
    )
