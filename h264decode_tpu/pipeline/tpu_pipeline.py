"""The jitted per-frame TPU reconstruction pipeline and its host glue.

ONE XLA program per stream geometry (frame_step) runs the entire device
path for a frame: residual transforms (kernels/transform) -> motion
compensation (kernels/mc) -> intra wavefront (kernels/intra) -> deblocking
(kernels/deblock) -> half-pel reference-plane generation -> in-place DPB
ring update -> packed YUV output plane.

Designed for the measured transport profile of the device link (a
latency-bound tunnel: ~30 ms per transfer roundtrip, uploads ~200 MB/s,
downloads ~25-60 MB/s):
  * every per-frame host tensor ships in a single packed uint8 buffer;
  * the frame's three output planes leave the device as ONE packed
    [H + H/2, W] buffer whose device->host copy starts asynchronously the
    moment the frame is dispatched, overlapping later frames' entropy
    decode and device work;
  * the DPB's half-pel plane stacks never leave the device: frame_step
    updates a donated ring buffer in place;
  * there is exactly ONE compile variant per stream geometry: weighted
    prediction (explicit 7.3.3.2 / implicit 8.4.2.3.1 / none) is resolved
    on device from tiny per-slice weight tables, and both reference lists
    are always evaluated (masked where unused), so I/P/B frames share one
    program. (The reference interleaves parse and "decode" per MB and has
    no pixel path at all: /root/reference/h264/slice.go:599-828.)

The host side (TpuDecoder) drives entropy decoding into FrameTensors,
derives the small per-frame parameter tensors, and feeds the jitted
function. Bit-exact vs the numpy oracle and therefore vs libavcodec.
"""

from __future__ import annotations

import os
import sys
from collections import deque
from concurrent.futures import Future, ThreadPoolExecutor
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# persistent XLA compilation cache: the big frame pipeline compiles once per
# stream geometry per machine, not per process
try:  # pragma: no cover
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_h264_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from ..kernels import mc as mc_k
from ..kernels import transform as tr_k
from ..kernels.deblock import deblock_frame_tpu
from ..kernels.deblock_prep_dev import deblock_prep_device, expand_slot_mv
from ..kernels.intra import K_I4, K_I8, K_I16, K_NONE, intra_wavefront
from ..kernels.intra_pallas import intra_frame_pallas
from ..syntax.pps import PPS
from ..syntax.sps import SPS
from ..tensors.frame_tensors import (
    LUMA_BLK_XY,
    MB_I_16X16,
    MB_I_NXN,
    MB_I_PCM,
    FrameTensors,
)
from ..utils.metrics import DecodeMetrics
from .decoder import Decoder
from .dpb import Picture

_jit_half_pel = jax.jit(mc_k.half_pel_planes)
_jit_chroma_pad = jax.jit(mc_k.chroma_pad)


@jax.jit
def _jit_pack_luma(y):
    """[H, W] uint8 -> the ring's packed luma MC layout."""
    return mc_k.pack_pair8(mc_k.half_pel_planes(y))


@jax.jit
def _jit_pack_chroma(cb, cr):
    """Cb/Cr [Hc, Wc] uint8 -> the ring's packed interleaved chroma layout."""
    c16 = mc_k.chroma_pad(cb).astype(jnp.uint16) | (
        mc_k.chroma_pad(cr).astype(jnp.uint16) << 8
    )
    return mc_k.pack_pair16(c16)


@partial(jax.jit, static_argnums=(1,))
def _jit_pack_luma_hbd(y, mx):
    """[H, W] uint16 -> the high-bit-depth packed luma MC layout (half-pel
    filter outputs Clip1 at the stream's mx)."""
    return mc_k.pack_pair16(mc_k.half_pel_planes(y, mx))


@jax.jit
def _jit_pack_c16(c):
    """[Hc, Wc] uint16 chroma component -> packed per-component ring."""
    return mc_k.pack_pair16(mc_k.chroma_pad(c).astype(jnp.uint16))

_ON_TPU: bool | None = None

# Table 8-15: QPc from clipped qPI (device constant for the 4:4:4 path)
from .reference_recon import CHROMA_QP_TABLE as _QPC_TAIL  # noqa: E402

_QPC_TAB = np.concatenate([np.arange(30), np.asarray(_QPC_TAIL)]).astype(np.int32)

# weight tables cover ref-list indices 0..R_W-1; ref lists can nominally be
# up to 32 entries (with duplicates), so R_W grows (pow2) when a stream
# actually uses longer lists
R_W_DEFAULT = 16

# device-memory budget for the DPB rings (MB): geometries whose rings would
# exceed it (e.g. 17-ref 4K High 4:4:4) decode on the host oracle instead of
# dying in the device allocator; override via env for bigger/smaller parts
_RING_BUDGET_MB = int(os.environ.get("H264_TPU_RING_BUDGET_MB", "6144"))


def _on_tpu() -> bool:
    """True when the default device is a real TPU (Pallas kernels usable)."""
    global _ON_TPU
    if _ON_TPU is None:
        try:
            d = jax.devices()[0]
            _ON_TPU = "tpu" in (d.platform or "").lower() or "TPU" in (
                getattr(d, "device_kind", "") or ""
            )
        except Exception:
            _ON_TPU = False
    return _ON_TPU


def _weight_cells(inp: dict, mb_h: int, mb_w: int):
    """Per-4x4-cell weighted-prediction parameters, gathered on device from
    the tiny per-slice tables the host packs every frame (identity defaults
    w=32/o=0/logWD=5 make unweighted slices exact no-ops through
    mc.weighted_combine).

    Fully-unweighted frames (no "w_tab" in the wire) short-circuit to
    scalar identity constants: the per-cell table gathers otherwise cost
    ~1 ms EACH at 1080p (~10 of them, device trace), all to produce
    constants.

    Returns (w0, o0, w1, o1, lwd) luma cell grids and a chroma getter
    comp -> (w0, o0, w1, o1, lwd)."""
    if "w_tab" not in inp:
        c32 = jnp.int32(32)
        c0 = jnp.int32(0)
        c5 = jnp.int32(5)

        def luma(bi):
            return c32, c0, c32, c0, c5

        def chroma(comp, bi):
            return c32, c0, c32, c0, c5

        return luma, chroma
    from ..kernels.deblock_prep_dev import _mb_to_cells as jmb
    from ..kernels.deblock_prep_dev import _part_to_cells as jpart

    w_tab = inp["w_tab"].astype(jnp.int32)  # [S, 2, R]
    o_tab = inp["o_tab"].astype(jnp.int32)  # [S, 2, R]
    wc_tab = inp["wc_tab"].astype(jnp.int32)  # [S, 2, R, 2]
    oc_tab = inp["oc_tab"].astype(jnp.int32)  # [S, 2, R, 2]
    lwd_tab = inp["lwd_tab"].astype(jnp.int32)  # [S, 2]
    pw0 = inp["pw0"].astype(jnp.int32)  # [S, R, R] bi weights (pair-indexed)
    pw1 = inp["pw1"].astype(jnp.int32)
    pwc0 = inp["pwc0"].astype(jnp.int32)  # [S, R, R, 2]
    pwc1 = inp["pwc1"].astype(jnp.int32)

    S, _, R = w_tab.shape
    sl = jnp.clip(jmb(inp["slice_mb"].astype(jnp.int32), mb_h, mb_w), 0, S - 1)
    if "ridx_cells" in inp:
        rc = inp["ridx_cells"]
        r0 = jnp.clip(rc[0], 0, R - 1)
        r1 = jnp.clip(rc[1], 0, R - 1)
    else:
        rp = inp["ridx_parts"].astype(jnp.int32)
        r0 = jnp.clip(jpart(rp[:, 0], mb_h, mb_w), 0, R - 1)
        r1 = jnp.clip(jpart(rp[:, 1], mb_h, mb_w), 0, R - 1)

    def pick(uni_tab, pair0, pair1, bi):
        u0 = uni_tab[sl, 0, r0]
        u1 = uni_tab[sl, 1, r1]
        b0 = pair0[sl, r0, r1]
        b1 = pair1[sl, r0, r1]
        return jnp.where(bi, b0, u0), jnp.where(bi, b1, u1)

    def luma(bi):
        w0, w1 = pick(w_tab, pw0, pw1, bi)
        return w0, o_tab[sl, 0, r0], w1, o_tab[sl, 1, r1], lwd_tab[sl, 0]

    def chroma(comp, bi):
        w0, w1 = pick(
            wc_tab[..., comp], pwc0[..., comp], pwc1[..., comp], bi
        )
        return (
            w0,
            oc_tab[sl, 0, r0, comp],
            w1,
            oc_tab[sl, 1, r1, comp],
            lwd_tab[sl, 1],
        )

    return luma, chroma


def _base_planes(inp: dict, mb_h: int, mb_w: int,
                 has_l8: bool, has_pcm: bool, cat: int = 1, bd: int = 8,
                 need_s2: bool = True):
    """Residual transforms + motion compensation (weighted, both lists
    masked) + PCM placement: every fully data-parallel pixel stage. Returns
    (base_y, base_cb, base_cr, ry, rcb, rcr) where base planes hold
    inter+PCM content (zeros at intra MBs) and r* are the residual planes.
    Shared verbatim between the single-chip frame program and the row-band
    sharded step (dist/sharded.py), which runs it on band-local tensors.

    cat = ChromaArrayType (1 = 4:2:0, also used for mono; 2 = 4:2:2 with
    full-height chroma, 8 blocks/MB and the 2x4 DC transform)."""
    H, W = mb_h * 16, mb_w * 16
    ch_h = 16 if cat == 2 else 8
    Hc, Wc = mb_h * ch_h, mb_w * 8
    n = mb_h * mb_w
    # narrow wire dtypes -> compute dtypes (free: fused into consumers)
    l8 = (
        inp["luma8_ac"].astype(jnp.int32)
        if has_l8
        else jnp.zeros((n, 4, 64), jnp.int32)
    )
    mx = (1 << bd) - 1
    qp_raw = inp["qp"].astype(jnp.int32)  # spec-range QP (deblock tables)
    qp = qp_raw + 6 * (bd - 8)  # QP'Y: what luma dequant consumes
    # ---- residual planes (all MBs)
    ry = tr_k.luma_residual_plane(
        inp["luma_ac"].astype(jnp.int32), inp["luma_dc"].astype(jnp.int32),
        l8, qp, inp["is_i16"], inp["is_t8"], inp["is_intra"],
        inp["ls4_y"], inp["ls8_y"], mb_h, mb_w,
    )
    chroma_res = (
        tr_k.chroma_residual_planes_422 if cat == 2
        else tr_k.chroma_residual_planes
    )
    rcb, rcr = chroma_res(
        inp["chroma_dc"].astype(jnp.int32), inp["chroma_ac"].astype(jnp.int32),
        qp_raw, inp["is_intra"], inp["ls4_c"], inp["qp_offsets"], mb_h, mb_w,
        bd=bd,
    )
    # ---- inter prediction: both lists always evaluated (masked where
    # unused) so I/P/B frames share one XLA program
    if "slot_cells" in inp:
        slot, mv = inp["slot_cells"], inp["mv_cells"]
    else:  # sharded path: compact per-MB wire, expanded on device
        slot, mv = expand_slot_mv(
            inp["slot_parts"], inp["mv_parts"], inp["is_intra"], mb_h, mb_w
        )
    use0_cell = slot[0] >= 0  # [H4, W4]
    use1_cell = slot[1] >= 0
    bi_cell = use0_cell & use1_cell
    luma_w, chroma_w = _weight_cells(inp, mb_h, mb_w)

    def px4(a):
        if jnp.ndim(a) == 0:  # identity weight constants broadcast as-is
            return a
        return jnp.repeat(jnp.repeat(a.astype(jnp.int32), 4, 0), 4, 1)

    def px2(a):  # luma cell grid -> chroma pixel grid
        if jnp.ndim(a) == 0:
            return a
        return jnp.repeat(
            jnp.repeat(a.astype(jnp.int32), ch_h // 4, 0), 2, 1
        )

    p0y = mc_k.luma_mc(inp["ref_luma"], slot[0], mv[0], H, W, need_s2)
    p1y = mc_k.luma_mc(inp["ref_luma"], slot[1], mv[1], H, W, need_s2)
    w0, o0, w1, o1, lwd = luma_w(bi_cell)
    pred_y = mc_k.weighted_combine(
        p0y, p1y, px4(use0_cell).astype(bool), px4(use1_cell).astype(bool),
        px4(w0), px4(o0), px4(w1), px4(o1), px4(lwd), mx,
    )
    inter_y = jnp.clip(pred_y + ry, 0, mx)

    use0c = px2(use0_cell).astype(bool)
    use1c = px2(use1_cell).astype(bool)
    # both chroma components ride one gather pass over the pre-packed
    # (Cb | Cr<<8 interleaved, column-pair-packed) chroma ring
    c2 = inp["ref_cr"] if bd > 8 else None  # separate Cr ring at high bd
    p0cb, p0cr = mc_k.chroma_mc_pair(inp["ref_cb"], slot[0], mv[0], Hc, Wc,
                                     chroma_array_type=cat, packed2=c2, mx=mx)
    p1cb, p1cr = mc_k.chroma_mc_pair(inp["ref_cb"], slot[1], mv[1], Hc, Wc,
                                     chroma_array_type=cat, packed2=c2, mx=mx)
    chroma_planes = []
    for comp, (p0, p1, rc) in enumerate(
        ((p0cb, p1cb, rcb), (p0cr, p1cr, rcr))
    ):
        cw0, co0, cw1, co1, clwd = chroma_w(comp, bi_cell)
        pred = mc_k.weighted_combine(
            p0, p1, use0c, use1c,
            px2(cw0), px2(co0), px2(cw1), px2(co1), px2(clwd), mx,
        )
        chroma_planes.append(jnp.clip(pred + rc, 0, mx))
    inter_cb, inter_cr = chroma_planes

    # ---- base planes: inter pixels + PCM pixels, zeros where intra fills
    inter_mb = (~inp["is_intra"]).reshape(mb_h, mb_w)
    im_y = jnp.repeat(jnp.repeat(inter_mb, 16, 0), 16, 1)
    im_c = jnp.repeat(jnp.repeat(inter_mb, ch_h, 0), 8, 1)
    pcm_y = inp["pcm_y"].astype(jnp.int32) if has_pcm else 0
    pcm_cb = inp["pcm_cb"].astype(jnp.int32) if has_pcm else 0
    pcm_cr = inp["pcm_cr"].astype(jnp.int32) if has_pcm else 0
    base_y = jnp.where(im_y, inter_y, pcm_y)
    base_cb = jnp.where(im_c, inter_cb, pcm_cb)
    base_cr = jnp.where(im_c, inter_cr, pcm_cr)
    return base_y, base_cb, base_cr, ry, rcb, rcr


def _frame_core(inp: dict, mb_h: int, mb_w: int, n_refs: int,
                has_l8: bool, has_pcm: bool, has_intra: bool = True,
                cat: int = 1, bd: int = 8, need_s2: bool = True):
    """The full parallel pixel path for one frame, one compile variant.

    has_l8/has_pcm/has_intra are the only static gates left: has_l8 is a
    per-PPS stream constant (transform_8x8_mode_flag), I_PCM frames are
    rare enough that the occasional extra variant beats always shipping
    three full-size PCM planes over the link, and has_intra=False skips
    the intra raster kernels entirely — typical P/B frames code ZERO intra
    macroblocks, and the serial wavefront kernels were ~60 ms/frame of
    pure overhead on them (device trace)."""
    odt = jnp.uint8 if bd == 8 else jnp.uint16
    base_y, base_cb, base_cr, ry, rcb, rcr = _base_planes(
        inp, mb_h, mb_w, has_l8, has_pcm, cat, bd, need_s2
    )
    if not has_intra:
        return (
            base_y.astype(odt),
            base_cb.astype(odt),
            base_cr.astype(odt),
        )
    # ---- intra reconstruction: Pallas raster kernel on TPU, XLA wavefront
    # elsewhere (CPU tests / virtual device meshes). 4:2:2 runs the XLA
    # wavefront everywhere (the Pallas raster kernel is 4:2:0-geometry)
    if cat == 2 or bd > 8:
        # 4:2:2 geometry and high bit depths run the XLA wavefront on all
        # backends (the Pallas raster kernel is 4:2:0 8-bit)
        y, cb, cr = intra_wavefront(
            base_y, base_cb, base_cr, ry, rcb, rcr,
            inp["kind"].astype(jnp.int32), inp["modes4"].astype(jnp.int32),
            inp["i16mode"].astype(jnp.int32), inp["cmode"].astype(jnp.int32),
            inp["avl"], inp["avt"], inp["avtr"], inp["avtl"],
            mb_h, mb_w, ch_h=16 if cat == 2 else 8,
            mid=1 << (bd - 1), mx=(1 << bd) - 1,
        )
        return y.astype(odt), cb.astype(odt), cr.astype(odt)
    intra_impl = intra_frame_pallas if _on_tpu() else intra_wavefront
    y, cb, cr = intra_impl(
        base_y, base_cb, base_cr, ry, rcb, rcr,
        inp["kind"].astype(jnp.int32), inp["modes4"].astype(jnp.int32),
        inp["i16mode"].astype(jnp.int32), inp["cmode"].astype(jnp.int32),
        inp["avl"], inp["avt"], inp["avtr"], inp["avtl"],
        mb_h, mb_w,
    )
    return y.astype(jnp.uint8), cb.astype(jnp.uint8), cr.astype(jnp.uint8)


def _comp_qp_grids(inp: dict):
    """Per-MB effective chroma QPs for the 4:4:4 luma-process chain."""
    qp = inp["qp"].astype(jnp.int32)
    cb_off, cr_off = inp["qp_offsets"]
    tab = jnp.asarray(_QPC_TAB)
    qp_cb = tab[jnp.clip(qp + cb_off, 0, 51)]
    qp_cr = tab[jnp.clip(qp + cr_off, 0, 51)]
    return qp_cb, qp_cr


def _frame_core_444(inp: dict, mb_h: int, mb_w: int, n_refs: int,
                    has_l8: bool, has_pcm: bool, has_intra: bool = True,
                    need_s2: bool = True):
    """ChromaArrayType-3 pixel path: Cb and Cr run the LUMA machinery per
    component (spec 7.3.5.3.1 / 8.3.4.5 / 8.4.2.2) — luma-geometry residual
    planes with per-component QPc and scaling lists, luma-style quarter-pel
    MC from per-component half-pel ring stacks, and three luma-mode passes
    of the intra kernel. Residuals ship dense (no sparse variant yet)."""
    H, W = mb_h * 16, mb_w * 16
    n = mb_h * mb_w
    qp = inp["qp"].astype(jnp.int32)
    qp_cb, qp_cr = _comp_qp_grids(inp)
    zero8 = jnp.zeros((n, 4, 64), jnp.int32)
    l8 = inp["luma8_ac"].astype(jnp.int32) if has_l8 else zero8

    def comp_residual(ac, dc, c8, qpc, ls4, ls8):
        return tr_k.luma_residual_plane(
            ac.astype(jnp.int32), dc.astype(jnp.int32), c8, qpc,
            inp["is_i16"], inp["is_t8"], inp["is_intra"], ls4, ls8,
            mb_h, mb_w,
        )

    ry = comp_residual(inp["luma_ac"], inp["luma_dc"], l8, qp,
                       inp["ls4_y"], inp["ls8_y"])
    c8b = inp["c444_8x8"][:, 0].astype(jnp.int32) if has_l8 else zero8
    c8r = inp["c444_8x8"][:, 1].astype(jnp.int32) if has_l8 else zero8
    rcb = comp_residual(inp["c444_ac"][:, 0], inp["c444_dc"][:, 0], c8b,
                        qp_cb, inp["ls4_cb"], inp["ls8_cb"])
    rcr = comp_residual(inp["c444_ac"][:, 1], inp["c444_dc"][:, 1], c8r,
                        qp_cr, inp["ls4_cr"], inp["ls8_cr"])

    slot, mv = inp["slot_cells"], inp["mv_cells"]
    use0_cell = slot[0] >= 0
    use1_cell = slot[1] >= 0
    bi_cell = use0_cell & use1_cell
    luma_w, chroma_w = _weight_cells(inp, mb_h, mb_w)

    def px4(a):
        if jnp.ndim(a) == 0:  # identity weight constants broadcast as-is
            return a
        return jnp.repeat(jnp.repeat(a.astype(jnp.int32), 4, 0), 4, 1)

    u0 = px4(use0_cell).astype(bool)
    u1 = px4(use1_cell).astype(bool)
    planes_out = []
    for comp, (ring, rc) in enumerate(
        ((inp["ref_luma"], ry), (inp["ref_cb"], rcb), (inp["ref_cr"], rcr))
    ):
        p0 = mc_k.luma_mc(ring, slot[0], mv[0], H, W, need_s2)
        p1 = mc_k.luma_mc(ring, slot[1], mv[1], H, W, need_s2)
        if comp == 0:
            w0, o0, w1, o1, lwd = luma_w(bi_cell)
        else:
            w0, o0, w1, o1, lwd = chroma_w(comp - 1, bi_cell)
        pred = mc_k.weighted_combine(
            p0, p1, u0, u1, px4(w0), px4(o0), px4(w1), px4(o1), px4(lwd)
        )
        planes_out.append(jnp.clip(pred + rc, 0, 255))

    inter_mb = (~inp["is_intra"]).reshape(mb_h, mb_w)
    im = jnp.repeat(jnp.repeat(inter_mb, 16, 0), 16, 1)
    pcm = [
        inp[k].astype(jnp.int32) if has_pcm else 0
        for k in ("pcm_y", "pcm_cb", "pcm_cr")
    ]
    bases = [jnp.where(im, pl, pc) for pl, pc in zip(planes_out, pcm)]
    rzs = (ry, rcb, rcr)
    if not has_intra:
        return tuple(b.astype(jnp.uint8) for b in bases)

    # intra: three luma-mode passes (the chroma half of each call runs on
    # dummy 4:2:0 planes and is discarded — correctness over peak perf for
    # the first device-complete 4:4:4 path)
    intra_impl = intra_frame_pallas if _on_tpu() else intra_wavefront
    dummy_c = jnp.zeros((mb_h * 8, mb_w * 8), jnp.int32)
    outs = []
    for base, rz in zip(bases, rzs):
        o = intra_impl(
            base, dummy_c, dummy_c, rz, dummy_c, dummy_c,
            inp["kind"].astype(jnp.int32), inp["modes4"].astype(jnp.int32),
            inp["i16mode"].astype(jnp.int32),
            jnp.zeros_like(inp["i16mode"]).astype(jnp.int32),
            inp["avl"], inp["avt"], inp["avtr"], inp["avtl"],
            mb_h, mb_w,
        )
        outs.append(o[0].astype(jnp.uint8))
    return outs[0], outs[1], outs[2]


def _deblock_core_444(planes, inp: dict, mb_h: int, mb_w: int):
    """ChromaArrayType-3 deblocking: chromaStyleFilteringFlag = 0, so each
    chroma plane filters with the LUMA kernel at luma geometry — same bS
    (derived from luma coded status + motion), thresholds from QPc."""
    y, cb, cr = planes
    mv = inp["mv_cells"]
    qp_cb, qp_cr = _comp_qp_grids(inp)

    def prep_for(qp_grid):
        return deblock_prep_device(
            inp["mb_cls"].astype(jnp.int32), qp_grid,
            inp["is_t8"], inp["slice_arr"].astype(jnp.int32),
            inp["disable"].astype(jnp.int32), inp["aoff"].astype(jnp.int32),
            inp["boff"].astype(jnp.int32), inp["nnz_grid"].astype(jnp.int32),
            inp.get("slot_parts", jnp.zeros((mb_h * mb_w, 2, 4), jnp.int32)),
            mv, (0, 0), mb_h, mb_w,
            slot_cells=inp.get("slot_cells"),
        )

    kern = None
    if _on_tpu():
        from ..kernels.deblock_pallas import deblock_frame_pallas as kern
    else:
        kern = deblock_frame_tpu
    dummy_c = jnp.zeros((mb_h * 8, mb_w * 8), jnp.uint8)
    out = []
    for plane, qp_grid in (
        (y, inp["qp"].astype(jnp.int32)),
        (cb, qp_cb),
        (cr, qp_cr),
    ):
        res = kern(plane, dummy_c, dummy_c, prep_for(qp_grid), mb_h, mb_w)
        out.append(res[0])
    return out[0], out[1], out[2]


def _deblock_core(planes, inp: dict, mb_h: int, mb_w: int, cat: int = 1,
                  bd: int = 8):
    """Device-side edge-parameter derivation + the deblocking filter (Pallas
    raster kernel on TPU, XLA wavefront elsewhere; 4:2:2 always runs the
    XLA kernel with full-height chroma). Expands the compact mv_parts to
    per-cell MVs on device."""
    from ..kernels.deblock_prep_dev import _blk_to_cells as jblk

    y, cb, cr = planes
    if "mv_cells" in inp:
        mv = inp["mv_cells"]
    else:
        mp = inp["mv_parts"].astype(jnp.int32)
        mv = jnp.stack(
            [
                jnp.stack(
                    [jblk(mp[:, lst, :, c], mb_h, mb_w) for c in range(2)],
                    axis=-1,
                )
                for lst in range(2)
            ]
        )
    # picture identity for bS: ring-slot ids (equal slot == same reference
    # picture), so the uid grid never ships over the link
    prep = deblock_prep_device(
        inp["mb_cls"].astype(jnp.int32), inp["qp"].astype(jnp.int32),
        inp["is_t8"], inp["slice_arr"].astype(jnp.int32),
        inp["disable"].astype(jnp.int32), inp["aoff"].astype(jnp.int32),
        inp["boff"].astype(jnp.int32), inp["nnz_grid"].astype(jnp.int32),
        inp.get("slot_parts", jnp.zeros((mb_h * mb_w, 2, 4), jnp.int32)),
        mv, inp["qp_offsets"], mb_h, mb_w,
        slot_cells=inp.get("slot_cells"),
        chroma_all_h_edges=cat == 2,
    )
    if cat == 2 or bd > 8:
        return deblock_frame_tpu(
            y, cb, cr, prep, mb_h, mb_w, ch_h=16 if cat == 2 else 8,
            bd_scale=1 << (bd - 8), mx=(1 << bd) - 1,
        )
    if _on_tpu():
        from ..kernels.deblock_pallas import deblock_frame_pallas

        return deblock_frame_pallas(y, cb, cr, prep, mb_h, mb_w)
    return deblock_frame_tpu(y, cb, cr, prep, mb_h, mb_w)


def _densify_residuals(inp: dict, n: int, has_l8: bool):
    """Inverse of the host's sparse residual packing: scatter the coded
    blocks' levels into dense coefficient tensors (padded entries carry
    index 0 with all-zero levels, so the .add is exact)."""
    la = jnp.zeros((n * 16, 16), jnp.int32)
    inp["luma_ac"] = (
        la.at[inp["l_idx"]].add(inp["l_lev"].astype(jnp.int32)).reshape(n, 16, 16)
    )
    ca = jnp.zeros((n * 8, 16), jnp.int32)
    inp["chroma_ac"] = (
        ca.at[inp["c_idx"]].add(inp["c_lev"].astype(jnp.int32)).reshape(n, 2, 4, 16)
    )
    ld = jnp.zeros((n, 16), jnp.int32)
    inp["luma_dc"] = ld.at[inp["ld_idx"]].add(inp["ld_lev"].astype(jnp.int32))
    if has_l8:
        l8 = jnp.zeros((n * 4, 64), jnp.int32)
        inp["luma8_ac"] = (
            l8.at[inp["l8_idx"]].add(inp["l8_lev"].astype(jnp.int32)).reshape(n, 4, 64)
        )


def _prepare_inp(wire: dict, dyn: dict, ring_y, ring_cb, ring_cr,
                 mb_h: int, mb_w: int, flags: tuple) -> dict:
    """Expand the narrow wire tensors into the _frame_core input contract:
    bit-packed flags -> booleans, nibble-packed intra modes, sparse residual
    densify, 8x8-granular MV expansion, ring binding."""
    has_l8, has_pcm, apply_db, sparse = flags[:4]
    inp = dict(dyn)
    inp.update(wire)
    f8 = inp.pop("flags8")
    m4n = inp.pop("modes4n")
    inp["modes4"] = (
        jnp.stack([m4n & 0x0F, m4n >> 4], axis=-1)
        .reshape(m4n.shape[0], 16)
        .astype(jnp.int32)
        - 1
    )
    if "slice_mb" in inp and "slice_arr" not in inp:
        inp["slice_arr"] = inp["slice_mb"]
    inp["is_i16"] = (f8 & 1) != 0
    inp["is_t8"] = (f8 & 2) != 0
    inp["is_intra"] = (f8 & 4) != 0
    inp["avl"] = (f8 & 8) != 0
    inp["avt"] = (f8 & 16) != 0
    inp["avtr"] = (f8 & 32) != 0
    inp["avtl"] = (f8 & 64) != 0
    if "nnz_bits" in inp:
        nb = inp.pop("nnz_bits")
        bits = (nb[:, None] >> jnp.arange(7, -1, -1, dtype=nb.dtype)) & 1
        inp["nnz_grid"] = (
            bits.reshape(-1)[: mb_h * 4 * mb_w * 4].reshape(mb_h * 4, mb_w * 4)
        )
    if sparse:
        _densify_residuals(inp, mb_h * mb_w, has_l8)

    # cell-ordered motion wire: the host ships slot/ref-idx at 8x8 cells and
    # MVs at 8x8 (or 4x4) cells ALREADY in picture-grid order, so the device
    # expansion is pure repeat/broadcast — the former [nMB, ...] -> grid
    # conversion was a [mb_h, mb_w, 4, 4] relayout costing ~18 ms each at
    # 1080p (4 per frame, device trace)
    def rep2(a):
        return jnp.repeat(jnp.repeat(a, 2, axis=-3 if a.ndim > 3 else -2),
                          2, axis=-2 if a.ndim > 3 else -1)

    if "mv8_cells" in inp:
        m8 = inp.pop("mv8_cells").astype(jnp.int32)  # [2, H8, W8, 2]
        inp["mv_cells"] = jnp.repeat(jnp.repeat(m8, 2, 1), 2, 2)
    elif "mv_cells" in inp:
        inp["mv_cells"] = inp["mv_cells"].astype(jnp.int32)
    if "slot_cells8" in inp:
        s8 = inp.pop("slot_cells8").astype(jnp.int32)  # [2, H8, W8]
        inp["slot_cells"] = jnp.repeat(jnp.repeat(s8, 2, 1), 2, 2)
    if "ridx_cells8" in inp:
        r8 = inp.pop("ridx_cells8").astype(jnp.int32)  # [2, H8, W8]
        inp["ridx_cells"] = jnp.repeat(jnp.repeat(r8, 2, 1), 2, 2)
    inp["ref_luma"] = ring_y
    inp["ref_cb"] = ring_cb
    inp["ref_cr"] = ring_cr
    return inp


@partial(jax.jit, static_argnums=(5, 6, 7, 8))
def frame_step(wire: dict, ring_y, ring_cb, ring_cr, dyn: dict,
               mb_h: int, mb_w: int, n_refs: int, flags: tuple):
    """The whole per-frame device program: reconstruct -> deblock ->
    half-pel planes -> DPB ring update -> packed output.

    flags = (has_l8, has_pcm, apply_deblock, sparse, cf3, has_intra). The
    DPB's reference planes live on device for the whole stream as a ring
    holding the PAIR-PACKED MC gather layouts (kernels/mc.py), re-fed
    (NOT donated: on this machine's axon runtime a donated ring costs
    ~310 ms/frame of hidden buffer traffic vs 0.3 ms without — measured by
    tools/perf_probe.py). The per-frame host tensors arrive as `wire`, a
    dict of narrow-dtype arrays shipped in ONE batched jax.device_put
    (residual coefficients ship SPARSE for typical inter frames — only
    coded blocks' levels plus indices); the packed output plane leaves
    device->host asynchronously."""
    has_l8, has_pcm, apply_db, sparse = flags[:4]
    cf3 = len(flags) > 4 and flags[4]
    has_intra = flags[5] if len(flags) > 5 else True
    cat = 2 if (len(flags) > 6 and flags[6]) else 1
    bd = flags[7] if len(flags) > 7 else 8
    need_s2 = flags[8] if len(flags) > 8 else True
    mx = (1 << bd) - 1
    inp = _prepare_inp(wire, dyn, ring_y, ring_cb, ring_cr, mb_h, mb_w, flags)
    slot = inp["slot_idx"].astype(jnp.int32).reshape(())
    if cf3:
        y, cb, cr = _frame_core_444(inp, mb_h, mb_w, n_refs, has_l8,
                                    has_pcm, has_intra, need_s2)
        if apply_db:
            y, cb, cr = _deblock_core_444((y, cb, cr), inp, mb_h, mb_w)
        ring_y = jax.lax.dynamic_update_slice(
            ring_y, mc_k.pack_pair8(mc_k.half_pel_planes(y))[None],
            (slot, 0, 0, 0, 0))
        ring_cb = jax.lax.dynamic_update_slice(
            ring_cb, mc_k.pack_pair8(mc_k.half_pel_planes(cb))[None],
            (slot, 0, 0, 0, 0))
        ring_cr = jax.lax.dynamic_update_slice(
            ring_cr, mc_k.pack_pair8(mc_k.half_pel_planes(cr))[None],
            (slot, 0, 0, 0, 0))
        packed = jnp.concatenate([y, cb, cr], axis=0)
        return ring_y, ring_cb, ring_cr, packed
    y, cb, cr = _frame_core(inp, mb_h, mb_w, n_refs, has_l8, has_pcm,
                            has_intra, cat, bd, need_s2)
    if apply_db:
        y, cb, cr = _deblock_core((y, cb, cr), inp, mb_h, mb_w, cat, bd)
    # DPB ring update: the rings hold the PAIR-PACKED layouts the MC
    # gathers consume (kernels/mc.py pack_pair8/pack_pair16), built once
    # per decoded frame here
    if bd > 8:
        # 16-bit samples: u32 word pairs; Cb and Cr keep separate rings
        hp = mc_k.pack_pair16(mc_k.half_pel_planes(y, mx))
        cbq = mc_k.pack_pair16(mc_k.chroma_pad(cb).astype(jnp.uint16))
        crq = mc_k.pack_pair16(mc_k.chroma_pad(cr).astype(jnp.uint16))
        ring_y = jax.lax.dynamic_update_slice(
            ring_y, hp[None], (slot, 0, 0, 0, 0))
        ring_cb = jax.lax.dynamic_update_slice(
            ring_cb, cbq[None], (slot, 0, 0, 0))
        ring_cr = jax.lax.dynamic_update_slice(
            ring_cr, crq[None], (slot, 0, 0, 0))
    else:
        hp = mc_k.pack_pair8(mc_k.half_pel_planes(y))
        c16 = mc_k.chroma_pad(cb).astype(jnp.uint16) | (
            mc_k.chroma_pad(cr).astype(jnp.uint16) << 8
        )
        cq = mc_k.pack_pair16(c16)
        ring_y = jax.lax.dynamic_update_slice(
            ring_y, hp[None], (slot, 0, 0, 0, 0))
        ring_cb = jax.lax.dynamic_update_slice(
            ring_cb, cq[None], (slot, 0, 0, 0))
    packed = jnp.concatenate([y, jnp.concatenate([cb, cr], axis=1)], axis=0)
    return ring_y, ring_cb, ring_cr, packed


@partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6))
def frame_fn(inp: dict, mb_h: int, mb_w: int, n_refs: int,
             has_l8: bool = False, has_pcm: bool = False,
             apply_deblock: bool = False):
    """Ring-free single-frame entry (driver compile checks, kernel tests)."""
    y, cb, cr = _frame_core(inp, mb_h, mb_w, n_refs, has_l8, has_pcm)
    if apply_deblock:
        y, cb, cr = _deblock_core((y, cb, cr), inp, mb_h, mb_w)
    return y, cb, cr


class _PackedFrame:
    """One decoded frame leaving the device as a single packed buffer
    [H + H/2, W] (Y on top; Cb | Cr side by side below). The device->host
    copy is started asynchronously at dispatch time; the first plane access
    waits for it and splits the planes."""

    def __init__(self, packed, H: int, W: int, metrics: DecodeMetrics | None,
                 cf3: bool = False, cf2: bool = False, dtype=np.uint8):
        self._packed = packed
        self._H = H
        self._W = W
        self._cf3 = cf3  # 4:4:4: packed rows are [Y; Cb; Cr] full-size
        self._cf2 = cf2  # 4:2:2: chroma rows are full-height
        self._dtype = np.dtype(dtype)
        self._planes = None
        self._metrics = metrics

    def block_until_ready(self):
        """Wait for the frame's packed buffer to be COMPUTED on device
        (decode complete) without forcing the device->host download. The
        wait is timed as the `device` stage: summed across frames it is the
        device compute not overlapped by host work, which makes the bench
        per-stage table account for its own wall."""
        pk = self._packed
        if pk is not None:
            b = getattr(pk, "block_until_ready", None)
            if b is not None:
                if self._metrics is not None:
                    with self._metrics.timer("device"):
                        b()
                else:
                    b()
        return self

    def fetch(self):
        if self._planes is None:
            m = self._metrics
            if m is not None:
                with m.timer("download"):
                    a = np.asarray(self._packed)
                m.count("bytes_down", a.nbytes)
            else:
                a = np.asarray(self._packed)
            H, W = self._H, self._W
            if self._cf3:
                self._planes = (a[:H], a[H : 2 * H], a[2 * H :])
            else:
                self._planes = (a[:H], a[H:, : W // 2], a[H:, W // 2 :])
            self._packed = None
        return self._planes


class _PlaneView:
    """numpy-coercible view of one plane of a _PackedFrame."""

    def __init__(self, frame: _PackedFrame, idx: int):
        self._frame = frame
        self._idx = idx

    def __array__(self, dtype=None, copy=None):
        a = self._frame.fetch()[self._idx]
        if dtype is not None and a.dtype != dtype:
            a = a.astype(dtype)
        return a

    def block_until_ready(self):
        """Wait until the frame's packed output exists ON DEVICE (decode
        complete) without starting the device->host download."""
        self._frame.block_until_ready()
        return self

    @property
    def shape(self):
        H, W = self._frame._H, self._frame._W
        if self._idx == 0 or self._frame._cf3:
            return (H, W)
        if self._frame._cf2:
            return (H, W // 2)
        return (H // 2, W // 2)

    @property
    def dtype(self):
        return self._frame._dtype


class _FuturePlane:
    """numpy-coercible plane backed by a pending reconstruction task (the
    pipelined TpuDecoder reconstructs picture N on a worker thread while
    the main thread entropy-decodes picture N+1)."""

    def __init__(self, fut: Future, idx: int):
        self._fut = fut
        self._idx = idx

    def _resolve(self):
        return self._fut.result()[self._idx]

    def __array__(self, dtype=None, copy=None):
        a = np.asarray(self._resolve())
        if dtype is not None and a.dtype != dtype:
            a = a.astype(dtype)
        return a

    def block_until_ready(self):
        p = self._resolve()
        block = getattr(p, "block_until_ready", None)
        if block is not None:
            block()


# raster-cell -> luma4x4BlkIdx reorder (inverse of LUMA_BLK_XY)
_RASTER_TO_BLK4 = np.array([y * 4 + x for (x, y) in LUMA_BLK_XY], np.int32)


def _coded_block_masks(ft: FrameTensors, has_l8: bool):
    """Coded-block booleans for the sparse residual wire format, derived
    from the nnz bookkeeping grids the entropy stage already maintains —
    O(nMB) int8 work instead of scanning every level of the dense
    coefficient tensors. A decoded block's levels are nonzero by
    construction (CAVLC total_coeff / CABAC significance), so nnz>0 is
    exactly "this block has levels to ship". transform-8x8 and PCM MBs set
    luma nnz for nC/deblock purposes without populating luma_ac, so they
    are masked out of the 4x4 list (t8 blocks ship via l8; PCM ships as
    planes). Returns dict key -> bool mask over the flattened block rows,
    in the same row order as the dense tensors."""
    mb_h, mb_w, n = ft.mb_h, ft.mb_w, ft.n_mbs
    pcm = ft.mb_class == MB_I_PCM
    nnz_raster = (
        ft.luma_nnz.reshape(mb_h, 4, mb_w, 4)
        .transpose(0, 2, 1, 3)
        .reshape(n, 16)
    )
    nnz_blk = nnz_raster[:, _RASTER_TO_BLK4]
    skip_mb = ft.transform_8x8 | pcm
    out = {
        "l": ((nnz_blk > 0) & ~skip_mb[:, None]).reshape(-1),
        # chroma 4x4 blk order is raster within the 8x8 (CHROMA_BLK_XY)
        "c": (
            (
                ft.chroma_nnz.reshape(2, mb_h, 2, mb_w, 2)
                .transpose(1, 3, 0, 2, 4)
                .reshape(n, 8)
                > 0
            )
            & ~pcm[:, None]
        ).reshape(-1),
        # luma DC: cbf_dc is CABAC-only bookkeeping (CAVLC never sets it),
        # and the tensor is tiny ([n,16] int16) — scan it directly
        "ld": ft.luma_dc.any(axis=1),
    }
    if has_l8:
        nnz8 = (
            ft.luma_nnz.reshape(mb_h, 2, 2, mb_w, 2, 2)
            .transpose(0, 3, 1, 4, 2, 5)
            .reshape(n, 4, 4)
            .max(axis=2)
        )
        out["l8"] = ((nnz8 > 0) & (ft.transform_8x8 & ~pcm)[:, None]).reshape(-1)
    return out


def _mb_avail_grids(ft: FrameTensors, pps: PPS):
    """MB-level intra availability (left/top/topright/topleft) incl. slice
    gating and constrained_intra_pred."""
    mb_h, mb_w = ft.mb_h, ft.mb_w
    sl = ft.slice_id.reshape(mb_h, mb_w)
    usable = np.ones((mb_h, mb_w), bool)
    if pps.constrained_intra_pred_flag:
        usable = (ft.mb_class < 3).reshape(mb_h, mb_w)

    def nb(dy, dx):
        ok = np.zeros((mb_h, mb_w), bool)
        ys, xs = slice(max(0, dy), mb_h + min(0, dy)), slice(
            max(0, dx), mb_w + min(0, dx)
        )
        ys2, xs2 = slice(max(0, -dy), mb_h + min(0, -dy)), slice(
            max(0, -dx), mb_w + min(0, -dx)
        )
        ok[ys2, xs2] = (
            (sl[ys, xs] == sl[ys2, xs2]) & usable[ys, xs]
        )
        return ok

    return nb(0, -1), nb(-1, 0), nb(-1, 1), nb(-1, -1)


_IDENTITY_WT_CACHE: dict = {}


def _weight_tables(weight_ctx, ref_lists, poc, s_pad: int, r_w: int,
                   osh: int = 0):
    """Per-slice weighted-prediction tables for the device-side gather.

    Identity default everywhere: w=32, o=0, logWD=5 — exact for unweighted
    uni (p*32+16)>>5 = p and for default bi (32p0+32p1+32)>>6 = (p0+p1+1)>>1.
    Explicit slices (7.3.3.2) fill per-(list, ref_idx) entries; implicit
    slices (8.4.2.3.1) fill the pair-indexed bi tables from POC distances.

    Fully-unweighted frames (the common case) reuse a cached read-only
    identity table set — callers must not mutate the returned arrays."""
    S, R = s_pad, r_w
    if all(wmode == "none" for wmode, _ in weight_ctx):
        key = (S, R)
        cached = _IDENTITY_WT_CACHE.get(key)
        if cached is None:
            cached = _IDENTITY_WT_CACHE[key] = {
                "w_tab": np.full((S, 2, R), 32, np.int16),
                "o_tab": np.zeros((S, 2, R), np.int16),
                "wc_tab": np.full((S, 2, R, 2), 32, np.int16),
                "oc_tab": np.zeros((S, 2, R, 2), np.int16),
                "lwd_tab": np.full((S, 2), 5, np.int8),
                "pw0": np.full((S, R, R), 32, np.int16),
                "pw1": np.full((S, R, R), 32, np.int16),
                "pwc0": np.full((S, R, R, 2), 32, np.int16),
                "pwc1": np.full((S, R, R, 2), 32, np.int16),
            }
        return cached
    w_tab = np.full((S, 2, R), 32, np.int16)
    o_tab = np.zeros((S, 2, R), np.int16)
    wc_tab = np.full((S, 2, R, 2), 32, np.int16)
    oc_tab = np.zeros((S, 2, R, 2), np.int16)
    lwd_tab = np.full((S, 2), 5, np.int8)
    pw0 = np.full((S, R, R), 32, np.int16)
    pw1 = np.full((S, R, R), 32, np.int16)
    pwc0 = np.full((S, R, R, 2), 32, np.int16)
    pwc1 = np.full((S, R, R, 2), 32, np.int16)
    for sid, (wmode, pwt) in enumerate(weight_ctx):
        if sid >= S or wmode == "none":
            continue
        if wmode == "explicit" and pwt is not None:
            lwd_tab[sid] = (pwt.luma_log2_weight_denom,
                            pwt.chroma_log2_weight_denom)
            ld, cd = int(pwt.luma_log2_weight_denom), int(
                pwt.chroma_log2_weight_denom)
            w_tab[sid] = 1 << ld
            wc_tab[sid] = 1 << cd
            for lst, tab in ((0, pwt.l0), (1, pwt.l1)):
                for ridx, e in enumerate(tab or []):
                    if ridx >= R:
                        break
                    w_tab[sid, lst, ridx] = e.luma_weight
                    # explicit offsets scale by 1 << (BitDepth - 8)
                    # (spec 8.4.2.3.2 offset scaling)
                    o_tab[sid, lst, ridx] = e.luma_offset << osh
                    wc_tab[sid, lst, ridx] = e.chroma_weight
                    oc_tab[sid, lst, ridx] = (
                        np.asarray(e.chroma_offset, np.int32) << osh
                    )
            # explicit bi weights are separable per (list, ref_idx)
            pw0[sid] = w_tab[sid, 0, :, None]
            pw1[sid] = w_tab[sid, 1, None, :]
            pwc0[sid] = wc_tab[sid, 0, :, None, :]
            pwc1[sid] = wc_tab[sid, 1, None, :, :]
        elif wmode == "implicit":
            l0, l1 = ref_lists[sid]
            for a, p0 in enumerate(l0[:R]):
                for b, p1 in enumerate(l1[:R]):
                    _, w1v = _implicit_w(p0, p1, poc)
                    pw0[sid, a, b] = 64 - w1v
                    pw1[sid, a, b] = w1v
                    pwc0[sid, a, b] = 64 - w1v
                    pwc1[sid, a, b] = w1v
            # implicit uni-prediction is the default combine: uni tables
            # stay identity; offsets stay 0, logWD stays 5
    return {
        "w_tab": w_tab, "o_tab": o_tab, "wc_tab": wc_tab, "oc_tab": oc_tab,
        "lwd_tab": lwd_tab, "pw0": pw0, "pw1": pw1,
        "pwc0": pwc0, "pwc1": pwc1,
    }


class TpuDecoder(Decoder):
    """Stream decoder whose pixel pipeline runs as one jitted XLA program
    per frame, with device-resident DPB reference planes and asynchronous
    packed-plane output."""

    def __init__(self, apply_deblock: bool = True, backend=None,
                 metrics: DecodeMetrics | None = None,
                 eager_download: bool | None = None):
        super().__init__(apply_deblock=apply_deblock, metrics=metrics)
        if eager_download is None:
            eager_download = os.environ.get("H264_TPU_EAGER_DL", "1") != "0"
        self._eager_dl = bool(eager_download)
        self._ring = None  # device DPB ring buffers (luma hp, cb, cr)
        self._ring_slots: dict[int, int] = {}  # pic uid -> ring slot
        self._ring_geom = None
        self._r_w = R_W_DEFAULT
        # two-stage decode pipeline (SURVEY.md section 7.3): the main thread
        # runs the irreducibly-serial entropy decode; this single worker
        # runs host prep + device dispatch for the previous picture(s).
        # Ring state, _ring_slots and _r_w are touched ONLY by the worker,
        # in submission order, so no locking is needed.
        self._pipeline = os.environ.get("H264_PIPELINE", "1") != "0"
        self._recon_exec = (
            ThreadPoolExecutor(max_workers=1, thread_name_prefix="h264recon")
            if self._pipeline
            else None
        )
        self._recon_pending: deque[Future] = deque()
        # depth 3 measured best on the axon tunnel (7.0 vs 6.9 fps at 2,
        # 6.8 at 4): enough in-flight frames to hide host prep + upload
        # without starving the ring-serialized device queue
        self._recon_depth = max(1, int(os.environ.get("H264_PIPELINE_DEPTH", "3")))

    def _submit_reconstruct(self, ft, sps, pps, slices, ref_lists,
                            weight_ctx, poc):
        if sps.bit_depth_luma != 8 and (
            sps.chroma_array_type == 3
            or sps.bit_depth_chroma != sps.bit_depth_luma
        ):
            # high-bit-depth 4:4:4 (and mixed-depth components) keep the
            # numpy oracle path; mono/4:2:0/4:2:2 at any depth, and all
            # 8-bit formats, run the device pipeline
            return Decoder._submit_reconstruct(
                self, ft, sps, pps, slices, ref_lists, weight_ctx, poc
            )
        if not self._pipeline:
            return self._reconstruct(ft, sps, pps, slices, ref_lists,
                                     weight_ctx, poc)
        cur_uid = self.uid_counter  # snapshot: main increments it right after
        while len(self._recon_pending) >= self._recon_depth:
            self._recon_pending.popleft().result()  # backpressure + errors
        fut = self._recon_exec.submit(
            self._recon_task, ft, sps, pps, slices, ref_lists, weight_ctx,
            poc, cur_uid,
        )
        self._recon_pending.append(fut)
        return _FuturePlane(fut, 0), _FuturePlane(fut, 1), _FuturePlane(fut, 2)

    def _recon_task(self, ft, sps, pps, slices, ref_lists, weight_ctx, poc,
                    cur_uid):
        try:
            m = self.metrics
            if m is not None:
                with m.timer("prep"):
                    return self._reconstruct(
                        ft, sps, pps, slices, ref_lists, weight_ctx, poc,
                        cur_uid=cur_uid,
                    )
            return self._reconstruct(
                ft, sps, pps, slices, ref_lists, weight_ctx, poc,
                cur_uid=cur_uid,
            )
        except Exception:
            if self.error_policy == "strict":
                raise
            self.error_count += 1  # degrade: mid-gray frame (error_policy)
            H, W = ft.mb_h * 16, ft.mb_w * 16
            Hc = ft.mb_h * ft.ch_mb_h
            Wc = ft.mb_w * (16 if ft.chroma_format == 3 else 8)
            return (
                np.full((H, W), 128, np.uint8),
                np.full((Hc, Wc), 128, np.uint8),
                np.full((Hc, Wc), 128, np.uint8),
            )

    def _drain_recon(self):
        while self._recon_pending:
            self._recon_pending.popleft().result()

    @staticmethod
    def ring_bytes(sps: SPS) -> int:
        """Device bytes the DPB rings for this stream geometry would take
        (pair-packed MC layouts, _ensure_ring shapes). 4:4:4 keeps a full
        4-plane half-pel stack PER chroma component, so multi-ref
        4:4:4/high-bd streams can be large; _reconstruct checks this
        against H264_TPU_RING_BUDGET_MB and falls back to the numpy oracle
        instead of dying in the allocator."""
        n_refs = max(1, sps.max_num_ref_frames + 1)
        H, W = sps.frame_height_in_mbs * 16, sps.pic_width_in_mbs * 16
        P = mc_k.PAD
        wb = 2 if sps.bit_depth_luma == 8 else 4  # ring word bytes
        luma = n_refs * 4 * 2 * (H + 2 * P) * ((W + 2 * P) // 2 + 2) * wb
        if sps.chroma_array_type == 3:
            return 3 * luma
        if sps.chroma_array_type == 0:
            return luma
        Hc = H if sps.chroma_array_type == 2 else H // 2
        chroma = n_refs * 2 * (Hc + 2 * P) * ((W // 2 + 2 * P) // 2 + 2) * 4
        return luma + chroma * (2 if sps.bit_depth_luma > 8 else 1)

    def _ensure_ring(self, sps: SPS):
        n_refs = max(1, sps.max_num_ref_frames + 1)
        H, W = sps.frame_height_in_mbs * 16, sps.pic_width_in_mbs * 16
        cf3 = sps.chroma_array_type == 3
        cf2 = sps.chroma_array_type == 2
        bd = sps.bit_depth_luma
        self._bd = bd
        geom = (n_refs, H, W, cf3, cf2, bd)
        if self._ring is None or self._ring_geom != geom:
            P = mc_k.PAD
            # rings hold the PAIR-PACKED MC layouts (kernels/mc.py):
            # luma [R, 4 planes, 2 phases, Hp, Wp//2+2] uint16; 4:2:0/4:2:2
            # chroma one interleaved Cb|Cr ring [R, 2, Hpc, Wpc//2+2] uint32
            lshape = (n_refs, 4, 2, H + 2 * P, (W + 2 * P) // 2 + 2)
            # word dtype: 8-bit samples pack pairs into uint16 (uint32 for
            # the Cb|Cr-interleaved chroma); >8-bit samples pack pairs of
            # uint16 into uint32, with Cb and Cr in separate rings
            ldt = jnp.uint16 if bd == 8 else jnp.uint32
            if cf3:
                # 4:4:4 chroma is MC'd with the luma process: each chroma
                # component keeps its own packed half-pel plane stack
                self._ring = [
                    jnp.zeros(lshape, ldt),
                    jnp.zeros(lshape, ldt),
                    jnp.zeros(lshape, ldt),
                ]
            else:
                Hc = H if cf2 else H // 2  # 4:2:2 chroma is full height
                Hpc, Wpc = Hc + 2 * P, W // 2 + 2 * P
                cshape = (n_refs, 2, Hpc, Wpc // 2 + 2)
                self._ring = [
                    jnp.zeros(lshape, ldt),
                    jnp.zeros(cshape, jnp.uint32),
                    (jnp.zeros(cshape, jnp.uint32) if bd > 8
                     else jnp.zeros((1,), jnp.uint8)),
                ]
            self._ring_slots = {}
            self._ring_geom = geom
        return n_refs

    def _alloc_slot(self, live_uids: set, n_refs: int) -> int:
        """A free ring slot, evicting slots of no-longer-referenced uids."""
        for uid in [u for u in self._ring_slots if u not in live_uids]:
            del self._ring_slots[uid]
        used = set(self._ring_slots.values())
        return next(i for i in range(n_refs) if i not in used)

    def _insert_host_refs(self, pictures: list[Picture], n_refs: int,
                          live: set):
        """Upload reference pictures that lack a ring slot (pictures decoded
        by a host fallback path, e.g. lossless transform-bypass frames),
        packed into the ring's MC layouts."""
        cf3 = self._ring[1].ndim == 5
        hbd = self._ring[0].dtype == jnp.uint32  # high-bit-depth ring words
        for p in pictures[:n_refs]:
            if p.uid in self._ring_slots:
                continue
            slot = self._alloc_slot(live, n_refs)
            mx = (1 << getattr(self, "_bd", 8)) - 1
            pack_l = (
                (lambda a: _jit_pack_luma_hbd(a, mx)) if hbd else _jit_pack_luma
            )
            hp = pack_l(jnp.asarray(np.asarray(p.y)))
            if cf3:
                cbp = pack_l(jnp.asarray(np.asarray(p.cb)))
                crp = pack_l(jnp.asarray(np.asarray(p.cr)))
                self._ring[2] = self._ring[2].at[slot].set(crp)
            elif hbd:
                cbp = _jit_pack_c16(jnp.asarray(np.asarray(p.cb)))
                crp = _jit_pack_c16(jnp.asarray(np.asarray(p.cr)))
                self._ring[2] = self._ring[2].at[slot].set(crp)
            else:
                cbp = _jit_pack_chroma(
                    jnp.asarray(np.asarray(p.cb)), jnp.asarray(np.asarray(p.cr))
                )
            self._ring[0] = self._ring[0].at[slot].set(hp)
            self._ring[1] = self._ring[1].at[slot].set(cbp)
            self._ring_slots[p.uid] = slot

    def _reconstruct(self, ft, sps, pps, slices, ref_lists, weight_ctx, poc,
                     cur_uid: int | None = None):
        if cur_uid is None:
            cur_uid = self.uid_counter
        over_budget = self.ring_bytes(sps) > _RING_BUDGET_MB << 20
        if over_budget and not getattr(self, "_budget_warned", False):
            self._budget_warned = True
            print(
                f"h264decode_tpu: DPB ring would take "
                f"{self.ring_bytes(sps) >> 20} MB (> H264_TPU_RING_BUDGET_MB="
                f"{_RING_BUDGET_MB}); decoding on the host oracle",
                file=sys.stderr,
            )
        if (
            slices[0][0].field_pic_flag
            or slices[0][0].mbaff_frame_flag
            or any(h.is_sp or h.is_si for h, *_ in slices)
            or over_budget
        ):
            # PAFF field pictures (field geometry would thrash the device
            # DPB ring, which is sized for frames), MBAFF pictures (pair
            # scan order + per-MB field placement) and SP/SI slices (8.6
            # transform-domain requant) run on the numpy oracle path
            for l0, l1 in ref_lists:
                for p in l0 + l1:
                    if not isinstance(p.y, np.ndarray):
                        p.y = np.asarray(p.y)
                        p.cb = np.asarray(p.cb)
                        p.cr = np.asarray(p.cr)
            return super()._reconstruct(
                ft, sps, pps, slices, ref_lists, weight_ctx, poc
            )
        if sps.qpprime_y_zero_transform_bypass_flag and (
            ft.qp.astype(np.int32) + 6 * (sps.bit_depth_luma - 8) == 0
        ).any():
            # lossless transform-bypass MBs (spec 8.5.15): numpy oracle path.
            # Reference pictures may hold still-device planes from earlier
            # TPU frames; materialize them once so the oracle's per-pixel
            # numpy indexing never touches a device array.
            for l0, l1 in ref_lists:
                for p in l0 + l1:
                    if not isinstance(p.y, np.ndarray):
                        p.y = np.asarray(p.y)
                        p.cb = np.asarray(p.cb)
                        p.cr = np.asarray(p.cr)
            return super()._reconstruct(
                ft, sps, pps, slices, ref_lists, weight_ctx, poc
            )
        m = self.metrics
        mb_h, mb_w = ft.mb_h, ft.mb_w
        H, W = mb_h * 16, mb_w * 16
        n = ft.n_mbs
        hdr0 = slices[0][0]
        n_refs = self._ensure_ring(sps)
        # ---- unique reference pictures -> ring slots
        uid_to_pic = {}
        for l0, l1 in ref_lists:
            for p in l0 + l1:
                uid_to_pic.setdefault(p.uid, p)
        pics = list(uid_to_pic.values())
        live = {p.uid for p in pics[:n_refs]}
        self._insert_host_refs(pics, n_refs, live)
        uid_slot = {
            u: s for u, s in self._ring_slots.items() if u in live
        }
        # slot for the current frame's half-pel planes (a free slot always
        # exists: the ring has max_num_ref_frames+1 slots)
        cur_slot = self._alloc_slot(live, n_refs)
        if hdr0.nal_ref_idc:
            self._ring_slots[cur_uid] = cur_slot

        # ---- compact per-part ref slots (expanded to cells on device)
        slot_lut = np.full(cur_uid + 2, -1, np.int32)
        for uid, s in uid_slot.items():
            slot_lut[uid] = s
        rp_parts = ft.ref_pic  # [n, 2, 4] picture uids (or -1/-2)
        slot_parts = np.where(
            rp_parts >= 0,
            slot_lut[np.clip(rp_parts, 0, len(slot_lut) - 1)],
            -1,
        ).astype(np.int8)

        # ---- per-slice weight tables (omitted from the wire entirely for
        # the common fully-unweighted frame: the device short-circuits to
        # identity constants, skipping ~10 per-cell table gathers)
        weighted = any(wmode != "none" for wmode, _ in weight_ctx)
        if weighted:
            s_pad = 1 << max(0, len(slices) - 1).bit_length()
            max_list = max(
                [1] + [len(l0) for l0, _ in ref_lists]
                + [len(l1) for _, l1 in ref_lists]
            )
            while self._r_w < max_list:
                self._r_w *= 2
            wt = _weight_tables(weight_ctx, ref_lists, poc, s_pad, self._r_w,
                                osh=sps.bit_depth_luma - 8)
        else:
            wt = {}

        # ---- intra wavefront metadata
        kind = np.zeros(n, np.int32)
        kind[(ft.mb_class == MB_I_NXN) & ~ft.transform_8x8] = K_I4
        kind[(ft.mb_class == MB_I_NXN) & ft.transform_8x8] = K_I8
        kind[ft.mb_class == MB_I_16X16] = K_I16
        avl, avt, avtr, avtl = _mb_avail_grids(ft, pps)

        # ---- PCM planes (only built and transferred when the frame has any)
        cf3 = sps.chroma_array_type == 3
        cf2 = sps.chroma_array_type == 2
        # chroma PCM unit (width x height per MB): 8x8 / 8x16 / 16x16
        cw = 16 if cf3 else 8
        chh = 16 if (cf3 or cf2) else 8
        has_pcm = bool(ft.pcm_samples)
        if has_pcm:
            pdt = np.uint8 if sps.bit_depth_luma == 8 else np.uint16
            pcm_y = np.zeros((mb_h * 16, mb_w * 16), pdt)
            pcm_cb = np.zeros((mb_h * chh, mb_w * cw), pdt)
            pcm_cr = np.zeros((mb_h * chh, mb_w * cw), pdt)
            mono = sps.chroma_array_type == 0
            for addr, (py, pcb, pcr) in ft.pcm_samples.items():
                mbx, mby = ft.mb_xy(addr)
                pcm_y[mby * 16 : mby * 16 + 16, mbx * 16 : mbx * 16 + 16] = py
                # mono PCM carries no chroma: present the mid-gray fill
                mid = 1 << (sps.bit_depth_chroma - 1)
                pcm_cb[mby * chh : (mby + 1) * chh, mbx * cw : (mbx + 1) * cw] = (
                    mid if mono else pcb
                )
                pcm_cr[mby * chh : (mby + 1) * chh, mbx * cw : (mbx + 1) * cw] = (
                    mid if mono else pcr
                )

        # one packed upload: the device link is latency-bound, so every
        # per-frame host tensor ships in a single uint8 buffer (narrow
        # dtypes preserved; widened on device inside frame_step)
        has_l8 = pps.transform_8x8_mode_flag and (
            ft.luma8_ac is not None
            or (cf3 and ft.c444_8x8 is not None)
        )
        # ---- sparse residual wire format: the device link is the decode
        # bottleneck and typical inter frames code only ~1-5% of blocks, so
        # ship (index, levels) of coded blocks only. Capacities are fixed
        # fractions of the geometry (static shapes -> exactly two compile
        # variants per stream: sparse for inter frames, dense for I frames).
        # chroma DC ships dense always (tiny and usually fully coded); AC +
        # luma-DC capacities are tight — an over-budget frame (I frames,
        # typically) takes the dense variant
        sp = {
            "l": (ft.luma_ac.reshape(-1, 16), n),
            "c": (ft.chroma_ac.reshape(-1, 16), n // 2),
            "ld": (ft.luma_dc, n // 4),
        }
        if has_l8:
            sp["l8"] = (ft.luma8_ac.reshape(-1, 64), n // 4)
        sparse = not (cf3 or cf2)  # 4:4:4/4:2:2 ship residuals dense
        masks = _coded_block_masks(ft, has_l8) if sparse else {}
        sp_idx = {}
        for key, (flat, cap) in (sp.items() if sparse else ()):
            idx = np.flatnonzero(masks[key]).astype(np.int32)
            if len(idx) > cap:
                sparse = False
                break
            sp_idx[key] = idx
        wire: dict[str, np.ndarray] = {}

        def narrow(a):
            # coefficient levels overwhelmingly fit int8; ship the narrow
            # dtype when the whole tensor does (the dtype is part of the
            # jit signature, so the rare wide frame simply takes the int16
            # compile variant)
            if a.dtype == np.int16 and a.size and abs(int(a.max(initial=0))) < 128 \
                    and abs(int(a.min(initial=0))) < 128:
                return a.astype(np.int8)
            return a

        wire["chroma_dc"] = narrow(ft.chroma_dc)
        if sparse:
            for key, (flat, cap) in sp.items():
                idx = sp_idx[key]
                pad = cap - len(idx)
                wire[key + "_idx"] = np.pad(idx, (0, pad))
                wire[key + "_lev"] = narrow(np.pad(flat[idx], ((0, pad), (0, 0))))
        else:
            wire["luma_ac"] = narrow(ft.luma_ac)
            wire["chroma_ac"] = narrow(ft.chroma_ac)
            wire["luma_dc"] = narrow(ft.luma_dc)
        if cf3:
            wire["c444_ac"] = narrow(ft.c444_ac)
            wire["c444_dc"] = narrow(ft.c444_dc)
            if has_l8:
                wire["c444_8x8"] = narrow(ft.ensure_c444_8x8())
                wire["luma8_ac"] = narrow(ft.ensure_luma8())
        # MVs ship at 8x8 granularity when no MB uses sub-8x8 partitions
        # (the overwhelmingly common case), in CELL-GRID order (the host
        # transpose is ~1 ms numpy; the device-side relayout it replaces
        # measured ~18 ms per array)
        mv16 = ft.mv.reshape(n, 2, 2, 2, 2, 2, 2)
        mv8c = mv16[:, :, :, :1, :, :1, :]
        mv8 = bool((mv16 == mv8c).all())
        if mv8:
            # [n, 2, py, px, 2] -> [2, mb_h*2, mb_w*2, 2]
            wire["mv8_cells"] = np.ascontiguousarray(
                mv8c.reshape(mb_h, mb_w, 2, 2, 2, 2)
                .transpose(2, 0, 3, 1, 4, 5)
                .reshape(2, mb_h * 2, mb_w * 2, 2)
            ).astype(np.int16)
        else:
            # [n, 2, cy*4+cx, 2] -> [2, H4, W4, 2]
            wire["mv_cells"] = np.ascontiguousarray(
                ft.mv.reshape(mb_h, mb_w, 2, 4, 4, 2)
                .transpose(2, 0, 3, 1, 4, 5)
                .reshape(2, mb_h * 4, mb_w * 4, 2)
            ).astype(np.int16)
        wire["qp"] = ft.qp
        # seven per-MB booleans ride one byte (device unpacks by bit)
        wire["flags8"] = (
            (ft.mb_class == MB_I_16X16).astype(np.uint8)
            | (ft.transform_8x8.astype(np.uint8) << 1)
            | ((ft.mb_class < 3).astype(np.uint8) << 2)
            | (avl.reshape(-1).astype(np.uint8) << 3)
            | (avt.reshape(-1).astype(np.uint8) << 4)
            | (avtr.reshape(-1).astype(np.uint8) << 5)
            | (avtl.reshape(-1).astype(np.uint8) << 6)
        )
        # ref slots + weight ref indices at 8x8 cells in grid order
        wire["slot_cells8"] = np.ascontiguousarray(
            slot_parts.reshape(mb_h, mb_w, 2, 2, 2)
            .transpose(2, 0, 3, 1, 4)
            .reshape(2, mb_h * 2, mb_w * 2)
        )
        if weighted:  # ref-list indices only feed the weight-table gathers
            wire["ridx_cells8"] = np.ascontiguousarray(
                ft.ref_idx.reshape(mb_h, mb_w, 2, 2, 2)
                .transpose(2, 0, 3, 1, 4)
                .reshape(2, mb_h * 2, mb_w * 2)
            )
        wire["kind"] = kind.astype(np.int8)
        # intra NxN modes (-1..8) nibble-pack two per byte
        m4 = (ft.intra4x4_modes.astype(np.int16) + 1).astype(np.uint8)
        wire["modes4n"] = m4[:, 0::2] | (m4[:, 1::2] << 4)
        wire["i16mode"] = ft.intra16_mode
        wire["cmode"] = ft.chroma_mode
        wire["slice_mb"] = ft.slice_id.astype(np.int16)
        for k, v in wt.items():
            wire[k] = v
        wire["slot_idx"] = np.asarray([cur_slot], np.int32)
        if has_l8 and not sparse:
            wire["luma8_ac"] = narrow(ft.luma8_ac)
        if has_pcm:
            wire["pcm_y"] = pcm_y
            wire["pcm_cb"] = pcm_cb
            wire["pcm_cr"] = pcm_cr
        if self.apply_deblock:
            wire["mb_cls"] = ft.mb_class
            wire["disable"] = ft.disable_deblock
            wire["aoff"] = ft.alpha_off
            wire["boff"] = ft.beta_off
            wire["nnz_bits"] = np.packbits((ft.luma_nnz > 0).reshape(-1))
            # bS picture identity rides the already-shipped slot_parts
        if m is not None:
            m.count("bytes_up", sum(v.nbytes for v in wire.values()))
        buf = jax.device_put(wire)  # ONE batched host->device transfer
        # scaling-list tables are per-(SPS, PPS) constants: upload once
        ls_key = (id(sps), id(pps))
        if getattr(self, "_ls_key", None) != ls_key:
            self._ls_key = ls_key
            s4 = pps.effective_scaling_4x4(sps)
            s8 = pps.effective_scaling_8x8(sps)
            ls4_y = np.stack(
                [tr_k.level_scale_tables_4x4(s4[0]),
                 tr_k.level_scale_tables_4x4(s4[3])]
            )
            ls8_y = np.stack(
                [tr_k.level_scale_tables_8x8(s8[0]),
                 tr_k.level_scale_tables_8x8(s8[1])]
            )
            ls4_c = np.stack(
                [
                    np.stack([tr_k.level_scale_tables_4x4(s4[1]),
                              tr_k.level_scale_tables_4x4(s4[2])]),
                    np.stack([tr_k.level_scale_tables_4x4(s4[4]),
                              tr_k.level_scale_tables_4x4(s4[5])]),
                ]
            )
            dev = {
                "ls4_y": jnp.asarray(ls4_y),
                "ls8_y": jnp.asarray(ls8_y),
                "ls4_c": jnp.asarray(ls4_c),
            }
            if cf3:
                # per-component luma-process lists: Intra/Inter Cb and Cr
                dev["ls4_cb"] = jnp.asarray(np.stack(
                    [tr_k.level_scale_tables_4x4(s4[1]),
                     tr_k.level_scale_tables_4x4(s4[4])]
                ))
                dev["ls4_cr"] = jnp.asarray(np.stack(
                    [tr_k.level_scale_tables_4x4(s4[2]),
                     tr_k.level_scale_tables_4x4(s4[5])]
                ))
                dev["ls8_cb"] = jnp.asarray(np.stack(
                    [tr_k.level_scale_tables_8x8(s8[2]),
                     tr_k.level_scale_tables_8x8(s8[3])]
                ))
                dev["ls8_cr"] = jnp.asarray(np.stack(
                    [tr_k.level_scale_tables_8x8(s8[4]),
                     tr_k.level_scale_tables_8x8(s8[5])]
                ))
            self._ls_dev = dev
        dyn = dict(self._ls_dev)
        dyn["qp_offsets"] = (pps.chroma_qp_index_offset,
                             pps.second_chroma_qp_index_offset)
        # typical P/B frames code zero intra MBs: skip the serial intra
        # raster kernels entirely (the base planes already hold the full
        # inter + PCM reconstruction)
        has_intra = bool(kind.any())
        # all-even MVs (integer/half-pel, common on easy content) make the
        # Table 8-12 second sample dead: skip its gathers in the program
        need_s2 = bool(((ft.mv & 1) != 0).any())
        flags = (has_l8, has_pcm, self.apply_deblock, sparse, cf3, has_intra,
                 cf2, sps.bit_depth_luma, need_s2)
        if m is not None:
            with m.timer("dispatch"):
                ry, rcb, rcr, packed = frame_step(
                    buf, *self._ring, dyn, mb_h, mb_w, n_refs, flags
                )
        else:
            ry, rcb, rcr, packed = frame_step(
                buf, *self._ring, dyn, mb_h, mb_w, n_refs, flags
            )
        self._ring = [ry, rcb, rcr]
        # start the device->host copy now; it overlaps later frames' entropy
        # decode and device compute, and the first plane access just waits.
        # H264_TPU_EAGER_DL=0 defers it to first access instead — on this
        # harness the device link is a narrow tunnel and eager copies of
        # full frames contend with the next frames' uploads
        if self._eager_dl:
            try:
                packed.copy_to_host_async()
            except Exception:
                pass
        out = _PackedFrame(
            packed, H, W, m, cf3=cf3, cf2=cf2,
            dtype=np.uint8 if sps.bit_depth_luma == 8 else np.uint16,
        )
        return _PlaneView(out, 0), _PlaneView(out, 1), _PlaneView(out, 2)


def _implicit_w(p0: Picture, p1: Picture, cur_poc: int) -> tuple[int, int]:
    """8.4.2.3.1 implicit weights (host-side, mirrors the oracle).

    Pure scalar integer math: this runs in an O(|l0|*|l1|) loop per B slice
    on the decode hot path."""
    if p1.poc == p0.poc or p0.long_term or p1.long_term:
        return 32, 32
    tb = min(127, max(-128, cur_poc - p0.poc))
    td = min(127, max(-128, p1.poc - p0.poc))
    if td > 0:
        tx = (16384 + abs(td) // 2) // td
    else:
        tx = -((16384 + abs(td) // 2) // -td)
    dsf = min(1023, max(-1024, (tb * tx + 32) >> 6))
    w1 = dsf >> 2
    if w1 < -64 or w1 > 128:
        return 32, 32
    return 64 - w1, w1
