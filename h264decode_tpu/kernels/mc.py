"""Motion compensation on device (spec 8.4.2.2/8.4.2.3), TPU-native design.

Instead of the oracle's per-block windows, each reference picture gets three
half-pel planes precomputed once by separable 6-tap filters over the whole
(edge-padded) frame — pure shift-add convolutions that XLA fuses and
vectorizes — then stored PAIR-PACKED (two consecutive columns per word, two
phase copies) in the device DPB ring. Per-pixel prediction is a handful of
word gathers from the packed {G, b, h, j} stack (4 indices per 4-px cell
row and reference list) plus quarter-pel averaging selected by the MV
fraction, and a generalized weighted combine (default bi = weights 32/32,
logWD 5, exactly (p0+p1+1)>>1).

All arithmetic int32; bit-exact vs pipeline/inter.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

PAD = 8  # flat-extension margin; any value >= 4 is exact (see oracle clamping)


def _filt6(a0, a1, a2, a3, a4, a5):
    return a0 - 5 * a1 + 20 * a2 + 20 * a3 - 5 * a4 + a5


def half_pel_planes(ref: jnp.ndarray, mx: int = 255) -> jnp.ndarray:
    """ref: [H, W] -> [4, H+2*PAD, W+2*PAD] stack (G, b, h, j); uint8 at
    mx=255, uint16 for high bit depths (Clip1 ceiling mx = 2^bd - 1).

    b = horizontal half-pel (right of G), h = vertical half-pel (below G),
    j = center half-pel. Computed over the edge-replicated canvas so any MV
    (after coordinate clamping into the padded range) is exact."""
    g = jnp.pad(ref.astype(jnp.int32), PAD, mode="edge")  # [H+2P, W+2P]
    ge = jnp.pad(g, ((2, 3), (2, 3)), mode="edge")  # margins for the 6-tap
    # b_raw at integer rows (incl. the vertical filter margins)
    b_raw = _filt6(
        ge[:, 0:-5], ge[:, 1:-4], ge[:, 2:-3], ge[:, 3:-2], ge[:, 4:-1], ge[:, 5:]
    )  # [H+2P+5, W+2P]
    b = jnp.clip((b_raw[2:-3] + 16) >> 5, 0, mx)
    h_raw = _filt6(
        ge[0:-5], ge[1:-4], ge[2:-3], ge[3:-2], ge[4:-1], ge[5:]
    )  # [H+2P, W+2P+5]
    h = jnp.clip((h_raw[:, 2:-3] + 16) >> 5, 0, mx)
    j_raw = _filt6(
        b_raw[0:-5], b_raw[1:-4], b_raw[2:-3], b_raw[3:-2], b_raw[4:-1], b_raw[5:]
    )  # [H+2P, W+2P]
    j = jnp.clip((j_raw + 512) >> 10, 0, mx)
    return jnp.stack([g, b, h, j]).astype(
        jnp.uint8 if mx == 255 else jnp.uint16
    )


def chroma_pad(ref: jnp.ndarray) -> jnp.ndarray:
    """[Hc, Wc] uint8 -> padded [Hc+2*PAD, Wc+2*PAD] uint8."""
    return jnp.pad(ref, PAD, mode="edge")


# Table 8-12 quarter-sample selection as 2 samples from the {G,b,h,j} stack:
# per frac class (fx + 4*fy): (plane1, dy1, dx1, plane2, dy2, dx2, single).
# The predicted sample is s1 when single, else (s1 + s2 + 1) >> 1.
_QPEL_TAB = np.array(
    [
        (0, 0, 0, 0, 0, 0, 1),  # G
        (0, 0, 0, 1, 0, 0, 0),  # avg(G, b)
        (1, 0, 0, 1, 0, 0, 1),  # b
        (1, 0, 0, 0, 0, 1, 0),  # avg(b, G[x+1])
        (0, 0, 0, 2, 0, 0, 0),  # avg(G, h)
        (1, 0, 0, 2, 0, 0, 0),  # avg(b, h)
        (1, 0, 0, 3, 0, 0, 0),  # avg(b, j)
        (1, 0, 0, 2, 0, 1, 0),  # avg(b, h[x+1])
        (2, 0, 0, 2, 0, 0, 1),  # h
        (2, 0, 0, 3, 0, 0, 0),  # avg(h, j)
        (3, 0, 0, 3, 0, 0, 1),  # j
        (2, 0, 1, 3, 0, 0, 0),  # avg(h[x+1], j)
        (2, 0, 0, 0, 1, 0, 0),  # avg(h, G[y+1])
        (2, 0, 0, 1, 1, 0, 0),  # avg(h, b[y+1])
        (1, 1, 0, 3, 0, 0, 0),  # avg(b[y+1], j)
        (2, 0, 1, 1, 1, 0, 0),  # avg(h[x+1], b[y+1])
    ],
    np.int32,
)


def _qpel_fields(frac: jnp.ndarray):
    """Table 8-12 fields for a [H4, W4] frac-class grid WITHOUT a gather:
    a 4-level bit-select tree over the 16 constant rows (the equivalent
    jnp table indexing lowers to a ~8 ns/index gather on TPU; this is a
    handful of VPU selects). Returns a 7-tuple of int32 grids matching
    _QPEL_TAB's columns."""
    b0 = (frac & 1) == 1
    b1 = (frac & 2) == 2
    b2 = (frac & 4) == 4
    b3 = (frac & 8) == 8
    out = []
    for col in range(7):
        v = _QPEL_TAB[:, col]
        lvl = [
            jnp.where(b0, int(v[2 * i + 1]), int(v[2 * i])) for i in range(8)
        ]
        lvl = [jnp.where(b1, lvl[2 * i + 1], lvl[2 * i]) for i in range(4)]
        lvl = [jnp.where(b2, lvl[2 * i + 1], lvl[2 * i]) for i in range(2)]
        out.append(jnp.where(b3, lvl[1], lvl[0]).astype(jnp.int32))
    return tuple(out)


def pack_pair8(planes: jnp.ndarray) -> jnp.ndarray:
    """[..., Hp, Wp] uint8 -> [..., 2, Hp, Wp//2+2] uint16: two
    phase-shifted copies of each plane with 2 consecutive columns packed
    little-endian per word, so one gather index yields 2 of the 4 samples
    a 4x4-cell row reads (Wp must be even, which frame geometry guarantees).

    Cost model (device trace): XLA TPU gathers cost ~7 ns per INDEX while
    the operand stays under ~100 MB and ~13 ns/idx above — pair packing
    halves the index count at 2x operand bytes, the sweet spot for a
    max-size reference ring (R=5 -> 85 MB). The DPB ring stores THIS
    packed layout directly (packed once per decoded frame), so per-frame
    MC does no repacking at all."""
    Wp = planes.shape[-1]
    Wk = Wp // 2 + 2
    C = Wp + 5  # max col read: 2*(Wk-1) + phase(1) + byte(1) = Wp + 4
    pad = [(0, 0)] * (planes.ndim - 1) + [(0, C - Wp)]
    g = jnp.pad(planes, pad, mode="edge")
    words = [
        (g[..., p : p + 2 * Wk][..., 0::2].astype(jnp.uint16)
         | (g[..., p : p + 2 * Wk][..., 1::2].astype(jnp.uint16) << 8))
        for p in range(2)
    ]
    return jnp.stack(words, axis=-3)  # [..., 2, Hp, Wk]


def luma_mc(
    packed: jnp.ndarray,  # [R, 4, 2, Hp, Wk] uint16 pair-packed half-pel ring
    slot: jnp.ndarray,  # [H4, W4] int32 (valid where >= 0; clamped by caller)
    mv: jnp.ndarray,  # [H4, W4, 2] int32 quarter-pel
    H: int,
    W: int,
    need_s2: bool = True,  # False when every MV component is even (integer/
    #                        half-pel): Table 8-12 then always selects a
    #                        single plane sample, so the second gather pair
    #                        is dead — the host detects this per frame
) -> jnp.ndarray:
    """Per-pixel luma prediction [H, W] int32 for one reference list.

    TPU cost model: four flat 1-D gathers per 4-pixel cell row (two per
    Table 8-12 sample), each fetching a pair-packed uint16 word = 2
    consecutive samples — MVs are constant within a 4x4 cell, so a cell
    row reads 4 consecutive reference columns. Exactness at the picture
    edges follows from the flat PAD-sample margins: reading base+k instead
    of clip(base+k) lands on a column holding the identical replicated
    value (PAD = 8 >= the max intra-word offset 1 + word span 3 + table
    offset 1).

    The Table 8-12 lookup runs at CELL resolution, and the index
    arithmetic is fenced off from the gathers with an
    optimization_barrier: letting XLA fuse the index computation into the
    gather loop scalarizes it (~40x slower at 1080p, measured —
    tools/perf_probe.py ablations)."""
    # reference geometry from the packed ring itself (may exceed the output
    # band in the row-sharded path, where refs are all-gathered)
    Hp, Wk = packed.shape[-2], packed.shape[-1]
    Wp = 2 * (Wk - 2)
    RH, RW = Hp - 2 * PAD, Wp - 2 * PAD
    flat = packed.reshape(-1)
    W4 = W // 4

    def rrow(a):  # cell grid [H4, W4] -> quad-row grid [H, W4]
        return jnp.repeat(a, 4, axis=0)

    # cell-resolution Table 8-12 entries (computed as a bit-select tree —
    # a 16-entry table LOOKUP lowers to a gather costing ~1 ms per field
    # set at 1080p, pure VPU selects are ~free)
    frac = (mv[..., 0] & 3) + 4 * (mv[..., 1] & 3)  # [H4, W4]
    t = _qpel_fields(frac)  # tuple of 7 [H4, W4] grids
    phase_sz = Hp * Wk
    base_c = jnp.maximum(slot, 0) * (8 * phase_sz)
    mvx, mvy = rrow(mv[..., 0]), rrow(mv[..., 1])  # [H, W4]
    yy = jnp.arange(H)[:, None]
    xx0 = (jnp.arange(W4) * 4)[None, :]  # first output column of each quad
    # clamp into the padded canvas (flat margins make this exact)
    xi = jnp.clip(xx0 + (mvx >> 2), -PAD, RW - 1 + PAD) + PAD
    yi = jnp.clip(yy + (mvy >> 2), -PAD, RH - 1 + PAD) + PAD
    x1 = jnp.minimum(xi + rrow(t[2]), Wp - 1)
    y1 = jnp.minimum(yi + rrow(t[1]), Hp - 1)
    x2 = jnp.minimum(xi + rrow(t[5]), Wp - 1)
    y2 = jnp.minimum(yi + rrow(t[4]), Hp - 1)
    b1 = rrow(base_c + t[0] * (2 * phase_sz))
    b2 = rrow(base_c + t[3] * (2 * phase_sz))

    def widx(b, y, x):
        return b + (x & 1) * phase_sz + y * Wk + (x >> 1)

    # field width: uint16 words pack two 8-bit samples (pack_pair8), uint32
    # words two 16-bit samples (pack_pair16, high-bit-depth ring)
    fs, fm = (8, 255) if packed.dtype == jnp.uint16 else (16, 0xFFFF)

    def unpack(wa, wb):  # [H, W4] x2 -> [H, W4, 4] int32 (cols x..x+3)
        return jnp.stack(
            [wa & fm, wa >> fs, wb & fm, wb >> fs], axis=-1
        ).astype(jnp.int32)

    i1a = widx(b1, y1, x1)  # cols x1, x1+1
    i1b = widx(b1, y1, x1 + 2)  # cols x1+2, x1+3
    if not need_s2:
        i1a, i1b = jax.lax.optimization_barrier((i1a, i1b))
        s1 = unpack(jnp.take(flat, i1a), jnp.take(flat, i1b))
        return s1.reshape(H, W)
    i2a = widx(b2, y2, x2)
    i2b = widx(b2, y2, x2 + 2)
    single = rrow(t[6])
    i1a, i1b, i2a, i2b, single = jax.lax.optimization_barrier(
        (i1a, i1b, i2a, i2b, single)
    )
    s1 = unpack(jnp.take(flat, i1a), jnp.take(flat, i1b))
    s2 = unpack(jnp.take(flat, i2a), jnp.take(flat, i2b))
    out = jnp.where(single[..., None] == 1, s1, (s1 + s2 + 1) >> 1)
    return out.reshape(H, W)


def pack_pair16(refs16: jnp.ndarray) -> jnp.ndarray:
    """[..., Hp, Wp] uint16 -> [..., 2, Hp, Wp//2+2] uint32: two
    phase-shifted copies with 2 consecutive uint16 columns per word, so one
    gather index yields both samples a 2-px chroma cell row reads (Wp must
    be even). The chroma DPB ring stores this layout directly."""
    Wp = refs16.shape[-1]
    Wk = Wp // 2 + 2
    C = Wp + 5  # max col read: 2*(Wk-1) + phase(1) + entry(1) = Wp + 4
    pad = [(0, 0)] * (refs16.ndim - 1) + [(0, C - Wp)]
    g = jnp.pad(refs16, pad, mode="edge")
    words = [
        (g[..., p : p + 2 * Wk][..., 0::2].astype(jnp.uint32)
         | (g[..., p : p + 2 * Wk][..., 1::2].astype(jnp.uint32) << 16))
        for p in range(2)
    ]
    return jnp.stack(words, axis=-3)  # [..., 2, Hp, Wk]


def chroma_mc_pair(
    packed: jnp.ndarray,  # [R, 2, Hpc, Wkc] uint32 pair-packed Cb|Cr<<8 ring
    slot: jnp.ndarray,  # [H4, W4] int32 (luma-cell granularity)
    mv: jnp.ndarray,  # [H4, W4, 2] int32 quarter-pel luma MV
    Hc: int,
    Wc: int,
    chroma_array_type: int = 1,
    packed2=None,  # high bit depth: separate per-component u32-packed rings
    #               (packed = Cb, packed2 = Cr; 16-bit samples don't fit the
    #               byte-interleaved trick), doubling the gather passes
    mx: int = 255,
):
    """Both chroma components, both pixels of a cell row, in one gather
    pass: Cb and Cr share every source coordinate (byte-interleaved uint16
    plane), and the two horizontally adjacent pixels of a 2x2 chroma cell
    share their MV, so their three distinct bilinear source columns
    (x, x+1, x+2) come from TWO packed uint32 words. Gather-index count:
    4 per cell row vs the naive 16 (XLA TPU gathers cost ~7 ns per INDEX).
    Edge exactness follows the same flat-PAD-margin argument as luma_mc.
    Returns (pred_cb, pred_cr) int32 planes."""
    Hp, Wk = packed.shape[-2], packed.shape[-1]
    Wp = 2 * (Wk - 2)
    RH, RW = Hp - 2 * PAD, Wp - 2 * PAD
    flat = packed.reshape(-1)
    Wc2 = Wc // 2  # == W4: one luma 4x4 cell <-> one chroma cell column

    # vertical chroma sampling: 4:2:0 halves rows (1/8-pel vertical MV),
    # 4:2:2 keeps full rows (spec 8.4.2.2.1: yIntC = mvLX[1] >> 2,
    # yFracC = (mvLX[1] & 3) << 1)
    rv = 2 if chroma_array_type == 1 else 4  # chroma rows per luma cell

    def r2(a):  # cell grid [H4, W4] -> chroma-row grid [Hc, Wc2]
        return jnp.repeat(a, rv, axis=0)

    sl = r2(jnp.maximum(slot, 0))
    mvx, mvy = r2(mv[..., 0]), r2(mv[..., 1])
    yy = jnp.arange(Hc)[:, None]
    xx0 = (jnp.arange(Wc2) * 2)[None, :]
    xi = jnp.clip(xx0 + (mvx >> 3), -PAD, RW - 1 + PAD) + PAD
    if chroma_array_type == 2:
        yi = jnp.clip(yy + (mvy >> 2), -PAD, RH - 1 + PAD) + PAD
        fy = (mvy & 3) << 1
    else:
        yi = jnp.clip(yy + (mvy >> 3), -PAD, RH - 1 + PAD) + PAD
        fy = mvy & 7
    yi1 = jnp.minimum(yi + 1, Hp - 1)
    fx = mvx & 7  # constant across the cell: shared by both pixels
    plane_sz = Hp * Wk
    base = sl * (2 * plane_sz)

    def widx(y, x):
        return base + (x & 1) * plane_sz + y * Wk + (x >> 1)

    iA = widx(yi, xi)  # cols xi, xi+1 at row yi
    iA2 = widx(yi, xi + 2)  # cols xi+2, xi+3 at row yi
    iC = widx(yi1, xi)
    iC2 = widx(yi1, xi + 2)
    iA, iA2, iC, iC2 = jax.lax.optimization_barrier((iA, iA2, iC, iC2))

    def bil(a, b, c, d):
        a, b, c, d = (v.astype(jnp.int32) for v in (a, b, c, d))
        return (
            (8 - fx) * (8 - fy) * a + fx * (8 - fy) * b
            + (8 - fx) * fy * c + fx * fy * d + 32
        ) >> 6

    def gather4(flatp):
        return (jnp.take(flatp, iA), jnp.take(flatp, iA2),
                jnp.take(flatp, iC), jnp.take(flatp, iC2))

    def comp_from(words, extract):
        wA, wA2, wC, wC2 = words
        # per-pixel bilinear corners, pixels 0 and 1: pixel 0 reads cols
        # (xi, xi+1), pixel 1 reads (xi+1, xi+2)
        A0, B0 = extract(wA & 0xFFFF), extract(wA >> 16)
        A1, B1 = B0, extract(wA2 & 0xFFFF)
        C0, D0 = extract(wC & 0xFFFF), extract(wC >> 16)
        C1, D1 = D0, extract(wC2 & 0xFFFF)
        p0 = bil(A0, B0, C0, D0)
        p1 = bil(A1, B1, C1, D1)
        return jnp.stack([p0, p1], axis=-1).reshape(Hc, Wc)

    if packed2 is not None:  # high bit depth: one gather pass per component
        ident = lambda v: v  # noqa: E731
        return (
            comp_from(gather4(flat), ident),
            comp_from(gather4(packed2.reshape(-1)), ident),
        )
    # 8-bit: Cb and Cr byte-interleave into one uint16, ONE gather pass
    w = gather4(flat)
    return (
        comp_from(w, lambda v: v & 255),
        comp_from(w, lambda v: v >> 8),
    )


def weighted_combine(
    p0: jnp.ndarray,
    p1: jnp.ndarray,
    use0: jnp.ndarray,  # bool per pixel
    use1: jnp.ndarray,
    w0: jnp.ndarray,
    o0: jnp.ndarray,
    w1: jnp.ndarray,
    o1: jnp.ndarray,
    log_wd: jnp.ndarray,
    mx: int = 255,
) -> jnp.ndarray:
    """Generalized spec 8.4.2.3 combine: bi uses (p0*w0 + p1*w1 + 2^lwd) >>
    (lwd+1) + (o0+o1+1)>>1; uni uses the one-sided formula. Host supplies
    neutral weights (uni: w=1,o=0,lwd=0; bi default: w=32,lwd=5) so unweighted
    prediction falls out exactly."""
    bi = use0 & use1
    uni = (
        jnp.where(
            log_wd >= 1,
            ((jnp.where(use0, p0, p1) * jnp.where(use0, w0, w1)
              + (1 << jnp.maximum(log_wd - 1, 0))) >> log_wd),
            jnp.where(use0, p0, p1) * jnp.where(use0, w0, w1),
        )
        + jnp.where(use0, o0, o1)
    )
    bi_val = ((p0 * w0 + p1 * w1 + (1 << log_wd)) >> (log_wd + 1)) + (
        (o0 + o1 + 1) >> 1
    )
    return jnp.clip(jnp.where(bi, bi_val, uni), 0, mx)
